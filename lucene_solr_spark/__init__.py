"""lucene_solr_spark — a PySpark-native full-text inverted-index + BM25 engine.

A from-scratch re-expression of the query and data-processing capabilities of
Apache Lucene/Solr 4.4 (reference: steff1193/lucene-solr) on Spark DataFrames:

- ``analysis``   — StandardAnalyzer-equivalent tokenization (UAX#29 + lowercase
                   + 33-word English stop list), JVM-regexp hot path and an
                   Arrow-UDF fidelity path; shingles, synonyms, char/edge
                   n-grams, HTML strip — all codegen expressions.
- ``index``      — inverted-index build: deterministic docIDs, norms
                   (SmallFloat byte315), delta-packed posting lists with
                   128-doc block metadata, segments + lineage, tiered merge.
- ``query``      — query parsers (classic/dismax + the full {!type ...}
                   local-params registry in ``query.qparser``), BM25 +
                   Classic TF-IDF + LM/DFR/IB/SweetSpot similarities,
                   boolean algebra + CommonTermsQuery, phrase/span
                   positions, block-max WAND + impact sketches, components
                   (facets, stats, grouping, joins + score modes, filter
                   algebra, MLT, suggest/infix/fuzzy suggest, spellcheck,
                   elevation, RealTimeGet, terms/term-vectors, highlight),
                   spatial filters, classification, percolation.
- ``functions``  — Solr function-query scalars + index-stat value sources.
- ``pipeline``   — training-data operators: dedup (exact / MinHash-LSH /
                   SimHash / n-gram Jaccard / connected-component groups),
                   similarity search (brute-force, LSH, IVF, IVF-PQ),
                   text quality/lang-ID stats, multimodal columns with
                   REAL PNG/WAV decoders, and the end-to-end corpus
                   curation flow.
- ``sources``    — loaders + deterministic synthetic web-page corpus generator.
- ``streaming``  — NRT micro-batch segment append (Structured Streaming);
                   lineage / checkpoint-resume bookkeeping lives in
                   ``index.lineage``.

Everything here is built from public knowledge of the Spark API and the
reference's observable semantics; reference citations in docstrings are
``path:line`` under /root/reference.
"""

__version__ = "0.1.0"

"""lucene_solr_spark — a PySpark-native full-text inverted-index + BM25 engine.

A from-scratch re-expression of the query and data-processing capabilities of
Apache Lucene/Solr 4.4 (reference: steff1193/lucene-solr) on Spark DataFrames:

- ``analysis``   — StandardAnalyzer-equivalent tokenization (UAX#29 + lowercase
                   + 33-word English stop list), JVM-regexp hot path and an
                   Arrow-UDF fidelity path.
- ``index``      — inverted-index build: deterministic docIDs, norms
                   (SmallFloat byte315), delta-packed posting lists with
                   128-doc block metadata, segments + lineage, tiered merge.
- ``query``      — query parser, BM25 (k1=1.2, b=0.75) top-k, boolean algebra,
                   phrase positions, block-max WAND pruning.
- ``functions``  — Solr function-query scalars + text-analysis functions.
- ``operators``  — faceting, stats, grouping, joins, MoreLikeThis, dedup
                   (exact / MinHash-LSH / SimHash / n-gram Jaccard),
                   similarity search over embeddings.
- ``sources``    — loaders + deterministic synthetic web-page corpus generator.
- ``streaming``  — NRT micro-batch segment append (Structured Streaming).
- ``plans``      — lineage / checkpoint-resume bookkeeping.

Everything here is built from public knowledge of the Spark API and the
reference's observable semantics; reference citations in docstrings are
``path:line`` under /root/reference.
"""

__version__ = "0.1.0"

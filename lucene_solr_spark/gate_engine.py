"""Engine-backed correctness gates.

Unlike gate.py's dialect-template rows (same SQL on Spark and DuckDB — they
validate the *semantics spec*), every Spark callable here runs the REAL
engine path: `build_index` over the sf_dir's `documents` table, then
`Searcher.search / boolean_search / phrase_search / search_wand /
match_docs / facet_field`. The DuckDB oracle recomputes the expected answer
brute-force from the raw corpus (tok CTE), so a bug anywhere in the write
path (inversion, norms, posting pack, merge) or the read path (dictionary
lookup, scoring kernel, WAND pruning, tie-break) turns the gate red.

Comparison discipline: the engine scores in float32 (BM25Similarity's
arithmetic, validated bit-exactly by the pytest goldens); the SQL oracle
scores in float64. Gates therefore compare the *rank-identical top-k*
(rank, doc_id) — the reference criterion (HitQueue.java:76-81 tie-break;
BASELINE.json "rank-identical") — or exact match sets, never raw float
scores, which keeps the cross-engine hash stable while still pinning the
full ordering.

The gate index is built once per sf_dir into `.gate_cache/` (gitignored)
and reused across gate queries and driver runs; a marker records corpus
size + an index-format version so stale caches rebuild.

Index docIDs: the build keys on the documents table's own doc_id (dense
rank of a dense column = itself), so engine doc_ids and oracle doc_ids
coincide; outputs still go through the docs-table join for safety.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .gate import bm25_sql, classic_sql, df_gate, tok_cte

INDEX_VERSION = "r4.1"
_CACHE_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".gate_cache")
_SEARCHERS: dict = {}


def _engine_searcher(spark: SparkSession, sf_dir: str):
    """Build (or reuse) the gate index over `{sf_dir}/documents.parquet` and
    return a Searcher. Cached on disk across processes and in-memory within
    one driver run."""
    from .index.build import build_index
    from .query.executor import Searcher

    key = os.path.abspath(sf_dir)
    if key in _SEARCHERS:
        return _SEARCHERS[key]

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    idx_dir = os.path.join(_CACHE_ROOT, f"idx_{tag}")
    marker = os.path.join(idx_dir, "gate_marker.json")

    fresh = False
    if os.path.exists(marker):
        with open(marker) as fh:
            m = json.load(fh)
        fresh = m.get("version") == INDEX_VERSION and m.get("n_docs") == n_docs and m.get("sf_dir") == key
    if not fresh:
        import shutil

        shutil.rmtree(idx_dir, ignore_errors=True)  # stale format → clean rebuild
        pages = docs.select(F.col("doc_id").alias("orig_id"), "text")
        # small chunk_span → a multi-chunk index even at sf0.01, so the WAND
        # gate drives REAL chunk pruning (bounds job, θ seed, survivor
        # filter), not the single-chunk exhaustive fallback
        build_index(
            spark, pages, idx_dir, text_col="text", key_col="orig_id",
            num_segments=2, chunk_span=64,
        )
        with open(marker, "w") as fh:
            json.dump({"version": INDEX_VERSION, "n_docs": n_docs, "sf_dir": key}, fh)

    searcher = Searcher(spark, idx_dir)
    _SEARCHERS[key] = searcher
    return searcher


def _to_orig(searcher, hits: DataFrame, ranked: bool) -> DataFrame:
    """Map internal doc_ids → the documents table's doc_id (via the docs
    table) and, for top-k outputs, materialize the rank from the engine's
    ordering (score desc, doc_id asc — HitQueue.java:76-81)."""
    out = hits.join(searcher.docs.select("doc_id", "orig_id"), "doc_id").select(
        F.col("orig_id").alias("odoc"), *(["score"] if ranked else [])
    )
    if ranked:
        w = Window.orderBy(F.col("score").desc(), F.col("odoc").asc())
        return out.select(
            F.col("odoc").cast("long").alias("doc_id"),
            F.row_number().over(w).cast("long").alias("rank"),
        ).orderBy("rank")
    return out.select(F.col("odoc").cast("long").alias("doc_id")).orderBy("doc_id")


def _rank_only(inner_sql: str) -> str:
    return f"SELECT doc_id, rank FROM ({inner_sql}) t ORDER BY rank"


def _docset_sql(d: str, where_term: str) -> str:
    return f"""
WITH tok AS ({tok_cte(d)})
SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
FROM tok WHERE {where_term}
ORDER BY doc_id"""


# --- flagship BM25 through the real engine -----------------------------------
@df_gate("engine_bm25_topk_single", _rank_only(bm25_sql("duckdb", ["spark"], k=10)))
def _e_bm25_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TermQuery → build_index + Searcher.search (TermScorer path,
    TermQuery.java:45-161) vs brute-force DuckDB recomputation."""
    s = _engine_searcher(spark, sf_dir)
    return _to_orig(s, s.search(["spark"], k=10), ranked=True)


@df_gate(
    "engine_classic_tfidf",
    _rank_only(classic_sql("duckdb", ["spark", "merge", "window"], k=10)),
)
def _e_classic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DefaultSimilarity (the reference's unconfigured-core DEFAULT scorer,
    DefaultSimilarity.java:55-140) over the SAME index the BM25 gates use —
    Similarity is a search-time choice over shared byte315 norms. Rank-only
    vs a double-precision DuckDB recomputation (coord + queryNorm +
    quantized length norm); float32 score identity is pytest-gated against
    brute_force_topk_classic (tests/test_classic.py)."""
    s = _engine_searcher(spark, sf_dir)
    return _to_orig(s, s.search_classic(["spark", "merge", "window"], k=10), ranked=True)


@df_gate(
    "engine_bm25_topk_multi",
    _rank_only(bm25_sql("duckdb", ["spark", "merge", "window"], k=10)),
)
def _e_bm25_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BooleanQuery SHOULD sum through the engine (DisjunctionSumScorer)."""
    s = _engine_searcher(spark, sf_dir)
    return _to_orig(s, s.search(["spark", "merge", "window"], k=10), ranked=True)


@df_gate(
    "engine_bm25_wand",
    _rank_only(bm25_sql("duckdb", ["spark", "merge", "window"], k=10)),
)
def _e_bm25_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-max WAND vs the SAME exhaustive oracle — proves the pruning is
    lossless end-to-end on a real corpus, not just in pytest."""
    s = _engine_searcher(spark, sf_dir)
    return _to_orig(s, s.search_wand(["spark", "merge", "window"], k=10), ranked=True)


@df_gate(
    "engine_filtered_bm25",
    _rank_only(bm25_sql("duckdb", ["spark", "merge"], k=10, doc_filter="lang = 'en'")),
)
def _e_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fq/FilteredQuery through the engine: filter restricts result docs,
    collection stats stay global (FilteredQuery.java)."""
    s = _engine_searcher(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fq = s.filter_docs_from_source(
        docs.withColumnRenamed("doc_id", "orig_id"),
        F.col("lang") == "en",
        key_col="orig_id",
    )
    return _to_orig(s, s.search(["spark", "merge"], k=10, filter_docs=fq), ranked=True)


# --- boolean algebra through the engine --------------------------------------
@df_gate(
    "engine_bool_must",
    f"""
WITH tok AS ({tok_cte('duckdb')})
SELECT CAST(doc_id AS BIGINT) AS doc_id
FROM tok WHERE term IN ('fast','merge')
GROUP BY doc_id HAVING COUNT(DISTINCT term) = 2
ORDER BY doc_id""",
)
def _e_must(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUST conjunction (ConjunctionScorer leap-frog as hash agg)."""
    s = _engine_searcher(spark, sf_dir)
    hits = s.boolean_search(must=["fast", "merge"], k=1_000_000)
    return _to_orig(s, hits, ranked=False)


@df_gate(
    "engine_bool_must_not",
    f"""
WITH tok AS ({tok_cte('duckdb')})
SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id FROM tok
WHERE term = 'fast'
  AND doc_id NOT IN (SELECT doc_id FROM tok WHERE term = 'merge')
ORDER BY doc_id""",
)
def _e_must_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUST_NOT anti-join (ReqExclScorer)."""
    s = _engine_searcher(spark, sf_dir)
    hits = s.boolean_search(must=["fast"], must_not=["merge"], k=1_000_000)
    return _to_orig(s, hits, ranked=False)


@df_gate(
    "engine_min_should_match",
    f"""
WITH tok AS ({tok_cte('duckdb')})
SELECT CAST(doc_id AS BIGINT) AS doc_id
FROM tok WHERE term IN ('hash','merge','stream')
GROUP BY doc_id HAVING COUNT(DISTINCT term) >= 2
ORDER BY doc_id""",
)
def _e_msm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minimumNumberShouldMatch ≥ 2 of 3 (MinShouldMatchSumScorer)."""
    s = _engine_searcher(spark, sf_dir)
    hits = s.boolean_search(
        should=["hash", "merge", "stream"], min_should_match=2, k=1_000_000
    )
    return _to_orig(s, hits, ranked=False)


@df_gate(
    "engine_req_opt_sum",
    _rank_only(bm25_sql("duckdb", ["fast", "merge"], k=10, combine="req_opt")),
)
def _e_req_opt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReqOptSumScorer through the engine: required 'fast' + optional
    'merge' scored only where the required clause matches
    (ReqOptSumScorer.java) — boolean_search(must, should)."""
    s = _engine_searcher(spark, sf_dir)
    hits = s.boolean_search(must=["fast"], should=["merge"], k=10)
    return _to_orig(s, hits, ranked=True)


# --- positional --------------------------------------------------------------
@df_gate(
    "engine_phrase_exact",
    f"""
WITH tok AS ({tok_cte('duckdb')})
SELECT DISTINCT CAST(t1.doc_id AS BIGINT) AS doc_id
FROM tok t1 JOIN tok t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
WHERE t1.term = 'fast' AND t2.term = 'merge'
ORDER BY doc_id""",
)
def _e_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactPhraseScorer through the index's position lists."""
    s = _engine_searcher(spark, sf_dir)
    return _to_orig(s, s.phrase_search(["fast", "merge"], k=1_000_000), ranked=False)


@df_gate(
    "engine_sloppy_phrase",
    f"""
WITH tok AS ({tok_cte('duckdb')})
SELECT DISTINCT CAST(t1.doc_id AS BIGINT) AS doc_id
FROM tok t1 JOIN tok t2 ON t1.doc_id = t2.doc_id
WHERE t1.term = 'fast' AND t2.term = 'merge'
  AND ABS((t2.pos - 1) - t1.pos) <= 2
ORDER BY doc_id""",
)
def _e_sloppy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sloppy phrase slop=2: engine match set vs the min-window oracle
    (a (fast,merge) pair matches iff the spread of the offset-adjusted
    positions ≤ slop — SloppyPhraseScorer's matchLength)."""
    s = _engine_searcher(spark, sf_dir)
    return _to_orig(
        s, s.phrase_search(["fast", "merge"], k=1_000_000, slop=2), ranked=False
    )


def _common_terms_sql(terms: list[str], mtf: float = 0.5, k: int = 10) -> str:
    """CommonTermsQuery oracle (CommonTermsQuery.java:170-226), DuckDB,
    lowFreqOccur=SHOULD / highFreqOccur=SHOULD: terms are classified by df
    computed FROM THE CORPUS (high iff df > ceil(mtf·maxDoc)); a doc matches
    iff it holds ≥1 low-frequency term; common terms only add score."""
    from .index.norms import quantized_doclen_sql

    qdl = quantized_doclen_sql("dl.dl", dialect="duckdb")
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH tok AS ({tok_cte('duckdb')}),
consts AS (
  SELECT CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS n,
         CAST((SELECT CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM documents) FROM tok) AS FLOAT) AS avgdl
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
qdl AS (SELECT doc_id, {qdl} AS qdl FROM dl),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM tok WHERE term IN ({term_list}) GROUP BY doc_id, term
),
dfv AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
  FROM tok WHERE term IN ({term_list}) GROUP BY term
),
klass AS (
  SELECT term, CASE WHEN df > CEIL({mtf} * consts.n) THEN 1 ELSE 0 END AS is_high
  FROM dfv CROSS JOIN consts
),
per AS (
  SELECT tf.doc_id, tf.term,
         LN(1.0 + (consts.n - dfv.df + 0.5) / (dfv.df + 0.5)) * 2.2 * tf.tf
           / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / consts.avgdl)) AS s
  FROM tf
  JOIN dfv ON tf.term = dfv.term
  JOIN qdl ON tf.doc_id = qdl.doc_id
  CROSS JOIN consts
),
agg AS (
  SELECT per.doc_id,
         SUM(CASE WHEN k.is_high = 0 THEN per.s END) AS low_s,
         COUNT(CASE WHEN k.is_high = 0 THEN 1 END) AS n_low,
         SUM(CASE WHEN k.is_high = 1 THEN per.s END) AS high_s
  FROM per JOIN klass k ON per.term = k.term
  GROUP BY per.doc_id
),
summed AS (
  SELECT doc_id, COALESCE(low_s, 0.0) + COALESCE(high_s, 0.0) AS score
  FROM agg WHERE n_low >= 1
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM summed
ORDER BY rank
LIMIT {k}"""


@df_gate("engine_common_terms", _common_terms_sql(["dup", "fast", "merge"]))
def _e_common_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CommonTermsQuery through the engine (CommonTermsQuery.java:146-226):
    'fast' and 'merge' are corpus-common (df ≈ 380/500 at sf0.01 > the
    ceil(0.5·maxDoc) cutoff) so they become the optional clause; 'dup'
    (df = 25) is the low-frequency clause that alone drives matching. The
    oracle recomputes the df classification and the ReqOptSum score from
    the raw corpus."""
    s = _engine_searcher(spark, sf_dir)
    hits = s.common_terms_search(["dup", "fast", "merge"], max_term_frequency=0.5, k=10)
    return _to_orig(s, hits, ranked=True)


# --- MultiTermQuery rewrites --------------------------------------------------
@df_gate("engine_prefix_match", _docset_sql("duckdb", "term LIKE 'st%'"))
def _e_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PrefixQuery rewrite → postings retrieval: docs containing any 'st*'
    term (PrefixQuery.java:96 → disjunction)."""
    s = _engine_searcher(spark, sf_dir)
    terms = s._rewrite_terms(F.col("term").like("st%"))
    return _to_orig(s, s.match_docs(terms), ranked=False)


@df_gate(
    "engine_fuzzy_match", _docset_sql("duckdb", "LEVENSHTEIN(term, 'spqrk') <= 2")
)
def _e_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FuzzyQuery rewrite (dictionary Levenshtein ∩, capped) → match set."""
    s = _engine_searcher(spark, sf_dir)
    band = (F.length("term") >= len("spqrk") - 2) & (F.length("term") <= len("spqrk") + 2)
    terms = s._rewrite_terms(band & (F.levenshtein(F.col("term"), F.lit("spqrk")) <= 2))
    return _to_orig(s, s.match_docs(terms), ranked=False)


@df_gate(
    "engine_range_match", _docset_sql("duckdb", "term >= 'query' AND term < 'spark'")
)
def _e_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TermRangeQuery over the sorted dictionary → match set."""
    s = _engine_searcher(spark, sf_dir)
    terms = s._rewrite_terms((F.col("term") >= "query") & (F.col("term") < "spark"))
    return _to_orig(s, s.match_docs(terms), ranked=False)


@df_gate(
    "engine_wildcard_match",
    _docset_sql("duckdb", "REGEXP_MATCHES(term, '^s.*[kw]$')"),
)
def _e_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard/Regexp rewrite (DFA ∩ dictionary) → match set."""
    s = _engine_searcher(spark, sf_dir)
    terms = s._rewrite_terms(F.col("term").rlike("^s.*[kw]$"))
    return _to_orig(s, s.match_docs(terms), ranked=False)


# --- aggregations / stats through the engine ----------------------------------
@df_gate(
    "engine_facet_field",
    f"""
WITH tok AS ({tok_cte('duckdb')}),
m AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'spark')
SELECT d.source AS source, CAST(COUNT(*) AS BIGINT) AS facet_count
FROM documents d JOIN m ON m.doc_id = d.doc_id
GROUP BY d.source
ORDER BY facet_count DESC, source ASC
LIMIT 20""",
)
def _e_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """facet.field over the engine's match DocSet (SimpleFacets fc path)."""
    s = _engine_searcher(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumnRenamed(
        "doc_id", "orig_id"
    )
    return s.facet_field(["spark"], docs, "source", key_col="orig_id", limit=20)


@df_gate(
    "engine_total_hits",
    f"""
WITH tok AS ({tok_cte('duckdb')})
SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS total_hits
FROM tok WHERE term = 'merge'""",
)
def _e_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TotalHitCountCollector through the non-scoring postings iterator."""
    s = _engine_searcher(spark, sf_dir)
    n = s.count(["merge"])
    return spark.createDataFrame([(n,)], "total_hits long")


@df_gate(
    "engine_collection_stats",
    f"""
WITH tok AS ({tok_cte('duckdb')})
SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS max_doc,
       CAST(COUNT(*) AS BIGINT) AS sum_ttf,
       CAST(COUNT(DISTINCT term) AS BIGINT) AS vocab_size
FROM tok""",
)
def _e_collstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollectionStatistics as the BUILT index recorded them (stats.json +
    term dictionary) — validates the write path's aggregates."""
    s = _engine_searcher(spark, sf_dir)
    vocab = s.terms.count()
    return spark.createDataFrame(
        [(s.stats.max_doc, s.stats.sum_total_term_freq, vocab)],
        "max_doc long, sum_ttf long, vocab_size long",
    )


# --- eDisMax across fields ----------------------------------------------------
_TITLE_EXPR = "SUBSTRING(text, 1, 80)"  # derived second field, both engines
_DISMAX_TERMS = ["spark", "merge"]
_DISMAX_QF = {"text": 1.0, "title": 3.0}
_DISMAX_TIE = 0.3


def _per_field_score_cte(d: str, tok_name: str, terms: list[str]) -> str:
    """Per-(doc, term) BM25 scores with PER-FIELD stats (df, avgdl, norms) —
    IndexSearcher.collectionStatistics(field) semantics."""
    from .index.norms import quantized_doclen_sql

    qdl = quantized_doclen_sql(f"dl_{tok_name}.dl", dialect=d)
    fc = "FLOAT" if d == "spark" else "REAL"
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
consts_{tok_name} AS (
  SELECT CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS n,
         CAST((SELECT CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM documents) FROM {tok_name}) AS {fc}) AS avgdl
),
dl_{tok_name} AS (SELECT doc_id, COUNT(*) AS dl FROM {tok_name} GROUP BY doc_id),
qdl_{tok_name} AS (SELECT doc_id, {qdl} AS qdl FROM dl_{tok_name}),
tf_{tok_name} AS (
  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM {tok_name} WHERE term IN ({term_list}) GROUP BY doc_id, term
),
df_{tok_name} AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
  FROM {tok_name} WHERE term IN ({term_list}) GROUP BY term
),
per_{tok_name} AS (
  SELECT tf.doc_id, tf.term,
         LN(1.0 + (c.n - dfv.df + 0.5) / (dfv.df + 0.5)) * 2.2 * tf.tf
           / (tf.tf + 1.2 * (0.25 + 0.75 * q.qdl / c.avgdl)) AS s
  FROM tf_{tok_name} tf
  JOIN df_{tok_name} dfv ON tf.term = dfv.term
  JOIN qdl_{tok_name} q ON tf.doc_id = q.doc_id
  CROSS JOIN consts_{tok_name} c
)"""


def _dismax_oracle(d: str) -> str:
    boosts = _DISMAX_QF
    return f"""
WITH tok_a AS ({tok_cte(d)}),
tok_b AS ({tok_cte(d, text_expr=_TITLE_EXPR)}),
{_per_field_score_cte(d, 'tok_a', _DISMAX_TERMS)},
{_per_field_score_cte(d, 'tok_b', _DISMAX_TERMS)},
u AS (
  SELECT doc_id, term, s * {boosts['text']} AS s FROM per_tok_a
  UNION ALL
  SELECT doc_id, term, s * {boosts['title']} AS s FROM per_tok_b
),
t AS (
  SELECT doc_id, term, MAX(s) + {_DISMAX_TIE} * (SUM(s) - MAX(s)) AS ts
  FROM u GROUP BY doc_id, term
),
f AS (SELECT doc_id, SUM(ts) AS score FROM t GROUP BY doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM f ORDER BY rank LIMIT 10"""


def _dismax_searcher(spark: SparkSession, sf_dir: str):
    from .query.dismax import DisMaxSearcher, build_multi_field_index

    key = ("dismax", os.path.abspath(sf_dir))
    if key in _SEARCHERS:
        return _SEARCHERS[key]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    idx_dir = os.path.join(_CACHE_ROOT, f"idx_{tag}_mf")
    marker = os.path.join(idx_dir, "gate_marker.json")
    fresh = False
    if os.path.exists(marker):
        with open(marker) as fh:
            m = json.load(fh)
        fresh = m.get("version") == INDEX_VERSION and m.get("n_docs") == n_docs
    if not fresh:
        import shutil

        shutil.rmtree(idx_dir, ignore_errors=True)
        pages = docs.select(F.col("doc_id").alias("orig_id"), "text")
        build_multi_field_index(
            spark,
            pages,
            idx_dir,
            field_exprs={
                "text": F.col("text"),
                "title": F.expr(_TITLE_EXPR),
            },
            key_col="orig_id",
        )
        with open(marker, "w") as fh:
            json.dump({"version": INDEX_VERSION, "n_docs": n_docs}, fh)
    ds = DisMaxSearcher(spark, idx_dir)
    _SEARCHERS[key] = ds
    return ds


@df_gate("engine_dismax_qf", _dismax_oracle("duckdb"))
def _e_dismax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """eDisMax qf across (text, title^3) with tie=0.3 through the real
    multi-field index (ExtendedDismaxQParser.java:1512 →
    DisjunctionMaxQuery.java:299) vs a per-field-stats DuckDB oracle."""
    ds = _dismax_searcher(spark, sf_dir)
    hits = ds.dismax_search(_DISMAX_TERMS, qf=_DISMAX_QF, tie=_DISMAX_TIE, k=10)
    return _to_orig(ds.searchers["text"], hits, ranked=True)


def _dismax_bq_oracle(d: str) -> str:
    """Main dismax + bq (text:fast^0.5) + bf (recip over n_chars), the
    DisMaxQParser.java:136-148 additive boost semantics."""
    boosts = _DISMAX_QF
    return f"""
WITH tok_a AS ({tok_cte(d)}),
tok_b AS ({tok_cte(d, text_expr=_TITLE_EXPR)}),
{_per_field_score_cte(d, 'tok_a', _DISMAX_TERMS + ['fast'])},
{_per_field_score_cte(d, 'tok_b', _DISMAX_TERMS)},
u AS (
  SELECT doc_id, term, s * {boosts['text']} AS s FROM per_tok_a WHERE term IN ('spark','merge')
  UNION ALL
  SELECT doc_id, term, s * {boosts['title']} AS s FROM per_tok_b WHERE term IN ('spark','merge')
),
t AS (
  SELECT doc_id, term, MAX(s) + {_DISMAX_TIE} * (SUM(s) - MAX(s)) AS ts
  FROM u GROUP BY doc_id, term
),
f AS (SELECT doc_id, SUM(ts) AS score FROM t GROUP BY doc_id),
bqs AS (SELECT doc_id, 0.5 * s AS b FROM per_tok_a WHERE term = 'fast'),
fin AS (
  SELECT f.doc_id,
         f.score + COALESCE(bqs.b, 0.0) + 1000.0 / (dd.n_chars + 1000.0) AS score
  FROM f LEFT JOIN bqs ON bqs.doc_id = f.doc_id
  JOIN documents dd ON dd.doc_id = f.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM fin ORDER BY rank LIMIT 10"""


@df_gate("engine_dismax_bq", _dismax_bq_oracle("duckdb"))
def _e_dismax_bq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """eDisMax bq + bf (DisMaxQParser.java:136-148): main dismax query
    required, bq = text:fast^0.5 and bf = recip(n_chars,1,1000,1000) scores
    ADD to matching docs."""
    from .functions.valuesources import recip

    ds = _dismax_searcher(spark, sf_dir)
    mapping = ds.searchers["text"].docs.select("orig_id", F.col("doc_id").alias("int_id"))
    bf_frame = (
        _documents(spark, sf_dir)
        .select(
            F.col("doc_id").alias("orig_id"),
            recip(F.col("n_chars"), 1.0, 1000.0, 1000.0).alias("bf"),
        )
        .join(mapping, "orig_id")
        .select(F.col("int_id").alias("doc_id"), "bf")
    )
    hits = ds.dismax_search(
        _DISMAX_TERMS,
        qf=_DISMAX_QF,
        tie=_DISMAX_TIE,
        k=10,
        bq=[("text", ["fast"], 0.5)],
        bf=bf_frame,
        bf_col="bf",
    )
    return _to_orig(ds.searchers["text"], hits, ranked=True)


# --- components: sort / paging / grouping / stats / facets -------------------
def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


_COMPONENT_QUERY = ["spark"]  # the q whose DocSet the component gates run over
_MATCH_CTE = "m AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'spark')"


def _match_orig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's match DocSet for the component query, in documents-table
    doc_ids — Solr components run over the q+fq result DocSet
    (SimpleFacets.java:336-448), so every component gate restricts to this."""
    s = _engine_searcher(spark, sf_dir)
    m = s.match_docs(_COMPONENT_QUERY)
    return (
        s.docs.join(m, "doc_id", "left_semi")
        .select(F.col("orig_id").cast("long").alias("doc_id"))
    )


@df_gate(
    "engine_sort_topk",
    """
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_chars AS BIGINT) AS n_chars
FROM documents ORDER BY n_chars DESC, doc_id ASC LIMIT 10""",
)
def _e_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TopFieldCollector through components.sort_topk."""
    from .query.components import sort_topk

    out = sort_topk(_documents(spark, sf_dir), [("n_chars", False)], k=10)
    return out.select(
        F.col("doc_id").cast("long"), F.col("n_chars").cast("long")
    )


@df_gate(
    "engine_search_after",
    """
WITH page1 AS (
  SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id ASC LIMIT 10
),
cursor AS (
  SELECT n_chars AS c_chars, doc_id AS c_doc FROM page1 ORDER BY n_chars ASC, doc_id DESC LIMIT 1
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d, cursor
WHERE d.n_chars < cursor.c_chars OR (d.n_chars = cursor.c_chars AND d.doc_id > cursor.c_doc)
ORDER BY d.n_chars DESC, d.doc_id ASC LIMIT 10""",
)
def _e_search_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """searchAfter: page 2 via the cursor from page 1 (no offset re-scan)."""
    from .query.components import search_after, sort_topk

    docs = _documents(spark, sf_dir)
    page1 = sort_topk(docs, [("n_chars", False)], k=10).collect()
    cursor = (page1[-1]["n_chars"], page1[-1]["doc_id"])
    out = search_after(docs, "n_chars", cursor, k=10, asc=False)
    return out.select(F.col("doc_id").cast("long"), F.col("n_chars").cast("long"))


@df_gate(
    "engine_grouping",
    f"""
WITH tok AS ({tok_cte('duckdb')}), {_MATCH_CTE}
SELECT source, CAST(doc_id AS BIGINT) AS doc_id, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT d.source, d.doc_id,
         ROW_NUMBER() OVER (PARTITION BY d.source ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
  FROM documents d JOIN m ON m.doc_id = d.doc_id
) t WHERE rn <= 2
ORDER BY source, rn""",
)
def _e_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping (top-2 per group) through components.grouping_top_docs,
    restricted to the engine's q='spark' match DocSet (Grouping.java runs
    over the query result, not the corpus)."""
    from .query.components import grouping_top_docs

    out = grouping_top_docs(
        _documents(spark, sf_dir), "source", "n_chars", 2,
        matches=_match_orig(spark, sf_dir),
    )
    return out.select("source", F.col("doc_id").cast("long"), "rn").orderBy(
        "source", "rn"
    )


@df_gate(
    "engine_stats_component",
    f"""
WITH tok AS ({tok_cte('duckdb')}), {_MATCH_CTE}
SELECT
  d.lang AS lang,
  CAST(COUNT(d.n_chars) AS BIGINT) AS cnt,
  CAST(SUM(CASE WHEN d.n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing,
  CAST(MIN(d.n_chars) AS BIGINT) AS min_v,
  CAST(MAX(d.n_chars) AS BIGINT) AS max_v,
  ROUND(CAST(SUM(CAST(d.n_chars AS DECIMAL(20,0))) AS DOUBLE), 2) AS sum_v,
  ROUND(CAST(SUM(CAST(d.n_chars AS DECIMAL(20,0))) AS DOUBLE) / COUNT(d.n_chars), 6) AS mean_v,
  ROUND(SQRT((CAST(SUM(CAST(d.n_chars AS DECIMAL(18,0)) * CAST(d.n_chars AS DECIMAL(18,0))) AS DOUBLE)
        - CAST(SUM(CAST(d.n_chars AS DECIMAL(20,0))) AS DOUBLE) * CAST(SUM(CAST(d.n_chars AS DECIMAL(20,0))) AS DOUBLE) / COUNT(d.n_chars))
        / (COUNT(d.n_chars) - 1)), 4) AS stddev_v
FROM documents d JOIN m ON m.doc_id = d.doc_id
GROUP BY d.lang ORDER BY d.lang""",
)
def _e_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StatsComponent over the q='spark' match DocSet, per-facet by lang
    (StatsValuesFactory.java:82-181 + stats.facet — Solr computes stats over
    the query result set). DECIMAL-exact sums; scale inferred (bigint → 0)."""
    from .query.components import stats_component

    out = stats_component(
        _documents(spark, sf_dir), "n_chars", facet_cols=["lang"],
        matches=_match_orig(spark, sf_dir),
    )
    return out.select(
        "lang",
        "cnt",
        "missing",
        F.col("min_v").cast("long"),
        F.col("max_v").cast("long"),
        F.round("sum_v", 2).alias("sum_v"),
        F.round("mean_v", 6).alias("mean_v"),
        F.round("stddev_v", 4).alias("stddev_v"),
    )


@df_gate(
    "engine_facet_query",
    f"""
WITH tok AS ({tok_cte('duckdb')}), {_MATCH_CTE}
SELECT
  CAST(SUM(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
  CAST(SUM(CASE WHEN d.n_chars > 300 THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
  CAST(SUM(CASE WHEN d.source = 'src0' AND d.n_chars <= 300 THEN 1 ELSE 0 END) AS BIGINT) AS n_src0_short
FROM documents d JOIN m ON m.doc_id = d.doc_id""",
)
def _e_facet_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """facet.query over the q='spark' match DocSet (SimpleFacets.java:277
    counts each facet.query predicate within the result set)."""
    from .query.components import facet_query

    docs = _documents(spark, sf_dir)
    return facet_query(
        docs,
        {
            "n_en": F.col("lang") == "en",
            "n_long": F.col("n_chars") > 300,
            "n_src0_short": (F.col("source") == "src0") & (F.col("n_chars") <= 300),
        },
        matches=_match_orig(spark, sf_dir),
    )


@df_gate(
    "engine_facet_range",
    f"""
WITH tok AS ({tok_cte('duckdb')}), {_MATCH_CTE}
SELECT CAST(FLOOR(d.n_chars / 50.0) * 50 AS DOUBLE) AS bucket_lo, CAST(COUNT(*) AS BIGINT) AS cnt
FROM documents d JOIN m ON m.doc_id = d.doc_id
GROUP BY FLOOR(d.n_chars / 50.0) * 50
ORDER BY bucket_lo""",
)
def _e_facet_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """facet.range over the q='spark' match DocSet
    (SimpleFacets.java:888-1078 buckets the result set)."""
    from .query.components import facet_range

    return facet_range(
        _documents(spark, sf_dir), "n_chars", gap=50.0,
        matches=_match_orig(spark, sf_dir),
    )


@df_gate(
    "engine_facet_pivot",
    f"""
WITH tok AS ({tok_cte('duckdb')}), {_MATCH_CTE}
SELECT d.lang AS lang, d.source AS source, CAST(COUNT(*) AS BIGINT) AS cnt
FROM documents d JOIN m ON m.doc_id = d.doc_id
GROUP BY d.lang, d.source
ORDER BY lang, source""",
)
def _e_facet_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """facet.pivot over the q='spark' match DocSet (PivotFacetHelper runs
    within the base DocSet)."""
    from .query.components import facet_pivot

    return facet_pivot(
        _documents(spark, sf_dir), ["lang", "source"],
        matches=_match_orig(spark, sf_dir),
    )


@df_gate(
    "engine_distinct_counts",
    f"""
WITH tok AS ({tok_cte('duckdb')}), {_MATCH_CTE}
SELECT CAST(COUNT(DISTINCT d.lang) AS BIGINT) AS distinct_lang,
       CAST(COUNT(DISTINCT d.source) AS BIGINT) AS distinct_source
FROM documents d JOIN m ON m.doc_id = d.doc_id""",
)
def _e_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """calcdistinct over the q='spark' match DocSet."""
    from .query.components import distinct_counts

    return distinct_counts(
        _documents(spark, sf_dir), ["lang", "source"],
        matches=_match_orig(spark, sf_dir),
    )


@df_gate(
    "engine_facet_date",
    """
SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt
FROM events WHERE event_type = 'click'
GROUP BY DATE_TRUNC('day', ts)
ORDER BY bucket""",
)
def _e_facet_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """facet.date (DateMathParser /DAY rounding → date_trunc buckets) over a
    filter DocSet — the fq-restricted path through restrict_to_matches, with
    event_id as the DocSet key (components are id-column generic)."""
    from .query.components import facet_date

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    matches = ev.where(F.col("event_type") == "click").select("event_id")
    return facet_date(ev, "ts", unit="day", matches=matches, id_col="event_id")


# not driver-registered (registry budget: a match-all row is the least
# informative gate — its set is trivially every live doc_id, a property
# engine_total_hits + the delete tests already pin); kept for pytest/manual
def _e_match_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MatchAllDocsQuery over the built index's live docs."""
    from .query.components import match_all

    s = _engine_searcher(spark, sf_dir)
    return spark.createDataFrame([(match_all(s).count(),)], "total long")


def _span_near_sql() -> str:
    d = "duckdb"
    return f"""
WITH tok AS ({tok_cte(d)}),
a AS (SELECT doc_id, pos FROM tok WHERE term = 'fast'),
b AS (SELECT doc_id, pos FROM tok WHERE term = 'merge'),
ord AS (
  SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS doc_id
  FROM a JOIN b ON a.doc_id = b.doc_id
  WHERE b.pos > a.pos AND b.pos - a.pos - 1 <= 1),
unord AS (
  SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS doc_id
  FROM a JOIN b ON a.doc_id = b.doc_id
  WHERE ABS(b.pos - a.pos) - 1 <= 2)
SELECT 'ordered' AS mode, doc_id FROM ord
UNION ALL
SELECT 'unordered' AS mode, doc_id FROM unord
ORDER BY mode, doc_id"""


@df_gate("engine_span_near", _span_near_sql())
def _e_span_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SpanNearQuery through the engine, both orders in one row set:
    ordered 'fast merge' slop=1 (NearSpansOrdered.java:190-345 — exists a
    pair p_fast < p_merge with gap ≤ 1) and unordered slop=2
    (NearSpansUnordered.java:332-335 — exists a pair with window − 2 ≤ 2),
    vs brute-force position-pair DuckDB oracles. Match-set equivalence of
    the iterator enumeration to the exists-pair predicate is property-
    tested in tests/test_spans.py."""
    from .query.spans import SpanNear, SpanTerm

    s = _engine_searcher(spark, sf_dir)
    ordered = SpanNear((SpanTerm("fast"), SpanTerm("merge")), slop=1, in_order=True)
    unordered = SpanNear(
        (SpanTerm("fast"), SpanTerm("merge")), slop=2, in_order=False
    )
    a = _to_orig(s, s.span_search(ordered, k=1_000_000), ranked=False).select(
        F.lit("ordered").alias("mode"), "doc_id"
    )
    b = _to_orig(s, s.span_search(unordered, k=1_000_000), ranked=False).select(
        F.lit("unordered").alias("mode"), "doc_id"
    )
    return a.unionAll(b).orderBy("mode", "doc_id")


# not driver-registered (registry budget: the bool engine gates exercise the
# same set algebra through the engine; tests/test_components.py covers the
# DocSet API directly) — kept as a callable for pytest and manual runs
def _e_docsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DocSet union/intersection/andNot over real match sets."""
    from .query.components import docset_and_not, docset_intersect, docset_union

    s = _engine_searcher(spark, sf_dir)
    a = s.match_docs(["fast"])
    b = s.match_docs(["merge"])
    return spark.createDataFrame(
        [
            (
                docset_union(a, b).count(),
                docset_intersect(a, b).count(),
                docset_and_not(a, b).count(),
            )
        ],
        "n_union long, n_intersect long, n_and_not long",
    )


@df_gate(
    "engine_join_semi",
    """
SELECT c.c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer c
WHERE c.c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
GROUP BY c.c_mktsegment
ORDER BY segment""",
)
def _e_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr {!join} through components.solr_join."""
    from .query.components import solr_join

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    joined = solr_join(
        orders, "o_custkey", customer, "c_custkey", F.col("o_totalprice") > 100000
    )
    return (
        joined.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("segment")
    )


@df_gate(
    "engine_block_join_parent",
    """
SELECT CAST(o.o_orderkey AS BIGINT) AS order_key,
       ROUND(MAX(l.l_extendedprice), 2) AS best_child_score,
       CAST(COUNT(*) AS BIGINT) AS n_matching_children
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_quantity > 45
GROUP BY o.o_orderkey
ORDER BY best_child_score DESC, order_key ASC
LIMIT 20""",
)
def _e_block_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ToParentBlockJoinQuery (score mode max) through components."""
    from .query.components import block_join_parent

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rolled = block_join_parent(
        li, F.col("l_quantity") > 45, "l_orderkey", "l_extendedprice", "max"
    )
    return (
        rolled.select(
            F.col("l_orderkey").cast("long").alias("order_key"),
            F.round("parent_score", 2).alias("best_child_score"),
            "n_matching_children",
        )
        .orderBy(F.col("best_child_score").desc(), F.col("order_key").asc())
        .limit(20)
    )


# --- §2.14 through the real dictionary ----------------------------------------
@df_gate(
    "engine_mlt_terms",
    f"""
WITH tok AS ({tok_cte('duckdb')}),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
dfv AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
tfv AS (SELECT term, COUNT(*) AS tf FROM tok WHERE doc_id = 0 GROUP BY term),
scored AS (
  SELECT tfv.term, tfv.tf * (1.0 + LN(n.n / (dfv.df + 1.0))) AS score
  FROM tfv JOIN dfv ON tfv.term = dfv.term CROSS JOIN n
)
SELECT term, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, term ASC) AS BIGINT) AS rank
FROM scored ORDER BY rank LIMIT 5""",
)
def _e_mlt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MoreLikeThis interesting terms via re-analysis + the REAL term
    dictionary's df (MoreLikeThis.java createQueue)."""
    from .query.components import more_like_this

    s = _engine_searcher(spark, sf_dir)
    seed = (
        _documents(spark, sf_dir).where(F.col("doc_id") == 0).select("text").head()[0]
    )
    _, terms = more_like_this(s, seed, max_query_terms=5)
    return spark.createDataFrame(
        [(t, i + 1) for i, t in enumerate(terms)], "term string, rank long"
    )


@df_gate(
    "engine_suggest",
    f"""
WITH tok AS ({tok_cte('duckdb')})
SELECT term, CAST(COUNT(*) AS BIGINT) AS weight
FROM tok WHERE term LIKE 's%'
GROUP BY term
ORDER BY weight DESC, term ASC
LIMIT 10""",
)
def _e_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix completion over the REAL term dictionary, ttf-weighted."""
    from .query.components import suggest

    s = _engine_searcher(spark, sf_dir)
    return suggest(s, "s", n=10)


@df_gate(
    "engine_spellcheck",
    f"""
WITH tok AS ({tok_cte('duckdb')}),
dict AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term)
SELECT term, CAST(df AS BIGINT) AS df,
       CAST(LEVENSHTEIN(term, 'merg') AS BIGINT) AS dist
FROM dict WHERE LEVENSHTEIN(term, 'merg') <= 2
ORDER BY dist ASC, df DESC, term ASC
LIMIT 10""",
)
def _e_spellcheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DirectSpellChecker over the REAL term dictionary."""
    from .query.components import spellcheck

    s = _engine_searcher(spark, sf_dir)
    return spellcheck(s, "merg", max_edits=2, n=10)


@df_gate(
    "engine_function_boost",
    _rank_only(
        bm25_sql(
            "duckdb",
            ["spark"],
            k=10,
            boost_expr="1000.0 / (1.0 * dd.n_chars + 1000.0)",
        )
    ),
)
def _e_func_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BoostedQuery: engine relevance × recip(n_chars) function query
    (ValueSourceParser 'recip'; BoostedQuery)."""
    from .functions.valuesources import boosted_topk, recip

    s = _engine_searcher(spark, sf_dir)
    mapping = s.docs.select("orig_id", F.col("doc_id").alias("int_id"))
    boost_frame = (
        _documents(spark, sf_dir)
        .select(
            F.col("doc_id").alias("orig_id"),
            recip(F.col("n_chars"), 1.0, 1000.0, 1000.0).alias("boost"),
        )
        .join(mapping, "orig_id")
        .select(F.col("int_id").alias("doc_id"), "boost")
    )
    hits = boosted_topk(s, ["spark"], boost_frame, "boost", k=10)
    return _to_orig(s, hits, ranked=True)


@df_gate(
    "engine_norm_bytes",
    f"""
WITH tok AS ({tok_cte('duckdb')}),
dls AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(dl AS BIGINT) AS dl
FROM dls ORDER BY doc_id""",
)
def _e_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc post-stop lengths as stored in the built docs table
    (DocInverterPerField.java:172 semantics through the real build)."""
    s = _engine_searcher(spark, sf_dir)
    return (
        s.docs.where(F.col("dl") > 0)
        .select(
            F.col("orig_id").cast("long").alias("doc_id"),
            F.col("dl").cast("long").alias("dl"),
        )
        .orderBy("doc_id")
    )


# --- per-language analysis dispatch (analysis/lang.py) -------------------------
def _lang_searcher(spark: SparkSession, sf_dir: str):
    """Second cached gate index, built with tokenizer='lang': each document
    is analyzed under ITS OWN language chain (GermanAnalyzer.java:171-185,
    FrenchAnalyzer.java:189-204, SpanishAnalyzer.java:127-141; en → the
    EnglishAnalyzer chain; zh → StandardAnalyzer fallback)."""
    from .index.build import build_index
    from .query.executor import Searcher

    key = ("lang", os.path.abspath(sf_dir))
    if key in _SEARCHERS:
        return _SEARCHERS[key]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    idx_dir = os.path.join(_CACHE_ROOT, f"idx_{tag}_lang")
    marker = os.path.join(idx_dir, "gate_marker.json")
    fresh = False
    if os.path.exists(marker):
        with open(marker) as fh:
            m = json.load(fh)
        fresh = m.get("version") == INDEX_VERSION and m.get("n_docs") == n_docs
    if not fresh:
        import shutil

        shutil.rmtree(idx_dir, ignore_errors=True)
        pages = docs.select(F.col("doc_id").alias("orig_id"), "text", "lang")
        build_index(
            spark, pages, idx_dir, text_col="text", key_col="orig_id",
            num_segments=2, chunk_span=64, tokenizer="lang",
        )
        with open(marker, "w") as fh:
            json.dump({"version": INDEX_VERSION, "n_docs": n_docs}, fh)
    searcher = Searcher(spark, idx_dir)
    _SEARCHERS[key] = searcher
    return searcher


@df_gate(
    "engine_lang_dispatch",
    f"""
WITH tok AS ({tok_cte('duckdb', stop_filter=False)}),
m AS (SELECT DISTINCT term, doc_id FROM tok)
SELECT q, doc_id FROM (
  -- 'lin' exists ONLY where the German chain ran: de docs containing 'line'
  SELECT 'de_stem' AS q, CAST(m.doc_id AS BIGINT) AS doc_id
  FROM m JOIN documents d ON d.doc_id = m.doc_id
  WHERE m.term = 'line' AND d.lang = 'de'
  UNION ALL
  -- 'vecto' exists ONLY where the French chain ran (norm strips final r)
  SELECT 'fr_stem' AS q, CAST(m.doc_id AS BIGINT) AS doc_id
  FROM m JOIN documents d ON d.doc_id = m.doc_id
  WHERE m.term = 'vector' AND d.lang = 'fr'
  UNION ALL
  -- 'the' is stopped by the en chain AND the standard fallback (zh), but
  -- indexed verbatim by the de/fr/es chains
  SELECT 'stop_dispatch' AS q, CAST(m.doc_id AS BIGINT) AS doc_id
  FROM m JOIN documents d ON d.doc_id = m.doc_id
  WHERE m.term = 'the' AND d.lang IN ('de', 'fr', 'es')
) ORDER BY q, doc_id""",
)
def _e_lang_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row language dispatch through the REAL build: three probe terms
    whose posting sets are non-empty ONLY if the right chain ran on the
    right rows — 'lin' (= german_light_stem('line'), no other chain produces
    it), 'vecto' (= french norm of 'vector'), and 'the' (indexed only by the
    non-English chains). A dispatch bug in any direction (wrong chain per
    row, one chain for all rows, stop set cross-contamination) breaks at
    least one probe's match set."""
    from functools import reduce

    s = _lang_searcher(spark, sf_dir)
    parts = []
    for label, term in (("de_stem", "lin"), ("fr_stem", "vecto"), ("stop_dispatch", "the")):
        hits = _to_orig(s, s.match_docs([term]), ranked=False)
        parts.append(hits.select(F.lit(label).alias("q"), "doc_id"))
    return reduce(lambda a, b: a.unionAll(b), parts).orderBy("q", "doc_id")

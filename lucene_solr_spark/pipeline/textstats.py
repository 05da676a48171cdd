"""Text-analysis operators for training-data pipelines, as reusable
DataFrame transforms (lang-ID, quality scoring, token statistics, document
fingerprinting).

All JVM-side Catalyst expressions over the shared tokenizer
(analysis.analyzer.TOKEN_REGEX + stoplist) — one scan, no Python, partial
aggregation everywhere; identical semantics to the DuckDB oracle SQL in
gate.py, which is what keeps the gates value-hash-equal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..analysis.analyzer import ENGLISH_STOP_WORDS, token_array


def _all_tokens(text: Column) -> Column:
    """Pre-stop lowercased tokens (quality metrics count stopwords)."""
    return token_array(text)


def _is_stop(tok: Column) -> Column:
    return tok.isin(*sorted(ENGLISH_STOP_WORDS))


def quality_scores(
    docs: DataFrame, text_col: str = "text", key_col: str = "doc_id",
    cast_key: bool = True,
) -> DataFrame:
    """Per-doc quality signals for corpus filtering: token count, mean token
    length, stopword ratio (the classic Gopher/C4-style heuristics built
    from one token array)."""
    toks = _all_tokens(F.col(text_col))
    n = F.size(toks)
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t).cast("long")
    )
    n_stop = F.size(F.filter(toks, _is_stop))
    key = F.col(key_col).cast("long") if cast_key else F.col(key_col)
    return docs.select(
        key.alias(key_col),
        n.cast("long").alias("n_tokens"),
        F.round(sum_len.cast("double") / n, 6).alias("mean_token_len"),
        F.round(n_stop.cast("double") / n, 6).alias("stop_ratio"),
    ).where(n > 0)


def lang_id(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    stop_ratio_threshold: float = 0.03,
    cast_key: bool = True,
) -> DataFrame:
    """Stopword-ratio language ID: English function words are so frequent
    that a near-zero stoplist hit rate marks non-English text. Returns
    (key, pred_lang ∈ {'en','other'})."""
    toks = _all_tokens(F.col(text_col))
    ratio = F.size(F.filter(toks, _is_stop)).cast("double") / F.size(toks)
    key = F.col(key_col).cast("long") if cast_key else F.col(key_col)
    return docs.select(
        key.alias(key_col),
        F.when(ratio >= stop_ratio_threshold, F.lit("en"))
        .otherwise(F.lit("other"))
        .alias("pred_lang"),
    ).where(F.size(toks) > 0)


def token_count_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus token bookkeeping: total/min/max tokens per doc + doc count
    over docs with ≥1 token (pipeline budget accounting)."""
    per = docs.select(
        F.size(_all_tokens(F.col(text_col))).cast("long").alias("n")
    ).where(F.col("n") > 0)
    return per.agg(
        F.sum("n").alias("total_tokens"),
        F.min("n").alias("min_doc_tokens"),
        F.max("n").alias("max_doc_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def fingerprints(
    docs: DataFrame, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """Deterministic position-weighted rolling-hash fingerprint per doc
    (post-stop tokens, pre-stop positions — matching the index's position
    semantics): Σ (md5_60(term) mod 1000003) · (pos+1). Order-independent
    aggregation of order-dependent weights → stable at any parallelism and
    reproducible in SQL."""
    toks = _all_tokens(F.col(text_col))
    # (pos, term) pairs with stopwords consuming positions, then filtered
    pairs = F.filter(
        F.transform(toks, lambda t, i: F.struct(i.alias("pos"), t.alias("term"))),
        lambda s: ~_is_stop(s["term"]) & (F.length(s["term"]) <= 255),
    )
    h = lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")  # noqa: E731
    contrib = F.aggregate(
        pairs,
        F.lit(0).cast("long"),
        lambda acc, s: acc + (h(s["term"]) % 1000003) * (s["pos"] + 1),
    )
    out = docs.select(
        F.col(key_col).cast("long").alias(key_col),
        contrib.alias("fingerprint"),
    )
    return out.where(F.size(pairs) > 0)


# --- URL classification (URLClassifyProcessor.java:44-240) --------------------
LANDING_PAGE_SUFFIXES = [
    "/",
    "index.html", "index.htm", "index.phtml", "index.shtml", "index.xml",
    "index.php", "index.asp", "index.aspx",
    "welcome.html", "welcome.htm", "welcome.phtml", "welcome.shtml",
    "welcome.xml", "welcome.php", "welcome.asp", "welcome.aspx",
]  # reference array order (:67-86) — first match wins


def url_classify(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """URLClassifyProcessor: append url_length, url_levels, url_toplevel,
    url_landingpage, url_domain, url_canonical — every output a pure
    Catalyst expression over `parse_url` (JVM, codegen), no UDFs.

    Reference semantics (URLClassifyProcessor.java):
    - levels = '/' count of the lowercased path with the landing suffix and
      trailing slashes stripped (:169-179)
    - toplevel = empty stripped path AND no query string (:186-190)
    - landingpage = no query string AND path ends with a landing suffix
      (:197-204); suffixes checked in array order, '/' first
    - canonical = first '/'+suffix occurrence at the end replaced by '/'
      (:143-153)
    Declared subset: the reference normalizes via java.net.URI.normalize()
    before classifying; '..'/'.' path segments are not resolved here."""
    url = F.col(url_col)
    path = F.lower(F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")))
    query = F.parse_url(url, F.lit("QUERY"))

    suffix = F.lit("")
    for s in reversed(LANDING_PAGE_SUFFIXES):  # build when-chain, first wins
        suffix = F.when(path.endswith(F.lit(s)), F.lit(s)).otherwise(suffix)

    path_wo = F.expr(
        f"substring(lower(coalesce(parse_url({url_col}, 'PATH'), '')), 1, "
        f"length(lower(coalesce(parse_url({url_col}, 'PATH'), ''))) - length(__sfx))"
    )
    # stripped = path minus suffix minus trailing slashes
    tmp = docs.withColumn("__sfx", suffix)
    stripped = F.regexp_replace(path_wo, "/+$", "")
    levels = (F.length(stripped) - F.length(F.regexp_replace(stripped, "/", ""))).cast(
        "int"
    )
    canonical = F.when(
        (F.col("__sfx") != "") & F.expr(f"endswith({url_col}, __sfx)"),
        F.concat(
            F.expr(f"substring({url_col}, 1, length({url_col}) - length(__sfx))"),
            F.when(F.col("__sfx") == "/", F.lit("/")).otherwise(F.lit("")),
        ),
    ).otherwise(url)
    # '/'+suffix -> '/': for named suffixes the preceding '/' is kept by
    # dropping only the suffix text; for '/' itself the url is unchanged
    out = (
        tmp.withColumn("url_length", F.length(url).cast("int"))
        .withColumn("url_levels", levels)
        .withColumn(
            "url_toplevel",
            ((F.length(stripped) == 0) & query.isNull()).cast("int"),
        )
        .withColumn(
            "url_landingpage",
            (query.isNull() & (F.col("__sfx") != "")).cast("int"),
        )
        .withColumn("url_domain", F.parse_url(url, F.lit("HOST")))
        .withColumn("url_canonical", canonical)
        .drop("__sfx")
    )
    return out

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

"""lucene/queries module operators: JoinUtil score modes (Total/Max/Avg),
BoostingQuery, CustomScoreQuery — engine vs numpy oracles."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import standard_tokenize
from lucene_solr_spark.functions.valuesources import (
    boosting_query_topk,
    custom_score_topk,
)
from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.index.norms import encode_norm
from lucene_solr_spark.query.bm25 import BM25Stats, bm25_score
from lucene_solr_spark.query.components import solr_join_scored
from lucene_solr_spark.query.executor import Searcher

CORPUS = {
    "u00": "spark merge fast index",
    "u01": "fast spark spark table",
    "u02": "dog bird cat",
    "u03": "fast stone merge spark",
    "u04": "stone stone dog merge",
    "u05": "spark table scan",
}


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    pages = spark.createDataFrame(list(CORPUS.items()), "url string, text string")
    paths = build_index(spark, pages, str(tmp_path_factory.mktemp("qm_idx")))
    return Searcher(spark, paths)


def _scores(terms):
    """Per-url float32 BM25 sum over `terms` (the flat SHOULD-sum oracle)."""
    urls = sorted(CORPUS)
    toks = [[t for _, t in standard_tokenize(CORPUS[u])] for u in urls]
    dl = np.array([len(t) for t in toks], dtype=np.int64)
    stats = BM25Stats(max_doc=len(urls), sum_total_term_freq=int(dl.sum()))
    nb = encode_norm(dl)
    total = np.zeros(len(urls), dtype=np.float64)
    matched = np.zeros(len(urls), dtype=bool)
    for t in terms:
        tf = np.array([tk.count(t) for tk in toks], dtype=np.int64)
        df = int((tf > 0).sum())
        if df == 0:
            continue
        c = bm25_score(tf, df, nb, stats)
        total += np.where(tf > 0, c.astype(np.float64), 0.0)
        matched |= tf > 0
    return {u: np.float32(total[i]) for i, u in enumerate(urls) if matched[i]}


def _by_url(idx, hits):
    m = dict(idx.docs.select("doc_id", "url").toPandas().itertuples(index=False, name=None))
    url_of = {k: v for k, v in m.items()}
    return {url_of[r.doc_id]: r.score for r in hits.collect()}


# --- JoinUtil score modes -----------------------------------------------------
@pytest.fixture(scope="module")
def join_frames(spark):
    frm = spark.createDataFrame(
        [(1, "a", 4.0), (2, "a", 2.0), (3, "b", 7.0), (4, "c", 1.0)],
        "id long, k string, score double",
    )
    to = spark.createDataFrame(
        [(100, "a"), (200, "b"), (300, "d")], "rid long, k string"
    )
    return frm, to


def test_join_score_modes(spark, join_frames):
    frm, to = join_frames
    pred = F.col("score") > 0.0
    for mode, want_a in [("total", 6.0), ("max", 4.0), ("avg", 3.0)]:
        out = solr_join_scored(frm, "k", to, "k", pred, "score", mode).toPandas()
        got = dict(zip(out["rid"], out["join_score"]))
        assert got == {100: pytest.approx(want_a), 200: pytest.approx(7.0)}


def test_join_scored_respects_from_predicate(spark, join_frames):
    frm, to = join_frames
    out = solr_join_scored(
        frm, "k", to, "k", F.col("score") > 3.0, "score", "total"
    ).toPandas()
    got = dict(zip(out["rid"], out["join_score"]))
    assert got == {100: pytest.approx(4.0), 200: pytest.approx(7.0)}


def test_join_scored_multivalue_first_term_wins(spark, join_frames):
    frm, _ = join_frames
    # doc 100 holds join values a AND b: the in-order scorer keeps the score
    # of the smallest term ('a'), not the larger-scored 'b'
    to_mv = spark.createDataFrame(
        [(100, "b"), (100, "a"), (200, "b")], "rid long, k string"
    )
    out = solr_join_scored(
        frm, "k", to_mv, "k", F.col("score") > 0.0, "score", "max", to_key="rid"
    ).toPandas()
    got = dict(zip(out["rid"], out["join_score"]))
    assert got == {100: pytest.approx(4.0), 200: pytest.approx(7.0)}


def test_join_scored_bad_mode(spark, join_frames):
    frm, to = join_frames
    with pytest.raises(ValueError):
        solr_join_scored(frm, "k", to, "k", F.lit(True), "score", "min")


# --- BoostingQuery ------------------------------------------------------------
def test_boosting_query_demotes_context_matches(spark, idx):
    base = _scores(["spark", "merge"])
    ctx_urls = {u for u in CORPUS if "stone" in CORPUS[u].split()}
    got = _by_url(idx, boosting_query_topk(idx, ["spark", "merge"], ["stone"], 0.5, k=10))
    assert set(got) == set(base)
    for u, s in got.items():
        want = float(np.float32(base[u] * np.float32(0.5))) if u in ctx_urls else float(base[u])
        assert s == pytest.approx(want, rel=1e-6)
    # demoted docs rank below their unboosted order where scores allow
    assert got and all(u in base for u in got)


def test_boosting_query_context_never_matches_alone(spark, idx):
    # 'dog' docs (u02, u04-without-match) must not appear unless they match
    got = _by_url(idx, boosting_query_topk(idx, ["table"], ["dog"], 2.0, k=10))
    assert set(got) == set(_scores(["table"]))


def test_boosting_query_missing_context_is_identity(spark, idx):
    base = _scores(["spark"])
    got = _by_url(idx, boosting_query_topk(idx, ["spark"], ["zzznope"], 0.1, k=10))
    for u, s in got.items():
        assert s == pytest.approx(float(base[u]), rel=1e-6)


# --- CustomScoreQuery ---------------------------------------------------------
def test_custom_score_product_of_sources(spark, idx):
    base = _scores(["spark", "merge"])
    vals = {u: (i + 1.0, 0.5 + i) for i, u in enumerate(sorted(CORPUS))}
    source = idx.docs.select("doc_id", "url").join(
        spark.createDataFrame(
            [(u, a, b) for u, (a, b) in vals.items()], "url string, va double, vb double"
        ),
        "url",
    )
    got = _by_url(
        idx,
        custom_score_topk(idx, ["spark", "merge"], source, ["va", "vb"], k=10,
                          query_boost=2.0),
    )
    assert set(got) == set(base)
    for u, s in got.items():
        a, b = vals[u]
        assert s == pytest.approx(2.0 * float(base[u]) * a * b, rel=1e-6)


def test_custom_score_missing_rows_default_to_one(spark, idx):
    base = _scores(["spark"])
    some = idx.docs.select("doc_id", "url").where(F.col("url") == "u00")
    source = some.withColumn("v", F.lit(3.0))
    got = _by_url(idx, custom_score_topk(idx, ["spark"], source, ["v"], k=10))
    for u, s in got.items():
        want = float(base[u]) * (3.0 if u == "u00" else 1.0)
        assert s == pytest.approx(want, rel=1e-6)

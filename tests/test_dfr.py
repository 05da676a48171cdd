"""DFR + IB similarities: engine top-k vs the float32-faithful scalar
oracle (DFRSimilarity.java:108-111, IBSimilarity.java:98-104; shared
SimilarityBase decoded-length norms; DisjunctionSumScorer double-sum)."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.query.dfr import (
    BASIC_MODELS,
    TermStats,
    brute_force_simbase_topk,
    dfr_scores,
    ib_scores,
)
from lucene_solr_spark.query.executor import Searcher


def _texts(n=40, seed=7):
    rng = np.random.default_rng(seed)
    vocab = ["spark", "merge", "query", "fast", "index", "scan", "shard",
             "table", "row", "plan", "join", "sort"]
    out = {}
    for d in range(n):
        ln = int(rng.integers(3, 60))
        out[d] = " ".join(rng.choice(vocab, size=ln).tolist())
    return out


@pytest.fixture(scope="module")
def dfr_index(spark, tmp_path_factory):
    texts = _texts()
    rows = [(d, t) for d, t in sorted(texts.items())]
    pages = spark.createDataFrame(rows, "orig_id long, text string")
    out = str(tmp_path_factory.mktemp("dfr_idx"))
    paths = build_index(spark, pages, out, num_segments=2, key_col="orig_id")
    return Searcher(spark, paths), texts


def _stats():
    return TermStats.make(n_docs=1000, df=12, ttf=30, sum_ttf=40_000)


def test_ineb2_positive_for_informative_term():
    s = dfr_scores(np.array([3]), np.array([115]), _stats())
    assert float(s[0]) > 0.0


def test_every_basic_model_finite():
    st = _stats()
    for name in BASIC_MODELS:
        s = dfr_scores(np.array([2]), np.array([115]), st, basic_model=name,
                       after_effect="l", normalization="h1")
        assert np.isfinite(s[0]), name


def test_h2_c_monotone():
    # larger c inflates tfn for short docs -> larger I(ne) score
    st = _stats()
    lo = dfr_scores(np.array([2]), np.array([112]), st, c=0.5)
    hi = dfr_scores(np.array([2]), np.array([112]), st, c=8.0)
    assert float(hi[0]) > float(lo[0])


def test_spl_lambda_one_guard():
    # DistributionSPL.java:35-37 — lambda==1f is remapped to 0.99f, not NaN
    st = TermStats.make(n_docs=9, df=9, ttf=9, sum_ttf=100)
    # lambda_df = (9+1)/(9+1) = 1.0f exactly
    s = ib_scores(np.array([2]), np.array([115]), st, distribution="spl", lam="df")
    assert np.isfinite(s[0])


def test_after_effect_b_dampens_more_for_frequent_terms():
    st_rare = TermStats.make(1000, 2, 3, 40_000)
    st_common = TermStats.make(1000, 500, 5000, 40_000)
    r = dfr_scores(np.array([2]), np.array([115]), st_rare)
    c = dfr_scores(np.array([2]), np.array([115]), st_common)
    assert float(r[0]) > float(c[0])


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),  # I(ne)B2 default
        dict(basic_model="g", after_effect="l", normalization="h1"),
        dict(basic_model="if", after_effect="b", normalization="h3", mu=800.0),
        dict(basic_model="p", after_effect="l", normalization="z", z=0.30),
        dict(basic_model="be", after_effect="b", normalization="h2", c=2.0),
        dict(basic_model="d", after_effect="l", normalization="h2"),
        dict(basic_model="in", after_effect="no", normalization="no"),
    ],
)
def test_dfr_engine_matches_oracle(dfr_index, kwargs):
    searcher, texts = dfr_index
    terms = ["spark", "merge"]
    got = searcher.search_dfr(terms, k=10, **kwargs).toPandas()
    expect = brute_force_simbase_topk(texts, terms, k=10, scorer="dfr", **kwargs)
    assert got["doc_id"].tolist() == [d for d, _ in expect]
    np.testing.assert_allclose(
        got["score"].values,
        np.array([s for _, s in expect], dtype=np.float32),
        rtol=1e-6,
    )


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),  # SPL-df-H2 default
        dict(distribution="ll", lam="df", normalization="h1"),
        dict(distribution="spl", lam="ttf", normalization="h2", c=1.0),
        dict(distribution="ll", lam="ttf", normalization="h3", mu=800.0),
    ],
)
def test_ib_engine_matches_oracle(dfr_index, kwargs):
    searcher, texts = dfr_index
    terms = ["query", "fast", "shard"]
    got = searcher.search_ib(terms, k=10, **kwargs).toPandas()
    expect = brute_force_simbase_topk(texts, terms, k=10, scorer="ib", **kwargs)
    assert got["doc_id"].tolist() == [d for d, _ in expect]
    np.testing.assert_allclose(
        got["score"].values,
        np.array([s for _, s in expect], dtype=np.float32),
        rtol=1e-6,
    )


def test_lm_paths_unchanged_by_simbase_refactor(dfr_index):
    # regression guard: the shared _search_simbase path must reproduce the
    # LM oracle exactly as before the refactor
    from lucene_solr_spark.query.lmdirichlet import brute_force_lm_topk

    searcher, texts = dfr_index
    got = searcher.search_lm_dirichlet(["spark", "merge"], k=10).toPandas()
    expect = brute_force_lm_topk(texts, ["spark", "merge"], k=10)
    assert got["doc_id"].tolist() == [d for d, _ in expect]

"""LMDirichletSimilarity: engine top-k vs the float32-faithful numpy
oracle (LMDirichletSimilarity.java:64-70; SimilarityBase decoded-length
norms; DisjunctionSumScorer double-sum combine)."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.query.executor import Searcher
from lucene_solr_spark.query.lmdirichlet import (
    LM_DOCLEN_TABLE,
    brute_force_lm_topk,
    collection_probability,
    lm_dirichlet_scores,
)


def _texts(n=40, seed=3):
    rng = np.random.default_rng(seed)
    vocab = ["spark", "merge", "query", "fast", "index", "scan", "shard",
             "table", "row", "plan", "join", "sort"]
    out = {}
    for d in range(n):
        ln = int(rng.integers(3, 60))
        out[d] = " ".join(rng.choice(vocab, size=ln).tolist())
    return out


def test_norm_table_decodes_length():
    # SimilarityBase.NORM_TABLE contract: exactly 1/byte315ToFloat(b)^2
    # (lossy byte315: 3 mantissa bits, squared → up to ~2× length skew,
    # identical skew to the reference)
    from lucene_solr_spark.index.norms import byte315_to_float, encode_norm

    b = int(encode_norm(np.array([49]))[0])
    f = np.float32(byte315_to_float(np.array([b]))[0])
    assert LM_DOCLEN_TABLE[b] == np.float32(1.0 / (f * f))
    assert 24.0 <= float(LM_DOCLEN_TABLE[b]) <= 100.0


def test_clip_at_zero():
    # a doc much shorter on the term than the collection model predicts
    # scores 0, never negative (class javadoc deviation from the paper)
    from lucene_solr_spark.index.norms import encode_norm

    p = collection_probability(100_000, 200_000)  # p ≈ 0.5 — very common term
    nb = encode_norm(np.array([5000]))  # long doc, tf=1 ≪ model prediction
    s = lm_dirichlet_scores(np.array([1]), nb, p)
    assert float(s[0]) == 0.0


def test_score_positive_for_informative_term():
    p = collection_probability(3, 200_000)
    s = lm_dirichlet_scores(np.array([2]), np.array([120]), p)
    assert float(s[0]) > 0.0


@pytest.fixture(scope="module")
def lm_index(spark, tmp_path_factory):
    texts = _texts()
    rows = [(d, t) for d, t in sorted(texts.items())]
    pages = spark.createDataFrame(rows, "orig_id long, text string")
    out = str(tmp_path_factory.mktemp("lm_idx"))
    # key on the numeric id (dense rank of a dense column = itself), so
    # engine doc_ids and oracle doc_ids coincide — same trick as the gates
    paths = build_index(spark, pages, out, num_segments=2, key_col="orig_id")
    return Searcher(spark, paths), texts


@pytest.mark.parametrize(
    "terms,k",
    [
        (["spark"], 10),
        (["spark", "merge"], 10),
        (["query", "fast", "shard"], 7),
        (["join"], 5),
    ],
)
def test_engine_matches_oracle(lm_index, terms, k):
    searcher, texts = lm_index
    got = searcher.search_lm_dirichlet(terms, k=k).toPandas()
    expect = brute_force_lm_topk(texts, terms, k=k)
    assert got["doc_id"].tolist() == [d for d, _ in expect]
    np.testing.assert_allclose(
        got["score"].values,
        np.array([s for _, s in expect], dtype=np.float32),
        rtol=1e-6,
    )


@pytest.mark.parametrize("terms", [["spark"], ["spark", "merge", "plan"]])
def test_jelinek_mercer_matches_oracle(lm_index, terms):
    searcher, texts = lm_index
    got = searcher.search_lm_jm(terms, k=10, lam=0.7).toPandas()
    expect = brute_force_lm_topk(texts, terms, k=10, similarity="jm", lam=0.7)
    assert got["doc_id"].tolist() == [d for d, _ in expect]
    np.testing.assert_allclose(
        got["score"].values,
        np.array([s for _, s in expect], dtype=np.float32),
        rtol=1e-6,
    )


def test_jm_always_nonnegative_and_lambda_sensitive():
    p = collection_probability(50, 1000)
    from lucene_solr_spark.query.lmdirichlet import lm_jelinek_mercer_scores
    from lucene_solr_spark.index.norms import encode_norm

    nb = encode_norm(np.array([30]))
    hi = lm_jelinek_mercer_scores(np.array([3]), nb, p, np.float32(0.1))
    lo = lm_jelinek_mercer_scores(np.array([3]), nb, p, np.float32(0.9))
    assert float(hi[0]) > float(lo[0]) > 0.0


def test_mu_parameter_changes_ranking_smoothly(lm_index):
    searcher, texts = lm_index
    a = searcher.search_lm_dirichlet(["spark", "merge"], k=10, mu=500.0).toPandas()
    b = brute_force_lm_topk(texts, ["spark", "merge"], k=10, mu=500.0)
    assert a["doc_id"].tolist() == [d for d, _ in b]

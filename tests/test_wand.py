"""Block-max WAND must be lossless: rank- AND score-identical to exhaustive
scoring (the reference's ground truth, TopScoreDocCollector.java:40-63).
Mirrors the reference's cross-scorer checks (TestBoolean2 compares
BooleanScorer vs BooleanScorer2)."""

import numpy as np
import pytest

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.query.executor import Searcher

VOCAB = ["alpha", "beta", "gamma", "delta", "spark", "query", "merge", "rare1", "rare2"]


def _corpus(n, seed):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        # zipf-ish: early vocab words common, rare words only in a few docs
        words = [VOCAB[min(int(rng.zipf(1.6)) - 1, len(VOCAB) - 1)] for _ in range(rng.randint(4, 30))]
        if i % 97 == 0:
            words.append("rare1")
        if i % 997 == 0:
            words.append("needle")  # df≈3: a TRUE tail term (head+tail shape)
        rows.append((f"u{i:05d}", " ".join(words)))
    return rows


@pytest.fixture(scope="module")
def wand_index(spark, tmp_path_factory):
    rows = _corpus(3000, seed=5)
    pages = spark.createDataFrame(rows, "url string, text string")
    out = str(tmp_path_factory.mktemp("wand_idx"))
    # small chunk span → many chunks → pruning actually exercised
    paths = build_index(spark, pages, out, num_segments=1, chunk_span=256)
    return Searcher(spark, paths)


@pytest.mark.parametrize(
    "terms,k",
    [
        (["spark"], 10),
        (["alpha", "rare1"], 10),
        (["spark", "query", "merge"], 5),
        (["beta", "gamma", "delta", "rare2"], 25),
        (["rare1"], 3),
    ],
)
def test_wand_identical_to_exhaustive(wand_index, terms, k):
    s = wand_index
    exhaustive = s.search(terms, k=k).toPandas()
    pruned = s.search_wand(terms, k=k).toPandas()
    assert pruned["doc_id"].tolist() == exhaustive["doc_id"].tolist()
    np.testing.assert_array_equal(pruned["score"].values, exhaustive["score"].values)


def test_wand_prunes_chunks(wand_index, spark):
    """The bound pass must actually drop chunks for a selective query."""
    s = wand_index
    terms = ["rare1"]
    total_chunks = (
        s.postings.where(s.postings.term.isin(terms))
        .select("chunk_id")
        .distinct()
        .count()
    )
    assert total_chunks > 1  # the setup gives pruning something to do


def test_wand_unknown_term(wand_index):
    assert wand_index.search_wand(["zzzznotaword"], k=10).count() == 0


def test_auto_head_tail_classifier(wand_index):
    """The round-5 df-stats pre-classifier: with the postings floor lowered
    to this corpus's size, a head+tail query (df ratio ≥100×) upgrades
    'auto' to the BMW chunk kernel — and stays rank+score identical. A
    balanced query must NOT engage it."""
    s = wand_index
    old = s.meta.get("kernel_auto_min_postings")
    s.meta["kernel_auto_min_postings"] = 1
    try:
        tinfo = s.lookup_terms(["alpha", "needle"])
        dfs = tinfo["df"].astype("int64")
        assert int(dfs.max()) >= 100 * int(dfs.min())  # corpus gives head+tail
        ps: dict = {}
        exhaustive = s.search(["alpha", "needle"], k=10).toPandas()
        auto = s.search_wand(["alpha", "needle"], k=10, pruning_stats=ps).toPandas()
        assert ps.get("auto_head_tail") is True
        assert auto["doc_id"].tolist() == exhaustive["doc_id"].tolist()
        np.testing.assert_array_equal(auto["score"].values, exhaustive["score"].values)
        ps2: dict = {}
        s.search_wand(["spark", "query"], k=10, pruning_stats=ps2).toPandas()
        assert "auto_head_tail" not in ps2  # balanced dfs: classifier stays off
    finally:
        if old is None:
            s.meta.pop("kernel_auto_min_postings", None)
        else:
            s.meta["kernel_auto_min_postings"] = old


@pytest.mark.parametrize(
    "terms,k",
    [
        (["alpha", "rare1"], 10),
        (["beta", "gamma", "rare2"], 5),
        (["spark", "query", "merge"], 10),
    ],
)
def test_bmw_chunk_kernel_identical(wand_index, terms, k):
    """The round-4 BMW chunk kernel (bucket_prune=True: in-kernel joint
    bucket bounds + per-chunk top-k) must stay rank- AND score-identical
    to exhaustive on multi-term queries."""
    s = wand_index
    exhaustive = s.search(terms, k=k).toPandas()
    ps: dict = {}
    pruned = s.search_wand(terms, k=k, bucket_prune=True, pruning_stats=ps).toPandas()
    assert pruned["doc_id"].tolist() == exhaustive["doc_id"].tolist()
    np.testing.assert_array_equal(pruned["score"].values, exhaustive["score"].values)

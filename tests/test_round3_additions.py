"""Round-3 additions: sorted-seed WAND (2-action plan), concurrent merge
scheduler, RAM-bounded flush policy, NRT stats preservation.

Reference semantics: ConcurrentMergeScheduler.java (maxThreadCount
concurrent merges), IndexWriterConfig.setRAMBufferSizeMB (default 16 MB,
DocumentsWriterFlushControl flush-by-RAM), SortingMergePolicy / index
sorting (chunk-0 θ seed), SegmentInfos snapshot invariants across reopens.
"""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.index.merge import compact
from lucene_solr_spark.query.executor import Searcher
from lucene_solr_spark.streaming.nrt import append_segment
from tests.test_merge_resume import _posting_snapshot
from tests.test_wand import _corpus


@pytest.fixture(scope="module")
def sorted_wand_index(spark, tmp_path_factory):
    rows = _corpus(3000, seed=9)
    pages = spark.createDataFrame(rows, "url string, text string").withColumn(
        "__len", F.length("text")
    )
    out = str(tmp_path_factory.mktemp("wand_sorted"))
    paths = build_index(
        spark, pages, out, num_segments=1, chunk_span=256, sort_col="__len"
    )
    return Searcher(spark, paths)


def test_sort_col_recorded_in_stats(sorted_wand_index):
    assert sorted_wand_index.meta.get("sort_col") == "__len"


@pytest.mark.parametrize(
    "terms,k",
    [
        (["spark"], 10),
        (["alpha", "rare1"], 10),
        (["spark", "query", "merge"], 5),
        (["rare1"], 3),
    ],
)
def test_wand_sorted_seed_identical(sorted_wand_index, terms, k):
    """Sorted index → θ seeds from chunk 0 concurrently with the bounds
    job; must stay rank- AND score-identical to exhaustive."""
    s = sorted_wand_index
    exhaustive = s.search(terms, k=k).toPandas()
    pruned = s.search_wand(terms, k=k).toPandas()
    assert pruned["doc_id"].tolist() == exhaustive["doc_id"].tolist()
    np.testing.assert_array_equal(pruned["score"].values, exhaustive["score"].values)


def test_wand_sorted_prunes(sorted_wand_index):
    """On a length-sorted index a selective single-term query must prune
    chunks (the whole point of index sorting for BMW)."""
    stats: dict = {}
    s = sorted_wand_index
    exh = s.search(["rare1"], k=3).toPandas()
    wnd = s.search_wand(["rare1"], k=3, pruning_stats=stats).toPandas()
    assert wnd["doc_id"].tolist() == exh["doc_id"].tolist()
    assert stats["chunks_live"] < stats["chunks_total"]


def test_wand_large_sorted_path(spark, tmp_path):
    """chunk_span tiny → n_chunks > 1024 → the large sorted path (bounds
    embedded in the final job's plan, semi-join prune, 2 actions)."""
    rows = _corpus(2200, seed=13)
    pages = spark.createDataFrame(rows, "url string, text string").withColumn(
        "__len", F.length("text")
    )
    paths = build_index(
        spark, pages, str(tmp_path / "idx"), num_segments=1, chunk_span=2,
        sort_col="__len", positions=False,
    )
    s = Searcher(spark, paths)
    assert s.stats.max_doc // int(s.meta["chunk_span"]) + 1 > 1024
    for terms, k in [(["spark"], 10), (["alpha", "rare1"], 5)]:
        exh = s.search(terms, k=k).toPandas()
        wnd = s.search_wand(terms, k=k).toPandas()
        assert wnd["doc_id"].tolist() == exh["doc_id"].tolist()
        np.testing.assert_array_equal(wnd["score"].values, exh["score"].values)


def test_concurrent_compact_equals_fresh_build(spark, tmp_path):
    """compact(max_concurrent>1) must leave the index byte-equivalent (as
    posting rows) to a fresh single-segment build — concurrent merges touch
    disjoint segments and serialize only the lineage tail."""
    from tests.test_index_e2e import make_corpus

    corpus = make_corpus(n=400, seed=21)
    rows = [(u, t, 1000) for u, t in corpus.items()]
    pages = spark.createDataFrame(rows, "url string, text string, warc_ts long")

    # large floor -> tiny test segments all sit on one tier -> small allowed
    # budget -> several 2-way merges per round (they run concurrently)
    policy = dict(
        max_merge_at_once=2, segs_per_tier=2.0, floor_bytes=10 * 1024 * 1024
    )
    conc = build_index(
        spark, pages, str(tmp_path / "conc"), ts_col="warc_ts", num_segments=8
    )
    seq = build_index(
        spark, pages, str(tmp_path / "seq"), ts_col="warc_ts", num_segments=8
    )
    ids_conc = compact(spark, conc, max_concurrent=3, **policy)
    ids_seq = compact(spark, seq, max_concurrent=1, **policy)
    assert len(ids_conc) >= 2  # multiple merges actually ran
    # same plans, same pre-assigned ids, same bytes: concurrency must be
    # invisible in the result
    assert sorted(ids_conc) == sorted(ids_seq)
    assert _posting_snapshot(spark, conc) == _posting_snapshot(spark, seq)

    # and the compacted index answers queries identically to a fresh build
    one = build_index(
        spark, pages, str(tmp_path / "one"), ts_col="warc_ts", num_segments=1
    )
    s_conc, s_one = Searcher(spark, conc), Searcher(spark, one)
    a = s_conc.search(["the"], k=10).toPandas()
    b = s_one.search(["the"], k=10).toPandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    np.testing.assert_array_equal(a["score"].values, b["score"].values)


def test_ram_budget_flush_policy(spark, tmp_path):
    """A tiny RAM budget must split the build into multiple segments; the
    result stays value-identical to the unbudgeted build."""
    from tests.test_index_e2e import make_corpus

    corpus = make_corpus(n=300, seed=23)
    pages = spark.createDataFrame(list(corpus.items()), "url string, text string")

    budgeted = build_index(
        spark, pages, str(tmp_path / "b"), ram_budget_mb=0.05
    )
    with open(budgeted.stats) as fh:
        n_segs = json.load(fh)["num_segments"]
    assert n_segs > 1

    plain = build_index(spark, pages, str(tmp_path / "p"))
    sb, sp = Searcher(spark, budgeted), Searcher(spark, plain)
    a = sb.search(["the"], k=10).toPandas()
    b = sp.search(["the"], k=10).toPandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    np.testing.assert_array_equal(a["score"].values, b["score"].values)


def test_nrt_append_preserves_build_meta(spark, tmp_path):
    """write_stats must carry build-time facts (chunk_span, positions,
    tokenizer) across appends and clear sort_col (appends break global
    docID sort order)."""
    rows = _corpus(300, seed=31)
    pages = spark.createDataFrame(rows, "url string, text string").withColumn(
        "__len", F.length("text")
    )
    paths = build_index(
        spark, pages, str(tmp_path / "idx"), chunk_span=512, positions=False,
        sort_col="__len",
    )
    more = spark.createDataFrame(_corpus(50, seed=37), "url string, text string")
    append_segment(spark, more, paths, chunk_span=512)
    with open(paths.stats) as fh:
        meta = json.load(fh)
    assert meta["chunk_span"] == 512
    assert meta["positions"] is False
    assert meta["sort_col"] is None
    assert meta["max_doc"] == 350


def test_wand_impact_path_single_action(sorted_wand_index):
    """With dictionary impact sketches, no deletes, and k <= IMPACT_K, a
    multi-term WAND must take the single-action impact path and stay
    identical to exhaustive (single-term queries take the stronger
    zero-action head path, tested separately)."""
    s = sorted_wand_index
    assert s._impacts_on
    stats: dict = {}
    q = ["rare1", "spark"]
    exh = s.search(q, k=3).toPandas()
    wnd = s.search_wand(q, k=3, pruning_stats=stats).toPandas()
    assert stats.get("impact_path") is True
    assert stats["chunks_live"] <= stats["chunks_total"]
    assert wnd["doc_id"].tolist() == exh["doc_id"].tolist()
    np.testing.assert_array_equal(wnd["score"].values, exh["score"].values)


def test_wand_impact_theta_is_attainable(sorted_wand_index):
    """The sketched θ (max over terms of the k-th best single-term score)
    must be ≤ the true k-th best summed score — lossless."""
    s = sorted_wand_index
    stats: dict = {}
    res = s.search_wand(["spark", "rare1"], k=5, pruning_stats=stats).toPandas()
    assert stats.get("impact_path") is True
    assert np.float32(stats["theta"]) <= np.float32(res["score"].iloc[4])


def test_impact_head_zero_action_single_term(sorted_wand_index):
    """Single-term top-k is answered from the dictionary pairs (impact_head)
    and is rank- AND score-identical to the exhaustive scan."""
    s = sorted_wand_index
    assert s._impact_docs_on
    stats: dict = {}
    fast = s.search_wand(["rare1"], k=3, pruning_stats=stats).toPandas()
    assert stats.get("impact_head") is True
    # force the scan path for the oracle
    s._impact_docs_on = False
    try:
        exh = s.search(["rare1"], k=3).toPandas()
    finally:
        s._impact_docs_on = True
    assert fast["doc_id"].tolist() == exh["doc_id"].tolist()
    np.testing.assert_array_equal(fast["score"].values, exh["score"].values)
    # boolean_search single-should also routes through the head
    head = s.search(["rare1"], k=3).toPandas()
    assert head["doc_id"].tolist() == exh["doc_id"].tolist()


def test_impact_head_tie_break_doc_asc(spark, tmp_path):
    """Heavy score ties: many byte-identical docs → equal BM25 scores; the
    head path must reproduce the collector's docID-asc tie-break, or prove
    insufficiency and fall back — either way results match the scan."""
    rows = [(f"t{i:04d}", "alpha beta gamma") for i in range(200)]
    rows += [(f"f{i:04d}", "delta " * (i % 7 + 1)) for i in range(300)]
    pages = spark.createDataFrame(rows, "url string, text string").withColumn(
        "__len", F.length("text")
    )
    paths = build_index(
        spark, pages, str(tmp_path / "ties"), chunk_span=64, sort_col="__len"
    )
    s = Searcher(spark, paths)
    fast = s.search(["alpha"], k=10).toPandas()
    s._impact_docs_on = False
    exh = s.search(["alpha"], k=10).toPandas()
    assert fast["doc_id"].tolist() == exh["doc_id"].tolist()
    np.testing.assert_array_equal(fast["score"].values, exh["score"].values)


def test_impact_head_sufficiency_fallback(spark, tmp_path):
    """df > kept pairs with the k-th kept score not strictly above the
    exclusion bound (all-equal scores) → _impact_topk_single must return
    None rather than answer unprovably."""
    rows = [(f"t{i:04d}", "alpha beta") for i in range(100)]
    pages = spark.createDataFrame(rows, "url string, text string").withColumn(
        "__len", F.length("text")
    )
    paths = build_index(
        spark, pages, str(tmp_path / "flat"), chunk_span=16, sort_col="__len"
    )
    s = Searcher(spark, paths)
    assert s._impact_docs_on
    # 100 identical postings, 32 kept: the kth kept score ties the bound
    assert s._impact_topk_single("alpha", 5) is None
    # and the public paths still answer correctly via the scan
    res = s.search(["alpha"], k=5).toPandas()
    assert res["doc_id"].tolist() == sorted(res["doc_id"].tolist())
    assert len(res) == 5


def test_wand_impact_fallback_large_k(sorted_wand_index):
    """k > IMPACT_K exceeds the sketch depth → falls back to the seeded
    path, still identical."""
    s = sorted_wand_index
    stats: dict = {}
    exh = s.search(["spark"], k=40).toPandas()
    wnd = s.search_wand(["spark"], k=40, pruning_stats=stats).toPandas()
    assert "impact_path" not in stats
    assert wnd["doc_id"].tolist() == exh["doc_id"].tolist()


def test_wand_impact_disabled_by_deletes(spark, tmp_path):
    """Tombstones can make a sketched θ unattainable — the impact path must
    disable itself and results stay correct."""
    from lucene_solr_spark.index.deletes import delete_by_key

    rows = _corpus(2000, seed=41)
    pages = spark.createDataFrame(rows, "url string, text string").withColumn(
        "__len", F.length("text")
    )
    paths = build_index(
        spark, pages, str(tmp_path / "idx"), chunk_span=256, sort_col="__len"
    )
    s = Searcher(spark, paths)
    top = s.search(["spark"], k=3).toPandas()
    victims = (
        s.docs.where(F.col("doc_id").isin([int(d) for d in top["doc_id"]]))
        .select("url")
        .toPandas()["url"]
        .tolist()
    )
    delete_by_key(spark, paths, victims)
    s.reopen()
    stats: dict = {}
    exh = s.search(["spark"], k=5).toPandas()
    wnd = s.search_wand(["spark"], k=5, pruning_stats=stats).toPandas()
    assert "impact_path" not in stats  # deletes force the seeded path
    assert wnd["doc_id"].tolist() == exh["doc_id"].tolist()
    assert not set(wnd["doc_id"]) & set(int(d) for d in top["doc_id"])

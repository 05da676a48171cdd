"""Quality-benchmark tests (lucene/benchmark quality package port)."""

import pytest

from lucene_solr_spark.query.quality import (
    MAX_POINTS, QualityStats, TrecJudge, quality_benchmark,
)


def test_stats_accumulation_formulas():
    # ranks: R N R N N  (maxGood = 3, one relevant never retrieved)
    st = QualityStats(max_good_points=3)
    for rank, rel in enumerate([True, False, True, False, False], start=1):
        st.add_result(rank, rel)
    assert st.precision_at(1) == 1.0
    assert st.precision_at(2) == 0.5
    assert st.precision_at(3) == pytest.approx(2 / 3)
    assert st.precision_at(5) == pytest.approx(2 / 5)
    # extrapolation past numPoints: (numPoints * pAt[numPoints]) / n
    assert st.precision_at(10) == pytest.approx((5 * (2 / 5)) / 10)
    # AVP = (p@1 + p@3) / maxGood
    assert st.avp() == pytest.approx((1.0 + 2 / 3) / 3)
    assert st.recall == pytest.approx(2 / 3)
    assert st.mrr == 1.0


def test_mrr_only_within_top5():
    st = QualityStats(max_good_points=1)
    for rank in range(1, 7):
        st.add_result(rank, rank == 6)  # first relevant at rank 6
    assert st.mrr == 0.0  # QualityStats.java:87-89 — only n<=5 counts
    st2 = QualityStats(max_good_points=1)
    for rank in range(1, 6):
        st2.add_result(rank, rank == 5)
    assert st2.mrr == pytest.approx(1 / 5)


def test_out_of_order_rank_raises():
    st = QualityStats(max_good_points=1)
    st.add_result(1, False)
    with pytest.raises(ValueError):
        st.add_result(3, True)


def test_average_only_over_judged_queries():
    a = QualityStats(max_good_points=2)
    a.add_result(1, True)
    a.add_result(2, True)
    b = QualityStats(max_good_points=0)  # no judgements → excluded
    b.add_result(1, False)
    avg = QualityStats.average([a, b])
    assert avg.recall == pytest.approx(1.0)
    assert avg.mrr == pytest.approx(1.0)
    assert avg.avp() == pytest.approx(a.avp())
    assert avg.precision_at(2) == pytest.approx(1.0)


def test_trec_judge_parsing():
    qrels = [
        "q1 0 docA 1",
        "q1 0 docB 0",
        "q1 0 docC 2",  # graded > 0 counts as relevant
        "q2 0 docA 1",
    ]
    j = TrecJudge(qrels)
    assert j.is_relevant("docA", "q1") and j.is_relevant("docC", "q1")
    assert not j.is_relevant("docB", "q1")
    assert j.max_recall("q1") == 2 and j.max_recall("q2") == 1
    assert j.max_recall("qX") == 0


def test_quality_benchmark_e2e(spark, tmp_path):
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher

    rows = [
        ("d1", "apache lucene search engine library"),
        ("d2", "lucene scoring and ranking internals"),
        ("d3", "cooking pasta with tomato sauce"),
        ("d4", "gardening tips for spring flowers"),
    ]
    pages = spark.createDataFrame(rows, "url string, text string")
    idx = build_index(spark, pages, str(tmp_path / "idx"))
    s = Searcher(spark, idx)
    judge = TrecJudge([
        "q1 0 d1 1", "q1 0 d2 1",   # lucene docs relevant for q1
        "q2 0 d3 1",
    ])
    per_query, avg = quality_benchmark(
        s, {"q1": "lucene", "q2": "pasta tomato"}, judge, max_results=4
    )
    # q1: both lucene docs retrieved at ranks 1-2 → recall 1, P@2 = 1
    assert per_query["q1"].recall == pytest.approx(1.0)
    assert per_query["q1"].precision_at(2) == pytest.approx(1.0)
    assert per_query["q1"].mrr == 1.0
    # q2: d3 at rank 1
    assert per_query["q2"].mrr == 1.0
    assert avg.recall == pytest.approx(1.0)
    assert avg.search_time > 0

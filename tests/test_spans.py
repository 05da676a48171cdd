"""Span queries: per-doc iterator semantics (hand goldens + brute-force
match-set oracles) and the end-to-end engine path over a real index.

Reference semantics: NearSpansOrdered.java:190-345 (stretchToOrder +
shrinkToAfterShortestMatch, slop = sum of non-overlapping gaps),
NearSpansUnordered.java:161-211,332-335 (PQ; max.end - min.start -
totalLength ≤ slop), SpanOrQuery.java:170-244, SpanNotQuery.java:85-137,
SpanFirstQuery.java:30-55, SpanScorer.java:73-92 (freq = Σ 1/(dist+1)).
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.query.executor import Searcher
from lucene_solr_spark.query.spans import (
    SpanFirst,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanTerm,
    eval_spans,
    span_freq,
    _near_ordered,
    _near_unordered,
)


def P(**kw):
    return {t: np.asarray(v, dtype=np.int64) for t, v in kw.items()}


# ---------------------------------------------------------------------------
# per-doc iterator semantics
# ---------------------------------------------------------------------------
def test_term_spans():
    assert eval_spans(SpanTerm("a"), P(a=[1, 4])) == [(1, 2), (4, 5)]
    assert eval_spans(SpanTerm("z"), P(a=[1])) == []


def test_near_ordered_adjacent():
    # "a b" exact adjacency: gap 0
    node = SpanNear((SpanTerm("a"), SpanTerm("b")), slop=0, in_order=True)
    assert eval_spans(node, P(a=[3], b=[4])) == [(3, 5)]
    assert eval_spans(node, P(a=[3], b=[5])) == []  # gap 1 > slop 0
    assert eval_spans(node, P(a=[3], b=[2])) == []  # out of order


def test_near_ordered_shrinks_to_shortest():
    # a at 0 and 4, b at 5: the shrink advances a to 4 → gap 0, one match
    node = SpanNear((SpanTerm("a"), SpanTerm("b")), slop=0, in_order=True)
    assert eval_spans(node, P(a=[0, 4], b=[5])) == [(4, 6)]


def test_near_ordered_slop_is_sum_of_gaps():
    # a..b..c with gaps 1 and 2 → total slop 3
    node = SpanNear(
        (SpanTerm("a"), SpanTerm("b"), SpanTerm("c")), slop=3, in_order=True
    )
    assert eval_spans(node, P(a=[0], b=[2], c=[5])) == [(0, 6)]
    tight = SpanNear(
        (SpanTerm("a"), SpanTerm("b"), SpanTerm("c")), slop=2, in_order=True
    )
    assert eval_spans(tight, P(a=[0], b=[2], c=[5])) == []


def test_near_single_clause_delegates():
    # SpanNearQuery.getSpans returns the sole clause's spans directly
    node = SpanNear((SpanTerm("a"),), slop=0, in_order=True)
    assert eval_spans(node, P(a=[2, 9])) == [(2, 3), (9, 10)]


def test_near_unordered_any_order():
    node = SpanNear((SpanTerm("a"), SpanTerm("b")), slop=0, in_order=False)
    assert eval_spans(node, P(a=[4], b=[3])) == [(3, 5)]
    assert eval_spans(node, P(a=[4], b=[2])) == []  # distance 1 > slop 0


def test_or_merges_sorted():
    node = SpanOr((SpanTerm("a"), SpanTerm("b")))
    assert eval_spans(node, P(a=[5, 1], b=[3])) == [(1, 2), (3, 4), (5, 6)]


def test_not_drops_overlaps():
    # include "a b" spans, exclude docs where c overlaps the span
    inc = SpanNear((SpanTerm("a"), SpanTerm("b")), slop=1, in_order=True)
    node = SpanNot(inc, SpanTerm("c"))
    # span (0,3) with c at 1 → overlap → dropped
    assert eval_spans(node, P(a=[0], b=[2], c=[1])) == []
    # c outside the span → kept
    assert eval_spans(node, P(a=[0], b=[2], c=[7])) == [(0, 3)]


def test_first_limits_end():
    node = SpanFirst(SpanTerm("a"), end=3)
    assert eval_spans(node, P(a=[1, 2, 5])) == [(1, 2), (2, 3)]


def test_span_freq_sloppy_factor():
    # one adjacent match (len 2): 1/3; one term occurrence (len 1): 1/2
    near = SpanNear((SpanTerm("a"), SpanTerm("b")), slop=0, in_order=True)
    assert span_freq(near, P(a=[3], b=[4])) == pytest.approx(1.0 / 3.0)
    assert span_freq(SpanTerm("a"), P(a=[7, 9])) == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# brute-force match-set oracles (random position lists)
# ---------------------------------------------------------------------------
def _brute_ordered_match(lists, slop):
    """exists strictly increasing tuple with sum-of-gaps ≤ slop (unit spans:
    p_n - p_1 - (n-1) ≤ slop)."""
    n = len(lists)
    for tup in itertools.product(*lists):
        if all(tup[i] < tup[i + 1] for i in range(n - 1)):
            if tup[-1] - tup[0] - (n - 1) <= slop:
                return True
    return False


def _brute_unordered_match(lists, slop):
    n = len(lists)
    for tup in itertools.product(*lists):
        if len(set(tup)) == n and (max(tup) + 1) - min(tup) - n <= slop:
            return True
    return False


@pytest.mark.parametrize("seed", range(30))
@pytest.mark.parametrize("n_clauses", [2, 3])
def test_near_match_set_vs_brute_force(seed, n_clauses):
    rng = np.random.default_rng(seed * 7 + n_clauses)
    # distinct-term position lists: sample disjoint positions per clause
    pool = rng.permutation(40)
    sizes = rng.integers(1, 5, size=n_clauses)
    lists, at = [], 0
    for s in sizes:
        lists.append(sorted(int(x) for x in pool[at : at + s]))
        at += s
    slop = int(rng.integers(0, 6))
    subs = [[(p, p + 1) for p in lst] for lst in lists]
    assert bool(_near_ordered(subs, slop)) == _brute_ordered_match(lists, slop)
    assert bool(_near_unordered(subs, slop)) == _brute_unordered_match(lists, slop)


# ---------------------------------------------------------------------------
# end-to-end through the engine
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def span_index(spark, tmp_path_factory):
    texts = [
        "fast merge wins",                      # 0: adjacent
        "fast and steady merge",                # 1: gap 2 ('and' is a stopword slot)
        "merge then fast",                      # 2: reversed
        "fast query speed",                     # 3: only fast
        "nothing here",                         # 4
        "fast merge fast merge",                # 5: two adjacent matches
    ]
    rows = [(f"u{i}", t) for i, t in enumerate(texts)]
    pages = spark.createDataFrame(rows, "url string, text string")
    out = str(tmp_path_factory.mktemp("span_idx"))
    paths = build_index(spark, pages, out, num_segments=1, positions=True)
    return Searcher(spark, paths)


def test_span_near_ordered_e2e(span_index):
    s = span_index
    node = SpanNear((SpanTerm("fast"), SpanTerm("merge")), slop=0, in_order=True)
    got = s.span_search(node, k=10).toPandas()
    assert set(got["doc_id"]) == {0, 5}
    # doc 5 has freq 2/3 vs doc 0's 1/3 → doc 5 ranks first
    assert got["doc_id"].tolist()[0] == 5

    sloppy = SpanNear((SpanTerm("fast"), SpanTerm("merge")), slop=2, in_order=True)
    got2 = s.span_search(sloppy, k=10).toPandas()
    assert set(got2["doc_id"]) == {0, 1, 5}


def test_span_near_unordered_e2e(span_index):
    s = span_index
    node = SpanNear((SpanTerm("fast"), SpanTerm("merge")), slop=1, in_order=False)
    got = s.span_search(node, k=10).toPandas()
    # doc 2 "merge then fast": merge@0, fast@2 → distance 3-0-2=1 ≤ 1
    assert set(got["doc_id"]) == {0, 2, 5}


def test_span_or_not_first_e2e(span_index):
    s = span_index
    either = SpanOr((SpanTerm("merge"), SpanTerm("query")))
    got = s.span_search(either, k=10).toPandas()
    assert set(got["doc_id"]) == {0, 1, 2, 3, 5}

    # fast not followed-by merge: docs whose 'fast' span overlaps nothing
    not_node = SpanNot(SpanTerm("fast"), SpanTerm("merge"))
    got2 = s.span_search(not_node, k=10).toPandas()
    assert set(got2["doc_id"]) == {0, 1, 2, 3, 5}  # unit spans never overlap

    first = SpanFirst(SpanTerm("merge"), end=1)  # merge as the first token
    got3 = s.span_search(first, k=10).toPandas()
    assert set(got3["doc_id"]) == {2}


def test_span_scores_match_bm25_arithmetic(span_index):
    """Engine score == weight * freq / (freq + cache[norm]) with summed idf
    over the tree's terms — recomputed here in float32."""
    from lucene_solr_spark.query.bm25 import K1, bm25_idf, norm_cache

    s = span_index
    node = SpanNear((SpanTerm("fast"), SpanTerm("merge")), slop=0, in_order=True)
    got = s.span_search(node, k=10).toPandas().set_index("doc_id")
    tinfo = s.lookup_terms(["fast", "merge"])
    idf = np.float32(
        sum(float(bm25_idf(int(r.df), s.stats.max_doc)) for r in tinfo.itertuples())
    )
    weight = np.float32(idf * (K1 + np.float32(1.0)))
    cache = norm_cache(s.stats)
    docs = s.docs.select("doc_id", "norm_byte").toPandas().set_index("doc_id")
    for doc_id, freq in [(0, np.float32(1 / 3)), (5, np.float32(2 / 3))]:
        nb = int(docs.loc[doc_id, "norm_byte"])
        expect = np.float32(weight * freq / (freq + cache[nb]))
        assert got.loc[doc_id, "score"] == pytest.approx(float(expect), rel=1e-6)

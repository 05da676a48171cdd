"""Surround query language: parser shapes + end-to-end match sets vs a
naive position oracle, and combine-equivalence vs the engine's own
boolean/span paths."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.query.executor import Searcher
from lucene_solr_spark.query.spans import SpanNear, SpanOr, SpanTerm, span_search
from lucene_solr_spark.query.surround import (
    SAnd,
    SDist,
    SNot,
    SOrNode,
    SPrefix,
    STerm,
    STrunc,
    SWeight,
    parse_surround,
    surround_search,
)

CORPUS = {
    "u00": "spark merge fast query plan",
    "u01": "merge spark index scan",
    "u02": "spark fast fast merge table",
    "u03": "query plan join sort",
    "u04": "fast spark merge scan shard",
    "u05": "index scan shard row merge",
    "u06": "spark query merge plan table",
    "u07": "table row plan join",
    "u08": "merge scan spark fast spark",
    "u09": "join sort query index",
}


@pytest.fixture(scope="module")
def fixture(spark, tmp_path_factory):
    pages = spark.createDataFrame(list(CORPUS.items()), "url string, text string")
    paths = build_index(
        spark, pages, str(tmp_path_factory.mktemp("sr_idx") / "idx"), num_segments=2
    )
    return Searcher(spark, paths)


# --- parser shapes -------------------------------------------------------------
def test_parse_infix_distance_default_and_numbered():
    assert parse_surround("a W b") == SDist(1, True, (STerm("a"), STerm("b")))
    assert parse_surround("a 3w b") == SDist(3, True, (STerm("a"), STerm("b")))
    assert parse_surround("a 10N b") == SDist(10, False, (STerm("a"), STerm("b")))


def test_parse_left_associative_chain():
    q = parse_surround("a 3N b 5N c")
    assert q == SDist(5, False, (SDist(3, False, (STerm("a"), STerm("b"))), STerm("c")))


def test_parse_prefix_operator_forms():
    q = parse_surround("3W(a, b, c)")
    assert q == SDist(3, True, (STerm("a"), STerm("b"), STerm("c")))
    q = parse_surround("or(a, b)")
    assert q == SOrNode((STerm("a"), STerm("b")))


def test_parse_precedence_and_boolean():
    q = parse_surround("a AND b OR c NOT d")
    # OR lowest: (a AND (b NOT d))? no — AND binds tighter than OR, NOT tighter
    assert q == SOrNode((SAnd((STerm("a"), STerm("b"))), SNot((STerm("c"), STerm("d")))))


def test_parse_truncation_and_weights():
    q = parse_surround("mer* 2W ind?x")
    assert q == SDist(2, True, (SPrefix("mer*"), STrunc("ind?x")))
    q = parse_surround("spark^2")
    assert q == SWeight(STerm("spark"), 2.0)


def test_parse_distance_number_range():
    # 1W is not a distance token (2-99 only): parses as the TERM "1w"
    q = parse_surround("1w")
    assert q == STerm("1w")


def test_and_inside_distance_rejected(fixture):
    with pytest.raises(ValueError, match="not allowed inside"):
        surround_search(fixture, "(a AND b) W c")


# --- e2e vs naive position oracle ----------------------------------------------
def _docs_of(searcher):
    m = searcher.docs.select("doc_id", "url").toPandas()
    return {r.url: r.doc_id for r in m.itertuples()}


def _oracle_near(a, b, dist, ordered):
    out = set()
    for u, txt in CORPUS.items():
        toks = txt.split()
        pa = [i for i, t in enumerate(toks) if t == a]
        pb = [i for i, t in enumerate(toks) if t == b]
        hit = any(
            (0 < j - i <= dist) if ordered else (i != j and abs(j - i) <= dist)
            for i in pa
            for j in pb
        )
        if hit:
            out.add(u)
    return out


@pytest.mark.parametrize(
    "query,a,b,dist,ordered",
    [
        ("spark W merge", "spark", "merge", 1, True),
        ("merge W spark", "merge", "spark", 1, True),
        ("spark 3W table", "spark", "table", 3, True),
        ("spark 2N scan", "spark", "scan", 2, False),
        ("fast N spark", "fast", "spark", 1, False),
    ],
)
def test_distance_match_sets(fixture, query, a, b, dist, ordered):
    got = set(surround_search(fixture, query, k=20).toPandas()["doc_id"])
    doc_of = _docs_of(fixture)
    expect = {doc_of[u] for u in _oracle_near(a, b, dist, ordered)}
    assert got == expect


def test_or_inside_distance(fixture):
    got = set(surround_search(fixture, "(spark OR row) W merge", k=20).toPandas()["doc_id"])
    doc_of = _docs_of(fixture)
    expect = {
        doc_of[u] for u in _oracle_near("spark", "merge", 1, True) | _oracle_near("row", "merge", 1, True)
    }
    assert got == expect


def test_prefix_expansion_inside_distance(fixture):
    # mer* -> merge; sc* -> scan; "merge W scan"? no — check mer* W sc*
    got = set(surround_search(fixture, "mer* W sc*", k=20).toPandas()["doc_id"])
    doc_of = _docs_of(fixture)
    expect = {doc_of[u] for u in _oracle_near("merge", "scan", 1, True)}
    assert got == expect


def test_distance_scores_equal_span_search(fixture):
    sur = surround_search(fixture, "spark 2W merge", k=20).toPandas()
    direct = span_search(
        fixture, SpanNear((SpanTerm("spark"), SpanTerm("merge")), slop=1, in_order=True), k=20
    ).toPandas()
    assert sur["doc_id"].tolist() == direct["doc_id"].tolist()
    np.testing.assert_allclose(sur["score"].values, direct["score"].values)


def test_and_matches_boolean_must(fixture):
    sur = surround_search(fixture, "spark AND merge AND fast", k=20).toPandas()
    ref = fixture.boolean_search(must=["spark", "merge", "fast"], k=20).toPandas()
    assert sur["doc_id"].tolist() == ref["doc_id"].tolist()
    np.testing.assert_allclose(sur["score"].values, ref["score"].values, rtol=1e-6)


def test_or_matches_boolean_should(fixture):
    sur = surround_search(fixture, "table OR shard", k=20).toPandas()
    ref = fixture.boolean_search(should=["table", "shard"], k=20).toPandas()
    assert sur["doc_id"].tolist() == ref["doc_id"].tolist()
    np.testing.assert_allclose(sur["score"].values, ref["score"].values, rtol=1e-6)


def test_not_excludes(fixture):
    sur = set(surround_search(fixture, "spark NOT table", k=20).toPandas()["doc_id"])
    ref_all = set(fixture.boolean_search(should=["spark"], k=20).toPandas()["doc_id"])
    doc_of = _docs_of(fixture)
    has_table = {doc_of[u] for u, t in CORPUS.items() if "table" in t.split()}
    assert sur == ref_all - has_table


def test_weight_scales_score(fixture):
    plain = surround_search(fixture, "shard", k=20).toPandas().set_index("doc_id")
    boosted = surround_search(fixture, "shard^3", k=20).toPandas().set_index("doc_id")
    np.testing.assert_allclose(
        boosted["score"].values, (plain["score"] * np.float32(3.0)).values, rtol=1e-6
    )


def test_boolean_combine_of_distance_subqueries(fixture):
    # (spark W merge) OR (index W scan): union-sum of two span frames
    got = set(
        surround_search(fixture, "(spark W merge) OR (index W scan)", k=20)
        .toPandas()["doc_id"]
    )
    doc_of = _docs_of(fixture)
    expect = {
        doc_of[u]
        for u in _oracle_near("spark", "merge", 1, True) | _oracle_near("index", "scan", 1, True)
    }
    assert got == expect

"""{!frange} (ValueSourceRangeFilter / FunctionRangeQuery) and
MaxScoreQParser: engine vs independent oracles."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.valuesources import (
    function_range_docset,
    function_range_query,
    recip,
    sum_,
)
from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.index.norms import encode_norm
from lucene_solr_spark.query.bm25 import BM25Stats, bm25_score
from lucene_solr_spark.query.executor import Searcher

CORPUS = {
    f"u{i:02d}": txt
    for i, txt in enumerate(
        [
            "spark merge fast query",
            "merge merge merge index",
            "spark spark scan table",
            "query plan join sort",
            "fast fast fast spark merge",
            "index scan shard row",
            "spark query merge plan",
            "table row plan join merge",
            "shard scan spark fast",
            "join sort query index spark",
        ]
    )
}
RANKS = {u: (i % 5, (i * 7) % 11) for i, u in enumerate(sorted(CORPUS))}


@pytest.fixture(scope="module")
def fixture(spark, tmp_path_factory):
    pages = spark.createDataFrame(list(CORPUS.items()), "url string, text string")
    paths = build_index(
        spark, pages, str(tmp_path_factory.mktemp("fr_idx") / "idx"), num_segments=2
    )
    source = spark.createDataFrame(
        [(u, a, b) for u, (a, b) in RANKS.items()],
        "url string, rank_a int, rank_b int",
    )
    return Searcher(spark, paths), source


def _doc_of(searcher):
    m = searcher.docs.select("doc_id", "url").toPandas()
    return dict(zip(m["url"], m["doc_id"]))


# --- frange ------------------------------------------------------------------
def test_frange_docset_matches_predicate(fixture):
    searcher, source = fixture
    ds = function_range_docset(
        searcher, source, sum_(F.col("rank_a"), F.col("rank_b")), l=4, u=10
    )
    got = sorted(r.doc_id for r in ds.collect())
    doc_of = _doc_of(searcher)
    expect = sorted(doc_of[u] for u, (a, b) in RANKS.items() if 4 <= a + b <= 10)
    assert got == expect


def test_frange_exclusive_bounds(fixture):
    searcher, source = fixture
    ds = function_range_docset(
        searcher, source, F.col("rank_a").cast("double"), l=1, u=3,
        incl=False, incu=False,
    )
    got = sorted(r.doc_id for r in ds.collect())
    doc_of = _doc_of(searcher)
    expect = sorted(doc_of[u] for u, (a, _) in RANKS.items() if 1 < a < 3)
    assert got == expect


def test_frange_open_upper_bound(fixture):
    searcher, source = fixture
    ds = function_range_docset(searcher, source, F.col("rank_b").cast("double"), l=7)
    doc_of = _doc_of(searcher)
    expect = sorted(doc_of[u] for u, (_, b) in RANKS.items() if b >= 7)
    assert sorted(r.doc_id for r in ds.collect()) == expect


def test_frange_composes_as_fq_without_changing_scores(fixture):
    searcher, source = fixture
    full = searcher.search(["spark"], k=10).toPandas()
    ds = function_range_docset(
        searcher, source, sum_(F.col("rank_a"), F.col("rank_b")), l=0, u=6
    )
    filt = searcher.search(["spark"], k=10, filter_docs=ds).toPandas()
    allowed = set(r.doc_id for r in ds.collect())
    assert set(filt["doc_id"]) <= allowed
    merged = filt.merge(full, on="doc_id", suffixes=("_f", ""))
    np.testing.assert_allclose(merged["score_f"].values, merged["score"].values)


def test_frange_main_query_constant_score(fixture):
    searcher, source = fixture
    # recip of rank_a: a genuine composed function, like the Solr example
    val = recip(F.col("rank_a").cast("double"), 1.0, 1.0, 1.0)
    hits = function_range_query(
        searcher, source, val, l=0.3, u=1.0, boost=2.5, k=10
    ).toPandas()
    doc_of = _doc_of(searcher)
    expect = sorted(
        doc_of[u] for u, (a, _) in RANKS.items() if 0.3 <= 1.0 / (1.0 + a) <= 1.0
    )
    assert hits["doc_id"].tolist() == expect[:10]
    assert (hits["score"] == np.float32(2.5)).all()


# --- MaxScoreQParser ---------------------------------------------------------
def _oracle_max_score(must, should, must_not, tie, k=10):
    doc_ids = sorted(CORPUS)
    token_lists = {u: CORPUS[u].split() for u in doc_ids}
    n = len(doc_ids)
    stats = BM25Stats(
        max_doc=n, sum_total_term_freq=sum(len(v) for v in token_lists.values())
    )
    nb = {u: int(encode_norm(np.array([len(token_lists[u])]))[0]) for u in doc_ids}

    def term_score(u, t):
        tf = token_lists[u].count(t)
        if tf == 0:
            return None
        df = sum(1 for v in token_lists.values() if t in v)
        return float(bm25_score(np.array([tf]), df, np.array([nb[u]]), stats)[0])

    should = [t for t in should if t not in set(must)]
    tie32 = np.float32(tie)
    out = {}
    for i, u in enumerate(doc_ids):
        ms = [term_score(u, t) for t in sorted(set(must))]
        if any(s is None for s in ms):
            continue
        ss = [s for s in (term_score(u, t) for t in sorted(set(should))) if s is not None]
        if not must and not ss:
            continue
        if any(term_score(u, t) is not None for t in must_not):
            continue
        must_sum = float(np.sum(np.float64(ms))) if ms else 0.0
        if ss:
            mx = np.float32(max(ss))
            sm = np.float32(np.sum(np.float64(ss)))
            dmq = np.float32(np.float64(mx) + np.float64(tie32) * (np.float64(sm) - np.float64(mx)))
        else:
            dmq = np.float32(0.0)
        out[i] = np.float32(must_sum + float(dmq))
    ranked = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


@pytest.mark.parametrize(
    "must,should,must_not,tie",
    [
        ([], ["spark", "merge"], [], 0.0),  # pure max
        ([], ["spark", "merge", "fast"], [], 0.3),
        (["query"], ["spark", "merge"], [], 0.0),
        (["spark"], ["fast", "merge"], ["table"], 0.5),
        (["spark"], ["spark", "merge"], [], 0.0),  # must wins the overlap
    ],
)
def test_max_score_engine_matches_oracle(fixture, must, should, must_not, tie):
    searcher, _ = fixture
    got = searcher.max_score_search(
        must=must, should=should, must_not=must_not, tie=tie, k=10
    ).toPandas()
    expect = _oracle_max_score(must, should, must_not, tie)
    assert got["doc_id"].tolist() == [d for d, _ in expect]
    np.testing.assert_allclose(
        got["score"].values,
        np.array([s for _, s in expect], dtype=np.float32),
        rtol=1e-6,
    )


def test_max_score_differs_from_sum_when_tie_zero(fixture):
    searcher, _ = fixture
    mx = searcher.max_score_search(should=["spark", "merge"], tie=0.0, k=10).toPandas()
    sm = searcher.boolean_search(should=["spark", "merge"], k=10).toPandas()
    both = mx.merge(sm, on="doc_id", suffixes=("_max", "_sum"))
    two_term = both[both["score_max"] < both["score_sum"]]
    assert len(two_term) > 0  # docs matching both terms score strictly less

"""Single-slice boolean fast path == the distributed scan+aggregate plan.

The fast path (executor._single_slice_boolean) collapses a small boolean
query to one coalesced kernel; correctness contract is bit-identical
(doc_id, float32 score) output versus the distributed plan it replaces.
Toggled per-call via LSS_SINGLE_SLICE_POSTINGS (0 disables).
"""

import os

import pytest

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.query.executor import Searcher
from tests.test_index_e2e import make_corpus


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    corpus = make_corpus(n=150, seed=13)
    rows = [(u, t, 1000) for u, t in corpus.items()]
    pages = spark.createDataFrame(rows, "url string, text string, warc_ts long")
    out = str(tmp_path_factory.mktemp("ss_idx"))
    paths = build_index(spark, pages, out, num_segments=2, positions=False)
    return Searcher(spark, paths)


CASES = [
    dict(should=["fast", "dog"]),
    dict(should=["fast", "dog", "cat"], min_should_match=2),
    dict(must=["fast", "dog"]),
    dict(must=["fast"], must_not=["cat"]),
    dict(must=["fast"], should=["dog", "cat"]),
    dict(must=["fast"], must_not=["zzznope"]),
    dict(should=["zzznope", "qqqnope"]),
]


@pytest.mark.parametrize("case", CASES)
def test_fast_path_matches_distributed(index, case):
    s = index
    fast = s.boolean_search(k=50, **case).toPandas()
    os.environ["LSS_SINGLE_SLICE_POSTINGS"] = "0"
    try:
        dist = s.boolean_search(k=50, **case).toPandas()
    finally:
        del os.environ["LSS_SINGLE_SLICE_POSTINGS"]
    assert list(fast["doc_id"]) == list(dist["doc_id"])
    assert list(fast["score"]) == list(dist["score"])


@pytest.fixture(scope="module")
def pos_index(spark, tmp_path_factory):
    corpus = make_corpus(n=150, seed=13)
    rows = [(u, t, 1000) for u, t in corpus.items()]
    pages = spark.createDataFrame(rows, "url string, text string, warc_ts long")
    out = str(tmp_path_factory.mktemp("ss_pos_idx"))
    paths = build_index(spark, pages, out, num_segments=2, positions=True)
    return Searcher(spark, paths)


@pytest.mark.parametrize("phrase,slop", [
    (["fast", "dog"], 0),
    (["fast", "dog"], 2),
    (["fast", "dog", "cat"], 3),
    (["fast"], 0),
])
def test_phrase_fast_path_matches_distributed(pos_index, phrase, slop):
    s = pos_index
    fast = s.phrase_search(phrase, k=1000, slop=slop).toPandas()
    os.environ["LSS_SINGLE_SLICE_POSITIONS"] = "0"
    try:
        dist = s.phrase_search(phrase, k=1000, slop=slop).toPandas()
    finally:
        del os.environ["LSS_SINGLE_SLICE_POSITIONS"]
    assert list(fast["doc_id"]) == list(dist["doc_id"])
    assert list(fast["score"]) == list(dist["score"])


PARSED = [
    '+fast -slow "fast dog" cat^2',
    'fast AND dog',
    '+fast +dog -"slow cat"',
    'fast^3 dog "dog cat"',
    '"fast dog" OR "dog cat"',
    '+zzznope fast',
    'fast -zzznope',
]


@pytest.mark.parametrize("q", PARSED)
def test_parsed_fast_path_matches_distributed(pos_index, q):
    s = pos_index
    fast = s.query(q, k=100).toPandas()
    os.environ["LSS_SINGLE_SLICE_POSTINGS"] = "0"
    try:
        dist = s.query(q, k=100).toPandas()
    finally:
        del os.environ["LSS_SINGLE_SLICE_POSTINGS"]
    assert list(fast["doc_id"]) == list(dist["doc_id"])
    assert list(fast["score"]) == list(dist["score"])


def test_fast_path_engages_and_big_df_declines(index, monkeypatch):
    s = index
    tinfo = s.lookup_terms(["fast", "dog"])
    assert s._single_slice_boolean(tinfo, [], [], 0, 10) is not None
    monkeypatch.setenv("LSS_SINGLE_SLICE_POSTINGS", "1")
    assert s._single_slice_boolean(tinfo, [], [], 0, 10) is None

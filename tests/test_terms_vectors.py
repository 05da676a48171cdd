"""TermsComponent (/terms) and TermVectorComponent over a real index."""

import pytest

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.query.components import term_vectors, terms_component
from lucene_solr_spark.query.executor import Searcher


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    rows = [
        ("u1", "apple apple banana cherry", 1),
        ("u2", "apple banana banana date", 2),
        ("u3", "cherry cherry cherry elderberry", 3),
    ]
    pages = spark.createDataFrame(rows, "url string, text string, warc_ts int")
    paths = build_index(
        spark, pages, str(tmp_path_factory.mktemp("tvidx")), ts_col="warc_ts"
    )
    return pages, Searcher(spark, paths)


def test_terms_sort_count(idx):
    _, s = idx
    rows = terms_component(s, limit=3).collect()
    # df: apple 2, banana 2, cherry 2, date 1, elderberry 1 → count desc,
    # term asc tiebreak
    assert [(r.term, r.df) for r in rows] == [
        ("apple", 2),
        ("banana", 2),
        ("cherry", 2),
    ]


def test_terms_prefix_bounds_mincount(idx):
    _, s = idx
    rows = terms_component(s, prefix="c", sort="index").collect()
    assert [r.term for r in rows] == ["cherry"]
    rows = terms_component(s, lower="banana", upper="date", lower_incl=False,
                           upper_incl=True, sort="index").collect()
    assert [r.term for r in rows] == ["cherry", "date"]
    rows = terms_component(s, mincount=2, sort="index").collect()
    assert [r.term for r in rows] == ["apple", "banana", "cherry"]
    rows = terms_component(s, maxcount=1, sort="index").collect()
    assert [r.term for r in rows] == ["date", "elderberry"]


def test_term_vectors(idx):
    pages, s = idx
    hits = s.search("apple", k=10)
    vec = term_vectors(s, hits, pages).collect()
    by_doc = {}
    for r in vec:
        by_doc.setdefault(r.url, {})[r.term] = (r.tf, list(r.positions))
    assert set(by_doc) == {"u1", "u2"}
    assert by_doc["u1"]["apple"] == (2, [0, 1])
    assert by_doc["u1"]["banana"] == (1, [2])
    assert by_doc["u2"]["banana"] == (2, [1, 2])
    assert by_doc["u2"]["date"] == (1, [3])

"""XML query parser (query/xmlparser.py) — CoreParser element coverage.

Element semantics from CoreParser.java:60-117 and the builders/ package;
compared against the equivalent direct engine calls on the same index."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def xidx(spark, tmp_path_factory):
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher

    texts = {
        "u0": "spark merge fast index",
        "u1": "fast spark spark table",
        "u2": "dog bird cat",
        "u3": "fast stone merge spark",
        "u4": "stone stone dog merge",
        "u5": "spark table scan",
    }
    pages = spark.createDataFrame(
        [(u, t) for u, t in texts.items()], "url string, text string"
    )
    out = str(tmp_path_factory.mktemp("xidx"))
    return Searcher(spark, build_index(spark, pages, out))


def rows(df):
    return [(int(r.doc_id), float(r.score)) for r in df.collect()]


def docs(df):
    return {int(r.doc_id) for r in df.collect()}


def test_term_query(xidx):
    from lucene_solr_spark.query.xmlparser import xml_query_search

    got = rows(xml_query_search(xidx, "<TermQuery fieldName='text'>spark</TermQuery>", k=10))
    want = rows(xidx.search(["spark"], k=10))
    assert got == want


def test_boolean_query(xidx):
    from lucene_solr_spark.query.xmlparser import xml_query_search

    xml = """
    <BooleanQuery>
      <Clause occurs="must"><TermQuery>fast</TermQuery></Clause>
      <Clause occurs="should"><TermQuery>merge</TermQuery></Clause>
      <Clause occurs="mustNot"><TermQuery>stone</TermQuery></Clause>
    </BooleanQuery>"""
    got = rows(xml_query_search(xidx, xml, k=10))
    want = rows(
        xidx.boolean_search(must=["fast"], should=["merge"], must_not=["stone"], k=10)
    )
    assert got == want


def test_boolean_msm_and_boost(xidx):
    from lucene_solr_spark.query.xmlparser import xml_query_search

    xml = """
    <BooleanQuery minimumNumberShouldMatch="2" boost="2.0">
      <Clause occurs="should"><TermQuery>spark</TermQuery></Clause>
      <Clause occurs="should"><TermQuery>merge</TermQuery></Clause>
      <Clause occurs="should"><TermQuery>table</TermQuery></Clause>
    </BooleanQuery>"""
    got = rows(xml_query_search(xidx, xml, k=10))
    want = rows(
        xidx.boolean_search(should=["spark", "merge", "table"], min_should_match=2, k=10)
    )
    assert [d for d, _ in got] == [d for d, _ in want]
    for (d1, s1), (d2, s2) in zip(got, want):
        assert abs(s1 - 2.0 * s2) < 1e-5


def test_dismax(xidx):
    from lucene_solr_spark.query.xmlparser import xml_query_search

    xml = """
    <DisjunctionMaxQuery tieBreaker="0.3">
      <TermQuery>spark</TermQuery>
      <TermQuery>merge</TermQuery>
    </DisjunctionMaxQuery>"""
    got = rows(xml_query_search(xidx, xml, k=10))
    want = rows(xidx.max_score_search(should=["spark", "merge"], tie=0.3, k=10))
    assert got == want


def test_match_all_and_constant_score(xidx):
    from lucene_solr_spark.query.xmlparser import xml_query_search

    got = rows(xml_query_search(xidx, "<MatchAllDocsQuery boost='1.5'/>", k=100))
    assert len(got) == 6 and all(s == 1.5 for _, s in got)

    xml = "<ConstantScoreQuery boost='3.0'><TermQuery>spark</TermQuery></ConstantScoreQuery>"
    got = rows(xml_query_search(xidx, xml, k=100))
    assert {d for d, _ in got} == docs(xidx.match_docs(["spark"]))
    assert all(s == 3.0 for _, s in got)


def test_range_and_filtered(xidx):
    from lucene_solr_spark.query.xmlparser import xml_query_search

    xml = "<TermRangeQuery lowerTerm='spark' upperTerm='table' includeUpper='false'/>"
    got = docs(xml_query_search(xidx, xml, k=100))
    # terms in [spark, table): spark, stone
    assert got == docs(xidx.match_docs(["spark", "stone"]))

    xml = """
    <FilteredQuery>
      <Query><TermQuery>merge</TermQuery></Query>
      <Filter><TermQuery>fast</TermQuery></Filter>
    </FilteredQuery>"""
    got = docs(xml_query_search(xidx, xml, k=100))
    assert got == docs(xidx.match_docs(["merge"])) & docs(xidx.match_docs(["fast"]))


def test_span_elements(xidx):
    from lucene_solr_spark.query.spans import SpanNear, SpanTerm
    from lucene_solr_spark.query.xmlparser import xml_query_search

    xml = """
    <SpanNear slop="0" inOrder="true">
      <SpanTerm>fast</SpanTerm>
      <SpanOrTerms>stone spark</SpanOrTerms>
    </SpanNear>"""
    got = rows(xml_query_search(xidx, xml, k=10))
    from lucene_solr_spark.query.spans import SpanOr

    node = SpanNear(
        (SpanTerm("fast"), SpanOr((SpanTerm("stone"), SpanTerm("spark")))),
        slop=0, in_order=True,
    )
    want = rows(xidx.span_search(node, k=10))
    assert got == want

    xml = """
    <SpanNot>
      <Include><SpanTerm>merge</SpanTerm></Include>
      <Exclude><SpanTerm>stone</SpanTerm></Exclude>
    </SpanNot>"""
    got = docs(xml_query_search(xidx, xml, k=10))
    assert got  # merge docs with no overlapping stone span


def test_unknown_element(xidx):
    from lucene_solr_spark.query.xmlparser import xml_query_search

    with pytest.raises(ValueError):
        xml_query_search(xidx, "<FuzzyLikeThisQuery>x</FuzzyLikeThisQuery>")


def test_doctype_rejected():
    import pytest as _pytest

    from lucene_solr_spark.query.xmlparser import xml_query_search

    bomb = (
        '<?xml version="1.0"?><!DOCTYPE lolz [<!ENTITY lol "lol">]>'
        "<TermQuery fieldName='text'>&lol;</TermQuery>"
    )
    with _pytest.raises(ValueError, match="DOCTYPE"):
        xml_query_search(None, bomb)

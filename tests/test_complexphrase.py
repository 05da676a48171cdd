"""ComplexPhraseQueryParser (query/complexphrase.py) vs position oracles.

Reference behaviors from ComplexPhraseQueryParser.java:60-360 and its test
(TestComplexPhraseQuery.java): wildcards/fuzzy/OR groups inside quoted
phrases match positionally; plain phrases behave like PhraseQuery."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def cp_index(spark, tmp_path_factory):
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher

    texts = {
        "u1": "jakarta apache project",
        "u2": "apache jakarta site",
        "u3": "jakarta lucene search",
        "u4": "the jakartan apache",
        "u5": "jakarta x apache",
        "u6": "johnny walker red",
        "u7": "jonny walker gin",
        "u8": "apache software foundation",
    }
    pages = spark.createDataFrame(
        [(u, t) for u, t in texts.items()], "url string, text string"
    )
    out = str(tmp_path_factory.mktemp("cpidx"))
    paths = build_index(spark, pages, out)
    return Searcher(spark, paths), sorted(texts)


def _docs(df):
    return {int(r.doc_id) for r in df.collect()}


def test_wildcard_in_phrase(cp_index):
    from lucene_solr_spark.query.complexphrase import complex_phrase_search

    s, urls = cp_index
    # "jakarta apach*" — adjacency required: u1 only (u2 reversed, u5 gap)
    got = _docs(complex_phrase_search(s, '"jakarta apach*"', k=10))
    assert got == {urls.index("u1")}
    # slop 1 lets the gap doc in, still ordered
    got = _docs(complex_phrase_search(s, '"jakarta apach*"~1', k=10))
    assert got == {urls.index("u1"), urls.index("u5")}
    # leading wildcard clause: "*akarta apache" — u1 (jakarta apache adj)
    got = _docs(complex_phrase_search(s, '"?akarta apache"', k=10))
    assert got == {urls.index("u1")}


def test_fuzzy_in_phrase(cp_index):
    from lucene_solr_spark.query.complexphrase import complex_phrase_search

    s, urls = cp_index
    # johnny~ matches johnny + jonny (edit 1) → both walker docs
    got = _docs(complex_phrase_search(s, '"johnny~ walker"', k=10))
    assert got == {urls.index("u6"), urls.index("u7")}
    # edit distance 0 = exact
    got = _docs(complex_phrase_search(s, '"johnny~0 walker"', k=10))
    assert got == {urls.index("u6")}


def test_or_group_in_phrase(cp_index):
    from lucene_solr_spark.query.complexphrase import complex_phrase_search

    s, urls = cp_index
    got = _docs(complex_phrase_search(s, '"(jakarta apache) software"', k=10))
    assert got == {urls.index("u8")}


def test_plain_phrase_and_stopword_slot(cp_index):
    from lucene_solr_spark.query.complexphrase import complex_phrase_search

    s, urls = cp_index
    got = _docs(complex_phrase_search(s, '"jakarta apache"', k=10))
    assert got == {urls.index("u1")}
    # unordered (inOrder=false) also matches the reversed doc
    got = _docs(
        complex_phrase_search(s, '"jakarta apache"', k=10, in_order=False)
    )
    assert got == {urls.index("u1"), urls.index("u2")}
    # nonexistent wildcard expansion → empty
    assert _docs(complex_phrase_search(s, '"jakarta zzz*"', k=10)) == set()


def test_qparser_dispatch(cp_index, spark):
    from lucene_solr_spark.query.qparser import SolrQueries

    s, urls = cp_index
    qp = SolrQueries(s)
    got = _docs(qp.query('{!complexphrase}"jakarta apach*"', k=10))
    assert got == {urls.index("u1")}
    got = _docs(qp.query('{!complexphrase inOrder=false}"jakarta apache"', k=10))
    assert got == {urls.index("u1"), urls.index("u2")}

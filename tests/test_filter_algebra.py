"""BooleanFilter / ChainedFilter / TermsFilter DocSet algebra and
group.func — reference-order semantics over small explicit sets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.query import components as C
from lucene_solr_spark.query.qparser import parse_function


def _ds(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def _ids(df):
    return sorted(r.doc_id for r in df.collect())


@pytest.fixture(scope="module")
def sets(spark):
    a = _ds(spark, [1, 2, 3, 4])
    b = _ds(spark, [3, 4, 5])
    c = _ds(spark, [4, 5, 6])
    uni = _ds(spark, [1, 2, 3, 4, 5, 6, 7])
    return a, b, c, uni


def test_docset_xor(spark, sets):
    a, b, _, _ = sets
    assert _ids(C.docset_xor(a, b)) == [1, 2, 5]


def test_boolean_filter_shapes(spark, sets):
    a, b, c, uni = sets
    # SHOULD union
    assert _ids(C.boolean_filter(should=[a, b])) == [1, 2, 3, 4, 5]
    # union(SHOULD) ∩ MUST − MUST_NOT
    got = C.boolean_filter(should=[a, b], must=[c], must_not=[_ds(spark, [5])])
    assert _ids(got) == [4]
    # MUST-only conjunction
    assert _ids(C.boolean_filter(must=[a, b])) == [3, 4]
    # MUST_NOT-only starts from the universe
    assert _ids(C.boolean_filter(must_not=[a], universe=uni)) == [5, 6, 7]
    with pytest.raises(ValueError):
        C.boolean_filter(must_not=[a])  # no universe
    with pytest.raises(ValueError):
        C.boolean_filter()


def test_chained_filter(spark, sets):
    a, b, c, uni = sets
    # OR fold
    assert _ids(C.chained_filter([a, c], "or")) == [1, 2, 3, 4, 5, 6]
    # leading AND starts from the first set
    assert _ids(C.chained_filter([a, b], "and")) == [3, 4]
    # mixed ops, left to right: (a OR b) XOR c
    assert _ids(C.chained_filter([a, b, c], ["or", "or", "xor"])) == [1, 2, 3, 6]
    # leading ANDNOT = universe − first, then fold
    assert _ids(C.chained_filter([a, b], ["andnot", "and"], universe=uni)) == [5]
    with pytest.raises(ValueError):
        C.chained_filter([a, b], ["or"])  # Invalid number of elements


def test_terms_filter_and_group_func(spark):
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher

    corpus = {"u0": "spark merge", "u1": "fast table", "u2": "spark scan"}
    pages = spark.createDataFrame(list(corpus.items()), "url string, text string")
    import tempfile

    paths = build_index(spark, pages, tempfile.mkdtemp(prefix="tf_idx"))
    s = Searcher(spark, paths)
    source = spark.createDataFrame(
        [("u0", 1.0), ("u1", 2.0), ("u2", 3.0)], "url string, rank double"
    )
    ds = C.terms_filter(s, source, "url", ["u0", "u2"])
    doc_of = dict(s.docs.select("url", "doc_id").toPandas().itertuples(index=False, name=None))
    assert _ids(ds) == sorted([doc_of["u0"], doc_of["u2"]])
    # composes with the scoring path as an fq
    hits = s.search(["spark"], k=10, filter_docs=ds)
    assert _ids(hits.select("doc_id")) == sorted([doc_of["u0"], doc_of["u2"]])

    # group.func: bucket by a function of rank (mod 2), top-1 per bucket
    keyed = source.join(s.docs.select("url", "doc_id"), "url")
    out = C.grouping_by_function(
        keyed, parse_function("mod(rank, 2)"), "rank", 1
    ).toPandas()
    by_group = dict(zip(out["group_value"], out["rank"]))
    assert by_group == {0.0: 2.0, 1.0: 3.0}

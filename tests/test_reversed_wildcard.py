"""Leading-wildcard via the reversed dictionary (ReversedWildcardFilter /
Factory semantics: reverse the token so a leading wildcard becomes a
pushdown-able prefix)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.query.executor import Searcher

CORPUS = {
    "u0": "walking talking merge",
    "u1": "sing ring bring",
    "u2": "merge spark scan",
    "u3": "thing wing sting walking",
}


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    pages = spark.createDataFrame(list(CORPUS.items()), "url string, text string")
    paths = build_index(spark, pages, str(tmp_path_factory.mktemp("rw_idx") / "idx"))
    s = Searcher(spark, paths)
    s.build_reversed_dictionary()
    return s


def _urls(s, hits):
    m = dict(s.docs.select("doc_id", "url").toPandas().itertuples(index=False, name=None))
    return {m[r.doc_id] for r in hits.collect()}


def test_leading_star_matches_wildcard_search(idx):
    got = _urls(idx, idx.leading_wildcard_search("*ing", k=10))
    want = _urls(idx, idx.wildcard_search("*ing", k=10))
    assert got == want == {"u0", "u1", "u3"}


def test_leading_question_mark(idx):
    # ?ing: exactly one leading char -> sing, ring, wing (not walking)
    got = _urls(idx, idx.leading_wildcard_search("?ing", k=10))
    assert got == {"u1", "u3"}


def test_mixed_infix_pattern(idx):
    # *alk*ng: suffix literal 'ng' prunes, regex verifies the middle
    got = _urls(idx, idx.leading_wildcard_search("*alk*ng", k=10))
    assert got == {"u0", "u3"}


def test_reversed_prefix_is_pushed_down(idx):
    rdict = idx._reversed_dictionary()
    plan = (
        rdict.where(F.col("rterm").like("gni%"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "rterm" in plan


def test_fallback_without_built_dictionary(spark, tmp_path_factory):
    pages = spark.createDataFrame(list(CORPUS.items()), "url string, text string")
    paths = build_index(spark, pages, str(tmp_path_factory.mktemp("rw2_idx") / "idx"))
    s = Searcher(spark, paths)  # no build_reversed_dictionary call
    got = _urls(s, s.leading_wildcard_search("*ing", k=10))
    assert got == {"u0", "u1", "u3"}

"""URLClassifyProcessor: length/levels/toplevel/landing/domain/canonical
as pure Catalyst expressions (URLClassifyProcessor.java:44-240)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.pipeline.textstats import url_classify

URLS = [
    "http://example.com/",
    "http://example.com/index.html",
    "http://example.com/a/b/page.html",
    "http://example.com/a/b/",
    "http://example.com/a/welcome.php",
    "http://example.com/search?q=x",
    "http://sub.example.com/a/b/c/index.htm",
]


@pytest.fixture(scope="module")
def classified(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    out = url_classify(df).toPandas().set_index("url")
    return out


def test_levels(classified):
    assert classified.loc["http://example.com/", "url_levels"] == 0
    assert classified.loc["http://example.com/index.html", "url_levels"] == 0
    assert classified.loc["http://example.com/a/b/page.html", "url_levels"] == 3
    assert classified.loc["http://example.com/a/b/", "url_levels"] == 2
    # suffix stripped first: "/a/b/c/index.htm" -> "/a/b/c" -> 3 slashes
    assert classified.loc["http://sub.example.com/a/b/c/index.htm", "url_levels"] == 3


def test_toplevel(classified):
    assert classified.loc["http://example.com/", "url_toplevel"] == 1
    assert classified.loc["http://example.com/index.html", "url_toplevel"] == 1
    assert classified.loc["http://example.com/a/b/", "url_toplevel"] == 0
    # query string disqualifies top-level (the path alone is empty-ish)
    assert classified.loc["http://example.com/search?q=x", "url_toplevel"] == 0


def test_landingpage(classified):
    assert classified.loc["http://example.com/", "url_landingpage"] == 1
    assert classified.loc["http://example.com/index.html", "url_landingpage"] == 1
    assert classified.loc["http://example.com/a/welcome.php", "url_landingpage"] == 1
    assert classified.loc["http://example.com/a/b/page.html", "url_landingpage"] == 0
    assert classified.loc["http://example.com/search?q=x", "url_landingpage"] == 0


def test_domain_and_length(classified):
    assert classified.loc["http://sub.example.com/a/b/c/index.htm", "url_domain"] == "sub.example.com"
    assert (
        classified.loc["http://example.com/", "url_length"]
        == len("http://example.com/")
    )


def test_canonical_strips_index_suffix(classified):
    assert (
        classified.loc["http://example.com/index.html", "url_canonical"]
        == "http://example.com/"
    )
    assert (
        classified.loc["http://sub.example.com/a/b/c/index.htm", "url_canonical"]
        == "http://sub.example.com/a/b/c/"
    )
    # trailing-slash landing pages stay themselves
    assert classified.loc["http://example.com/a/b/", "url_canonical"] == "http://example.com/a/b/"
    # non-landing pages unchanged
    assert (
        classified.loc["http://example.com/a/b/page.html", "url_canonical"]
        == "http://example.com/a/b/page.html"
    )


def test_plan_is_pure_codegen(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    plan = url_classify(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

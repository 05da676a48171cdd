"""HTMLStripCharFilter re-expression: JVM chain vs expectations and vs the
DuckDB replay of the identical chain (the oracle the gate would run).

Reference behavior: HTMLStripCharFilter.jflex — inline tags emit nothing,
script/style/br collapse to '\n', comments vanish, entities decode."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.charfilter import html_strip, html_strip_sql

CASES = [
    ("plain text, no markup", "plain text, no markup"),
    ("a<b>c</b>d", "acd"),  # inline tags emit NOTHING
    ("<p class='x'>para</p>", "para"),
    ("keep <!-- comment\nspanning lines --> this", "keep  this"),
    ("x<script type=\"text/js\">var a = '<p>';</script>y", "x\ny"),
    ("x<style>p { color: red }</style>y", "x\ny"),
    ("line one<br/>line two<BR>three</br>", "line one\nline two\nthree\n"),
    ("<!DOCTYPE html><html><body>content</body></html>", "content"),
    ("5 &lt; 6 &amp;&amp; 7 &gt; 6", "5 < 6 && 7 > 6"),
    ("fish &amp;amp; chips", "fish &amp; chips"),  # one decode pass, like the scanner
    ("&#60;tag&#62; &#x3c;x&#x3e;", "<tag> <x>"),
    ("it&#39;s &quot;quoted&quot;", "it's \"quoted\""),
    ("a&nbsp;b", "a b"),
    ("<![CDATA[raw <data>]]>", "raw "),  # inner <data> is still a tag form
    ("", ""),
]


def test_html_strip_expected(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(CASES)), "html": [c[0] for c in CASES]})
    )
    got = {
        r["i"]: r["out"]
        for r in df.select("i", html_strip("html").alias("out")).collect()
    }
    for i, (src, want) in enumerate(CASES):
        assert got[i] == want, f"case {i}: {src!r} -> {got[i]!r}, want {want!r}"


def test_html_strip_matches_duckdb_oracle(spark):
    """The gate contract: Spark chain == DuckDB chain on constructed pages."""
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(CASES)), "html": [c[0] for c in CASES]})
    )
    got = df.select("i", html_strip("html").alias("out")).toPandas()
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(CASES)), "html": [c[0] for c in CASES]}))
    want = con.execute(
        f"SELECT i, {html_strip_sql('html')} AS out FROM t ORDER BY i"
    ).fetchdf()
    got = got.sort_values("i").reset_index(drop=True)
    assert list(got["out"]) == list(want["out"])


def test_html_strip_null_and_tokenize(spark):
    """NULL propagates (like token_array); stripped text tokenizes sanely."""
    from lucene_solr_spark.analysis.analyzer import token_array

    df = spark.createDataFrame(
        pd.DataFrame({"html": pd.Series([None, "<p>Fast <b>Merge</b></p>"], dtype=object)})
    )
    rows = df.select(
        token_array(html_strip("html")).alias("toks")
    ).collect()
    assert rows[0]["toks"] is None
    assert rows[1]["toks"] == ["fast", "merge"]

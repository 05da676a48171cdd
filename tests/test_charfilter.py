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


def test_full_entity_table_python():
    """Every one of the 259 reference entity names decodes to its exact
    codepoint (HTMLStripCharFilter.java:30683-30766), via the driver-side
    twin of html_strip_full."""
    from lucene_solr_spark.analysis.charfilter import html_to_text
    from lucene_solr_spark.analysis.htmlentities import HTML_ENTITY_MAP

    for name, want in HTML_ENTITY_MAP.items():
        if name == "nbsp":
            want = " "  # engine-wide nbsp→space convention (see HTML_ENTITIES)
        got = html_to_text(f"x&{name};y")
        assert got == f"x{want}y", (name, want, got)


def test_numeric_references_full_range():
    from lucene_solr_spark.analysis.charfilter import html_to_text

    assert html_to_text("&#65;&#x42;") == "AB"
    assert html_to_text("&#233;") == "é"          # Latin-1
    assert html_to_text("&#x1F600;") == "\U0001F600"  # astral plane
    assert html_to_text("&#26085;&#x672C;") == "日本"  # past Latin-1, decimal+hex
    assert html_to_text("&#0;") == "&#0;"          # invalid → literal
    assert html_to_text("&#x110000;") == "&#x110000;"
    assert html_to_text("&#xD800;") == "&#xD800;"  # surrogate guarded
    # single decode level (the scanner's one pass)
    assert html_to_text("&amp;lt;") == "&lt;"
    # uppercase variants accepted for exactly the six names
    assert html_to_text("&AMP;&LT;&GT;&QUOT;&COPY;&REG;") == '&<>"©®'
    assert html_to_text("&NBSP;") == "&NBSP;"  # not an accepted variant


def test_html_strip_full_spark(spark):
    """html_strip_full through a live plan: tag chain + full entity decode,
    byte-identical to the stored text for a webgen-style page."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.charfilter import html_strip_full

    text = "café & friends — Δx \U0001F600"
    html = (
        "<html><!-- c --><body>caf&eacute; &amp; friends &mdash; "
        "&Delta;x &#x1F600;</body></html>"
    )
    df = spark.createDataFrame([(html, text)], "html string, text string")
    row = df.select(
        html_strip_full(F.col("html")).alias("stripped"), "text"
    ).head()
    assert row.stripped == row.text  # byte-identical extracted text

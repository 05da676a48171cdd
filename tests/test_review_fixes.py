"""Regression tests for the round-3 review findings: {!term f=} stored-field
dispatch, chain-shaped connected components, HTML numeric-&amp; single-level
decode, elevate underfill, qparser error types."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.charfilter import html_strip, html_strip_sql
from lucene_solr_spark.pipeline.dedup import connected_components
from lucene_solr_spark.query.components import elevate_query
from lucene_solr_spark.query.qparser import SolrQueries, SyntaxError_


# --- connected components on a chain -------------------------------------------
def test_connected_components_long_chain_converges(spark):
    # pathological topology: 60 docs linked only pairwise (diameter 59).
    # pointer jumping must close it well inside the default round budget.
    pairs = spark.createDataFrame(
        [(f"d{i:03d}", f"d{i+1:03d}") for i in range(59)],
        "key_a string, key_b string",
    )
    out = connected_components(pairs).toPandas()
    assert len(out) == 60
    assert set(out["component"]) == {"d000"}


def test_connected_components_raises_instead_of_splitting(spark):
    pairs = spark.createDataFrame(
        [(f"d{i:03d}", f"d{i+1:03d}") for i in range(40)],
        "key_a string, key_b string",
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2)


# --- HTML strip: one decode level for numeric ampersand -------------------------
def test_html_numeric_amp_single_decode(spark):
    df = spark.createDataFrame(
        [("&#38;lt;b&#38;gt;",), ("&amp;lt;i&amp;gt;",), ("x &#38; y",),
         ("&#60;script&#62;",)],
        "text string",
    )
    got = [r.s for r in df.select(html_strip("text").alias("s")).collect()]
    # numerically-escaped entities decode ONE level, like &amp;-escaped ones
    assert got[0] == "&lt;b&gt;"
    assert got[1] == "&lt;i&gt;"
    assert got[2] == "x & y"
    # plain numeric < > decode to the characters (no tag re-strip pass runs)
    assert got[3] == "<script>"


def test_html_strip_sql_twin_matches(spark):
    import duckdb

    rows = ["&#38;lt;b&#38;gt;", "a &#38; b &amp; c", "&#x26;amp; z"]
    df = spark.createDataFrame([(r,) for r in rows], "text string")
    got = [r.s for r in df.select(html_strip("text").alias("s")).collect()]
    con = duckdb.connect()
    sql = html_strip_sql("text")
    want = [
        con.execute(f"SELECT {sql} FROM (SELECT ? AS text)", [r]).fetchone()[0]
        for r in rows
    ]
    assert got == want


# --- qparser stored-field dispatch + error types --------------------------------
@pytest.fixture(scope="module")
def ctx(spark, tmp_path_factory):
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher

    corpus = {"u0": "spark electronics", "u1": "merge table", "u2": "spark scan"}
    pages = spark.createDataFrame(list(corpus.items()), "url string, text string")
    paths = build_index(spark, pages, str(tmp_path_factory.mktemp("rf_idx")))
    source = spark.createDataFrame(
        [("u0", "books"), ("u1", "electronics"), ("u2", "electronics")],
        "url string, category string",
    )
    return SolrQueries(Searcher(spark, paths), source=source)


def _urls(ctx, hits):
    m = dict(
        ctx.searcher.docs.select("doc_id", "url").toPandas().itertuples(
            index=False, name=None
        )
    )
    return sorted(m[r.doc_id] for r in hits.collect())


def test_term_f_stored_field_not_text(ctx):
    # 'electronics' appears in u0's TEXT but u1/u2's category — f=category
    # must hit the stored field, not the text index
    got = _urls(ctx, ctx.query("{!term f=category}electronics", k=10))
    assert got == ["u1", "u2"]


def test_prefix_and_field_stored_dispatch(ctx):
    assert _urls(ctx, ctx.query("{!prefix f=category}elec", k=10)) == ["u1", "u2"]
    assert _urls(ctx, ctx.query("{!field f=category}books", k=10)) == ["u0"]


def test_term_f_text_still_scored(ctx):
    got = ctx.query("{!term f=text}spark", k=10)
    assert got.select("score").distinct().count() > 0  # BM25-scored path


def test_boost_missing_b_is_syntax_error(ctx):
    with pytest.raises(SyntaxError_):
        ctx.query("{!boost}spark")
    with pytest.raises(SyntaxError_):
        ctx.query("{!boost b=$nope}spark")


# --- elevate underfill -----------------------------------------------------------
def test_elevate_missing_key_does_not_underfill(ctx):
    s = ctx.searcher
    full = s.search(["spark"], k=10).count()
    out = elevate_query(s, ["spark"], ["zzz-not-a-doc"], k=2)
    # the unresolved pin must not consume a result slot
    assert out.count() == min(2, full)
    assert not any(r.elevated for r in out.collect())

"""Local-params parsing (QueryParsing.java:103-171), the function-expression
parser (FunctionQParser.java:221-380), and the QParser registry dispatch
(QParserPlugin.java:32-52) — parse goldens + e2e over a real index."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.query.executor import Searcher
from lucene_solr_spark.query.qparser import (
    SolrQueries,
    SyntaxError_,
    parse_function,
    parse_local_params,
)

CORPUS = {
    "u00": "spark merge fast index",
    "u01": "fast spark spark table",
    "u02": "dog bird cat",
    "u03": "fast stone merge spark",
    "u04": "stone stone dog merge",
    "u05": "spark table scan",
}
META = {  # url -> (rank, lat, lon, cat)
    "u00": (1.0, 48.85, 2.35, "a"),
    "u01": (2.0, 48.86, 2.36, "a"),
    "u02": (3.0, 40.71, -74.0, "b"),
    "u03": (4.0, 48.80, 2.30, "b"),
    "u04": (5.0, 35.68, 139.69, "c"),
    "u05": (6.0, 48.90, 2.40, "a"),
}


@pytest.fixture(scope="module")
def ctx(spark, tmp_path_factory):
    pages = spark.createDataFrame(list(CORPUS.items()), "url string, text string")
    paths = build_index(spark, pages, str(tmp_path_factory.mktemp("qp_idx")))
    searcher = Searcher(spark, paths)
    source = spark.createDataFrame(
        [(u, *META[u]) for u in sorted(CORPUS)],
        "url string, rank double, lat double, lon double, cat string",
    )
    return SolrQueries(searcher, source=source, params={"qq": "spark merge"})


def _urls(ctx, hits):
    m = dict(
        ctx.searcher.docs.select("doc_id", "url").toPandas().itertuples(
            index=False, name=None
        )
    )
    return [m[r.doc_id] for r in hits.collect()]


# --- parse_local_params goldens ------------------------------------------------
def test_local_params_bare_type():
    lp, rest = parse_local_params("{!func}recip(x,1,2,3)")
    assert lp == {"type": "func"} and rest == "recip(x,1,2,3)"


def test_local_params_keyed_and_quoted():
    lp, rest = parse_local_params("{!join from=f to=t x='a b' y=\"c\\\"d\"}body")
    assert lp == {"type": "join", "from": "f", "to": "t", "x": "a b", "y": 'c"d'}
    assert rest == "body"


def test_local_params_deref_and_v():
    lp, rest = parse_local_params("{!query v=$qq}", {"qq": "spark merge"})
    assert lp == {"type": "query", "v": "spark merge"} and rest == ""


def test_local_params_not_local():
    lp, rest = parse_local_params("plain query")
    assert lp is None and rest == "plain query"


def test_local_params_errors():
    with pytest.raises(SyntaxError_):
        parse_local_params("{!unclosed")
    with pytest.raises(SyntaxError_):
        parse_local_params("{!x=")


# --- parse_function goldens ----------------------------------------------------
def test_parse_function_shapes(spark):
    df = spark.createDataFrame([(2.0, 3.0)], "a double, b double")
    row = df.select(
        parse_function("sum(a, product(b, 2))").alias("s"),
        parse_function("recip(a, 1, 2, 1)").alias("r"),
        parse_function("max(a, b, 2.5)").alias("m"),
        parse_function("if(exists(a), a, 9)").alias("i"),
    ).collect()[0]
    assert row.s == pytest.approx(8.0)
    assert row.r == pytest.approx(2.0 / (1 * 2.0 + 1))
    assert row.m == pytest.approx(3.0)
    assert row.i == pytest.approx(2.0)


def test_parse_function_errors():
    with pytest.raises(SyntaxError_):
        parse_function("nosuchfn(a)")
    with pytest.raises(SyntaxError_):
        parse_function("sum(a")


# --- dispatch e2e ---------------------------------------------------------------
def test_default_lucene(ctx):
    got = _urls(ctx, ctx.query("spark merge", k=10))
    want = _urls(ctx, ctx.searcher.search(["spark", "merge"], k=10))
    assert got == want


def test_term_and_prefix_and_field(ctx):
    assert set(_urls(ctx, ctx.query("{!term f=text}stone", k=10))) == {"u03", "u04"}
    assert set(_urls(ctx, ctx.query("{!prefix f=text}sto", k=10))) == {"u03", "u04"}
    # field with multi-token value = phrase
    assert set(_urls(ctx, ctx.query("{!field f=text}fast spark", k=10))) == {"u01"}


def test_nested_query_deref(ctx):
    got = _urls(ctx, ctx.query("{!query v=$qq}", k=10))
    want = _urls(ctx, ctx.searcher.search(["spark", "merge"], k=10))
    assert got == want


def test_switch(ctx):
    q = "{!switch case.yes='spark' default='stone'}yes"
    assert _urls(ctx, ctx.query(q, k=10)) == _urls(ctx, ctx.searcher.search(["spark"]))
    q2 = "{!switch case.yes='spark' default='stone'}other"
    assert _urls(ctx, ctx.query(q2, k=10)) == _urls(ctx, ctx.searcher.search(["stone"]))


def test_func_query_scores_by_function(ctx):
    hits = ctx.query("{!func}sub(10, rank)", k=3)
    assert _urls(ctx, hits) == ["u00", "u01", "u02"]  # lowest rank wins


def test_frange_query_and_docset(ctx):
    ds = ctx.docset("{!frange l=2 u=4}rank")
    urls = set(_urls(ctx, ds.select("doc_id", F.lit(0.0).alias("score"))))
    assert urls == {"u01", "u02", "u03"}
    hits = ctx.query("{!frange l=2 u=4}rank", k=10)
    assert set(_urls(ctx, hits)) == {"u01", "u02", "u03"}


def test_boost_query(ctx):
    from lucene_solr_spark.functions.valuesources import boosted_topk

    got = ctx.query("{!boost b=recip(rank,1,2,1)}spark", k=10)
    bframe = ctx._doc_values(parse_function("recip(rank,1,2,1)"), "bv")
    want = boosted_topk(ctx.searcher, ["spark"], bframe, "bv", k=10)
    assert _urls(ctx, got) == _urls(ctx, want)


def test_geofilt_docset(ctx):
    ds = ctx.docset("{!geofilt pt=48.85,2.35 d=20}")
    urls = set(_urls(ctx, ds.select("doc_id", F.lit(0.0).alias("score"))))
    assert urls == {"u00", "u01", "u03", "u05"}


def test_join_docset(ctx):
    # docs sharing a cat with rank>4 docs: cat c (u04) and a (u05 rank 6)
    ds = ctx.docset("{!join from=cat to=cat}rank:[5 TO *]")
    urls = set(_urls(ctx, ds.select("doc_id", F.lit(0.0).alias("score"))))
    assert urls == {"u00", "u01", "u04", "u05"}


def test_fq_field_predicate_and_composition(ctx):
    ds = ctx.docset("cat:a")
    hits = ctx.searcher.search(["spark"], k=10, filter_docs=ds)
    assert set(_urls(ctx, hits)) <= {"u00", "u01", "u05"}


def test_maxscore_dispatch(ctx):
    got = _urls(ctx, ctx.query("{!maxscore tie=0.3}+spark merge fast", k=10))
    want = _urls(
        ctx,
        ctx.searcher.max_score_search(
            must=["spark"], should=["merge", "fast"], tie=0.3, k=10
        ),
    )
    assert got == want


def test_surround_dispatch(ctx):
    # ordered: only u03 has fast before merge within distance 2
    got = set(_urls(ctx, ctx.query("{!surround}fast 2W merge", k=10)))
    assert got == {"u03"}
    # unordered picks up u00 ("... merge fast ...") too
    got_n = set(_urls(ctx, ctx.query("{!surround}fast 2N merge", k=10)))
    assert got_n == {"u00", "u03"}


def test_unknown_parser_raises(ctx):
    with pytest.raises(SyntaxError_):
        ctx.query("{!nosuch}x")


def test_select_tagged_fq_exclusion(ctx):
    """Multi-select faceting: {!tag=}/{!ex=} — the facet over the tagged
    dimension ignores its own filter (SimpleFacets tag/ex semantics, the
    DrillSideways pattern), other facets still see it."""
    res = ctx.select({
        "q": "spark",
        "fq": ["{!tag=catf}cat:a"],
        "facet.field": ["{!ex=catf key=cats_multiselect}cat", "cat"],
        "rows": 10,
    })
    # response respects the fq: only cat=a spark docs (u00 u01 u05)
    assert res["response"]["numFound"] == 3
    # excluded facet counts over ALL spark matches (u00 u01 u03 u05)
    assert res["facet_counts"]["cats_multiselect"] == {"a": 3, "b": 1}
    # the un-excluded facet still sees the filter
    assert res["facet_counts"]["cat"] == {"a": 3}


def test_select_tagged_exclusion_stats_and_query(ctx):
    res = ctx.select({
        "q": "spark",
        "fq": ["{!tag=catf}cat:a"],
        "facet.query": {"{!ex=catf key=highrank}rank:[4 TO *]": "rank:[4 TO *]"},
        "stats.field": "{!ex=catf key=rank_all}rank",
        "rows": 0,
    })
    # u03 (rank 4) is outside cat:a but counts with the filter excluded
    assert res["facet_counts"]["facet_queries"]["highrank"] == 2
    st = res["stats"]["rank_all"]
    assert st["cnt"] == 4 and st["max_v"] == 6.0


def test_select_facet_range_with_exclusion(ctx):
    res = ctx.select({
        "q": "spark",
        "fq": ["{!tag=catf}cat:a"],
        "facet.range": ["{!ex=catf key=ranks}rank"],
        "facet.range.gap": 2.0,
        "rows": 0,
    })
    # spark matches u00(1.0) u01(2.0) u03(4.0) u05(6.0), filter excluded
    assert res["facet_counts"]["facet_ranges"]["ranks"] == {
        0.0: 1, 2.0: 1, 4.0: 1, 6.0: 1}


def test_select_full_component_stack(ctx, spark):
    """One request exercising grouping + pivot + highlighting + debug +
    spellcheck alongside the query (SearchHandler's component chain).
    Uses a source carrying the stored text (what hl highlights)."""
    source = spark.createDataFrame(
        [(u, *META[u], CORPUS[u]) for u in sorted(CORPUS)],
        "url string, rank double, lat double, lon double, cat string, text string",
    )
    ctx = SolrQueries(ctx.searcher, source=source)
    res = ctx.select({
        "q": "spark merge",
        "rows": 3,
        "facet.pivot": "cat",
        "group": "true",
        "group.field": "cat",
        "group.sort": "rank asc",
        "hl": "true",
        "hl.fl": "text",
        "debugQuery": "true",
        "spellcheck": "true",
        "spellcheck.q": "spak",
    })
    docs = res["response"]["docs"]
    assert docs, "query returned hits"
    # pivot counts cover the match set
    pivot = {r["cat"]: r["count"] for r in
             res["facet_counts"]["facet_pivot"]["cat"]}
    assert sum(pivot.values()) == res["response"]["numFound"]
    # grouping: one top doc per cat by rank asc
    grouped = res["grouped"]["cat"]
    assert grouped["matches"] == res["response"]["numFound"]
    for g in grouped["groups"]:
        ranks = [d["rank"] for d in g["doclist"]]
        assert ranks == sorted(ranks)
    # highlighting covers every returned doc with an <em> span
    for d in docs:
        snip = res["highlighting"][d["doc_id"]]["text"]
        assert snip and "<em>" in snip
    # debug explain is float32-identical to the hit scores
    for d in docs:
        exp = res["debug"]["explain"][d["doc_id"]]
        assert abs(exp["value"] - d["score"]) < 1e-6
    # spellcheck suggests the real term
    words = [s["word"] for s in res["spellcheck"]["suggestions"]["spak"]]
    assert "spark" in words


def test_select_mlt(ctx, spark):
    source = spark.createDataFrame(
        [(u, *META[u], CORPUS[u]) for u in sorted(CORPUS)],
        "url string, rank double, lat double, lon double, cat string, text string",
    )
    ctx = SolrQueries(ctx.searcher, source=source)
    res = ctx.select({"q": "merge", "rows": 1, "mlt": "true",
                      "mlt.fl": "text", "mlt.count": 3})
    (seed_id, mlt), = res["moreLikeThis"].items()
    assert mlt["interestingTerms"]
    assert all(d["doc_id"] != seed_id for d in mlt["docs"])
    assert len(mlt["docs"]) >= 1


def test_select_response_wt_formats(ctx):
    # wt=json: parseable, Solr envelope, facet NamedList flat by default
    import json as _json

    out = ctx.select_response({
        "q": "spark", "rows": 3, "fl": "cat",
        "facet.field": "cat", "wt": "json"})
    data = _json.loads(out)
    assert data["responseHeader"]["status"] == 0
    assert data["response"]["numFound"] == 4
    assert len(data["response"]["docs"]) == 3
    flat = data["facet_counts"]["facet_fields"]["cat"]
    assert flat[0::2] == ["a", "b"] and flat[1::2] == [3, 1]

    # wt=xml: typed envelope
    out = ctx.select_response({"q": "spark", "rows": 1, "wt": "xml"})
    assert out.startswith('<?xml version="1.0" encoding="UTF-8"?>')
    assert 'numFound="4"' in out and "<doc>" in out

    # wt=csv: fl-ordered columns
    out = ctx.select_response({
        "q": "spark", "rows": 2, "fl": "cat", "wt": "csv",
        "csv.header": "true"})
    lines = out.splitlines()
    assert lines[0].split(",")[:2] == ["doc_id", "score"] or "cat" in lines[0]

    # wt=python: eval round-trip
    out = ctx.select_response({
        "q": "spark", "rows": 1, "wt": "python", "omitHeader": "true"})
    assert eval(out)["response"]["numFound"] == 4


def test_response_log_component(ctx):
    # ResponseLogComponent: responseLog=true adds 'key:score,...' over
    # the returned page (ResponseLogComponent.java processScores)
    res = ctx.select({"q": "spark", "rows": 2, "responseLog": "true"})
    entries = res["responseLog"].split(",")
    assert len(entries) == 2
    for e in entries:
        key, score = e.rsplit(":", 1)
        assert key.startswith("u")
        float(score)
    res2 = ctx.select({"q": "spark", "rows": 2})
    assert "responseLog" not in res2

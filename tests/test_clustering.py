"""ClusteringComponent tests: STC search-result clustering (response shape
per CarrotClusteringEngine.clustersToNamedList) and the distributed
DocumentClusteringEngine analog."""

import pytest

from lucene_solr_spark.query.clustering import (
    cluster_collection, cluster_hits, cluster_search_results,
    doc_term_weights, hashed_tfidf_vectors,
)

SNIPPETS = {
    1: "Apache Lucene is a search library written in Java",
    2: "Apache Lucene search performance and indexing speed",
    3: "Lucene search library for full text indexing",
    4: "Salmon fishing in the river during autumn season",
    5: "River salmon fishing techniques and autumn tips",
    6: "Cooking pasta with tomato sauce at home",
}


def test_stc_groups_shared_phrases():
    clusters = cluster_search_results(SNIPPETS)
    assert clusters, "no clusters produced"
    # top cluster: the lucene/search docs (3 docs sharing phrases)
    top = clusters[0]
    assert set(top["docs"]) == {1, 2, 3}
    assert any("lucene" in l for l in top["labels"])
    # the fishing pair clusters together
    fishing = next(c for c in clusters if set(c["docs"]) == {4, 5})
    assert any("fishing" in l or "salmon" in l for l in fishing["labels"])
    # doc 6 shares nothing → Other Topics, flagged like Carrot2's synthetic
    other = clusters[-1]
    assert other["labels"] == ["Other Topics"] and other.get("other-topics")
    assert 6 in other["docs"]
    # response shape: labels/score/docs on every cluster
    for c in clusters:
        assert set(c) >= {"labels", "score", "docs"}


def test_stc_label_subphrase_dedup():
    snips = {
        1: "big data processing engine",
        2: "big data processing engine",
    }
    labels = cluster_search_results(snips)[0]["labels"]
    # "big data" must not appear alongside "big data processing" etc.
    for i, a in enumerate(labels):
        for b in labels[i + 1 :]:
            assert a not in b and b not in a


def test_stc_no_shared_phrases():
    clusters = cluster_search_results({1: "alpha beta", 2: "gamma delta"})
    assert len(clusters) == 1
    assert clusters[0]["labels"] == ["Other Topics"]
    assert clusters[0]["docs"] == [1, 2]
    assert cluster_search_results({}) == []


def test_cluster_hits_component_flow(spark, tmp_path):
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher

    rows = [(f"u{k}", text) for k, text in SNIPPETS.items()]
    pages = spark.createDataFrame(rows, "url string, text string")
    idx = build_index(spark, pages, str(tmp_path / "idx"))
    s = Searcher(spark, idx)
    # carrot.snippet reads the STORED field: doc_id ↔ text via the source
    docs = spark.read.parquet(idx.docs).select("doc_id", "url").join(pages, "url")
    clusters = cluster_hits(s, "lucene search fishing salmon", docs, rows=6)
    assert clusters
    all_ids = {d for c in clusters for d in c["docs"]}
    # every clustered id is a real hit doc_id
    hit_ids = {int(h["doc_id"]) for h in s.search("lucene search fishing salmon", k=6).collect()}
    assert all_ids <= hit_ids


def test_select_facade_clustering(spark, tmp_path):
    """/select with clustering=true attaches the "clusters" key, clustering
    the returned page over carrot.snippet."""
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher
    from lucene_solr_spark.query.qparser import SolrQueries

    rows = [(f"u{k}", text) for k, text in SNIPPETS.items()]
    pages = spark.createDataFrame(rows, "url string, text string")
    idx = build_index(spark, pages, str(tmp_path / "idx"))
    facade = SolrQueries(Searcher(spark, idx), source=pages)
    resp = facade.select({
        "q": "lucene search fishing salmon river",
        "rows": 6,
        "clustering": "true",
        "carrot.snippet": "text",
    })
    assert "clusters" in resp and resp["clusters"]
    page_ids = {d["doc_id"] for d in resp["response"]["docs"]}
    for c in resp["clusters"]:
        assert set(c["docs"]) <= page_ids
        assert c["labels"]
    # component off by default / with clustering.results=false
    resp2 = facade.select({"q": "lucene", "rows": 3})
    assert "clusters" not in resp2
    resp3 = facade.select({
        "q": "lucene", "rows": 3,
        "clustering": "true", "clustering.results": "false",
    })
    assert "clusters" not in resp3
    # carrot.produceSummary clusters the query-focused highlighter
    # summaries instead of the full field
    resp4 = facade.select({
        "q": "lucene search fishing salmon river",
        "rows": 6,
        "clustering": "true",
        "carrot.produceSummary": "true",
        "carrot.fragSize": 80,
    })
    assert "clusters" in resp4 and resp4["clusters"]


def test_hashed_vectors_shape_and_plan(spark):
    docs = spark.createDataFrame(
        [(k, t) for k, t in SNIPPETS.items()], "doc_id long, text string"
    )
    w = doc_term_weights(docs)
    vecs = hashed_tfidf_vectors(w, dim=32)
    rows = vecs.collect()
    assert len(rows) == len(SNIPPETS)
    assert all(len(r["vector"]) == 32 for r in rows)
    assert all(any(abs(v) > 0 for v in r["vector"]) for r in rows)
    # stopwords excluded from the weight rows
    assert w.where("term = 'the'").count() == 0
    plan = vecs._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cluster_collection_separates_topics(spark):
    # two clearly-separated vocabularies, several docs each
    lucene = [
        "lucene search index query term ranking",
        "search index lucene scoring query boost",
        "index segment lucene merge query search",
        "query parser lucene search index terms",
    ]
    cooking = [
        "pasta tomato sauce garlic olive oil",
        "tomato garlic pasta recipe sauce dinner",
        "sauce pasta olive garlic tomato basil",
        "recipe dinner pasta sauce tomato oil",
    ]
    rows = [(i, t) for i, t in enumerate(lucene + cooking)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assigned, labels = cluster_collection(docs, k=2, dim=128, n_labels=4)
    a = {r["doc"]: r["cluster"] for r in assigned.collect()}
    lucene_clusters = {a[i] for i in range(4)}
    cooking_clusters = {a[i] for i in range(4, 8)}
    assert len(lucene_clusters) == 1 and len(cooking_clusters) == 1
    assert lucene_clusters != cooking_clusters
    lc, cc = lucene_clusters.pop(), cooking_clusters.pop()
    assert "lucene" in labels[lc] or "search" in labels[lc]
    assert "pasta" in labels[cc] or "tomato" in labels[cc]

"""ClusteringComponent (solr/contrib/clustering) — search-result and
whole-collection clustering.

Reference surface: ClusteringComponent.java:57 dispatches to a
SearchClusteringEngine (clusters ONE page of results — the default
`clustering.results=true` mode) or a DocumentClusteringEngine
(`clustering.collection=true`); CarrotClusteringEngine.java:551-599
shapes the response as a list of clusters, each carrying `labels`
(≤ carrot.numDescriptions phrases), `score`, optional `other-topics`,
and `docs` (ids). The Carrot2 algorithms themselves live in an external
jar the reference does not ship (same situation as kuromoji's binary
dictionary), so the engines here are honest re-implementations:

- `cluster_search_results`: Suffix Tree Clustering in the published
  Zamir & Etzioni '98 form (shared-phrase base clusters, score
  |B|·f(|P|), >50%-overlap merge into connected components) — run
  driver-side over the ≤rows snippets of one result page, exactly like
  the Solr component (the engine never sees more than a page).
- `cluster_collection`: the DocumentClusteringEngine analog, Spark-first
  and 100 TB-shaped — tf·idf doc vectors feature-hashed into a dense
  `dim`-array (pure column expressions), spherical k-means via the IVF
  quantizer machinery (pipeline/similarity.py: deterministic hash
  sample → driver Lloyd's → Arrow-batched assignment), labels = top
  summed-tf·idf terms per cluster (one groupBy).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from ..analysis.analyzer import standard_tokenize

# --- SearchClusteringEngine: STC over one result page -----------------------

_MAX_PHRASE = 3  # STC base clusters: phrases of 1..3 words
_MERGE_OVERLAP = 0.5  # Zamir & Etzioni's 0.5 binary-similarity threshold


def _phrase_score(n_docs: int, phrase_len: int) -> float:
    # s(B) = |B| · f(|P|): single words penalized, credit grows to 6 words
    f = 0.5 if phrase_len == 1 else float(min(phrase_len, 6))
    return n_docs * f


def _base_clusters(snippets: dict) -> dict:
    """phrase (token tuple) → set of doc ids, phrases shared by ≥2 docs."""
    by_phrase: dict[tuple, set] = defaultdict(set)
    for doc_id, text in snippets.items():
        toks = [t for _, t in standard_tokenize(text or "")]
        for n in range(1, _MAX_PHRASE + 1):
            for i in range(len(toks) - n + 1):
                by_phrase[tuple(toks[i : i + n])].add(doc_id)
    return {p: d for p, d in by_phrase.items() if len(d) >= 2}


def cluster_search_results(
    snippets: dict,
    num_descriptions: int = 5,
    max_clusters: int = 10,
    include_other_topics: bool = True,
) -> list[dict]:
    """STC over `{doc_id: snippet_text}` → Solr-shaped cluster list
    (CarrotClusteringEngine.clustersToNamedList): [{"labels": [...],
    "score": float, "docs": [ids]}, …, {"labels": ["Other Topics"],
    "other-topics": True, "docs": [...]}]."""
    base = _base_clusters(snippets)
    if not base:
        out = []
        if include_other_topics and snippets:
            out.append({
                "labels": ["Other Topics"], "score": 0.0,
                "other-topics": True, "docs": sorted(snippets),
            })
        return out

    phrases = sorted(
        base,
        key=lambda p: (-_phrase_score(len(base[p]), len(p)), p),
    )
    # merge: >50% mutual overlap edges → connected components
    parent = {p: p for p in phrases}

    def find(p):
        while parent[p] != p:
            parent[p] = parent[parent[p]]
            p = parent[p]
        return p

    for i, a in enumerate(phrases):
        da = base[a]
        for b in phrases[i + 1 :]:
            db = base[b]
            inter = len(da & db)
            if inter / len(da) > _MERGE_OVERLAP and inter / len(db) > _MERGE_OVERLAP:
                parent[find(b)] = find(a)

    merged: dict = defaultdict(lambda: {"phrases": [], "docs": set(), "score": 0.0})
    for p in phrases:
        root = find(p)
        m = merged[root]
        m["phrases"].append(p)
        m["docs"] |= base[p]
        m["score"] += _phrase_score(len(base[p]), len(p))

    clusters = sorted(merged.values(), key=lambda m: (-m["score"], m["phrases"][0]))
    out, covered = [], set()
    for m in clusters[:max_clusters]:
        # labels: the highest-scoring phrases, sub-phrases of a chosen
        # label suppressed (Carrot2's label-dedup behavior)
        labels: list[str] = []
        for p in m["phrases"]:
            text = " ".join(p)
            if any(text in l or l in text for l in labels):
                continue
            labels.append(text)
            if len(labels) >= num_descriptions:
                break
        out.append({
            "labels": labels,
            "score": round(m["score"], 4),
            "docs": sorted(m["docs"]),
        })
        covered |= m["docs"]
    rest = sorted(set(snippets) - covered)
    if include_other_topics and rest:
        out.append({
            "labels": ["Other Topics"], "score": 0.0,
            "other-topics": True, "docs": rest,
        })
    return out


def cluster_hits(
    searcher,
    query: str,
    docs: DataFrame,
    rows: int = 10,
    snippet_field: str = "text",
    key_col: str = "doc_id",
    num_descriptions: int = 5,
) -> list[dict]:
    """The `clustering.results=true` component flow: search top-`rows`,
    fetch their carrot.snippet field, cluster the page. Output doc ids are
    the engine ids (doc_id), like SOLR_DOCUMENT_ID carries the uniqueKey."""
    hits = searcher.search(query, k=rows).collect()
    if not hits:
        return []
    ids = [int(h["doc_id"]) for h in hits]
    rows_ = (
        docs.where(F.col(key_col).isin(ids))
        .select(key_col, snippet_field)
        .collect()
    )
    snippets = {int(r[key_col]): r[snippet_field] for r in rows_}
    return cluster_search_results(snippets, num_descriptions=num_descriptions)


# --- DocumentClusteringEngine: distributed k-means over tf·idf --------------


def doc_term_weights(
    docs: DataFrame, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """(doc, term, w): ltc-style tf·idf — (1+ln tf)·ln(1+N/df) — entirely
    in column expressions (explode → two map-side-combinable groupBys)."""
    from ..analysis.analyzer import (
        ENGLISH_STOP_WORDS, MAX_TOKEN_LENGTH, token_array_for,
    )

    n_docs = docs.count()
    toks = docs.select(
        F.col(key_col).alias("doc"),
        F.explode(token_array_for(F.col(text_col))).alias("term"),
    ).where(
        ~F.col("term").isin(*sorted(ENGLISH_STOP_WORDS))
        & (F.length("term") <= MAX_TOKEN_LENGTH)
    )
    tf = toks.groupBy("doc", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    return (
        tf.join(F.broadcast(df_), "term")
        .select(
            "doc",
            "term",
            (
                (F.lit(1.0) + F.log(F.col("tf").cast("double")))
                * F.log(F.lit(1.0) + F.lit(float(n_docs)) / F.col("df"))
            ).alias("w"),
        )
    )


def hashed_tfidf_vectors(
    weights: DataFrame, dim: int = 128, key_col: str = "doc"
) -> DataFrame:
    """Feature-hash (term → xxhash64 % dim/2, sign from an independent
    hash) the sparse tf·idf rows into a dense `vector` array column — the
    published hashing-trick, pure column expressions, so the k-means input
    needs no vocabulary dictionary and no Python. Each term lands in TWO
    independently-hashed halves of the vector (the multiple-hashing
    variance reduction from the feature-hashing literature): a colliding
    pair that cancels in one half survives in the other."""
    half = max(1, dim // 2)
    entries = []
    for seed in (0, 1):
        h = F.xxhash64("term", F.lit(seed))
        slot = (F.pmod(h, F.lit(half)).cast("int") + F.lit(seed * half)).alias("slot")
        sgn = F.when(
            F.pmod(F.xxhash64("term", F.lit(seed + 2)), F.lit(2)) == 0, F.lit(1.0)
        ).otherwise(F.lit(-1.0))
        entries.append((slot, sgn))
    exploded = weights.select(
        key_col,
        "w",
        F.explode(
            F.array(*[F.struct(slot, sgn.alias("sgn")) for slot, sgn in entries])
        ).alias("e"),
    )
    by_slot = (
        exploded.groupBy(key_col, F.col("e.slot").alias("slot"))
        .agg(F.sum(F.col("w") * F.col("e.sgn")).alias("v"))
    )
    return (
        by_slot.groupBy(key_col)
        .agg(F.map_from_entries(F.collect_list(F.struct("slot", "v"))).alias("m"))
        .select(
            key_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda d: F.coalesce(F.element_at("m", d), F.lit(0.0)),
            ).alias("vector"),
        )
    )


def cluster_collection(
    docs: DataFrame,
    k: int,
    dim: int = 128,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_labels: int = 5,
    iters: int = 10,
) -> tuple[DataFrame, dict[int, list[str]]]:
    """DocumentClusteringEngine analog: returns (assignments DataFrame
    (doc, cluster), labels {cluster: top terms}). Centroid training
    collects only a deterministic hash-sample (ivf_train_centroids);
    assignment is one Arrow-batched matrix product; labels one groupBy."""
    from ..pipeline.similarity import ivf_assign, ivf_train_centroids

    w = doc_term_weights(docs, text_col=text_col, key_col=key_col)
    vecs = hashed_tfidf_vectors(w, dim=dim)
    cents = ivf_train_centroids(
        vecs, n_centroids=k, dim=dim, vec_col="vector", key_col="doc",
        iters=iters,
    )
    assigned = ivf_assign(vecs, cents, vec_col="vector").select(
        "doc", F.col("list_id").alias("cluster")
    )
    top = (
        w.join(assigned, "doc")
        .groupBy("cluster", "term")
        .agg(F.sum("w").alias("tw"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("cluster").orderBy(F.desc("tw"), "term")
            ),
        )
        .where(F.col("rank") <= n_labels)
        .orderBy("cluster", "rank")
        .collect()
    )
    labels: dict[int, list[str]] = defaultdict(list)
    for r in top:
        labels[int(r["cluster"])].append(r["term"])
    return assigned, dict(labels)

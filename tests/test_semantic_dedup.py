"""SemDeDup-style semantic dedup: planted near-duplicate clusters are
collapsed to one representative (lowest centroid-cosine member), distinct
items survive, results identical at any parallelism."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_spark.pipeline.dedup import semantic_dedup
from lucene_solr_spark.pipeline.similarity import ivf_train_centroids


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


def _corpus():
    """3 well-separated directions; per direction one near-dup group of 3
    (pairwise cos > 0.99) plus 2 distinct members (cos < 0.9 to anything)."""
    rng = np.random.default_rng(5)
    dim = 16
    bases = [np.eye(dim)[i] for i in (0, 5, 11)]
    rows = []
    vid = 0
    for b in bases:
        group = _unit(b + 0.02 * rng.standard_normal(dim))
        for _ in range(3):  # near-identical triplet
            rows.append((vid, (_unit(group + 0.005 * rng.standard_normal(dim))).tolist()))
            vid += 1
        for _ in range(2):  # distinct members of the same cluster
            rows.append((vid, (_unit(b + 0.45 * rng.standard_normal(dim))).tolist()))
            vid += 1
    return rows, dim


@pytest.fixture(scope="module")
def planted(spark):
    rows, dim = _corpus()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = ivf_train_centroids(emb, n_centroids=3, dim=dim, max_sample=1000, seed=3)
    return emb, cents, rows


def test_near_dup_triplets_collapse(planted):
    emb, cents, rows = planted
    out = semantic_dedup(emb, cents, threshold=0.95).toPandas()
    assert len(out) == len(rows)
    # each planted triplet (ids 0-2, 5-7, 10-12) shares one canonical
    for start in (0, 5, 10):
        trip = out[out["key"].isin(range(start, start + 3))]
        assert trip["canonical"].nunique() == 1
        assert trip["is_duplicate"].sum() == 2  # one survivor per triplet
        assert (trip["canonical"].iloc[0] in range(start, start + 3))


def test_distinct_members_survive(planted):
    emb, cents, rows = planted
    out = semantic_dedup(emb, cents, threshold=0.95).toPandas()
    distinct_ids = [3, 4, 8, 9, 13, 14]
    d = out[out["key"].isin(distinct_ids)]
    assert (~d["is_duplicate"]).all()
    assert (d["canonical"] == d["key"]).all()


def test_representative_is_lowest_centroid_cosine(planted):
    emb, cents, rows = planted
    out = semantic_dedup(emb, cents, threshold=0.95).toPandas()
    vecs = {k: _unit(v) for k, v in rows}
    for start in (0, 5, 10):
        trip = out[out["key"].isin(range(start, start + 3))]
        rep = int(trip["canonical"].iloc[0])
        lid = int(trip["list_id"].iloc[0])
        c = cents[lid]
        sims = {k: float(vecs[k] @ c) for k in range(start, start + 3)}
        expect = min(sims, key=lambda k: (sims[k], k))
        assert rep == expect


def test_parallelism_invariance(spark, planted):
    emb, cents, rows = planted
    a = (
        semantic_dedup(emb.repartition(1), cents, threshold=0.95)
        .toPandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    b = (
        semantic_dedup(emb.repartition(8), cents, threshold=0.95)
        .toPandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_threshold_one_keeps_everything_but_exact(planted):
    emb, cents, rows = planted
    out = semantic_dedup(emb, cents, threshold=0.999999).toPandas()
    assert out["is_duplicate"].sum() == 0  # nothing is that similar


def test_max_cluster_subsplit_still_covers_all_rows(planted):
    emb, cents, rows = planted
    out = semantic_dedup(emb, cents, threshold=0.95, max_cluster=2).toPandas()
    # sub-splitting bounds matrix size; coverage stays total and the rule
    # "duplicates only ever point at a same-cluster canonical" holds
    assert len(out) == len(rows)
    assert set(out["key"]) == {k for k, _ in rows}

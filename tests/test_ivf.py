"""IVF ANN: deterministic coarse quantizer, partitioned inverted lists,
probe-pruned top-k with recall vs the exhaustive scan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.pipeline import similarity


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def test_centroids_deterministic(spark, emb):
    dim = len(emb.select("embedding").head()[0])
    c1 = similarity.ivf_train_centroids(emb, 8, dim, max_sample=500, iters=5)
    c2 = similarity.ivf_train_centroids(emb, 8, dim, max_sample=500, iters=5)
    assert np.array_equal(c1, c2)
    # spherical: unit-norm centroids
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_ivf_recall_and_pruning(spark, emb, tmp_path):
    """Recall where the IVF premise holds: real near-neighbors (planted
    dups of the query, as in test_ann_recall_planted_neardups — on a
    uniform-random corpus every ANN method degrades to chance)."""
    dim = len(emb.select("embedding").head()[0])
    q = np.asarray(
        emb.where(F.col("vec_id") == 0).select("embedding").head()[0],
        dtype=np.float64,
    )
    rng = np.random.RandomState(3)
    planted = [
        (10_000 + i, [float(np.float32(x)) for x in q + rng.randn(dim) * 0.02], 99)
        for i in range(12)
    ]
    emb = emb.unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<float>, label int")
    )
    n_lists = 8
    cents = similarity.ivf_train_centroids(emb, n_lists, dim, max_sample=500, iters=5)
    assigned = similarity.ivf_assign(emb, cents)
    path = str(tmp_path / "ivf")
    similarity.write_ivf_partitioned(assigned, path)

    exact = list(
        similarity.cosine_topk(emb, list(map(float, q)), k=10).toPandas()["vec_id"]
    )
    # full probe == exhaustive: identical top-k set
    full = list(
        similarity.ivf_topk(
            spark, path, q, cents, k=10, nprobe=n_lists, decimal_rerank=True
        ).toPandas()["vec_id"]
    )
    assert full == exact

    # nprobe=3: the planted near-dups share the query's list, so recall ≥
    # 0.9 while scanning a strict subset
    approx = set(
        similarity.ivf_topk(spark, path, q, cents, k=10, nprobe=3).toPandas()["vec_id"]
    )
    recall = len(set(exact) & approx) / 10
    assert recall >= 0.9, f"recall@10 = {recall}"

    # partition pruning is physical: the probed scan reads < all rows and
    # the plan carries a list_id partition filter
    qn = q / np.linalg.norm(q)
    order = np.argsort(-(cents @ qn), kind="stable")
    lists = sorted(int(j) for j in order[:3])
    scan = spark.read.parquet(path).where(F.col("list_id").isin(lists))
    assert scan.count() < emb.count()
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan

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


def test_pq_encode_roundtrip_quality(spark, emb):
    """PQ codes must reconstruct well enough that ADC ranks a vector's OWN
    code closest to itself; codebooks deterministic."""
    dim = len(emb.select("embedding").head()[0])
    b1 = similarity.pq_train_codebooks(emb, dim, m_subvectors=8, n_codes=16,
                                       max_sample=400, iters=5)
    b2 = similarity.pq_train_codebooks(emb, dim, m_subvectors=8, n_codes=16,
                                       max_sample=400, iters=5)
    assert np.array_equal(b1, b2)
    enc = similarity.pq_encode(emb.limit(50), b1).toPandas()
    assert set(len(c) for c in enc["pq_code"]) == {8}
    # reconstruction correlates with the original (sanity, not exactness)
    row = enc.iloc[0]
    x = np.asarray(row["embedding"], dtype=np.float64)
    x = x / np.linalg.norm(x)
    rec = np.concatenate([b1[mi, int(code)] for mi, code in enumerate(row["pq_code"])])
    # 16 codes/subspace is coarse: require reconstruction to beat a wrong
    # codeword by a clear margin rather than an absolute bar
    wrong = np.concatenate(
        [b1[mi, (int(code) + 7) % 16] for mi, code in enumerate(row["pq_code"])]
    )
    assert float(x @ rec) > 0.3
    assert float(x @ rec) > float(x @ wrong)


def test_ivf_pq_topk_recall(spark, emb, tmp_path):
    dim = len(emb.select("embedding").head()[0])
    q = np.asarray(
        emb.where(F.col("vec_id") == 0).select("embedding").head()[0],
        dtype=np.float64,
    )
    rng = np.random.RandomState(3)
    planted = [
        (20_000 + i, [float(np.float32(x)) for x in q + rng.randn(dim) * 0.02], 99)
        for i in range(12)
    ]
    emb2 = emb.unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<float>, label int")
    )
    n_lists = 8
    cents = similarity.ivf_train_centroids(emb2, n_lists, dim, max_sample=500, iters=5)
    books = similarity.pq_train_codebooks(emb2, dim, m_subvectors=8, n_codes=64,
                                          max_sample=500, iters=5)
    coded = similarity.pq_encode(similarity.ivf_assign(emb2, cents), books)
    path = str(tmp_path / "ivfpq")
    coded.write.mode("overwrite").partitionBy("list_id").parquet(path)

    exact = list(
        similarity.cosine_topk(emb2, list(map(float, q)), k=10).toPandas()["vec_id"]
    )
    got = list(
        similarity.ivf_pq_topk(
            spark, path, q, cents, books, k=10, nprobe=3, rerank=100
        ).toPandas()["vec_id"]
    )
    # exact rerank over the ADC shortlist: high overlap with the true top-10
    assert len(set(got) & set(exact)) >= 9
    # the ADC-only path still finds the planted cluster
    adc = similarity.ivf_pq_topk(
        spark, path, q, cents, books, k=10, nprobe=3, rerank=0
    ).toPandas()
    assert (adc["vec_id"] >= 20_000).sum() >= 8

"""Training-data pipeline operators: dedup (exact/MinHash/SimHash/Jaccard),
similarity search (brute force vs LSH ANN), multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.pipeline import dedup, multimodal, similarity


@pytest.fixture(scope="module")
def docs(spark):
    sent = "the quick brown fox jumps over lazy dog while spark shuffles postings "
    base = sent * 4
    # single-token change in one of the four repeats → near-dup
    near = sent * 3 + sent.replace("lazy", "sleepy")
    far = "completely different content about database query optimization engines"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, near),  # near dup of 0
        (3, far),
        (4, far + " with extra tail tokens appended here"),
        (5, "tiny"),  # too short for shingles
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs).orderBy("doc_id").toPandas()
    assert len(out) == 5  # 6 docs, one exact dup
    assert out.loc[out["doc_id"] == 0, "n_copies"].iloc[0] == 2


def test_shingles_short_doc_empty(docs):
    sh = dedup.shingles(docs).where(F.col("doc_id") == 5)
    assert sh.count() == 0


def test_minhash_exact_dup_identical_signature(docs):
    sigs = dedup.minhash_signatures(docs).orderBy("doc_id").toPandas()
    s0 = sigs[sigs["doc_id"] == 0].iloc[0, 1:].tolist()
    s1 = sigs[sigs["doc_id"] == 1].iloc[0, 1:].tolist()
    assert s0 == s1
    assert 5 not in sigs["doc_id"].tolist()  # shingle-less doc has no signature


def test_minhash_lsh_finds_dups(docs):
    sigs = dedup.minhash_signatures(docs)
    pairs = dedup.minhash_lsh_pairs(sigs).toPandas()
    got = {(int(a), int(b)): j for a, b, j in pairs.itertuples(index=False)}
    assert got.get((0, 1)) == 1.0  # exact dup: all signatures match
    # near dup found with high estimated jaccard
    assert (0, 2) in got or (1, 2) in got


def test_ngram_jaccard_verifies(spark, docs):
    sigs = dedup.minhash_signatures(docs)
    pairs = dedup.minhash_lsh_pairs(sigs)
    verified = dedup.ngram_jaccard(docs, pairs).toPandas()
    j = {(int(a), int(b)): v for a, b, v in verified.itertuples(index=False)}
    assert j[(0, 1)] == 1.0
    if (0, 2) in j:
        assert 0.3 < j[(0, 2)] < 1.0


def test_simhash_near_pairs(docs):
    fps = dedup.simhash(docs)
    pairs = dedup.simhash_near_pairs(fps, max_hamming=10).toPandas()
    got = {(int(a), int(b)): h for a, b, h in pairs.itertuples(index=False)}
    assert got.get((0, 1)) == 0  # identical text → identical fingerprint
    assert (0, 2) in got  # near dup within hamming budget
    assert (0, 3) not in got  # unrelated docs differ in many bits


def test_simhash_deterministic_across_parallelism(spark, docs):
    a = dedup.simhash(docs.repartition(1)).orderBy("doc_id").toPandas()
    b = dedup.simhash(docs.repartition(7)).orderBy("doc_id").toPandas()
    assert a["simhash"].tolist() == b["simhash"].tolist()


# --- similarity -------------------------------------------------------------
@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(0)
    centers = rng.randn(4, 16) * 3
    rows = []
    for i in range(200):
        c = i % 4
        v = centers[c] + rng.randn(16) * 0.1
        rows.append((i, [float(np.float32(x)) for x in v], c))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_cosine_topk_matches_numpy_oracle(vectors):
    pdf = vectors.orderBy("vec_id").toPandas()
    m = np.stack(pdf["embedding"].values).astype(np.float64)
    q = m[0]
    cos = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(cos)), key=lambda i: (-cos[i], i))[:10]

    got = similarity.cosine_topk(vectors, list(q), k=10).toPandas()
    assert got["vec_id"].tolist() == order
    np.testing.assert_allclose(got["cosine"].values, cos[order], rtol=1e-9)

    got2 = similarity.cosine_topk_pandas(vectors, q, k=10).toPandas()
    assert got2["vec_id"].tolist() == order


def test_ann_lsh_recall(vectors):
    pdf = vectors.orderBy("vec_id").toPandas()
    q = np.stack(pdf["embedding"].values)[0].astype(np.float64)
    exact = set(similarity.cosine_topk_pandas(vectors, q, k=10).toPandas()["vec_id"])

    signed = similarity.add_lsh_signature(vectors, dim=16, n_planes=12)
    approx = set(
        similarity.ann_lsh_topk(signed, q, k=10, n_planes=12, probe_hamming=2)
        .toPandas()["vec_id"]
    )
    recall = len(exact & approx) / 10
    assert recall >= 0.6  # clustered data, multiprobe → decent recall
    # candidates actually pruned vs full corpus
    probes_all = signed.select("signature").distinct().count()
    assert probes_all > 1


def test_ann_recall_planted_neardups(spark):
    """Recall ≥0.9 where the LSH premise holds: near-duplicate neighbors.
    sf0.01 embeddings + 12 planted dups of vec 0 (cos ≥ ~0.99); the MD5
    sign-plane pipeline (the gate's exact configuration) must recover ≥9 of
    the true top-10 while scanning a sub-linear candidate set."""
    base = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = np.asarray(
        base.where(F.col("vec_id") == 0).select("embedding").head()[0],
        dtype=np.float64,
    )
    rng = np.random.RandomState(3)
    planted = [
        (10_000 + i, [float(np.float32(x)) for x in q + rng.randn(len(q)) * 0.02], 99)
        for i in range(12)
    ]
    emb = base.unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<float>, label int")
    )
    planes = similarity.md5_sign_planes(dim=len(q), n_planes=12)
    signed = similarity.add_lsh_signature(
        emb, dim=len(q), n_planes=12, planes=planes
    ).persist()
    exact = set(
        similarity.cosine_topk(emb, list(map(float, q)), k=10).toPandas()["vec_id"]
    )
    approx = set(
        similarity.ann_lsh_topk(
            signed, q, k=10, n_planes=12, probe_hamming=2, planes=planes
        ).toPandas()["vec_id"]
    )
    recall = len(exact & approx) / 10
    assert recall >= 0.9, f"recall@10 = {recall}"
    # the probe set must prune: candidates < 40% of the corpus
    qsig = 0
    for b, v in enumerate(planes @ q >= 0):
        qsig |= int(v) << b
    probes = {qsig} | {qsig ^ (1 << b) for b in range(12)} | {
        qsig ^ (1 << b1) ^ (1 << b2) for b1 in range(12) for b2 in range(b1 + 1, 12)
    }
    n_cand = signed.where(F.col("signature").isin(sorted(probes))).count()
    assert n_cand < 0.4 * emb.count(), f"candidates {n_cand} not sub-linear"
    signed.unpersist()


# --- multimodal -------------------------------------------------------------
def test_image_features_plumbing(spark):
    media = multimodal.synthetic_media(spark, n=32)
    feats = multimodal.image_features(media, fake=True)
    pdf = feats.orderBy("id").toPandas()
    assert len(pdf) == 32
    assert all(len(f) == 16 for f in pdf["features"])
    # deterministic: same input → same features at different parallelism
    pdf2 = multimodal.image_features(media.repartition(5), fake=True).orderBy("id").toPandas()
    np.testing.assert_array_equal(
        np.stack(pdf["features"].values), np.stack(pdf2["features"].values)
    )
    # blobs are projected away
    assert "media" not in feats.columns


def test_real_decode_raises_without_libs(spark):
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"xx", 4, 4)


def test_frame_sample(spark):
    media = multimodal.synthetic_media(spark, n=8)
    out = multimodal.frame_sample(media, every_n=10).toPandas()
    meta = media.select("id", "meta.n_frames").toPandas()
    for _, row in meta.iterrows():
        expect = list(range(0, max(int(row["n_frames"]) - 1, 0) + 1, 10))
        got = sorted(out[out["id"] == row["id"]]["frame_idx"])
        assert got == expect


def test_textstats_apis(spark, docs):
    from lucene_solr_spark.pipeline import textstats

    q = textstats.quality_scores(docs).toPandas()
    assert (q["stop_ratio"] >= 0).all() and (q["n_tokens"] > 0).all()
    li = textstats.lang_id(docs).toPandas()
    assert set(li["pred_lang"]) <= {"en", "other"}
    tc = textstats.token_count_stats(docs).head()
    assert tc.total_tokens >= tc.n_docs >= 1
    fp = textstats.fingerprints(docs).toPandas()
    assert fp["fingerprint"].nunique() > 1


def test_resize_gray_real():
    from lucene_solr_spark.pipeline.multimodal import resize_gray

    # constant image stays constant at any size
    const = np.full((17, 13), 42, dtype=np.uint8)
    out = resize_gray(const, 8, 8)
    np.testing.assert_allclose(out, 42.0)
    # 2x2 block mean on an even grid matches exact pooling
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out2 = resize_gray(px, 2, 2)
    exp = px.reshape(2, 2, 2, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(out2, exp)


def test_resize_images_plumbing(spark):
    media = multimodal.synthetic_media(spark, n=8)
    out = multimodal.resize_images(media, 8, 8, fake=True).orderBy("id").toPandas()
    assert len(out) == 8 and all(len(p) == 64 for p in out["pixels"])


def test_audio_features_real_pcm(spark):
    # a 1 kHz-ish square wave as raw int16 PCM: nonzero energy + high zcr
    wave = (np.tile(np.r_[np.ones(8), -np.ones(8)], 512) * 16384).astype("<i2")
    rows = [(0, bytearray(wave.tobytes()), "audio/pcm", (0, 0, 0, 16000)),
            (1, bytearray(b""), "audio/pcm", (0, 0, 0, 16000))]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.audio_features(df).orderBy("id").toPandas()
    f0 = np.asarray(out["features"][0])
    assert f0[:8].min() > 0.4  # RMS of the square wave ≈ 0.5
    assert 0.05 < f0[8:].max() < 0.3  # zcr = 2 crossings / 16 samples
    assert np.asarray(out["features"][1]).sum() == 0  # empty clip → zeros
    assert out["sample_rate"].tolist() == [16000, 16000]


def test_cosine_all_pairs_guard_and_lsh_blocked_verify(spark):
    import numpy as np
    import pytest as _pytest

    from lucene_solr_spark.pipeline import similarity

    rng = np.random.default_rng(3)
    base = rng.normal(size=(30, 8))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        if i < 8:  # planted near-dup: tiny perturbation → cosine ≈ 1
            rows.append((1000 + i, [float(x) for x in v + rng.normal(scale=0.01, size=8)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # the cartesian baseline refuses big inputs unless explicitly allowed
    with _pytest.raises(ValueError, match="cartesian"):
        similarity.cosine_all_pairs(emb, threshold=0.9, max_rows=10)

    exact = {
        (r.key_a, r.key_b)
        for r in similarity.cosine_all_pairs(emb, threshold=0.95).collect()
    }
    blocked = {
        (r.key_a, r.key_b)
        for r in similarity.cosine_near_dup_pairs_lsh(
            emb, threshold=0.95, dim=8, n_planes=8
        ).collect()
    }
    assert blocked <= exact  # blocking never invents pairs
    planted = {(i, 1000 + i) for i in range(8)} & exact
    # sign-plane LSH keeps nearly-parallel vectors in one bucket
    assert len(blocked & planted) / len(planted) >= 0.9


def test_ann_partitioned_table_prunes_and_matches(vectors, tmp_path):
    """write_signed_partitioned + ann_lsh_topk_partitioned: identical results
    to the in-memory ANN path, and the scan is Hive-partition-pruned (the
    probe bands appear as PartitionFilters; non-probed sig_band dirs are
    never read)."""
    pdf = vectors.orderBy("vec_id").toPandas()
    q = np.stack(pdf["embedding"].values)[0].astype(np.float64)
    spark = vectors.sparkSession

    signed = similarity.add_lsh_signature(vectors, dim=16, n_planes=12)
    path = str(tmp_path / "signed")
    similarity.write_signed_partitioned(signed, path, band_bits=4)

    base = similarity.ann_lsh_topk(
        signed, q, k=10, n_planes=12, probe_hamming=1, decimal_rerank=True
    ).toPandas()
    part = similarity.ann_lsh_topk_partitioned(
        spark, path, q, k=10, n_planes=12, probe_hamming=1, band_bits=4,
        decimal_rerank=True,
    )
    got = part.toPandas()
    assert got["vec_id"].tolist() == base["vec_id"].tolist()
    np.testing.assert_allclose(got["cosine"].values, base["cosine"].values)

    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "sig_band" in plan
    # probe set at Hamming≤1 covers ≤ 13 of the 16 bands — pruning is real
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), "partition filter must be pushed"


def test_connected_components_transitive_closure(spark):
    # a~b, b~c, and an isolated pair (x~y): closure = {a,b,c}, {x,y}
    pairs = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y"), ("c", "d"), ("p", "q"), ("q", "p")],
        "key_a string, key_b string",
    )
    comp = {
        r["key"]: r["component"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert comp == {
        "a": "a", "b": "a", "c": "a", "d": "a",
        "x": "x", "y": "x",
        "p": "p", "q": "p",
    }


def test_connected_components_chain_needs_iterations(spark):
    # a 12-node path graph: worst case for min propagation (diameter 11)
    edges = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(11)]
    pairs = spark.createDataFrame(edges, "key_a string, key_b string")
    comp = dedup.connected_components(pairs).collect()
    assert {r["component"] for r in comp} == {"n00"} and len(comp) == 12


def test_dedup_groups_end_to_end(spark, docs):
    # pairs from the LSH stage over the fixture corpus; groups must cover
    # every doc, singletons canonical to themselves
    sigs = dedup.minhash_signatures(docs)
    pairs = dedup.minhash_lsh_pairs(sigs)
    out = dedup.dedup_groups(docs, pairs).toPandas().set_index("doc_id")
    assert len(out) == docs.count()
    # a canonical doc is never marked duplicate; group members share it
    for k, row in out.iterrows():
        assert (row["canonical"] == k) == (not row["is_duplicate"])
    npairs = pairs.count()
    if npairs:
        assert out["is_duplicate"].sum() >= 1


def test_frame_sample_raw_container_bytes(spark):
    vids = multimodal.synthetic_video(spark, n=6)
    out = multimodal.frame_sample(vids, every_n=3).toPandas()
    src = vids.toPandas().set_index("id")
    for _, row in out.iterrows():
        meta = src.loc[row["id"], "meta"]
        w, h = meta["width"], meta["height"]
        lo = int(row["frame_idx"]) * w * h
        assert bytes(row["frame"]) == bytes(src.loc[row["id"], "media"])[lo : lo + w * h]
    # synthetic_media blobs hold ONE w*h plane but claim a random n_frames,
    # so whenever n_frames != 1 the length check fails -> NULL frame (the
    # compressed-codec stub path); n_frames == 1 rows slice the real plane
    media = multimodal.synthetic_media(spark, n=16)
    stub = multimodal.frame_sample(media, every_n=5).toPandas()
    nf = media.select("id", "meta.n_frames").toPandas().set_index("id")["n_frames"]
    for _, row in stub.iterrows():
        assert (row["frame"] is None) == (int(nf.loc[row["id"]]) != 1)


def test_frame_sample_plan_is_jvm_only(spark):
    vids = multimodal.synthetic_video(spark, n=2)
    plan = (
        multimodal.frame_sample(vids)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan

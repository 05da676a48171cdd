"""Similarity search over an embedding column (array<float>).

Two paths, mirroring the exhaustive-vs-pruned split of the BM25 engine:

- **Brute-force cosine top-k** — the correctness baseline. Dot products are
  accumulated as exact DECIMAL sums of float32×float32 products (each such
  product is exactly representable in double, and DECIMAL addition is
  order-independent), so the result is bit-deterministic at any parallelism
  AND reproducible by a DuckDB oracle. JVM-only expressions; the Pandas-UDF
  variant below trades that determinism for raw numpy throughput.

- **LSH-bucketed ANN** — the scale path: deterministic random-hyperplane
  signatures (seeded, derived from the dimension index — no runtime RNG),
  multi-probe candidate generation (query bucket + all Hamming-1 probes),
  exact re-scoring within candidates. Sub-linear candidate set; recall
  depends on n_planes (tested ≥0.6 @ 16 planes on synthetic clusters, with
  recall→1 as probes increase).

At 100 TB the brute-force path is a single scan + TakeOrderedAndProject
(no shuffle before top-k merge); the ANN path prunes the scan with a
partition-prunable `signature` column — write the table partitioned or
z-ordered by signature and only candidate buckets are read.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _decimal_dot(a: Column, b: Column) -> Column:
    """Exact, order-independent dot product: Σ DECIMAL(x_i * y_i).

    x_i,y_i are float32 → x_i*y_i is exact in double → CAST to
    DECIMAL(38,20) rounds identically everywhere; DECIMAL sum is exact."""
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast("decimal(30,15)")
    )
    return F.aggregate(
        prods,
        F.lit(0).cast("decimal(30,15)"),
        lambda acc, p: (acc + p).cast("decimal(30,15)"),
    ).cast("double")


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """Exhaustive cosine top-k against one query vector (JVM expressions,
    deterministic DECIMAL accumulation, tie-break cosine desc / key asc)."""
    q = F.array(*[F.lit(float(v)).cast("float") for v in query_vec])
    dot = _decimal_dot(F.col(vec_col), q)
    nv = F.sqrt(_decimal_dot(F.col(vec_col), F.col(vec_col)))
    nq = F.sqrt(_decimal_dot(q, q))
    cos = (dot / (nv * nq)).alias("cosine")
    return (
        embeddings.select(F.col(key_col), cos)
        .orderBy(F.col("cosine").desc(), F.col(key_col).asc())
        .limit(k)
    )


def cosine_topk_pandas(
    embeddings: DataFrame,
    query_vec: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """Vectorized numpy variant: one matrix-vector product per Arrow batch.
    Float64 accumulation (not DECIMAL) — the throughput path."""
    spark = embeddings.sparkSession
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt(q @ q))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].values).astype(np.float64)
            dots = m @ q
            norms = np.sqrt((m * m).sum(axis=1))
            yield pd.DataFrame({key_col: pdf[key_col].values, "cosine": dots / (norms * qn)})

    scored = embeddings.select(key_col, vec_col).mapInPandas(
        kernel, schema=f"{key_col} long, cosine double"
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(key_col).asc()).limit(k)


def cosine_all_pairs(
    embeddings: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    round_digits: int = 8,
    max_rows: int = 100_000,
    allow_unblocked: bool = False,
) -> DataFrame:
    """Exact near-dup pairs: all (a < b) with ROUND(cosine, d) ≥ threshold.

    The brute-force baseline (deterministic DECIMAL accumulation, so it has
    an exact DuckDB oracle). Norms are precomputed per vector and broadcast
    into the pair join.

    GUARDED: this is a cartesian product — O(n²) pairs. Inputs over
    `max_rows` raise unless `allow_unblocked=True`; at scale, block
    candidates first (`cosine_near_dup_pairs_lsh`, which feeds only
    same-signature-bucket pairs into this exact verify)."""
    if not allow_unblocked:
        n = embeddings.count()
        if n > max_rows:
            raise ValueError(
                f"cosine_all_pairs on {n} rows is an O(n^2) cartesian product; "
                "use cosine_near_dup_pairs_lsh (LSH-blocked verify) or pass "
                "allow_unblocked=True for a deliberate brute-force run"
            )
    normed = embeddings.select(
        F.col(key_col),
        F.col(vec_col),
        F.sqrt(_decimal_dot(F.col(vec_col), F.col(vec_col))).alias("nrm"),
    )
    a = normed.select(
        F.col(key_col).alias("key_a"), F.col(vec_col).alias("va"), F.col("nrm").alias("na")
    )
    b = normed.select(
        F.col(key_col).alias("key_b"), F.col(vec_col).alias("vb"), F.col("nrm").alias("nb")
    )
    pairs = a.join(b, F.col("key_a") < F.col("key_b"))
    cos = F.round(_decimal_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), round_digits)
    return (
        pairs.select("key_a", "key_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def cosine_near_dup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 16,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    round_digits: int = 8,
    planes: np.ndarray | None = None,
) -> DataFrame:
    """Near-dup pairs at scale: LSH signature blocking (same sign-plane
    bucket → candidate) followed by the exact DECIMAL cosine verify on
    candidates only — the equi-join replaces the cartesian product, exactly
    like MinHash banding replaces all-pairs Jaccard. Recall is governed by
    n_planes: P(same bucket) = (1 − θ/π)^n_planes for angle θ, so
    high-cosine near-dups collide with high probability; raise recall by
    unioning several plane families if needed."""
    if planes is None:
        planes = md5_sign_planes(dim, n_planes)
    signed = add_lsh_signature(
        embeddings, dim=dim, n_planes=n_planes, vec_col=vec_col, planes=planes
    )
    a = signed.select(
        F.col(key_col).alias("key_a"), F.col(vec_col).alias("va"), "signature"
    )
    b = signed.select(
        F.col(key_col).alias("key_b"), F.col(vec_col).alias("vb"), "signature"
    )
    cand = a.join(b, "signature").where(F.col("key_a") < F.col("key_b"))
    na = F.sqrt(_decimal_dot(F.col("va"), F.col("va")))
    nb = F.sqrt(_decimal_dot(F.col("vb"), F.col("vb")))
    cos = F.round(_decimal_dot(F.col("va"), F.col("vb")) / (na * nb), round_digits)
    return (
        cand.select("key_a", "key_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
        .distinct()
    )


# --- LSH ANN ----------------------------------------------------------------
def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    """Deterministic random hyperplanes (seeded Gaussian)."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(np.float64)


def md5_sign_planes(dim: int, n_planes: int) -> np.ndarray:
    """±1 hyperplanes derived from MD5 — random-sign projections are a valid
    random-hyperplane LSH family, and (unlike Gaussian planes) an external
    SQL oracle can reproduce them exactly: sign(p, i) = +1 iff the 60-bit
    MD5 integer of "p:i" is odd (the same md5i hash the dedup gates share)."""
    import hashlib

    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for i in range(dim):
            h = int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:15], 16)
            out[p, i] = 1.0 if h % 2 == 1 else -1.0
    return out


def add_lsh_signature(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 7,
    vec_col: str = "embedding",
    planes: np.ndarray | None = None,
) -> DataFrame:
    """Append `signature` = sign-bit pattern of the hyperplane projections.
    At scale, partition/cluster the stored table by this column. Pass
    `planes` (e.g. md5_sign_planes) to control the family explicitly."""
    planes = planes if planes is not None else _hyperplanes(dim, n_planes, seed)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].values).astype(np.float64)
            bits = (m @ planes.T) >= 0  # (n, planes)
            sig = np.zeros(len(pdf), dtype=np.int64)
            for b in range(planes.shape[0]):
                sig |= bits[:, b].astype(np.int64) << b
            out = pdf.copy()
            out["signature"] = sig
            yield out

    from pyspark.sql.types import LongType, StructField, StructType

    # build a fresh StructType — StructType.add mutates in place, which would
    # corrupt the source DataFrame's cached schema
    schema = StructType(
        list(embeddings.schema.fields) + [StructField("signature", LongType(), False)]
    )
    return embeddings.mapInPandas(kernel, schema=schema)


def _probe_set(
    q: np.ndarray, planes: np.ndarray, n_planes: int, probe_hamming: int
) -> set[int]:
    """Query signature plus all multi-probe buckets within Hamming distance
    `probe_hamming` (0, 1 or 2)."""
    qsig = 0
    for b, v in enumerate(planes @ q >= 0):
        qsig |= int(v) << b
    probes = {qsig}
    if probe_hamming >= 1:
        probes |= {qsig ^ (1 << b) for b in range(n_planes)}
    if probe_hamming >= 2:
        probes |= {
            qsig ^ (1 << b1) ^ (1 << b2)
            for b1 in range(n_planes)
            for b2 in range(b1 + 1, n_planes)
        }
    return probes


def ann_lsh_topk(
    signed: DataFrame,
    query_vec: np.ndarray,
    k: int = 10,
    n_planes: int = 16,
    seed: int = 7,
    probe_hamming: int = 1,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    planes: np.ndarray | None = None,
    decimal_rerank: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates = query signature bucket plus all probes
    within Hamming distance `probe_hamming`, exact cosine inside candidates.
    decimal_rerank=True uses the DECIMAL-exact JVM rerank (bit-reproducible
    by a SQL oracle); default is the numpy throughput path."""
    q = np.asarray(query_vec, dtype=np.float64)
    planes = planes if planes is not None else _hyperplanes(len(q), n_planes, seed)
    probes = _probe_set(q, planes, n_planes, probe_hamming)
    cands = signed.where(F.col("signature").isin(sorted(probes)))
    if decimal_rerank:
        return cosine_topk(
            cands, [float(v) for v in q], k=k, vec_col=vec_col, key_col=key_col
        )
    return cosine_topk_pandas(cands, q, k=k, vec_col=vec_col, key_col=key_col)


def write_signed_partitioned(
    signed: DataFrame, path: str, band_bits: int = 6
) -> None:
    """Materialize the signed embedding table PHYSICALLY partitioned for ANN.

    Partitioning by the full signature would create 2^n_planes directories
    (65k at 16 planes) with tiny files; instead partition by the low
    `band_bits` bits (`sig_band`, 64 dirs at 6 bits) — each probe bucket
    maps to exactly one band, so a probe-set scan prunes to ≤|probes| of
    the 2^band_bits partitions at the Hive-partition level (zero I/O for
    the rest), and files inside each band stay large. The full `signature`
    column remains for the exact in-partition filter.

    Reference parity: Lucene keeps postings per-term so a TermQuery touches
    one postings list; this is the same locality idea applied to an
    LSH bucket column (SURVEY.md ANN scale path)."""
    out = signed.withColumn(
        "sig_band", (F.col("signature") % F.lit(1 << band_bits)).cast("int")
    )
    out.write.mode("overwrite").partitionBy("sig_band").parquet(path)


def ann_lsh_topk_partitioned(
    spark,
    path: str,
    query_vec: np.ndarray,
    k: int = 10,
    n_planes: int = 16,
    seed: int = 7,
    probe_hamming: int = 1,
    band_bits: int = 6,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    planes: np.ndarray | None = None,
    decimal_rerank: bool = False,
) -> DataFrame:
    """ANN top-k against a `write_signed_partitioned` table: the probe set's
    band keys become a partition filter (`PartitionFilters` in the plan —
    non-probed directories are never listed or read), then the exact
    signature `isin` and cosine rerank run inside the surviving bands.
    At 100 TB with 64 bands and Hamming-1 probes this reads ≤ 17/64 of the
    table's partitions instead of scanning everything."""
    q = np.asarray(query_vec, dtype=np.float64)
    planes = planes if planes is not None else _hyperplanes(len(q), n_planes, seed)
    probes = _probe_set(q, planes, n_planes, probe_hamming)
    bands = sorted({p % (1 << band_bits) for p in probes})
    signed = spark.read.parquet(path).where(F.col("sig_band").isin(bands))
    cands = signed.where(F.col("signature").isin(sorted(probes)))
    if decimal_rerank:
        return cosine_topk(
            cands, [float(v) for v in q], k=k, vec_col=vec_col, key_col=key_col
        )
    return cosine_topk_pandas(cands, q, k=k, vec_col=vec_col, key_col=key_col)


# --- IVF ANN ------------------------------------------------------------
def ivf_train_centroids(
    embeddings: DataFrame,
    n_centroids: int,
    dim: int,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    max_sample: int = 100_000,
    iters: int = 10,
    seed: int = 7,
) -> np.ndarray:
    """Coarse quantizer for IVF: spherical k-means over a DETERMINISTIC
    sample. The sample is hash-selected (crc32(key) mod m == 0), so it is
    independent of partitioning/task order — same centroids on any cluster
    size — and bounded (≤ max_sample rows collected to the driver, ~dim·8
    bytes each; at 100 TB the sample is what's collected, never the table).
    Lloyd's iterations run in numpy with seeded k-means++ init; empty
    clusters keep their previous centroid. Centroids are L2-normalized each
    round (spherical k-means), so nearest-centroid-by-dot == by-cosine."""
    n = embeddings.count()
    mod = max(1, n // max_sample)
    sample = (
        embeddings.select(key_col, vec_col)
        .where((F.crc32(F.col(key_col).cast("string")) % mod) == 0)
        .orderBy(key_col)
        .limit(max_sample)
        .toPandas()
    )
    x = np.stack(sample[vec_col].values).astype(np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    # k-means++ seeding
    cents = [x[rng.randint(len(x))]]
    for _ in range(1, min(n_centroids, len(x))):
        d2 = np.min(
            [1.0 - x @ c for c in cents], axis=0
        )  # cosine distance to nearest chosen
        d2 = np.maximum(d2, 0)
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(len(x), 1.0 / len(x))
        cents.append(x[rng.choice(len(x), p=probs)])
    c = np.stack(cents)
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(len(c)):
            members = x[assign == j]
            if len(members):
                v = members.sum(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    c[j] = v / nv
    return c


def ivf_assign(
    embeddings: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Append `list_id` = argmax-cosine centroid (ties → lowest id), one
    Arrow-batched matrix product per batch — the IVF inverted-list key."""
    c = np.asarray(centroids, dtype=np.float64)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].values).astype(np.float64)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            out = pdf.copy()
            out["list_id"] = np.argmax(m @ c.T, axis=1).astype(np.int32)
            yield out

    from pyspark.sql.types import IntegerType, StructField, StructType

    schema = StructType(
        list(embeddings.schema.fields) + [StructField("list_id", IntegerType(), False)]
    )
    return embeddings.mapInPandas(kernel, schema=schema)


def write_ivf_partitioned(assigned: DataFrame, path: str) -> None:
    """Materialize the assigned table physically partitioned by `list_id` —
    the IVF inverted lists as Hive partitions, so a probe scan lists and
    reads ONLY the probed lists (PartitionFilters, zero I/O elsewhere).
    Same locality idea as the per-term postings files / LSH sig_band."""
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(path)


def ivf_topk(
    spark,
    path: str,
    query_vec: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    decimal_rerank: bool = False,
) -> DataFrame:
    """IVF probe: rank centroids by cosine to the query, scan the top
    `nprobe` inverted lists (partition-pruned), exact cosine rerank inside.
    Recall rises with nprobe (nprobe == n_centroids is exhaustive); the
    scanned fraction is ~nprobe/n_centroids of the table."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    c = np.asarray(centroids, dtype=np.float64)
    order = np.argsort(-(c @ qn), kind="stable")
    lists = sorted(int(j) for j in order[:nprobe])
    cands = spark.read.parquet(path).where(F.col("list_id").isin(lists))
    if decimal_rerank:
        return cosine_topk(
            cands, [float(v) for v in q], k=k, vec_col=vec_col, key_col=key_col
        )
    return cosine_topk_pandas(cands, q, k=k, vec_col=vec_col, key_col=key_col)


# --- Product quantization (IVF-PQ) -------------------------------------------
# Classical PQ (Jégou, Douze, Schmid: "Product Quantization for Nearest
# Neighbor Search", IEEE TPAMI 2011 — public method): split each normalized
# vector into M subvectors, k-means each subspace to 256 codes, store one
# byte per subvector. A probe scan then reads M bytes/vector instead of
# dim·8 — at 10^12 vectors the candidate scan shrinks ~32-96x, and the
# exact rerank touches full vectors only for the shortlist. Query-side
# scoring is ADC (asymmetric distance): one (M, 256) dot-product table per
# query, score = sum of M table lookups — vectorized in the Arrow kernel.


def pq_train_codebooks(
    embeddings: DataFrame,
    dim: int,
    m_subvectors: int = 8,
    n_codes: int = 256,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    max_sample: int = 100_000,
    iters: int = 10,
    seed: int = 11,
) -> np.ndarray:
    """Deterministic per-subspace k-means (same hash-selected bounded
    sample protocol as ivf_train_centroids — centroids independent of
    cluster size). Returns (M, n_codes, dim//M) float64 codebooks over
    L2-NORMALIZED inputs, so ADC dot sums approximate cosine."""
    if dim % m_subvectors:
        raise ValueError("dim must divide evenly into m_subvectors")
    dsub = dim // m_subvectors
    n = embeddings.count()
    mod = max(1, n // max_sample)
    sample = (
        embeddings.select(key_col, vec_col)
        .where((F.crc32(F.col(key_col).cast("string")) % mod) == 0)
        .orderBy(key_col)
        .limit(max_sample)
        .toPandas()
    )
    x = np.stack(sample[vec_col].values).astype(np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    books = np.zeros((m_subvectors, n_codes, dsub))
    for mi in range(m_subvectors):
        xs = x[:, mi * dsub : (mi + 1) * dsub]
        k = min(n_codes, len(xs))
        # k-means++ in the subspace (L2)
        cents = [xs[rng.randint(len(xs))]]
        for _ in range(1, k):
            d2 = np.min(
                np.stack([((xs - c) ** 2).sum(axis=1) for c in cents]), axis=0
            )
            s = d2.sum()
            probs = d2 / s if s > 0 else np.full(len(xs), 1.0 / len(xs))
            cents.append(xs[rng.choice(len(xs), p=probs)])
        c = np.stack(cents)
        for _ in range(iters):
            d = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)
            for j in range(len(c)):
                members = xs[assign == j]
                if len(members):
                    c[j] = members.mean(axis=0)
        books[mi, : len(c)] = c
        if len(c) < n_codes:
            books[mi, len(c):] = c[0]  # degenerate tiny-sample fill
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append `pq_code: array<smallint>` (one code per subvector; smallint
    because Spark has no unsigned byte). Arrow-batched argmin per subspace;
    inputs are normalized before encoding (spherical convention)."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, dsub = books.shape

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].values).astype(np.float64)
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(x), m), dtype=np.int16)
            for mi in range(m):
                xs = x[:, mi * dsub : (mi + 1) * dsub]
                # ||xs - c||^2 = ||xs||^2 - 2 xs.c + ||c||^2 → argmin via dot
                d = -2.0 * (xs @ books[mi].T) + (books[mi] ** 2).sum(axis=1)
                codes[:, mi] = np.argmin(d, axis=1).astype(np.int16)
            out = pdf.copy()
            out["pq_code"] = list(codes)
            yield out

    from pyspark.sql.types import ArrayType, ShortType, StructField, StructType

    schema = StructType(
        list(embeddings.schema.fields)
        + [StructField("pq_code", ArrayType(ShortType()), False)]
    )
    return embeddings.mapInPandas(kernel, schema=schema)


def ivf_pq_topk(
    spark,
    path: str,
    query_vec: np.ndarray,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 100,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ probe: partition-pruned scan of the probed lists reading ONLY
    (key, pq_code) — parquet column pruning keeps the full vectors unread —
    ADC approximate scores, shortlist of `rerank` candidates, then ONE
    semi-joined exact-cosine rerank over the shortlist's full vectors.
    rerank=0 returns ADC scores directly."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    c = np.asarray(centroids, dtype=np.float64)
    books = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, dsub = books.shape
    order = np.argsort(-(c @ qn), kind="stable")
    lists = sorted(int(j) for j in order[:nprobe])
    # the per-query ADC table: table[mi, code] = dot(q_mi, codebook[mi, code])
    table = np.stack(
        [books[mi] @ qn[mi * dsub : (mi + 1) * dsub] for mi in range(m)]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.stack(pdf["pq_code"].values).astype(np.int64)
            scores = table[np.arange(m)[None, :], codes].sum(axis=1)
            yield pd.DataFrame({key_col: pdf[key_col].values, "adc_score": scores})

    cands = (
        spark.read.parquet(path)
        .where(F.col("list_id").isin(lists))
        .select(key_col, "pq_code")
    )
    adc = cands.mapInPandas(kernel, schema=f"{key_col} long, adc_score double")
    shortlist = adc.orderBy(F.col("adc_score").desc(), F.col(key_col).asc()).limit(
        max(rerank, k) if rerank else k
    )
    if not rerank:
        return shortlist
    full = (
        spark.read.parquet(path)
        .where(F.col("list_id").isin(lists))
        .select(key_col, vec_col)
        .join(F.broadcast(shortlist.select(key_col)), key_col, "left_semi")
    )
    return cosine_topk_pandas(full, q, k=k, vec_col=vec_col, key_col=key_col)

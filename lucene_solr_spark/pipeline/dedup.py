"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All hashing is **portable** (MD5-derived 60-bit integers, identical in Spark
SQL and DuckDB) so every operator has an exact cross-engine oracle, and
**deterministic** (no RNG at runtime) so results are identical at any
parallelism — the same property the index build relies on.

Scale design:
- exact dedup: one hash-groupBy shuffle, map-side combined.
- MinHash: signatures are a narrow per-doc aggregation over shingles
  (explode → groupBy(doc).agg(min per seed)); LSH banding turns the
  quadratic all-pairs problem into an equi-join on (band, band_hash) —
  Spark's hash join does the bucketing. Candidate pairs are then verified
  with exact Jaccard only within buckets. No broadcast of the corpus, no
  cartesian product; skewed buckets (boilerplate shingles) are bounded by
  `max_bucket` (drop pathological buckets, standard practice at CC scale).
- SimHash: per-doc 48-bit fingerprint via bit-majority over term hashes —
  one groupBy; near-dup candidates join on band substrings of the
  fingerprint (Hamming-distance blocking).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..analysis.analyzer import post_stop_tokens

N_MINHASHES = 8
LSH_BANDS = 4  # rows_per_band = N_MINHASHES // LSH_BANDS = 2
SIMHASH_BITS = 48


def md5_long(col: Column) -> Column:
    """Portable 60-bit integer hash (same value in DuckDB via
    CAST(CONCAT('0x', SUBSTR(MD5(x),1,15)) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_dedup(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-key doc per exact text hash (hash-groupBy dedup)."""
    h = F.md5(F.col(text_col)).alias("content_hash")
    return (
        df.select(F.col(key_col), h)
        .groupBy("content_hash")
        .agg(F.min(key_col).alias(key_col), F.count(F.lit(1)).alias("n_copies"))
    )


def shingles(df: DataFrame, text_col: str = "text", key_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(key, shingle) rows: distinct n-grams of post-stop tokens joined by
    '_'. Expressed with JVM array functions only (no Python)."""
    toks = post_stop_tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws("_", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(F.col(key_col), F.explode(grams).alias("shingle")).distinct()


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_hashes: int = N_MINHASHES,
    shingle_n: int = 3,
) -> DataFrame:
    """(key, sig_0..sig_{H-1}): per-doc MinHash signature.

    sig_i = min over shingles of hash(i || ':' || shingle). Documents with
    fewer than `shingle_n` tokens get no signature (no shingles)."""
    sh = shingles(df, text_col, key_col, shingle_n)
    aggs = [
        F.min(md5_long(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"sig_{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy(key_col).agg(*aggs)


def minhash_lsh_pairs(
    sigs: DataFrame,
    key_col: str = "doc_id",
    n_hashes: int = N_MINHASHES,
    bands: int = LSH_BANDS,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs from banded LSH + estimated Jaccard.

    Signature split into `bands` bands of n_hashes/bands rows; docs sharing
    any band hash become a candidate pair; est_jaccard = matching signature
    fraction. Pathological buckets larger than `max_bucket` are dropped
    (head-shingle skew guard)."""
    rows = n_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"sig_{b * rows + r}").cast("string") for r in range(rows)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                md5_long(F.concat_ws("|", *parts)).alias("bucket"),
            )
        )
    # the self-join shuffle carries ONLY (key, band, bucket) — 3 columns,
    # one row per (doc, band). Signatures re-attach ONCE per side after the
    # pairs are distinct, so the 128 sig values cross the wire once per doc
    # per side instead of once per (doc, band) through the fat self-join
    # (a ~64× pair-shuffle-width cut at the production 128/16 params).
    buckets = sigs.select(
        key_col, F.explode(F.array(*band_cols)).alias("bb")
    ).select(key_col, "bb.band", "bb.bucket")

    # skew guard: drop buckets with too many members
    sizes = buckets.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("n"))
    buckets = buckets.join(
        sizes.where(F.col("n") <= max_bucket).select("band", "bucket"),
        ["band", "bucket"],
    )

    a, b_ = buckets.alias("a"), buckets.alias("b")
    pairs = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{key_col}") < F.col(f"b.{key_col}")),
        )
        .select(
            F.col(f"a.{key_col}").alias("key_a"),
            F.col(f"b.{key_col}").alias("key_b"),
        )
        .distinct()
    )
    sig_arr = sigs.select(
        key_col, F.array(*[F.col(f"sig_{i}") for i in range(n_hashes)]).alias("sig")
    )
    return (
        pairs.join(
            sig_arr.select(F.col(key_col).alias("key_a"), F.col("sig").alias("sig_a")),
            "key_a",
        )
        .join(
            sig_arr.select(F.col(key_col).alias("key_b"), F.col("sig").alias("sig_b")),
            "key_b",
        )
        .select(
            "key_a",
            "key_b",
            (
                F.size(
                    F.filter(
                        F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                        lambda v: v,
                    )
                )
                / F.lit(float(n_hashes))
            ).alias("est_jaccard"),
        )
    )


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (key_a, key_b):
    |A∩B| / |A∪B| over distinct shingle sets — the verify stage after LSH."""
    sh = shingles(df, text_col, key_col, shingle_n)
    sh_a = sh.select(F.col(key_col).alias("key_a"), "shingle")
    sh_b = sh.select(F.col(key_col).alias("kb"), F.col("shingle").alias("shingle_b"))
    sizes = sh.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    inter = (
        pairs.select("key_a", "key_b")
        .join(sh_a, "key_a")
        .join(
            sh_b,
            (F.col("key_b") == F.col("kb")) & (F.col("shingle") == F.col("shingle_b")),
        )
        .groupBy("key_a", "key_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(key_col, "key_a").withColumnRenamed("n", "n_a"), "key_a")
        .join(sizes.withColumnRenamed(key_col, "key_b").withColumnRenamed("n", "n_b"), "key_b")
        .select(
            "key_a",
            "key_b",
            (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias("jaccard"),
        )
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """(key, simhash): bit b of the fingerprint = majority vote over terms of
    bit b of hash(term), weighted by tf. Near-identical docs differ in few
    bits (Charikar's SimHash)."""
    toks = df.select(
        F.col(key_col), F.explode(post_stop_tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(key_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    h = md5_long(F.col("term"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.col("tf")).otherwise(
                -F.col("tf")
            )
        ).alias(f"s_{b}")
        for b in range(bits)
    ]
    per_doc = tf.groupBy(key_col).agg(*bit_sums)
    fingerprint = sum(
        F.when(F.col(f"s_{b}") >= 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        for b in range(bits)
    )
    return per_doc.select(F.col(key_col), fingerprint.alias("simhash"))


def simhash_near_pairs(
    fps: DataFrame, key_col: str = "doc_id", bits: int = SIMHASH_BITS, max_hamming: int = 3, bands: int = 4
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Blocking: split the fingerprint into `bands` bit-bands; any pair within
    Hamming ≤ bands-1 shares at least one exact band (pigeonhole), so an
    equi-join per band finds all candidates; verify with bit_count."""
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    banded = fps.select(
        key_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * band_bits).bitwiseAND(F.lit(mask)).alias("band_val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(key_col, "simhash", "bb.band", "bb.band_val")
    a, b_ = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{key_col}") < F.col(f"b.{key_col}")),
        )
        .select(
            F.col(f"a.{key_col}").alias("key_a"),
            F.col(f"b.{key_col}").alias("key_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("key_a", "key_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "key_a",
    b_col: str = "key_b",
    max_iter: int = 25,
) -> DataFrame:
    """Near-dup PAIRS → duplicate GROUPS: connected components by iterative
    min-label propagation. The candidate-pair stages (MinHash LSH, SimHash
    banding, cosine blocking) emit edges; deduplication needs the
    transitive closure — a~b and b~c put all three in ONE group even when
    (a,c) was never emitted.

    Each superstep: label(x) <- min(label(x), min label of x's neighbours),
    then pointer-jump label(x) <- label(label(x)) — the jump doubles the
    propagated distance per round, so convergence is O(log component
    diameter) (a 2^25-link chain fits the default budget). Each round is
    one shuffle on the edge list plus one on the labels frame; labels
    persist + localCheckpoint to keep the plan flat (no lineage blow-up at
    iteration 20). Non-convergence inside max_iter raises instead of
    returning silently split groups. Returns (key, component) where
    component is the lexicographic min key of the group — members of no
    pair are absent (callers treat missing as singleton).
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = edges.select("src").distinct().withColumn("component", F.col("src"))
    labels = labels.persist()
    for _ in range(max_iter):
        # min over self + neighbours' current labels
        neigh = (
            edges.join(labels.withColumnRenamed("src", "dst"), "dst")
            .select("src", "component")
        )
        new_labels = (
            labels.unionByName(neigh)
            .groupBy("src")
            .agg(F.min("component").alias("component"))
        )
        # pointer jumping: label(x) <- label(label(x)) — doubles the
        # propagated distance every round, so convergence is O(log
        # diameter) instead of O(diameter); a 1000-link chain (pathological
        # near-dup topology: each page links only to its neighbour)
        # converges in ~10 rounds instead of 999
        parent = new_labels.select(
            F.col("src").alias("component"), F.col("component").alias("gp")
        )
        new_labels = (
            new_labels.join(parent, "component", "left")
            .select(
                "src",
                F.least(
                    F.col("component"), F.coalesce(F.col("gp"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("component", "old"), "src")
            .where(F.col("component") != F.col("old"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        # never converged inside max_iter: returning split labels would
        # silently leave duplicates marked distinct — refuse instead (a
        # chain-shaped component's diameter exceeds the budget; raise
        # max_iter, its cost is one shuffle per extra round)
        edges.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter"
        )
    edges.unpersist()
    return labels.select(F.col("src").alias("key"), "component")


def dedup_groups(
    docs: DataFrame,
    pairs: DataFrame,
    key_col: str = "doc_id",
    a_col: str = "key_a",
    b_col: str = "key_b",
) -> DataFrame:
    """Full-corpus dedup verdict: every doc labelled with its duplicate
    group's canonical representative (min key) and an is_duplicate flag
    (True = drop in a keep-one-per-group pipeline). Docs in no candidate
    pair are their own canonical. One left join against the component
    labels — corpus-scan shaped, no driver structures."""
    comp = connected_components(pairs, a_col, b_col)
    out = docs.select(key_col).join(
        comp.withColumnRenamed("key", key_col), key_col, "left"
    )
    return out.select(
        key_col,
        F.coalesce(F.col("component"), F.col(key_col)).alias("canonical"),
    ).withColumn("is_duplicate", F.col(key_col) != F.col("canonical"))


def semantic_dedup(
    embeddings: DataFrame,
    centroids,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    max_cluster: int = 20_000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with the IVF coarse quantizer
    (`similarity.ivf_train_centroids` — deterministic at any parallelism),
    then WITHIN each cluster connect items whose pairwise cosine ≥
    `threshold` into duplicate groups and keep one representative per
    group — the member with the LOWEST cosine to its cluster centroid (the
    paper's keep-the-most-atypical rule), ties broken by smallest key.

    Returns (key, list_id, canonical, is_duplicate): canonical = the kept
    representative's key; is_duplicate=True rows are dropped by a
    keep-one-per-group pipeline. Cross-cluster near-duplicates are NOT
    examined — the published method's stated approximation; raise
    n_centroids for tighter clusters, lower it for higher recall.

    Scale: one Arrow matmul pass to assign clusters, one shuffle to group
    by cluster, and an O(m²) in-memory similarity matrix per cluster —
    sized by corpus/n_centroids, and clusters above `max_cluster` members
    are deterministically sub-split by key hash (documented recall
    approximation, same bound discipline as `max_bucket` in MinHash LSH)
    so no task ever materializes an unbounded matrix."""
    import numpy as np
    import pandas as pd

    from .similarity import ivf_assign

    c = np.asarray(centroids, dtype=np.float64)
    assigned = ivf_assign(embeddings, c, vec_col=vec_col).select(
        key_col, vec_col, "list_id"
    )
    # sub-split only oversized clusters: n_sub = ceil(size / max_cluster)
    sizes = assigned.groupBy("list_id").agg(F.count(F.lit(1)).alias("n"))
    assigned = (
        assigned.join(F.broadcast(sizes), "list_id")
        .withColumn(
            "sub_split",
            (
                F.crc32(F.col(key_col).cast("string"))
                % F.greatest(F.lit(1), F.ceil(F.col("n") / F.lit(max_cluster)))
            ).cast("int"),
        )
        .drop("n")
    )
    thr = float(threshold)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {"key": [], "list_id": [], "canonical": [], "is_duplicate": []}
            )
        keys = pdf[key_col].to_numpy()
        lid = int(pdf["list_id"].iloc[0])
        m = np.stack(pdf[vec_col].values).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sim = m @ m.T
        cent_sim = m @ c[lid]
        n = len(keys)
        adj = sim >= thr
        np.fill_diagonal(adj, False)
        # connected components over the threshold graph (cluster-local BFS)
        comp = np.full(n, -1, dtype=np.int64)
        cur = 0
        for s in range(n):
            if comp[s] >= 0:
                continue
            stack = [s]
            comp[s] = cur
            while stack:
                v = stack.pop()
                for w in np.nonzero(adj[v] & (comp < 0))[0]:
                    comp[w] = cur
                    stack.append(w)
            cur += 1
        canonical = np.empty(n, dtype=keys.dtype)
        for g in range(cur):
            members = np.nonzero(comp == g)[0]
            # keep lowest centroid-cosine; ties -> smallest key
            order = sorted(members, key=lambda i: (cent_sim[i], keys[i]))
            canonical[members] = keys[order[0]]
        return pd.DataFrame(
            {
                "key": keys,
                "list_id": np.full(n, lid, dtype=np.int32),
                "canonical": canonical,
                "is_duplicate": keys != canonical,
            }
        )

    return assigned.groupBy("list_id", "sub_split").applyInPandas(
        kernel,
        schema="key long, list_id int, canonical long, is_duplicate boolean",
    )

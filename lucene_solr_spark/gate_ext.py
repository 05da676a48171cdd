"""Gate entries for the training-data pipeline operators.

Unlike gate.py's dialect-template queries, the Spark side here runs the REAL
DataFrame-API implementations from lucene_solr_spark.pipeline; the DuckDB
oracle reproduces their semantics in SQL. Both sides share the portable
MD5-derived 60-bit hash (gate.md5i) and the tokenizer regex, so values are
bit-identical.

Also registers a few reference-parity SQL gates that belong to SURVEY.md
§2.14 (MoreLikeThis, suggest, spellcheck).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .gate import _STOPLIST_SQL, df_gate, gate, md5i, tok_cte
from .pipeline import dedup, similarity

N_H = dedup.N_MINHASHES
SIM_BITS = dedup.SIMHASH_BITS


def _duck_md5i(expr: str) -> str:
    return md5i(expr, "duckdb")


# --- shared DuckDB CTE fragments ---------------------------------------------
def _shingle_cte() -> str:
    """DISTINCT (doc_id, shingle) of consecutive post-stop token triples —
    the SQL twin of pipeline.dedup.shingles."""
    return f"""
tok AS ({tok_cte('duckdb')}),
seq AS (
  SELECT doc_id, term,
         LEAD(term, 1) OVER w AS t1,
         LEAD(term, 2) OVER w AS t2
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sh AS (
  SELECT DISTINCT doc_id, CONCAT(term, '_', t1, '_', t2) AS shingle
  FROM seq WHERE t2 IS NOT NULL
)"""


def _sigs_select() -> str:
    parts = []
    for i in range(N_H):
        seeded = "CONCAT('" + str(i) + ":', shingle)"
        parts.append(f"MIN({_duck_md5i(seeded)}) AS sig_{i}")
    mins = ",\n    ".join(parts)
    return f"SELECT CAST(doc_id AS BIGINT) AS doc_id,\n    {mins}\n  FROM sh GROUP BY doc_id"


# --- MinHash signatures -------------------------------------------------------
_MINHASH_SIG_ORACLE = f"""
WITH {_shingle_cte()}
{_sigs_select()}"""


@df_gate(
    "dedup_exact_hash",
    """
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents GROUP BY MD5(text) ORDER BY doc_id""",
)
def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup through the REAL pipeline (hash-groupBy, map-side
    combined): lowest-key survivor + copy count per content hash."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        dedup.exact_dedup(docs)
        .select(F.col("doc_id").cast("long"), F.col("n_copies").cast("long"))
        .orderBy("doc_id")
    )


@df_gate("dedup_minhash_signatures", _MINHASH_SIG_ORACLE)
def _q_minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature build (shingle → min-hash per seed), the map stage
    of MinHash-LSH dedup."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.minhash_signatures(docs)


# --- MinHash LSH candidate pairs ----------------------------------------------
def _bands_union() -> str:
    rows = N_H // dedup.LSH_BANDS
    selects = []
    for b in range(dedup.LSH_BANDS):
        parts = ", ".join(
            f"CAST(sig_{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        selects.append(
            f"SELECT *, {b} AS band, {_duck_md5i(f'CONCAT_WS(chr(124), {parts})')} AS bucket FROM sigs"
        )
    return "\nUNION ALL\n".join(selects)


_MATCH_SUM = " + ".join(
    f"(CASE WHEN a.sig_{i} = b.sig_{i} THEN 1 ELSE 0 END)" for i in range(N_H)
)

_MINHASH_PAIRS_ORACLE = f"""
WITH {_shingle_cte()},
sigs AS ({_sigs_select()}),
banded AS ({_bands_union()})
SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS key_a, CAST(b.doc_id AS BIGINT) AS key_b,
       ({_MATCH_SUM}) / {float(N_H)} AS est_jaccard
FROM banded a JOIN banded b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id"""


@df_gate("dedup_minhash_lsh_pairs", _MINHASH_PAIRS_ORACLE)
def _q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded LSH near-dup candidates + estimated Jaccard (the shuffle-join
    stage of MinHash dedup)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.minhash_lsh_pairs(dedup.minhash_signatures(docs))


# --- n-gram Jaccard verify ------------------------------------------------------
_JACCARD_ORACLE = f"""
WITH {_shingle_cte()},
cand AS (
  SELECT a.doc_id AS key_a, b.doc_id AS key_b
  FROM (SELECT DISTINCT doc_id FROM sh) a
  JOIN (SELECT DISTINCT doc_id FROM sh) b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id < 100
),
inter AS (
  SELECT c.key_a, c.key_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.key_a
  JOIN sh sb ON sb.doc_id = c.key_b AND sb.shingle = sa.shingle
  GROUP BY c.key_a, c.key_b
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)
SELECT CAST(i.key_a AS BIGINT) AS key_a, CAST(i.key_b AS BIGINT) AS key_b,
       CAST(i.n_inter AS DOUBLE) / (za.n + zb.n - i.n_inter) AS jaccard
FROM inter i JOIN sizes za ON za.doc_id = i.key_a JOIN sizes zb ON zb.doc_id = i.key_b"""


@df_gate("dedup_ngram_jaccard_pairs", _JACCARD_ORACLE)
def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard verification stage over a deterministic
    candidate set (consecutive doc_ids < 100 that both have shingles)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh_docs = dedup.shingles(docs).select("doc_id").distinct()
    a = sh_docs.select(F.col("doc_id").alias("key_a")).where(F.col("key_a") < 100)
    b = sh_docs.select(F.col("doc_id").alias("key_b"))
    pairs = a.join(b, F.col("key_b") == F.col("key_a") + 1)
    out = dedup.ngram_jaccard(docs, pairs)
    return out.select(
        "key_a", "key_b", (F.col("jaccard").cast("double")).alias("jaccard")
    )


# --- SimHash fingerprints -------------------------------------------------------
def _simhash_oracle() -> str:
    h = _duck_md5i("term")
    bit_sums = ",\n    ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN tf ELSE -tf END) AS s_{b}"
        for b in range(SIM_BITS)
    )
    fingerprint = " + ".join(
        f"(CASE WHEN s_{b} >= 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(SIM_BITS)
    )
    return f"""
WITH tok AS ({tok_cte('duckdb')}),
tf AS (
  SELECT doc_id, term, {h} AS h, COUNT(*) AS tf
  FROM tok GROUP BY doc_id, term
),
bits AS (
  SELECT doc_id,
    {bit_sums}
  FROM tf GROUP BY doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST({fingerprint} AS BIGINT) AS simhash
FROM bits"""


@df_gate("dedup_simhash_fingerprint", _simhash_oracle())
def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """48-bit SimHash per document (Charikar bit-majority over term hashes)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.simhash(docs)


# --- embedding cosine top-k ------------------------------------------------------
_EMB_UNNEST = """
ev AS (
  SELECT e.vec_id, u.idx, CAST(u.val AS DOUBLE) AS x
  FROM embeddings e,
  LATERAL (SELECT UNNEST(e.embedding) AS val, GENERATE_SUBSCRIPTS(e.embedding, 1) AS idx) u
)"""

_COSINE_TOPK_ORACLE = f"""
WITH {_EMB_UNNEST},
qv AS (SELECT idx, x AS y FROM ev WHERE vec_id = 0),
acc AS (
  SELECT ev.vec_id,
         SUM(CAST(ev.x * qv.y AS DECIMAL(30,15))) AS dot,
         SUM(CAST(ev.x * ev.x AS DECIMAL(30,15))) AS nv2
  FROM ev JOIN qv USING (idx) GROUP BY ev.vec_id
),
nq AS (SELECT SQRT(CAST(SUM(CAST(y * y AS DECIMAL(30,15))) AS DOUBLE)) AS nq FROM qv)
SELECT CAST(acc.vec_id AS BIGINT) AS vec_id,
       ROUND(CAST(acc.dot AS DOUBLE) / (SQRT(CAST(acc.nv2 AS DOUBLE)) * nq.nq), 8) AS cosine
FROM acc, nq
ORDER BY cosine DESC, vec_id ASC
LIMIT 10"""


@df_gate("embedding_cosine_topk", _COSINE_TOPK_ORACLE)
def _q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against vec 0 (the ANN correctness
    baseline), DECIMAL-exact accumulation."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
    out = similarity.cosine_topk(emb, [float(v) for v in q], k=10)
    return out.select("vec_id", F.round("cosine", 8).alias("cosine"))


# --- embedding near-dup pairs -----------------------------------------------------
_NEAR_DUP_ORACLE = f"""
WITH {_EMB_UNNEST},
sub AS (SELECT * FROM ev WHERE vec_id < 200),
nrm AS (SELECT vec_id, SQRT(CAST(SUM(CAST(x * x AS DECIMAL(30,15))) AS DOUBLE)) AS nrm FROM sub GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS key_a, b.vec_id AS key_b,
         SUM(CAST(a.x * b.x AS DECIMAL(30,15))) AS dot
  FROM sub a JOIN sub b ON a.idx = b.idx AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
)
SELECT CAST(d.key_a AS BIGINT) AS key_a, CAST(d.key_b AS BIGINT) AS key_b,
       ROUND(CAST(d.dot AS DOUBLE) / (na.nrm * nb.nrm), 8) AS cosine
FROM dots d JOIN nrm na ON na.vec_id = d.key_a JOIN nrm nb ON nb.vec_id = d.key_b
WHERE ROUND(CAST(d.dot AS DOUBLE) / (na.nrm * nb.nrm), 8) >= 0.25"""


@df_gate("embedding_near_dup_pairs", _NEAR_DUP_ORACLE)
def _q_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (cos ≥ 0.25) over vec_id<200 —
    the verify stage behind LSH blocking."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(F.col("vec_id") < 200)
    return similarity.cosine_all_pairs(emb, threshold=0.25)


# --- ANN: deterministic MD5-sign-plane LSH, fully oracle-checked --------------------
ANN_PLANES = 12
ANN_PROBE = 2


def _ann_oracle() -> str:
    """DuckDB replays the WHOLE ANN pipeline: MD5 ±1 hyperplanes →
    DECIMAL-exact projections → signature bits → Hamming-≤2 candidate set →
    DECIMAL-exact cosine rerank. Same algorithm, independent execution."""
    sgn_hash = _duck_md5i(
        "CONCAT(CAST(p.p AS VARCHAR), ':', CAST(i.idx - 1 AS VARCHAR))"
    )
    return f"""
WITH {_EMB_UNNEST},
pl AS (
  SELECT p.p, i.idx,
         CASE WHEN {sgn_hash} % 2 = 1 THEN 1.0 ELSE -1.0 END AS sgn
  FROM (SELECT UNNEST(RANGE({ANN_PLANES})) AS p) p
  CROSS JOIN (SELECT DISTINCT idx FROM ev) i
),
proj AS (
  SELECT ev.vec_id, pl.p,
         CAST(SUM(CAST(ev.x * pl.sgn AS DECIMAL(30,15))) AS DOUBLE) AS pr
  FROM ev JOIN pl ON pl.idx = ev.idx GROUP BY ev.vec_id, pl.p
),
sig AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN pr >= 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS sig
  FROM proj GROUP BY vec_id
),
qs AS (SELECT sig AS qsig FROM sig WHERE vec_id = 0),
cand AS (SELECT s.vec_id FROM sig s, qs WHERE bit_count(xor(s.sig, qs.qsig)) <= {ANN_PROBE}),
qv AS (SELECT idx, x AS y FROM ev WHERE vec_id = 0),
acc AS (
  SELECT ev.vec_id,
         SUM(CAST(ev.x * qv.y AS DECIMAL(30,15))) AS dot,
         SUM(CAST(ev.x * ev.x AS DECIMAL(30,15))) AS nv2
  FROM ev JOIN qv USING (idx)
  WHERE ev.vec_id IN (SELECT vec_id FROM cand)
  GROUP BY ev.vec_id
),
nq AS (SELECT SQRT(CAST(SUM(CAST(y * y AS DECIMAL(30,15))) AS DOUBLE)) AS nq FROM qv)
SELECT CAST(acc.vec_id AS BIGINT) AS vec_id,
       ROUND(CAST(acc.dot AS DOUBLE) / (SQRT(CAST(acc.nv2 AS DOUBLE)) * nq.nq), 8) AS cosine
FROM acc, nq
ORDER BY cosine DESC, vec_id ASC
LIMIT 10"""


@df_gate("ann_lsh_cosine_topk", _ann_oracle())
def _q_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-10 (MD5 random-sign hyperplanes +
    Hamming-2 multiprobe + DECIMAL-exact rerank). Deterministic end to end,
    so the DuckDB oracle replays it exactly — the former rows-only check is
    now a full value-hash gate. Recall vs the exact top-k is asserted ≥0.9
    in tests/test_pipeline.py::test_ann_recall."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
    planes = similarity.md5_sign_planes(dim=len(q), n_planes=ANN_PLANES)
    signed = similarity.add_lsh_signature(
        emb, dim=len(q), n_planes=ANN_PLANES, planes=planes
    )
    out = similarity.ann_lsh_topk(
        signed,
        np.asarray(q, dtype=np.float64),
        k=10,
        n_planes=ANN_PLANES,
        probe_hamming=ANN_PROBE,
        planes=planes,
        decimal_rerank=True,
    )
    return out.select("vec_id", F.round("cosine", 8).alias("cosine"))


# --- ANN quality signal: recall@10 vs the exact scan, both oracle-replayed ----------
def _ann_recall_oracle() -> str:
    sgn_hash = _duck_md5i(
        "CONCAT(CAST(p.p AS VARCHAR), ':', CAST(i.idx - 1 AS VARCHAR))"
    )
    return f"""
WITH {_EMB_UNNEST},
pl AS (
  SELECT p.p, i.idx,
         CASE WHEN {sgn_hash} % 2 = 1 THEN 1.0 ELSE -1.0 END AS sgn
  FROM (SELECT UNNEST(RANGE({ANN_PLANES})) AS p) p
  CROSS JOIN (SELECT DISTINCT idx FROM ev) i
),
proj AS (
  SELECT ev.vec_id, pl.p,
         CAST(SUM(CAST(ev.x * pl.sgn AS DECIMAL(30,15))) AS DOUBLE) AS pr
  FROM ev JOIN pl ON pl.idx = ev.idx GROUP BY ev.vec_id, pl.p
),
sig AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN pr >= 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS sig
  FROM proj GROUP BY vec_id
),
qs AS (SELECT sig AS qsig FROM sig WHERE vec_id = 0),
cand AS (SELECT s.vec_id FROM sig s, qs WHERE bit_count(xor(s.sig, qs.qsig)) <= {ANN_PROBE}),
qv AS (SELECT idx, x AS y FROM ev WHERE vec_id = 0),
nq AS (SELECT SQRT(CAST(SUM(CAST(y * y AS DECIMAL(30,15))) AS DOUBLE)) AS nq FROM qv),
allcos AS (
  SELECT ev.vec_id,
         CAST(SUM(CAST(ev.x * qv.y AS DECIMAL(30,15))) AS DOUBLE)
           / (SQRT(CAST(SUM(CAST(ev.x * ev.x AS DECIMAL(30,15))) AS DOUBLE)) * (SELECT nq FROM nq)) AS cosine
  FROM ev JOIN qv USING (idx) GROUP BY ev.vec_id
),
exact10 AS (SELECT vec_id FROM allcos ORDER BY cosine DESC, vec_id ASC LIMIT 10),
ann10 AS (
  SELECT vec_id FROM allcos WHERE vec_id IN (SELECT vec_id FROM cand)
  ORDER BY cosine DESC, vec_id ASC LIMIT 10
)
SELECT CAST((SELECT COUNT(*) FROM ann10 WHERE vec_id IN (SELECT vec_id FROM exact10)) AS DOUBLE) / 10.0 AS recall_at_10,
       CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT COUNT(*) FROM ev WHERE idx = 1) AS BIGINT) AS n_vectors"""


@df_gate("ann_recall_at_10", _ann_recall_oracle())
def _q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN quality number, recorded as a gate: recall@10 of the LSH path
    vs the exhaustive scan, plus the candidate-set size that bought it. Both
    sides replay the full deterministic pipeline. NOTE the sf0.01 synthetic
    embeddings have near-random neighbor structure (top cosines ≈0.3), so
    sub-linear probing necessarily misses most 'neighbors' here; on data
    with real near-duplicate structure the same setting reaches recall ≈1.0
    (tests/test_pipeline.py::test_ann_recall_planted_neardups)."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
    planes = similarity.md5_sign_planes(dim=len(q), n_planes=ANN_PLANES)
    signed = similarity.add_lsh_signature(
        emb, dim=len(q), n_planes=ANN_PLANES, planes=planes
    ).persist()
    exact = {
        r.vec_id
        for r in similarity.cosine_topk(emb, [float(v) for v in q], k=10).collect()
    }
    ann = {
        r.vec_id
        for r in similarity.ann_lsh_topk(
            signed,
            np.asarray(q, dtype=np.float64),
            k=10,
            n_planes=ANN_PLANES,
            probe_hamming=ANN_PROBE,
            planes=planes,
            decimal_rerank=True,
        ).collect()
    }
    qsig = 0
    for b, v in enumerate(planes @ np.asarray(q, dtype=np.float64) >= 0):
        qsig |= int(v) << b
    probes = {qsig}
    probes |= {qsig ^ (1 << b) for b in range(ANN_PLANES)}
    probes |= {
        qsig ^ (1 << b1) ^ (1 << b2)
        for b1 in range(ANN_PLANES)
        for b2 in range(b1 + 1, ANN_PLANES)
    }
    n_cand = signed.where(F.col("signature").isin(sorted(probes))).count()
    n_vec = emb.count()
    signed.unpersist()
    return spark.createDataFrame(
        [(len(ann & exact) / 10.0, n_cand, n_vec)],
        "recall_at_10 double, n_candidates long, n_vectors long",
    )


# --- MinHash quality at production parameters (128 perms / 16 bands) ---------
# Planted near-dups: for doc_id < 50, a mutated copy (every 25th post-stop
# token dropped → shingle Jaccard ≈ 0.8) is added under doc_id + 1,000,000.
# Everything is MD5-deterministic, so precision/recall vs exact Jaccard are
# REPLAYED identically by the DuckDB oracle — the quality numbers are the
# gate's recorded output, and any drift in the MinHash path flips the hash.
_Q_HASHES = 128
_Q_BANDS = 16
_Q_DROP = 25
_Q_PLANT = 50
_Q_THRESH = 0.5


def _q_sigs_select(n_hashes: int) -> str:
    mins = ",\n    ".join(
        "MIN({h}) AS sig_{i}".format(
            h=_duck_md5i("CONCAT('{}:', shingle)".format(i)), i=i
        )
        for i in range(n_hashes)
    )
    return f"SELECT CAST(doc_id AS BIGINT) AS doc_id,\n    {mins}\n  FROM sh GROUP BY doc_id"


def _q_bands_union(n_hashes: int, bands: int) -> str:
    rows = n_hashes // bands
    selects = []
    for b in range(bands):
        parts = ", ".join(f"CAST(sig_{b * rows + r} AS VARCHAR)" for r in range(rows))
        selects.append(
            f"SELECT *, {b} AS band, {_duck_md5i(f'CONCAT_WS(chr(124), {parts})')} AS bucket FROM sigs"
        )
    return "\nUNION ALL\n".join(selects)


def _balanced_sum(terms: list[str]) -> str:
    """Parenthesize a sum as a balanced tree — a left-deep 128-term chain
    exceeds DuckDB's binder recursion limit."""
    if len(terms) == 1:
        return terms[0]
    mid = len(terms) // 2
    return f"({_balanced_sum(terms[:mid])} + {_balanced_sum(terms[mid:])})"


def _minhash_quality_oracle() -> str:
    match_sum = _balanced_sum(
        [
            f"(CASE WHEN a.sig_{i} = b.sig_{i} THEN 1 ELSE 0 END)"
            for i in range(_Q_HASHES)
        ]
    )
    return f"""
WITH tok AS ({tok_cte('duckdb')}),
ordd AS (
  SELECT doc_id, term, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS ord
  FROM tok
),
mut AS (
  SELECT doc_id + 1000000 AS doc_id, term,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS ord
  FROM ordd WHERE doc_id < {_Q_PLANT} AND ord % {_Q_DROP} <> {_Q_DROP - 1}
),
allt AS (SELECT * FROM ordd UNION ALL SELECT * FROM mut),
seq AS (
  SELECT doc_id, term, LEAD(term, 1) OVER w AS t1, LEAD(term, 2) OVER w AS t2
  FROM allt WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
),
sh AS MATERIALIZED (SELECT DISTINCT doc_id, CONCAT(term, '_', t1, '_', t2) AS shingle FROM seq WHERE t2 IS NOT NULL),
sigs AS MATERIALIZED ({_q_sigs_select(_Q_HASHES)}),
banded AS MATERIALIZED ({_q_bands_union(_Q_HASHES, _Q_BANDS)}),
cand AS (
  SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS key_a, CAST(b.doc_id AS BIGINT) AS key_b,
         ({match_sum}) / {float(_Q_HASHES)} AS ej
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
candf AS (SELECT key_a, key_b FROM cand WHERE ej >= {_Q_THRESH}),
inter AS (
  SELECT sa.doc_id AS key_a, sb.doc_id AS key_b, COUNT(*) AS n_inter
  FROM sh sa JOIN sh sb ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
  GROUP BY sa.doc_id, sb.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
truth AS (
  SELECT CAST(i.key_a AS BIGINT) AS key_a, CAST(i.key_b AS BIGINT) AS key_b
  FROM inter i JOIN sizes za ON za.doc_id = i.key_a JOIN sizes zb ON zb.doc_id = i.key_b
  WHERE CAST(i.n_inter AS DOUBLE) / (za.n + zb.n - i.n_inter) >= {_Q_THRESH}
),
hit AS (
  SELECT c.key_a FROM candf c JOIN truth t ON t.key_a = c.key_a AND t.key_b = c.key_b
)
SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
       CAST((SELECT COUNT(*) FROM candf) AS BIGINT) AS n_candidates,
       CAST((SELECT COUNT(*) FROM hit) AS BIGINT) AS n_hits,
       CAST((SELECT COUNT(*) FROM hit) AS DOUBLE) / NULLIF((SELECT COUNT(*) FROM candf), 0) AS precision_,
       CAST((SELECT COUNT(*) FROM hit) AS DOUBLE) / NULLIF((SELECT COUNT(*) FROM truth), 0) AS recall_"""


@df_gate("dedup_minhash_quality", _minhash_quality_oracle())
def _q_minhash_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash dedup at production parameters (128 permutations, 16 bands of
    8 — the Common-Crawl-style configuration) with MEASURED precision/recall
    against exact shingle Jaccard on a planted near-dup corpus."""
    from .analysis.analyzer import post_stop_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    kept = F.array_join(
        F.filter(
            post_stop_tokens(F.col("text")),
            lambda t, i: (i % _Q_DROP) != (_Q_DROP - 1),
        ),
        " ",
    )
    mutated = docs.where(F.col("doc_id") < _Q_PLANT).select(
        (F.col("doc_id") + F.lit(1000000)).alias("doc_id"), kept.alias("text")
    )
    aug = docs.unionByName(mutated)

    cand = (
        dedup.minhash_lsh_pairs(
            dedup.minhash_signatures(aug, n_hashes=_Q_HASHES),
            n_hashes=_Q_HASHES,
            bands=_Q_BANDS,
        )
        .where(F.col("est_jaccard") >= _Q_THRESH)
        .select("key_a", "key_b")
    )

    sh = dedup.shingles(aug)
    inter = (
        sh.select(F.col("doc_id").alias("key_a"), "shingle")
        .join(sh.select(F.col("doc_id").alias("key_b"), "shingle"), "shingle")
        .where(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    truth = (
        inter.join(sizes.select(F.col("doc_id").alias("key_a"), F.col("n").alias("n_a")), "key_a")
        .join(sizes.select(F.col("doc_id").alias("key_b"), F.col("n").alias("n_b")), "key_b")
        .where(
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            >= _Q_THRESH
        )
        .select("key_a", "key_b")
    )
    n_truth = truth.count()
    n_cand = cand.count()
    n_hit = cand.join(truth, ["key_a", "key_b"], "left_semi").count()
    return spark.createDataFrame(
        [
            (
                n_truth,
                n_cand,
                n_hit,
                (n_hit / n_cand) if n_cand else None,
                (n_hit / n_truth) if n_truth else None,
            )
        ],
        "n_truth long, n_candidates long, n_hits long, precision_ double, recall_ double",
    )


# --- reference §2.14 extras (SQL templates on both engines) -------------------------
@gate("morelikethis_top_terms")
def _q_mlt(d: str) -> str:
    """MoreLikeThis interesting-term selection: top-5 terms of doc 0 by
    tf·idf with DefaultSimilarity idf = 1 + ln(N/(df+1))
    (MoreLikeThis.java createQueue; TFIDFSimilarity.idf)."""
    return f"""
WITH tok AS ({tok_cte(d)}),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
dfv AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
tfv AS (SELECT term, COUNT(*) AS tf FROM tok WHERE doc_id = 0 GROUP BY term)
SELECT tfv.term AS term, CAST(tfv.tf AS BIGINT) AS tf, CAST(dfv.df AS BIGINT) AS df,
       ROUND(tfv.tf * (1.0 + LN(n.n / (dfv.df + 1.0))), 6) AS score
FROM tfv JOIN dfv ON tfv.term = dfv.term CROSS JOIN n
ORDER BY score DESC, tfv.term ASC
LIMIT 5"""


@gate("suggest_prefix_completion")
def _q_suggest(d: str) -> str:
    """AnalyzingSuggester analog: weight-ordered completion of a prefix from
    the term dictionary, weight = total term frequency
    (lucene/suggest/.../AnalyzingSuggester.java)."""
    return f"""
WITH tok AS ({tok_cte(d)})
SELECT term, CAST(COUNT(*) AS BIGINT) AS weight
FROM tok WHERE term LIKE 's%'
GROUP BY term
ORDER BY weight DESC, term ASC
LIMIT 10"""


@gate("spellcheck_direct")
def _q_spellcheck(d: str) -> str:
    """DirectSpellChecker: candidate corrections within edit distance 2,
    ranked by (distance asc, df desc) (DirectSpellChecker.java:532)."""
    return f"""
WITH tok AS ({tok_cte(d)}),
dict AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term)
SELECT term, CAST(df AS BIGINT) AS df,
       CAST(LEVENSHTEIN(term, 'merg') AS BIGINT) AS dist
FROM dict WHERE LEVENSHTEIN(term, 'merg') <= 2
ORDER BY dist ASC, df DESC, term ASC
LIMIT 10"""


# --- spatial: geofilt + geodist sort -------------------------------------------
# Deterministic lat/lon derived from doc_id (identical integer arithmetic in
# both dialects); oracle reproduces the same haversine on DuckDB doubles.
_GEO_ORACLE = """
WITH pts AS (
  SELECT doc_id,
         ((doc_id * 37) % 1800) / 10.0 - 90.0  AS lat,
         ((doc_id * 73) % 3600) / 10.0 - 180.0 AS lon
  FROM documents
),
d AS (
  SELECT doc_id,
         2 * 6371.0087714 * ASIN(SQRT(
           POWER(SIN(RADIANS(lat - 10.0) / 2), 2)
           + COS(RADIANS(10.0)) * COS(RADIANS(lat))
             * POWER(SIN(RADIANS(lon - 20.0) / 2), 2)
         )) AS dist
  FROM pts
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, ROUND(dist, 4) AS dist_km
FROM d WHERE dist <= 3000.0
ORDER BY dist ASC, doc_id ASC
LIMIT 25"""


@df_gate("spatial_geofilt_topk", _GEO_ORACLE)
def _q_geofilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{!geofilt} + sort=geodist() asc (LatLonType.java:147-240): box
    prefilter → exact haversine ≤ d → nearest-k. Runs the REAL spatial
    module over synthetic-but-deterministic coordinates."""
    from .query import spatial

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pts = docs.select(
        "doc_id",
        (((F.col("doc_id") * 37) % 1800) / 10.0 - 90.0).alias("lat"),
        (((F.col("doc_id") * 73) % 3600) / 10.0 - 180.0).alias("lon"),
    )
    out = spatial.geodist_topk(
        pts, "lat", "lon", 10.0, 20.0, k=25, within_km=3000.0,
        key_cols=("doc_id",),
    )
    return out.select("doc_id", F.round("dist_km", 4).alias("dist_km"))


# --- dedup: candidate pairs → duplicate groups ---------------------------------
# Transitive closure of the MinHash-LSH candidate pairs; the oracle closes
# the SAME pair SQL with a recursive CTE (min label over reachability).
_CC_ORACLE = f"""
WITH RECURSIVE {_shingle_cte()},
sigs AS ({_sigs_select()}),
banded AS ({_bands_union()}),
pairs AS (
  SELECT DISTINCT a.doc_id AS key_a, b.doc_id AS key_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
edges AS (
  SELECT key_a AS src, key_b AS dst FROM pairs
  UNION
  SELECT key_b AS src, key_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
)
SELECT CAST(src AS BIGINT) AS key,
       CAST(LEAST(src, MIN(dst)) AS BIGINT) AS component
FROM reach GROUP BY src"""


@df_gate("dedup_connected_components", _CC_ORACLE)
def _q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → duplicate groups: iterative min-label propagation
    (the transitive-closure stage a keep-one-per-group dedup pipeline needs
    after LSH); oracle = recursive-CTE closure of the identical pairs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(dedup.minhash_signatures(docs))
    return dedup.connected_components(pairs)


# --- end-to-end curation pipeline ----------------------------------------------
# pipeline/curate.py: lang filter → quality filter → exact dedup → MinHash-LSH
# near-dup groups → canonical survivors. Every stage's oracle fragment is the
# SAME SQL the per-stage gates use (langid/quality thresholds, MD5 exact
# groups, shingle→sig→band pairs, recursive-CTE closure), composed over the
# progressively filtered doc set — so a wiring bug BETWEEN stages (wrong
# join, filter applied to the wrong frame, sigs computed pre-filter) breaks
# this row even while each stage's own gate stays green.
def _curate_oracle() -> str:
    return f"""
WITH RECURSIVE tok_all AS ({tok_cte('duckdb', stop_filter=False)}),
per AS (
  SELECT doc_id,
         COUNT(*) AS n_tokens,
         SUM(LENGTH(term)) AS sum_len,
         SUM(CASE WHEN term IN ({_STOPLIST_SQL}) THEN 1 ELSE 0 END) AS n_stop
  FROM tok_all GROUP BY doc_id
),
keepq AS (
  SELECT doc_id FROM per
  WHERE CAST(n_stop AS DOUBLE) / n_tokens >= 0.03
    AND n_tokens >= 5
    AND CAST(sum_len AS DOUBLE) / n_tokens BETWEEN 2.0 AND 12.0
),
exact AS (
  SELECT MIN(d.doc_id) AS doc_id
  FROM documents d JOIN keepq k ON k.doc_id = d.doc_id
  GROUP BY MD5(d.text)
),
tok AS ({tok_cte('duckdb')}),
seq AS (
  SELECT doc_id, term,
         LEAD(term, 1) OVER w AS t1,
         LEAD(term, 2) OVER w AS t2
  FROM tok WHERE doc_id IN (SELECT doc_id FROM exact)
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sh AS (
  SELECT DISTINCT doc_id, CONCAT(term, '_', t1, '_', t2) AS shingle
  FROM seq WHERE t2 IS NOT NULL
),
sigs AS ({_sigs_select()}),
banded AS ({_bands_union()}),
pairs AS (
  SELECT DISTINCT a.doc_id AS key_a, b.doc_id AS key_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
edges AS (
  SELECT key_a AS src, key_b AS dst FROM pairs
  UNION
  SELECT key_b AS src, key_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
),
comp AS (
  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS canonical
  FROM reach GROUP BY src
)
SELECT CAST(e.doc_id AS BIGINT) AS doc_id
FROM exact e LEFT JOIN comp c ON c.doc_id = e.doc_id
WHERE c.canonical IS NULL OR c.canonical = e.doc_id
ORDER BY doc_id"""


@df_gate("curation_pipeline", _curate_oracle())
def _q_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship LLM-data flow through the REAL composed pipeline
    (pipeline/curate.py:52): survivors of lang→quality→exact→LSH-groups."""
    from .pipeline.curate import curate_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out, _report = curate_corpus(docs, key_col="doc_id", lang="en")
    return out.select(F.col("doc_id").cast("long").alias("doc_id")).orderBy("doc_id")


# --- recursive prefix tree spatial (shapes beyond point-radius) -----------------
_POLY = (
    (0.0, 0.0), (0.0, 40.0), (25.0, 40.0), (32.0, 15.0), (12.0, -8.0)
)


def _poly_oracle() -> str:
    from .query.spatial_prefix import Polygon, polygon_refine_sql

    refine = polygon_refine_sql("lat", "lon", Polygon(_POLY))
    return f"""
WITH pts AS (
  SELECT doc_id,
         (CAST((doc_id * 37) % 1800 AS DOUBLE) / 10.0 - 90.0) AS lat,
         (CAST((doc_id * 73) % 3600 AS DOUBLE) / 10.0 - 180.0) AS lon
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id FROM pts
WHERE {refine}
ORDER BY doc_id"""


@df_gate("spatial_prefix_polygon", _poly_oracle())
def _q_prefix_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RecursivePrefixTreeStrategy intersects(polygon): quad-cell covering
    (full cells by prefix, boundary cells + generated ray-cast refine) vs
    the DuckDB oracle running the IDENTICAL even-odd test directly on every
    point (RecursivePrefixTreeStrategy.java:40-90 semantics: the strategy
    is a pruning plan, never a different answer)."""
    from .query.spatial_prefix import Polygon, prefix_tree_search, quad_cell_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pts = docs.select(
        "doc_id",
        (((F.col("doc_id") * 37) % 1800) / 10.0 - 90.0).alias("lat"),
        (((F.col("doc_id") * 73) % 3600) / 10.0 - 180.0).alias("lon"),
    ).withColumn("cell", quad_cell_col(F.col("lat"), F.col("lon"), 12))
    out = prefix_tree_search(pts, Polygon(_POLY), detail_level=7, cell_col="cell")
    return out.select(F.col("doc_id").cast("long")).orderBy("doc_id")

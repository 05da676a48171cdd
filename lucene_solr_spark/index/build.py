"""Inverted-index build: pages → docs / terms / postings / lineage.

Spark-first re-expression of the Lucene write path
(DocInverterPerField.java:92-172 → TermsHashPerField.java:141-165 →
Lucene41PostingsWriter.java:240-266 → DocumentsWriterPerThread.java:465-501):

  read → dedup(url, keep latest warc_ts) → deterministic docIDs (global url
  rank) → JVM tokenize+explode → groupBy(term, doc) [tf + positions] →
  repartition(termID, chunk) + sortWithinPartitions → mapInPandas pack →
  parquet segments + lineage rows.

Scale design (the part that must survive 100 TB):

- **Skew**: head terms ("spark", "data", …) have posting lists with millions
  of docs. The pack key is (term_id, chunk_id) where chunk_id =
  doc_id // chunk_span — a *deterministic* salt that (a) bounds every pack
  group to chunk_span docs (no OOM on the 'the'-shaped term),
  (b) preserves global docID order across chunks so query-side concat and
  segment merge are pure appends, exactly like Lucene's 128-doc blocks.
- **One wide shuffle**: explode → groupBy(term, doc) does map-side partial
  aggregation (Spark hash agg) before the exchange, like the in-RAM
  TermsHash; the (term→termID) join is the only other exchange.
- **Norms are denormalized into posting rows** (norm_bytes parallel array),
  the analog of Lucene's per-segment .nvd file: query-time scoring is then a
  single scan + kernel with NO join against the docs table.
- **Block metadata every 128 docs** (Lucene41PostingsFormat block size):
  last_doc for skip/conjunction, block max(tf) + max(norm_byte) for lossless
  block-max WAND bounds.
- **Lineage**: one row per (segment), with doc ranges and counts; a build
  driven from the lineage table skips completed segments on restart
  (UpdateLog-style recoverability, UpdateLog.java:71-258).

Segments are contiguous docID ranges (segment = doc_id // seg_span), so a
sort-merge compaction of two segments is concatenation per termID.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..analysis.analyzer import token_array, ENGLISH_STOP_WORDS, MAX_TOKEN_LENGTH
from .docids import assign_dense_ids
from .norms import encode_norm

BLOCK_SIZE = 128  # Lucene41PostingsFormat.BLOCK_SIZE (:384)
DEFAULT_CHUNK_SPAN = 1 << 16  # max docs per posting-row chunk (skew bound).
# Sizing: a head term present in every doc of a chunk yields a row of
# ~5 arrays x 64k ints + positions ~ 1-2 MB — safely under executor task
# memory even with many concurrent tasks; 262144 (the old default) produced
# 6-8 MB rows whose UnsafeRow serialization OOMed 8g executors.

POSTINGS_SCHEMA = (
    "term_id long, seg_id int, chunk_id long, first_doc long, df_chunk int, "
    "doc_gaps array<int>, tfs array<int>, norm_bytes array<int>, "
    "skip_last_doc array<long>, block_max_tf array<int>, block_max_nb array<int>, "
    "pos_flat array<int>"
)


@dataclass
class IndexPaths:
    root: str

    @property
    def docs(self) -> str:
        return os.path.join(self.root, "docs")

    @property
    def terms(self) -> str:
        return os.path.join(self.root, "terms")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def lineage(self) -> str:
        return os.path.join(self.root, "lineage")

    @property
    def stats(self) -> str:
        return os.path.join(self.root, "stats.json")


def _pack_rows(
    term_ids: np.ndarray,
    seg_id: int,
    chunk_id: int,
    docs: np.ndarray,
    tfs: np.ndarray,
    nbs: np.ndarray,
    pos_lists,
) -> dict:
    """Pack one already-doc-sorted (term, seg, chunk) slice → posting-row
    dict, numpy-only (Lucene41PostingsWriter semantics: docID deltas
    :240-246, 128-doc block metadata :256-266)."""
    gaps = np.empty_like(docs)
    gaps[0] = 0
    gaps[1:] = np.diff(docs)
    n = len(docs)
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    ends = np.minimum((np.arange(nblocks) + 1) * BLOCK_SIZE, n) - 1
    if pos_lists is not None:
        pos_flat = (
            np.concatenate([np.asarray(p, dtype=np.int32) for p in pos_lists])
            if n
            else np.array([], dtype=np.int32)
        )
    else:
        pos_flat = None
    return {
        "term_id": int(term_ids[0]),
        "seg_id": int(seg_id),
        "chunk_id": int(chunk_id),
        "first_doc": int(docs[0]),
        "df_chunk": n,
        "doc_gaps": gaps.astype(np.int32),
        "tfs": tfs.astype(np.int32),
        "norm_bytes": nbs.astype(np.int32),
        "skip_last_doc": docs[ends],
        "block_max_tf": np.array(
            [tfs[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE].max() for i in range(nblocks)],
            dtype=np.int32,
        ),
        "block_max_nb": np.array(
            [nbs[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE].max() for i in range(nblocks)],
            dtype=np.int32,
        ),
        "pos_flat": pos_flat,
    }


def _invert_batch(doc_ids: np.ndarray, token_lists, positions: bool) -> pd.DataFrame:
    """Vectorized per-doc inversion of one Arrow batch of (doc_id, tokens[]):
    → rows (doc_id, term, tf[, positions]) with pre-stop positions.

    This is DocInverterPerField.java:92-172 as a batch kernel: the term →
    positions map is built inside the executor's Arrow batch (factorize +
    stable lexsort + boundary split), so the JVM never materializes
    object-hash aggregation state. The old formulation —
    explode → groupBy(term, doc).agg(collect_list(pos)) — OOMed 8-10 GB
    executors at 5×10^8 tokens; this kernel is O(batch) memory."""
    lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64, count=len(token_lists))
    total = int(lens.sum())
    empty = {"doc_id": np.array([], dtype=np.int64), "term": [], "tf": np.array([], dtype=np.int32)}
    if positions:
        empty["positions"] = []
    if total == 0:
        return pd.DataFrame(empty)
    flat_terms = np.concatenate([np.asarray(t, dtype=object) for t in token_lists if len(t)])
    flat_docs = np.repeat(np.asarray(doc_ids, dtype=np.int64), lens)
    starts = np.cumsum(lens) - lens
    flat_pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)

    stop = ENGLISH_STOP_WORDS
    keep = np.fromiter(
        (t not in stop and len(t) <= MAX_TOKEN_LENGTH for t in flat_terms),
        dtype=bool,
        count=total,
    )
    flat_terms, flat_docs, flat_pos = flat_terms[keep], flat_docs[keep], flat_pos[keep]
    if len(flat_terms) == 0:
        return pd.DataFrame(empty)

    codes, uniques = pd.factorize(flat_terms, sort=False)
    order = np.lexsort((codes, flat_docs))  # stable → positions stay ascending
    d, c, p = flat_docs[order], codes[order], flat_pos[order]
    change = np.flatnonzero((np.diff(d) != 0) | (np.diff(c) != 0))
    bounds = np.concatenate(([0], change + 1, [len(d)]))
    out = {
        "doc_id": d[bounds[:-1]],
        "term": uniques[c[bounds[:-1]]],
        "tf": np.diff(bounds).astype(np.int32),
    }
    if positions:
        out["positions"] = np.split(p.astype(np.int32), bounds[1:-1])
    return pd.DataFrame(out)


def invert_tokens(
    with_ids: DataFrame, text_col: str, positions: bool
) -> DataFrame:
    """(doc_id, text) → (doc_id, term, tf[, positions]) via JVM tokenization
    + the Arrow inversion kernel. No wide JVM aggregation; the rows feed the
    pack shuffle directly."""
    schema = "doc_id long, term string, tf int" + (
        ", positions array<int>" if positions else ""
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield _invert_batch(pdf["doc_id"].values, pdf["toks"].values, positions)

    src = with_ids.select(
        "doc_id",
        F.coalesce(token_array(F.col(text_col)), F.array().cast("array<string>")).alias(
            "toks"
        ),
    )
    return src.mapInPandas(kernel, schema=schema)


def pack_sorted_partitions(enriched: DataFrame, positions: bool) -> DataFrame:
    """Pack posting rows via repartition-on-key + sortWithinPartitions +
    mapInPandas, instead of groupBy().applyInPandas.

    Why: at web scale the vocabulary has 10^7–10^8 terms, so per-group
    pandas-DataFrame overhead (one per term×chunk in applyInPandas)
    dominates. Here each Arrow batch holds MANY groups and the group
    boundaries are found vectorized (np.unique on the sorted keys); rows of
    a group that straddle Arrow batches are carried over inside the
    iterator. The shuffle is the same single exchange keyed
    (term_id, chunk_id) — chunking is the deterministic head-term salt."""
    cols = ["term_id", "seg_id", "chunk_id", "doc_id", "tf", "norm_byte"] + (
        ["positions"] if positions else []
    )

    def kernel(batches):
        import pandas as pd  # noqa: F401 (worker-side)

        carry: pd.DataFrame | None = None

        def pack_block(pdf: pd.DataFrame, upto: int) -> pd.DataFrame:
            rows = []
            tid = pdf["term_id"].values[:upto]
            cid = pdf["chunk_id"].values[:upto]
            sid = pdf["seg_id"].values[:upto]
            docs = pdf["doc_id"].values[:upto].astype(np.int64)
            tfs = pdf["tf"].values[:upto]
            nbs = pdf["norm_byte"].values[:upto]
            poss = pdf["positions"].values[:upto] if positions else None
            # group change points on the (term, seg, chunk) sorted key
            change = np.flatnonzero(
                (np.diff(tid) != 0) | (np.diff(cid) != 0) | (np.diff(sid) != 0)
            )
            starts = np.concatenate(([0], change + 1))
            ends_ = np.concatenate((change + 1, [upto]))
            for s, e in zip(starts, ends_):
                rows.append(
                    _pack_rows(
                        tid[s:e],
                        int(sid[s]),
                        int(cid[s]),
                        docs[s:e],
                        tfs[s:e],
                        nbs[s:e],
                        poss[s:e] if positions else None,
                    )
                )
            return pd.DataFrame(rows)

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            # hold back the last (term, chunk) group — it may continue in
            # the next Arrow batch of this partition
            tid = pdf["term_id"].values
            cid = pdf["chunk_id"].values
            sid_ = pdf["seg_id"].values
            last_mask = (tid == tid[-1]) & (cid == cid[-1]) & (sid_ == sid_[-1])
            cut = len(pdf) - int(last_mask[::-1].argmin() if not last_mask.all() else len(pdf))
            if cut > 0:
                out = pack_block(pdf, cut)
                if len(out):
                    yield out
            carry = pdf.iloc[cut:].reset_index(drop=True)
        if carry is not None and len(carry):
            yield pack_block(carry, len(carry))

    return (
        enriched.select(*cols)
        .repartition(F.col("term_id"), F.col("chunk_id"))
        .sortWithinPartitions("term_id", "seg_id", "chunk_id", "doc_id")
        .mapInPandas(kernel, schema=POSTINGS_SCHEMA)
    )


def _norm_byte_udf():
    @F.pandas_udf("int")
    def enc(dl: pd.Series) -> pd.Series:
        return pd.Series(encode_norm(dl.values).astype(np.int32))

    return enc


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    text_col: str = "text",
    key_col: str = "url",
    ts_col: str | None = None,
    num_segments: int = 1,
    positions: bool = True,
    chunk_span: int = DEFAULT_CHUNK_SPAN,
    resume: bool = False,
) -> IndexPaths:
    """Build (or resume) the full inverted index under `out_dir`."""
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    # --- 1. dedup: updateDocument semantics = delete-by-key + re-add
    # (IndexWriter.java:1187) → keep the newest warc_ts per url
    src = pages.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    if ts_col is not None:
        # max_by aggregation, NOT a row_number window: hash agg does
        # map-side partial combining (a window sort-shuffles every row with
        # no partial). Ordering key struct(ts, text) keeps ties deterministic.
        src = src.groupBy(key_col).agg(
            F.max_by(
                F.col(text_col), F.struct(F.col(ts_col), F.col(text_col))
            ).alias(text_col)
        )

    # --- 2. deterministic docIDs = global url rank (parquet-staged: the
    # sorted corpus is read twice and caching it OOMs executors at scale)
    ids_staging = os.path.join(out_dir, "_staging_ids")
    with_ids = assign_dense_ids(
        src.select(key_col, text_col),
        order_col=key_col,
        id_col="doc_id",
        staging_dir=ids_staging,
    )

    # --- 3+4. tokenize (JVM) + per-doc inversion (Arrow kernel) in ONE
    # map-side pass: (doc_id, term, tf, positions), no wide JVM aggregation
    term_doc = invert_tokens(with_ids, text_col, positions)
    # term_doc is reused by 3 downstream jobs (doc lengths, term stats,
    # postings pack). Stage it as parquet rather than .persist(): at CC
    # scale this is hundreds of GB of (term, doc, positions) rows, and
    # Spark's cache serializer builds columnar batches in executor heap
    # (observed OOM at 2M docs x 8g executors even with DISK_ONLY), while a
    # parquet staging table is written streaming and read back compressed.
    staging = os.path.join(out_dir, "_staging_term_doc")
    term_doc.write.mode("overwrite").parquet(staging)
    term_doc = spark.read.parquet(staging)

    # doc length = Σ tf (post-stop, DocInverterPerField.java:172); docs whose
    # tokens were all stopwords/empty get dl=0 via the left join
    dl_nonempty = term_doc.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    docs_tbl = (
        with_ids.select("doc_id", F.col(key_col))
        .join(dl_nonempty, "doc_id", "left")
        .withColumn("dl", F.coalesce(F.col("dl"), F.lit(0)).cast("long"))
        .select(
            "doc_id",
            key_col,
            "dl",
            _norm_byte_udf()(F.col("dl")).alias("norm_byte"),
        )
    )
    # docs live under seg=bulk so NRT appends (docs/seg=N) share the layout
    docs_tbl.write.mode("overwrite").parquet(os.path.join(paths.docs, "seg=bulk"))
    docs_tbl = spark.read.parquet(paths.docs)

    # one aggregation job for the collection statistics
    totals = docs_tbl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")
    ).head()
    max_doc = int(totals["n"])
    sum_ttf = int(totals["t"] or 0)
    seg_span = max(1, math.ceil(max_doc / num_segments))
    # per-segment doc counts + token totals → lineage metrics (second job
    # only needed for multi-segment builds)
    if num_segments == 1:
        seg_doc_stats = {0: (max_doc, sum_ttf)}
    else:
        seg_doc_stats = {
            int(r.seg): (int(r.n_docs), int(r.ttf))
            for r in docs_tbl.groupBy(
                (F.col("doc_id") / F.lit(seg_span)).cast("int").alias("seg")
            )
            .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("ttf"))
            .collect()
        }

    # --- 5. term dictionary with deterministic termIDs (global term rank)
    term_stats = term_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("ttf")
    )
    terms_tbl = assign_dense_ids(term_stats, order_col="term", id_col="term_id")
    terms_tbl.write.mode("overwrite").parquet(paths.terms)
    terms_tbl = spark.read.parquet(paths.terms)

    # --- 6. postings: join termIDs + norms, chunk, pack
    enriched = (
        term_doc.join(terms_tbl.select("term", "term_id"), "term")
        .join(docs_tbl.select("doc_id", "norm_byte"), "doc_id")
        .withColumn("seg_id", (F.col("doc_id") / F.lit(seg_span)).cast("int"))
        .withColumn("chunk_id", (F.col("doc_id") / F.lit(chunk_span)).cast("long"))
    )

    if num_segments > 1:
        enriched = enriched.persist()

    done_segs: set[int] = set()
    if resume and os.path.exists(paths.lineage):
        done_segs = {
            r.seg_id
            for r in spark.read.parquet(paths.lineage)
            .where(F.col("status") == "complete")
            .select("seg_id")
            .collect()
        }

    for seg in range(num_segments):
        if seg in done_segs:
            continue
        seg_rows = enriched.where(F.col("seg_id") == seg)
        packed = pack_sorted_partitions(seg_rows, positions=positions)
        # pack input is sorted (term_id, seg, chunk, doc) within partitions
        # and mapInPandas preserves order, so rows arrive term-sorted — no
        # extra sort of the (multi-MB) packed rows before write
        packed.write.mode("overwrite").parquet(
            os.path.join(paths.postings, f"seg_id={seg}")
        )
        seg_df = spark.read.parquet(os.path.join(paths.postings, f"seg_id={seg}"))
        lineage_row = (
            seg_df.agg(
                F.min("first_doc").alias("doc_id_min"),
                F.max(F.element_at("skip_last_doc", -1)).alias("doc_id_max"),
                F.count_distinct("term_id").alias("term_count"),
                F.sum("df_chunk").alias("row_count"),
                (F.sum("df_chunk") * 8).alias("posting_bytes"),  # df_chunk == len(doc_gaps); avoids scanning the arrays
            )
            .withColumn("seg_id", F.lit(seg))
            .withColumn("status", F.lit("complete"))
            .withColumn("built_at_snapshot", F.lit(int(time.time() * 1000)))
            .withColumn("n_docs", F.lit(seg_doc_stats.get(seg, (0, 0))[0]))
            .withColumn("ttf", F.lit(seg_doc_stats.get(seg, (0, 0))[1]))
        )
        lineage_row.write.mode("append").parquet(paths.lineage)

    with open(paths.stats, "w") as fh:
        json.dump(
            {
                "max_doc": int(max_doc),
                "sum_total_term_freq": int(sum_ttf),
                "num_segments": num_segments,
                "seg_span": seg_span,
                "chunk_span": chunk_span,
                "positions": positions,
                "block_size": BLOCK_SIZE,
            },
            fh,
        )
    spark.catalog.clearCache()
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(ids_staging, ignore_errors=True)
    return paths

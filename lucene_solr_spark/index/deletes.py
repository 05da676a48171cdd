"""Deletes: tombstone table + physical reclaim at merge.

Reference semantics (BufferedDeletesStream.java, IndexWriter.java:1187,
SegmentMerger docID remap around deletes):

- **delete-by-key / delete-by-term** append doc_ids to a `deletes/` tombstone
  table (the liveDocs bitset analog — our docIDs are global, so one table
  covers all segments).
- **Search-time**: Searcher anti-joins every result against the tombstones
  (docs become invisible immediately, like a deleted doc under an NRT
  reader).
- **Stats**: maxDoc / df / ttf keep counting deleted docs until reclaim —
  exactly Lucene, where CollectionStatistics.maxDoc() and docFreq include
  deleted docs until the merge rewrites the segment.
- **Reclaim** (`purge_deletes`): merge all live segments with the tombstones
  filtered out of every posting row, then refresh the term dictionary's
  df/ttf (keeping term_ids stable), rewrite the docs tables without the
  deleted rows, regenerate stats.json, and clear the tombstone table. After
  a purge the index is value-identical to a fresh build over the surviving
  docs (docID holes are fine: docIDs are global url ranks, never remapped).

Scale: the tombstone set NEVER materializes on the driver. It stays a
DataFrame end to end: grouped by chunk_id (= doc_id // chunk_span, the same
salt that keys posting rows) into per-chunk sorted delete arrays — each
array is the per-chunk liveDocs bitset analog, bounded to chunk_span docs —
and JOINED to the posting rows on chunk_id. Posting rows in chunks with no
deletions never enter the Python kernel at all (anti-join bypass), so a
purge's rewrite cost is proportional to the touched chunks, and a 10^12-doc
index with 10^10 tombstones shuffles only the tombstones + touched rows.
The set digest (segment markers recording which delete generation a merge
already applied) is likewise a commutative distributed aggregate, two longs
on the driver instead of the set.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import IndexPaths, POSTINGS_SCHEMA, _pack_rows, terms_ttf_col


def _deletes_dir(paths: IndexPaths) -> str:
    return os.path.join(paths.root, "deletes")


def tombstone_digest(tomb: DataFrame) -> str:
    """Stable digest of a tombstone set — lets a segment record which
    delete generation was already applied to its postings (merge-inline
    reclaim), so purge_deletes can skip rewriting it.

    Commutative distributed aggregate (count + XOR of per-doc xxhash64 —
    XOR is order-independent and overflow-free, and the tombstone table is
    distinct so no pair can cancel): two longs to the driver, the set
    itself never leaves the cluster.

    Collision model: XOR-of-hashes is linearly malleable, so two DIFFERENT
    equal-size tombstone sets can be constructed to collide if doc_ids are
    attacker-influenced (random collision odds stay ~2^-64). The digest is
    a change-detection optimization for purge scheduling inside a trusted
    pipeline, not an integrity MAC; deployments where doc_ids are
    adversarial should force-purge (ignore the digest) or swap in a
    cryptographic order-independent combiner (e.g. sum of sha2 prefixes
    mod 2^128)."""
    row = tomb.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(F.col("doc_id"))).alias("h"),
    ).head()
    return f"{int(row['n'])}:{int(row['h'] or 0)}"


def read_deletes(spark: SparkSession, paths: IndexPaths) -> DataFrame | None:
    d = _deletes_dir(paths)
    if not os.path.exists(d):
        return None
    return spark.read.parquet(d).select("doc_id").distinct()


def delete_by_key(
    spark: SparkSession,
    paths: IndexPaths | str,
    keys: list | DataFrame,
    key_col: str = "url",
) -> int:
    """Tombstone every doc whose key is in `keys` (deleteDocuments(Term) on
    the unique-key field). Returns the number of docs tombstoned.

    `keys` may be a driver-side list (small explicit deletes) or a DataFrame
    of keys (bulk updates) — the DataFrame path semi-joins distributed, so a
    10^8-key catch-up batch never materializes on the driver."""
    paths = paths if isinstance(paths, IndexPaths) else IndexPaths(paths)
    docs = spark.read.parquet(paths.docs)
    if isinstance(keys, DataFrame):
        key_frame = keys.select(F.col(keys.columns[0]).alias(key_col)).distinct()
        hit = docs.join(key_frame, key_col, "left_semi").select("doc_id")
    else:
        hit = docs.where(F.col(key_col).isin(list(keys))).select("doc_id")
    n = hit.count()
    if n:
        hit.write.mode("append").parquet(_deletes_dir(paths))
    return n


def delete_by_term(spark: SparkSession, paths: IndexPaths | str, term: str) -> int:
    """Tombstone every doc whose text contains `term` — delete-by-query with
    a TermQuery (BufferedDeletesStream applies these against each segment;
    here one postings scan finds the global doc set)."""
    paths = paths if isinstance(paths, IndexPaths) else IndexPaths(paths)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for row in pdf.itertuples(index=False):
                gaps = np.asarray(row.doc_gaps, dtype=np.int64)
                outs.append(row.first_doc + np.cumsum(gaps))
            if outs:
                yield pd.DataFrame({"doc_id": np.concatenate(outs)})

    postings = spark.read.option("basePath", paths.postings).parquet(
        os.path.join(paths.postings, "seg_id=*")
    )
    hit = (
        postings.where(F.col("term") == term)
        .select("first_doc", "doc_gaps")
        .mapInPandas(kernel, schema="doc_id long")
        .distinct()
    )
    n = hit.count()
    if n:
        hit.write.mode("append").parquet(_deletes_dir(paths))
    return n


def filter_deleted_rows(
    rows: DataFrame, tomb: DataFrame, positions: bool, chunk_span: int
) -> DataFrame:
    """Drop tombstoned docs from posting rows, re-packing gap/block metadata
    (the liveDocs skip in TermsConsumer.java:86-171's merge loop).

    Fully distributed: tombstones are grouped into per-chunk sorted arrays
    (chunk_id = doc_id // chunk_span, the posting-row salt, so each array is
    bounded to chunk_span entries — the per-segment liveDocs bitset analog)
    and joined to the posting rows on chunk_id. Rows in chunks with no
    deletions bypass the Python kernel entirely via anti-join, so rewrite
    cost is proportional to TOUCHED chunks, and nothing ever collects to
    the driver."""
    tomb_chunks = (
        tomb.select(
            # integer floor-division (`div`), matching the build side's
            # `g_doc // chunk_span` exactly — float division would only be
            # exact while doc_id < 2^53
            F.expr(f"doc_id div {int(chunk_span)}").alias("chunk_id"),
            "doc_id",
        )
        .groupBy("chunk_id")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("del_docs"))
    )
    out_cols = [f.name for f in rows.schema.fields]
    untouched = rows.join(tomb_chunks.select("chunk_id"), "chunk_id", "left_anti")
    touched = rows.join(tomb_chunks, "chunk_id", "inner")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                dels = np.asarray(row.del_docs, dtype=np.int64)
                gaps = np.asarray(row.doc_gaps, dtype=np.int64)
                docs = row.first_doc + np.cumsum(gaps)
                idx = np.minimum(np.searchsorted(dels, docs), len(dels) - 1)
                keep = dels[idx] != docs
                tfs = np.asarray(row.tfs, dtype=np.int64)
                if not keep.any():
                    continue
                if keep.all():
                    pos_lists = _split_pos(row, tfs) if positions else None
                    kept_docs, kept_tfs = docs, tfs
                    kept_nbs = np.asarray(row.norm_bytes, dtype=np.int64)
                else:
                    pos_lists = (
                        [p for p, k in zip(_split_pos(row, tfs), keep) if k]
                        if positions
                        else None
                    )
                    kept_docs, kept_tfs = docs[keep], tfs[keep]
                    kept_nbs = np.asarray(row.norm_bytes, dtype=np.int64)[keep]
                out.append(
                    _pack_rows(
                        row.term,
                        int(row.seg_id),
                        int(row.chunk_id),
                        kept_docs,
                        kept_tfs,
                        kept_nbs,
                        pos_lists,
                    )
                )
            if out:
                yield pd.DataFrame(out)

    filtered = touched.mapInPandas(kernel, schema=POSTINGS_SCHEMA)
    return filtered.select(out_cols).unionByName(untouched.select(out_cols))


def _split_pos(row, tfs: np.ndarray) -> list:
    cuts = np.cumsum(tfs)[:-1]
    return np.split(np.asarray(row.pos_flat, dtype=np.int32), cuts)


def purge_deletes(spark: SparkSession, paths: IndexPaths | str) -> int:
    """Physically reclaim all tombstoned docs: rewrite every live segment's
    postings without them, refresh df/ttf in the term dictionary (term_ids
    stable), drop the docs rows, regenerate stats, clear the tombstones.
    Returns the number of docs reclaimed."""
    from .lineage import live_seg_ids

    paths = paths if isinstance(paths, IndexPaths) else IndexPaths(paths)
    tomb = read_deletes(spark, paths)
    if tomb is None:
        return 0
    n_deleted = tomb.count()  # scalar only — the set stays distributed
    if n_deleted == 0:
        return 0
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "128")

    with open(paths.stats) as fh:
        meta = json.load(fh)
    positions = bool(meta.get("positions", True))
    chunk_span = int(meta.get("chunk_span", 1 << 16))

    live = live_seg_ids(spark, paths.lineage)
    if live is None:
        live = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(paths.postings)
            if d.startswith("seg_id=")
        )
    digest = tombstone_digest(tomb)
    for seg_id in live:
        seg_dir = os.path.join(paths.postings, f"seg_id={seg_id}")
        marker = os.path.join(seg_dir, "_deletes_applied.json")
        if os.path.exists(marker):
            with open(marker) as fh:
                applied = json.load(fh)
            if applied.get("digest") == digest:
                continue  # merge already reclaimed this exact tombstone set
        rows = spark.read.parquet(seg_dir)
        filtered = filter_deleted_rows(
            rows.withColumn("seg_id", F.lit(seg_id).cast("int")),
            tomb,
            positions,
            chunk_span,
        )
        tmp = seg_dir + "__purge_tmp"
        (
            filtered.repartition(F.col("term"))
            .sortWithinPartitions("term", "chunk_id")
            .write.mode("overwrite")
            .option("parquet.block.size", str(32 * 1024 * 1024))
            .parquet(tmp)
        )
        shutil.rmtree(seg_dir)
        os.rename(tmp, seg_dir)

    # docs tables: drop tombstoned rows
    docs = spark.read.parquet(paths.docs)
    kept = docs.join(tomb, "doc_id", "left_anti")
    tmp_docs = paths.docs + "__purge_tmp"
    kept.write.mode("overwrite").parquet(os.path.join(tmp_docs, "seg=purged"))
    shutil.rmtree(paths.docs)
    os.rename(tmp_docs, paths.docs)

    # term dictionary: refresh df/ttf from the purged postings, keep ids
    postings_all = spark.read.option("basePath", paths.postings).parquet(
        os.path.join(paths.postings, "seg_id=*")
    )
    new_stats = postings_all.groupBy("term").agg(
        F.sum("df_chunk").alias("df"), F.sum(terms_ttf_col()).alias("ttf")
    )
    terms_dir = os.path.join(paths.root, meta.get("terms_dir", "terms"))
    old_terms = spark.read.parquet(terms_dir).select("term", "term_id")
    refreshed = old_terms.join(new_stats, "term")  # vanished terms drop out
    tmp_terms = terms_dir + "__purge_tmp"
    refreshed.write.mode("overwrite").parquet(tmp_terms)
    shutil.rmtree(terms_dir)
    os.rename(tmp_terms, terms_dir)

    # stats: recount over surviving docs. The lineage snapshot is refreshed
    # to the CURRENT live-lineage sums (purge never edits lineage), so the
    # next append_segment reconstructs exact post-purge stats as
    # `stats + (lineage_sum_then - this_snapshot)` — see nrt.write_stats.
    docs2 = spark.read.parquet(paths.docs)
    totals = docs2.agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")).head()
    meta["max_doc"] = int(totals["n"])
    meta["sum_total_term_freq"] = int(totals["t"] or 0)
    from .lineage import latest_rows, read_lineage

    lineage = read_lineage(spark, paths.lineage)
    if lineage is not None and "n_docs" in lineage.columns:
        sums = (
            latest_rows(lineage)
            .where(F.col("status") == "complete")
            .agg(F.sum("n_docs").alias("n"), F.sum("ttf").alias("t"))
            .head()
        )
        meta["lineage_n_docs"] = int(sums["n"] or 0)
        meta["lineage_ttf"] = int(sums["t"] or 0)
    with open(paths.stats, "w") as fh:
        json.dump(meta, fh)

    shutil.rmtree(_deletes_dir(paths), ignore_errors=True)
    return int(n_deleted)

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

Scale: tombstones ship to the filter kernel as ONE sorted broadcast array
(np.searchsorted membership) — the bitset equivalent; a delete wave of 10^8
docs is an ~800 MB broadcast, at which point purge soon or shard the purge
by doc range (chunk_id prune: only posting rows whose chunk intersects the
tombstone range are rewritten).
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


def tombstone_digest(deleted_sorted: np.ndarray) -> str:
    """Stable digest of a tombstone set — lets a segment record which
    delete generation was already applied to its postings (merge-inline
    reclaim), so purge_deletes can skip rewriting it."""
    import hashlib

    arr = np.sort(np.asarray(deleted_sorted, dtype=np.int64))
    return hashlib.md5(arr.tobytes()).hexdigest()


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
    rows: DataFrame, deleted_sorted: np.ndarray, positions: bool
) -> DataFrame:
    """Drop tombstoned docs from posting rows, re-packing gap/block metadata
    (the liveDocs skip in TermsConsumer.java:86-171's merge loop)."""
    spark = rows.sparkSession
    bc = spark.sparkContext.broadcast(np.sort(deleted_sorted.astype(np.int64)))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dels = bc.value
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                gaps = np.asarray(row.doc_gaps, dtype=np.int64)
                docs = row.first_doc + np.cumsum(gaps)
                if len(dels):
                    idx = np.minimum(np.searchsorted(dels, docs), len(dels) - 1)
                    keep = dels[idx] != docs
                else:
                    keep = np.ones(len(docs), dtype=bool)
                tfs = np.asarray(row.tfs, dtype=np.int64)
                if keep.all():
                    out.append(
                        _pack_rows(
                            row.term,
                            int(row.seg_id),
                            int(row.chunk_id),
                            docs,
                            tfs,
                            np.asarray(row.norm_bytes, dtype=np.int64),
                            _split_pos(row, tfs) if positions else None,
                        )
                    )
                    continue
                if not keep.any():
                    continue
                pos_lists = None
                if positions:
                    pos_lists = [
                        p for p, k in zip(_split_pos(row, tfs), keep) if k
                    ]
                out.append(
                    _pack_rows(
                        row.term,
                        int(row.seg_id),
                        int(row.chunk_id),
                        docs[keep],
                        tfs[keep],
                        np.asarray(row.norm_bytes, dtype=np.int64)[keep],
                        pos_lists,
                    )
                )
            if out:
                yield pd.DataFrame(out)

    return rows.mapInPandas(kernel, schema=POSTINGS_SCHEMA)


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
    deleted = np.array(sorted(r.doc_id for r in tomb.collect()), dtype=np.int64)
    if len(deleted) == 0:
        return 0
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "128")

    with open(paths.stats) as fh:
        meta = json.load(fh)
    positions = bool(meta.get("positions", True))

    live = live_seg_ids(spark, paths.lineage)
    if live is None:
        live = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(paths.postings)
            if d.startswith("seg_id=")
        )
    digest = tombstone_digest(deleted)
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
            deleted,
            positions,
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
    return int(len(deleted))

"""Segment compaction: Lucene's tiered sort-merge, re-expressed for Spark.

Reference semantics being reproduced:

- **Sort-merge on termID**: Lucene merges segments by walking every
  segment's term enum in sorted order through a priority queue
  (reference MultiTermsEnum.java:34-132) and, per term, concatenating the
  segments' posting lists with docID remapping
  (TermsConsumer.java:86-171, SegmentMerger.java:71-130). Our segments are
  *contiguous global docID ranges* (seg = doc_id // seg_span, docIDs are
  global url ranks), so no remap is needed — the merge of k segments'
  postings for one term is a concatenation in doc order followed by
  re-delta-encoding. Spark expression: union the segment parquet dirs,
  `groupBy(term, chunk_id).applyInPandas(recombine)` — a single shuffle
  keyed exactly like the build's pack stage, which is the sort-merge.

- **Merge selection**: TieredMergePolicy picks up to `maxMergeAtOnce`
  segments per merge, prefers merges of equal-sized segments (skew score),
  never produces a merged segment over `maxMergedSegmentBytes`, and ignores
  the "floor" by rounding tiny segments up to `floorSegmentBytes`
  (TieredMergePolicy.java:81-88 defaults; selection loop :317-423; score =
  skew * pow(totalSize, 0.05) at :366-380, lower is better). `plan_merges`
  reproduces that scoring on lineage rows.

Scale notes (100 TB): the merge shuffle is keyed on (term_id, chunk_id) —
the same deterministic skew bound as the build (no posting group can exceed
chunk_span docs), and AQE handles residual imbalance. Segment parquet dirs
are immutable inputs; the merged segment is written to a fresh directory and
the lineage table is appended (old rows marked superseded) before old dirs
are dropped — crash-safe in the same append-only style as Lucene's
write-once segments + SegmentInfos generation swap.
"""

from __future__ import annotations

import math
import os
import shutil
import time
from dataclasses import dataclass

import pandas as pd
import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .build import BLOCK_SIZE, IndexPaths, POSTINGS_SCHEMA
from .lineage import gc_superseded, latest_rows, read_lineage

# TieredMergePolicy defaults (TieredMergePolicy.java:81-88)
MAX_MERGE_AT_ONCE = 10
SEGS_PER_TIER = 10.0
FLOOR_SEGMENT_BYTES = 2 * 1024 * 1024  # 2 MB
MAX_MERGED_SEGMENT_BYTES = 5 * 1024 * 1024 * 1024  # 5 GB


@dataclass(frozen=True)
class SegmentInfo:
    seg_id: int
    posting_bytes: int


@dataclass(frozen=True)
class MergePlan:
    seg_ids: tuple[int, ...]
    score: float
    merged_bytes: int


def merge_score(window: list[SegmentInfo], floor_bytes: int = FLOOR_SEGMENT_BYTES) -> float:
    """TieredMergePolicy merge scoring: skew * totalBytes^0.05, lower is
    better — equal-sized merges beat lopsided ones, smaller merges beat
    bigger at equal skew (TieredMergePolicy.java:366-380)."""
    sizes = sorted((max(s.posting_bytes, floor_bytes) for s in window), reverse=True)
    tot = sum(sizes)
    return (sizes[0] / tot) * (tot ** 0.05)


def plan_merges(
    segments: list[SegmentInfo],
    max_merge_at_once: int = MAX_MERGE_AT_ONCE,
    segs_per_tier: float = SEGS_PER_TIER,
    floor_bytes: int = FLOOR_SEGMENT_BYTES,
    max_merged_bytes: int = MAX_MERGED_SEGMENT_BYTES,
) -> list[MergePlan]:
    """TieredMergePolicy-style merge selection over lineage rows.

    Mirrors TieredMergePolicy.findMerges (:317-423): compute the allowed
    segment budget from the total index size; while over budget, enumerate
    candidate windows over the size-sorted segment list, score each by
    skew * totalBytes^0.05 (lower = better, :366-380), emit the best,
    repeat on the remainder.
    """
    segs = sorted(segments, key=lambda s: (-s.posting_bytes, s.seg_id))
    floored = lambda b: max(b, floor_bytes)  # noqa: E731

    total = sum(floored(s.posting_bytes) for s in segs)
    # allowed count: levels of segsPerTier segments, each tier 10x bigger
    # (TieredMergePolicy.java:338-352)
    allowed = 0.0
    level = float(floor_bytes)
    remaining = float(total)
    while remaining > 0:
        count_at_level = remaining / level
        if count_at_level < segs_per_tier:
            allowed += math.ceil(count_at_level)
            break
        allowed += segs_per_tier
        remaining -= segs_per_tier * level
        level *= max_merge_at_once

    plans: list[MergePlan] = []
    pool = list(segs)
    while len(pool) > allowed and len(pool) >= 2:
        best: MergePlan | None = None
        for start in range(len(pool)):
            window = pool[start : start + max_merge_at_once]
            if len(window) < 2:
                break
            tot = sum(floored(s.posting_bytes) for s in window)
            if tot > max_merged_bytes:
                continue
            score = merge_score(window, floor_bytes)
            if best is None or score < best.score:
                best = MergePlan(
                    seg_ids=tuple(s.seg_id for s in window),
                    score=score,
                    merged_bytes=tot,
                )
        if best is None:
            break
        plans.append(best)
        chosen = set(best.seg_ids)
        pool = [s for s in pool if s.seg_id not in chosen]
    return plans


def merge_segments(
    spark: SparkSession,
    paths: IndexPaths | str,
    seg_ids: list[int],
    new_seg_id: int | None = None,
    apply_deletes: bool = True,
    lineage_lock=None,
    skip_gc: bool = False,
) -> int:
    """Compact `seg_ids` into one new segment. Returns the new seg_id.

    Write-once discipline: new dir written first, lineage appended, old dirs
    removed last. Readers resolve segments through lineage (Searcher.reopen
    reads only live segments' dirs), so a crash after the lineage append but
    before the source rmtree cannot double-count postings; the orphaned dirs
    are garbage-collected here on the next merge (gc_superseded).

    Tombstoned docs are dropped INLINE during the merge (Lucene merges skip
    deleted docs in the same pass, TermsConsumer.java:86-171) — a merge
    right after a delete wave reclaims those postings for free instead of
    leaving them for purge_deletes to rewrite again. The merged dir records
    a digest of the tombstone set it applied, so purge_deletes skips its
    postings rewrite when the set is unchanged. Lineage n_docs/ttf still
    carry the source sums (docID allocation must never reuse ids; BM25
    stats keep counting deleted docs until purge, like CollectionStatistics
    over an index with deletions)."""
    from .deletes import filter_deleted_rows, read_deletes, tombstone_digest

    paths = paths if isinstance(paths, IndexPaths) else IndexPaths(paths)
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "128")
    # startup GC: clear dirs a previous crash left superseded-but-present
    # (the concurrent scheduler GCs once per round instead — a racing GC
    # could observe another thread's half-appended lineage)
    if not skip_gc:
        gc_superseded(spark, paths.postings, paths.lineage)
    if new_seg_id is None:
        existing = [
            int(d.split("=", 1)[1])
            for d in os.listdir(paths.postings)
            if d.startswith("seg_id=")
        ]
        new_seg_id = max(existing) + 1

    srcs = [os.path.join(paths.postings, f"seg_id={s}") for s in sorted(seg_ids)]
    union = spark.read.parquet(*srcs)

    tomb = None
    if apply_deletes:
        tomb = read_deletes(spark, paths)
        if tomb is not None and tomb.limit(1).count() == 0:
            tomb = None  # empty tombstone table: nothing to reclaim
    if tomb is not None:
        import json as _json

        with open(paths.stats) as fh:
            _meta = _json.load(fh)
        union = filter_deleted_rows(
            union,
            tomb,
            bool(_meta.get("positions", True)),
            int(_meta.get("chunk_span", 1 << 16)),
        )

    # streaming recombine over term-sorted partitions (one exchange that
    # also gives the write its term-sorted layout) — groupBy.applyInPandas
    # pays per-group pandas overhead, ruinous at web-scale vocabulary where
    # most (term, chunk) groups are singletons (see make_stream_recombiner)
    from .build import make_stream_recombiner

    merged = (
        union.repartition(F.col("term"))
        .sortWithinPartitions("term", "chunk_id")
        .mapInPandas(make_stream_recombiner(None), schema=POSTINGS_SCHEMA)
        .withColumn("seg_id", F.lit(new_seg_id).cast("int"))
    )
    out_dir = os.path.join(paths.postings, f"seg_id={new_seg_id}")
    # merged segments are long-lived: rows stay term-sorted through the
    # kernel, so parquet row-group min/max stats stay tight for query-side
    # term pruning (rows are ≤ chunk_span docs ≈ 1-2 MB)
    (
        merged.sortWithinPartitions("term", "chunk_id")
        .write.mode("overwrite")
        .option("parquet.block.size", str(32 * 1024 * 1024))
        .parquet(out_dir)
    )
    if tomb is not None:
        # marker AFTER the parquet write (the writer clears the dir), BEFORE
        # the lineage append — a crash in between replays the whole merge
        with open(os.path.join(out_dir, "_deletes_applied.json"), "w") as fh:
            import json as _json

            _json.dump({"digest": tombstone_digest(tomb)}, fh)

    # lineage: new segment row + superseded markers, all in one append;
    # n_docs/ttf of the merged segment = sum over its sources (doc ranges
    # are disjoint, so the metrics are additive). Under the concurrent
    # scheduler the whole read→append→rmtree tail is serialized: parquet
    # appends to ONE directory from concurrent jobs can collide in the
    # shared _temporary staging dir, and a read racing an append could list
    # half-committed part files. The heavy work (the merge shuffle + the
    # new segment's write, each to its own dir) stays fully concurrent.
    import contextlib

    with lineage_lock if lineage_lock is not None else contextlib.nullcontext():
        lineage = read_lineage(spark, paths.lineage)
        src_rows = lineage.where(
            F.col("seg_id").isin([int(s) for s in seg_ids])
            & (F.col("status") == "complete")
        )
        has_metrics = "n_docs" in lineage.columns
        src_totals = (
            src_rows.agg(F.sum("n_docs").alias("n"), F.sum("ttf").alias("t")).head()
            if has_metrics
            else None
        )
        seg_df = spark.read.parquet(out_dir)
        new_row = (
            seg_df.agg(
                F.min("first_doc").alias("doc_id_min"),
                F.max(F.element_at("skip_last_doc", -1)).alias("doc_id_max"),
                F.count_distinct("term").alias("term_count"),
                F.sum("df_chunk").alias("row_count"),
                (F.sum("df_chunk") * 8).alias("posting_bytes"),  # df_chunk == len(doc_gaps); avoids scanning the arrays
            )
            .withColumn("seg_id", F.lit(new_seg_id).cast("int"))
            .withColumn("status", F.lit("complete"))
            .withColumn(
                "built_at_snapshot", F.lit(int(time.time() * 1000)).cast("long")
            )
        )
        if has_metrics:
            new_row = new_row.withColumn(
                "n_docs", F.lit(int(src_totals["n"] or 0)).cast("long")
            ).withColumn("ttf", F.lit(int(src_totals["t"] or 0)).cast("long"))
        superseded = src_rows.withColumn("status", F.lit("superseded")).withColumn(
            "built_at_snapshot", F.lit(int(time.time() * 1000))
        )
        new_row.unionByName(superseded, allowMissingColumns=True).write.mode(
            "append"
        ).parquet(paths.lineage)

        for s in srcs:
            shutil.rmtree(s, ignore_errors=True)
    return new_seg_id


def compact(
    spark: SparkSession,
    paths: IndexPaths | str,
    max_concurrent: int = 4,
    **policy_kwargs,
) -> list[int]:
    """Run the tiered policy to quiescence: plan, merge, re-plan.

    The ConcurrentMergeScheduler analog (ConcurrentMergeScheduler.java:
    maxThreadCount merges in flight, each on its own thread): plans within
    one planning round touch DISJOINT segment sets (plan_merges removes
    chosen segments from the pool), so their merge shuffles + new-segment
    writes run as concurrent Spark jobs from `max_concurrent` driver
    threads — on a busy cluster that overlaps the shuffles' network/IO
    with each other instead of serializing driver barriers. New seg_ids are
    pre-assigned per round, the round GCs once up front, and the lineage
    append tail is serialized under one lock (see merge_segments)."""
    paths = paths if isinstance(paths, IndexPaths) else IndexPaths(paths)
    new_ids: list[int] = []
    while True:
        lineage = read_lineage(spark, paths.lineage)
        live = _live_segments(lineage)
        plans = plan_merges(live, **policy_kwargs)
        if not plans:
            return new_ids
        if max_concurrent <= 1 or len(plans) == 1:
            for plan in plans:
                new_ids.append(merge_segments(spark, paths, list(plan.seg_ids)))
            continue
        import threading
        from concurrent.futures import ThreadPoolExecutor

        gc_superseded(spark, paths.postings, paths.lineage)
        existing = [
            int(d.split("=", 1)[1])
            for d in os.listdir(paths.postings)
            if d.startswith("seg_id=")
        ]
        next_id = max(existing) + 1
        lock = threading.Lock()
        with ThreadPoolExecutor(max_workers=max_concurrent) as pool:
            futs = [
                pool.submit(
                    merge_segments,
                    spark,
                    paths,
                    list(plan.seg_ids),
                    new_seg_id=next_id + i,
                    lineage_lock=lock,
                    skip_gc=True,
                )
                for i, plan in enumerate(plans)
            ]
            new_ids.extend(f.result() for f in futs)


def _live_segments(lineage_df) -> list[SegmentInfo]:
    """Segments whose latest lineage row is `complete` (not superseded)."""
    pdf = (
        latest_rows(lineage_df)
        .where(F.col("status") == "complete")
        .toPandas()
    )
    return [
        SegmentInfo(seg_id=int(r.seg_id), posting_bytes=int(r.posting_bytes))
        for r in pdf.itertuples(index=False)
    ]

"""Lineage table helpers: the SegmentInfos-generation analog.

The lineage parquet is the single source of truth for which segments are
live. Every writer (bulk build, NRT append, merge) appends rows; a segment
is live iff its LATEST row (by built_at_snapshot, ties broken by favoring
'superseded' — a supersede always happens-after the row it replaces) has
status='complete'. Readers resolve segment directories through lineage so a
crash between "append superseded rows" and "remove old dirs" can never
double-count postings (reference SegmentInfos swap semantics,
lucene/core/src/java/org/apache/lucene/index/SegmentInfos.java).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_lineage(spark: SparkSession, lineage_dir: str) -> DataFrame | None:
    """Read the lineage table; mergeSchema tolerates older files that predate
    newer columns (e.g. batch_id)."""
    if not os.path.exists(lineage_dir):
        return None
    return spark.read.option("mergeSchema", "true").parquet(lineage_dir)


def latest_rows(lineage: DataFrame) -> DataFrame:
    """One row per seg_id: the most recent status + metrics.

    'superseded' sorts after 'complete' lexicographically, which doubles as
    the tie-break when a merge writes both rows in the same millisecond."""
    cols = set(lineage.columns)
    aggs = [
        F.max_by("status", F.struct("built_at_snapshot", "status")).alias("status"),
        F.max("posting_bytes").alias("posting_bytes"),
    ]
    for c in ("n_docs", "ttf"):
        if c in cols:
            aggs.append(F.max(c).alias(c))
    return lineage.groupBy("seg_id").agg(*aggs)


def live_seg_ids(spark: SparkSession, lineage_dir: str) -> list[int] | None:
    """seg_ids whose latest lineage status is 'complete'; None if no lineage
    table exists (pre-lineage index → caller falls back to directory glob)."""
    lineage = read_lineage(spark, lineage_dir)
    if lineage is None:
        return None
    rows = (
        latest_rows(lineage)
        .where(F.col("status") == "complete")
        .select("seg_id")
        .collect()
    )
    return sorted(int(r.seg_id) for r in rows)


def all_seg_ids(spark: SparkSession, lineage_dir: str) -> set[int]:
    """Every seg_id ever recorded (complete or superseded) — the namespace a
    new segment id must not collide with."""
    lineage = read_lineage(spark, lineage_dir)
    if lineage is None:
        return set()
    return {int(r.seg_id) for r in lineage.select("seg_id").distinct().collect()}


def applied_batch_ids(spark: SparkSession, lineage_dir: str) -> set[int]:
    """Streaming batch ids already committed — the UpdateLog replay guard.
    Distinct from seg_id: batch numbering (starts at 0 per checkpoint) and
    segment numbering (global, monotone) are separate namespaces."""
    lineage = read_lineage(spark, lineage_dir)
    if lineage is None or "batch_id" not in lineage.columns:
        return set()
    rows = (
        lineage.where(F.col("batch_id").isNotNull() & (F.col("status") == "complete"))
        .select("batch_id")
        .distinct()
        .collect()
    )
    return {int(r.batch_id) for r in rows}


def gc_superseded(spark: SparkSession, postings_dir: str, lineage_dir: str) -> list[int]:
    """Remove posting directories of superseded segments that a crash left
    behind (merge_segments crashed after the lineage append but before the
    rmtree). Safe anytime: lineage, not the directory glob, defines liveness."""
    live = live_seg_ids(spark, lineage_dir)
    if live is None or not os.path.exists(postings_dir):
        return []
    live_set = set(live)
    removed = []
    for d in os.listdir(postings_dir):
        if not d.startswith("seg_id="):
            continue
        try:
            seg = int(d.split("=", 1)[1])
        except ValueError:
            continue  # stray non-segment dir (temp/backup) — not ours to touch
        if seg not in live_set:
            shutil.rmtree(os.path.join(postings_dir, d), ignore_errors=True)
            removed.append(seg)
    return sorted(removed)

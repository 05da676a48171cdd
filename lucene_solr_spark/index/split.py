"""Index splitters (lucene/misc): PKIndexSplitter + MultiPassIndexSplitter.

Reference:
- lucene/misc/src/java/org/apache/lucene/index/PKIndexSplitter.java:38-121 —
  docs matching a Filter go to the first output, the complement to the
  second; each output is a full standalone index.
- lucene/misc/src/java/org/apache/lucene/index/MultiPassIndexSplitter.java:
  48-110 — n equal parts, either sequential docID ranges (-seq) or
  deterministic round-robin; implemented there as "fake deletes" over the
  input reader, exactly the mechanism used here.

Spark shape: a split is a copy + tombstone-the-complement + purge — the
engine's distributed delete machinery (index/deletes.py) already rewrites
segments without the dropped docs and refreshes df/ttf/stats, which is
precisely what the reference's addIndexes(reader-with-deletions) pass
does. docIDs stay stable (sparse) in the outputs rather than being
renumbered; doc identity lives in the key column, so every query API is
unaffected — documented divergence from Lucene's merge-time compaction.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from .build import IndexPaths
from .deletes import _deletes_dir, purge_deletes


def _copy_index(paths: IndexPaths, out_dir: str) -> IndexPaths:
    if os.path.exists(out_dir):
        raise ValueError(f"split output exists: {out_dir}")
    shutil.copytree(paths.root, out_dir)
    out = IndexPaths(out_dir)
    # outputs start clean: the input's pending tombstones are the caller's
    # business (purge first if they should apply)
    if os.path.exists(_deletes_dir(out)):
        shutil.rmtree(_deletes_dir(out))
    return out


def _drop_docs(spark: SparkSession, out: IndexPaths, tomb: DataFrame) -> None:
    if tomb.limit(1).count() == 0:
        return
    tomb.select("doc_id").write.mode("append").parquet(_deletes_dir(out))
    purge_deletes(spark, out)


def pk_split_index(
    spark: SparkSession,
    paths: IndexPaths | str,
    out1: str,
    out2: str,
    first_docs: DataFrame,
) -> tuple[IndexPaths, IndexPaths]:
    """PKIndexSplitter.split(): `first_docs` (a DocSet frame with doc_id —
    any Filter's result, e.g. a range over the key) lands in out1, the
    complement in out2."""
    paths = paths if isinstance(paths, IndexPaths) else IndexPaths(paths)
    docs_all = spark.read.parquet(paths.docs).select("doc_id")
    first = first_docs.select("doc_id").distinct()
    rest = docs_all.join(first, "doc_id", "left_anti")
    a = _copy_index(paths, out1)
    _drop_docs(spark, a, rest)
    b = _copy_index(paths, out2)
    _drop_docs(spark, b, first)
    return a, b


def multi_pass_split(
    spark: SparkSession,
    paths: IndexPaths | str,
    out_dirs: list[str],
    seq: bool = False,
) -> list[IndexPaths]:
    """MultiPassIndexSplitter.split(): n parts; seq=True → contiguous
    docID-rank ranges of equal size, else round-robin by docID rank (the
    reference's deterministic assignment over the live-doc sequence)."""
    paths = paths if isinstance(paths, IndexPaths) else IndexPaths(paths)
    n = len(out_dirs)
    docs_all = spark.read.parquet(paths.docs).select("doc_id")
    max_doc = docs_all.count()
    if max_doc < n:
        raise ValueError("Not enough documents for splitting")
    # doc rank over live docIDs (dense already in a fresh index; rank keeps
    # the assignment faithful after deletes)
    from pyspark.sql import Window

    ranked = docs_all.withColumn(
        "rk", F.row_number().over(Window.orderBy("doc_id")) - 1
    )
    part_size = int(math.ceil(max_doc / n))
    part = (F.col("rk") / part_size).cast("int") if seq else F.col("rk") % n
    assigned = ranked.select("doc_id", part.alias("part"))
    outs = []
    for i, out_dir in enumerate(out_dirs):
        p = _copy_index(paths, out_dir)
        _drop_docs(spark, p, assigned.where(F.col("part") != i))
        outs.append(p)
    return outs

"""Deterministic dense ID assignment by global sort order.

Lucene docIDs are assignment-order-dependent per segment; for reproducible
top-k tie-breaks across parallelism levels (local[8] == local[32] ==
1000-executor cluster) we instead define docID := rank of the unique key in
the global sort order. Implemented scale-out, with no single-partition
bottleneck and no `monotonically_increasing_id` (whose values depend on task
placement):

1. range-repartition + sort within partitions on the key,
2. tag every row with (partition id, local index) in the same pass,
3. per-partition counts (one light job) → cumulative offsets,
4. id = offset[pid] + local index (broadcast join, pure JVM).

The result is independent of where the range boundaries fall: partitions are
disjoint key ranges, so offset + local rank == global rank.

Two materialization strategies for the two passes over the sorted data:
- `staging_dir=None` (small inputs): .persist() the sorted frame.
- `staging_dir=...` (corpus-scale): write the tagged frame to parquet and
  read it back. Spark's cache serializer builds columnar batches in executor
  heap (observed OOMs on multi-GB corpora with 8g executors); a parquet
  stage streams. Because (pid, local index) are COLUMNS, re-read partition
  boundaries are irrelevant.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _tag_local_index(part: DataFrame) -> DataFrame:
    """Append __local_idx = 0-based row index within the (sorted) partition."""
    schema_out = part.schema.fieldNames() + ["__local_idx"]

    def tag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = 0
        for pdf in batches:
            out = pdf.copy()
            out["__local_idx"] = range(base, base + len(pdf))
            base += len(pdf)
            yield out

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(list(part.schema.fields) + [StructField("__local_idx", LongType(), False)])
    out = part.mapInPandas(tag, schema=schema)
    return out.select(*schema_out)


def assign_dense_ids(
    df: DataFrame,
    order_col: str | list[str],
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    staging_dir: str | None = None,
    single_partition: bool = False,
) -> DataFrame:
    """Add `id_col` = 0-based rank of `order_col` (a unique column, or a
    column list whose tuple is unique — e.g. [sort_key, unique_key] for
    index sorting) in the global ascending sort order. Deterministic at any
    parallelism.

    single_partition: small-input fast path — one-task global sort, ids are
    the local indexes directly. Skips the range-sampling job, the
    per-partition count collect, and the offset join (3+ driver barriers);
    same ids by construction. Callers gate it on input size (the bulk
    builder uses its <256 MB small-input test)."""
    spark = df.sparkSession
    cols = [order_col] if isinstance(order_col, str) else list(order_col)
    if single_partition:
        part = df.repartition(1).sortWithinPartitions(*cols)
        tagged = _tag_local_index(part.withColumn("__pid", F.lit(0)))
        return (
            tagged.withColumn(id_col, F.col("__local_idx").cast("long"))
            .drop("__pid", "__local_idx")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # repartitionByRange's boundary-sampling job re-evaluates the input
    # plan (a second full run of whatever produced df — the dedup agg, the
    # dictionary cascade). On the non-staged path, cache the input so the
    # sampling pass materializes it ONCE and the sort pass reads the cache;
    # corpus-scale callers pass staging_dir and keep the streaming behavior
    # (caching multi-GB text columns OOMs executors — see module doc).
    cached_input = None
    if staging_dir is None:
        cached_input = df.persist(StorageLevel.MEMORY_AND_DISK)
        df = cached_input
    part = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    tagged = _tag_local_index(part)

    if staging_dir is not None:
        tagged.write.mode("overwrite").parquet(staging_dir)
        tagged = spark.read.parquet(staging_dir)
    else:
        tagged = tagged.persist(StorageLevel.MEMORY_AND_DISK)

    counts = {
        int(r["__pid"]): int(r["c"])
        for r in tagged.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    if cached_input is not None:
        # tagged is materialized now; the input cache has served both passes
        cached_input.unpersist()
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    offsets_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __offset long"
    )
    return (
        tagged.join(F.broadcast(offsets_df), "__pid")
        .withColumn(id_col, (F.col("__offset") + F.col("__local_idx")).cast("long"))
        .drop("__pid", "__local_idx", "__offset")
    )

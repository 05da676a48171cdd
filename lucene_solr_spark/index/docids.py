"""Deterministic dense ID assignment by global sort order.

Lucene docIDs are assignment-order-dependent per segment; for reproducible
top-k tie-breaks across parallelism levels (local[8] == local[32] ==
1000-executor cluster) we instead define docID := rank of the unique key in
the global sort order. Implemented scale-out, with no single-partition
bottleneck and no `monotonically_increasing_id` (whose values depend on task
placement):

1. range-repartition + sort within partitions on the key,
2. per-partition counts (one light job),
3. cumulative offsets broadcast into a mapInPandas that adds offset+local rank.

The result is independent of where the range boundaries fall: partitions are
disjoint ranges, so offset + local rank == global rank.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def assign_dense_ids(
    df: DataFrame,
    order_col: str,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add `id_col` = 0-based rank of `order_col` (must be unique) in the
    global ascending sort order. Deterministic at any parallelism."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = (
        df.repartitionByRange(num_partitions, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = dict(
        part.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    schema_out = part.drop("__pid").schema.add(id_col, "long", False)

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = offsets[int(pdf["__pid"].iloc[0])]
            out = pdf.drop(columns=["__pid"])
            out[id_col] = range(base + local, base + local + len(pdf))
            local += len(pdf)
            yield out

    out = part.mapInPandas(add_ids, schema=schema_out)
    # note: `part` stays persisted until the consumer is done; caller may
    # materialize `out` then unpersist via spark.catalog.clearCache()
    return out

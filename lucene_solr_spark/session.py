"""SparkSession factory tuned for the index-build / query workload.

Local mode stands in for a multi-executor cluster; every setting below is the
one we would ship to a 1000-executor job (AQE, skew-join handling, Arrow
batches), with sizes scaled for the sandbox.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "lucene-solr-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # 2x cores locally; on a real cluster this would be sized so one
        # shuffle partition of postings fits comfortably in executor memory
        # (~128-256MB), i.e. tens of thousands of partitions at 100TB.
        shuffle_partitions = max(8, cpus * 2)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # posting rows carry multi-hundred-KB arrays; 4096-row columnar
        # reader batches cannot reserve contiguous buffers for them
        .config("spark.sql.parquet.columnarReaderBatchSize", "128")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()

"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship BM25 top-k over sf0.001 documents.
queries()     — one entry per implemented operator (lucene_solr_spark.gate).
oracle_sql()  — DuckDB-equivalent SQL per query, generated from the same
                templates so tokenization/arithmetic match exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lucene_solr_spark import gate


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    gate.register_views(spark, "/root/testdata/sf0.001")
    return spark.sql(gate.bm25_sql("spark", ["spark", "merge", "window"], k=10))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return gate.spark_queries()


def oracle_sql() -> dict[str, str]:
    return gate.oracle_sqls()

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
    """Flagship: the REAL engine path (build_index + Searcher BM25 top-k)
    over /root/testdata/sf0.001 documents; driver checks rows>0."""
    from lucene_solr_spark.gate_engine import _engine_searcher, _to_orig

    s = _engine_searcher(spark, "/root/testdata/sf0.001")
    return _to_orig(s, s.search(["spark", "merge", "window"], k=10), ranked=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return gate.spark_queries()


def oracle_sql() -> dict[str, str]:
    return gate.oracle_sqls()

"""Length/Trim/PatternReplace/Reverse token filters — codegen goldens."""

from __future__ import annotations

from pyspark.sql import functions as F

from lucene_solr_spark.analysis.miscfilters import (
    length_filter,
    pattern_replace,
    reverse_filter,
    trim_filter,
)


def _run(spark, col, toks):
    df = spark.createDataFrame([(toks,)], "toks array<string>")
    return df.select(col.alias("o")).collect()[0].o


def test_length_filter(spark):
    got = _run(spark, length_filter(F.col("toks"), 2, 4), ["a", "ab", "abcd", "abcde"])
    assert got == ["ab", "abcd"]


def test_trim_filter(spark):
    got = _run(spark, trim_filter(F.col("toks")), ["  a ", "b", " "])
    assert got == ["a", "b", ""]


def test_pattern_replace_all_vs_first(spark):
    toks = ["aXbXc", "noX"]
    assert _run(spark, pattern_replace(F.col("toks"), "X", "-"), toks) == ["a-b-c", "no-"]
    assert _run(
        spark, pattern_replace(F.col("toks"), "X", "-", replace_all=False), toks
    ) == ["a-bXc", "no-"]


def test_reverse_filter(spark):
    got = _run(spark, reverse_filter(F.col("toks")), ["abc", "x"])
    assert got == ["cba", "x"]


def test_plan_python_free(spark):
    df = spark.createDataFrame([(["ab"],)], "toks array<string>")
    plan = (
        df.select(length_filter(F.col("toks"), 1, 3))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan

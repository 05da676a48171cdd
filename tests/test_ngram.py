"""Character n-gram / edge n-gram filters vs reference emission order
(NGramTokenFilter.java 4.4, EdgeNGramTokenFilter.java FRONT)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.ngram import char_ngrams, edge_ngrams


def _run(spark, col, toks):
    df = spark.createDataFrame([(toks,)], "toks array<string>")
    return df.select(col.alias("g")).collect()[0].g


def test_char_ngrams_reference_order(spark):
    # NGramTokenFilter 4.4: position-major, size-minor
    got = _run(spark, char_ngrams(F.col("toks"), 1, 2), ["abc"])
    assert got == ["a", "ab", "b", "bc", "c"]
    got2 = _run(spark, char_ngrams(F.col("toks"), 2, 3), ["abcd"])
    assert got2 == ["ab", "abc", "bc", "bcd", "cd"]


def test_char_ngrams_multi_token_and_short(spark):
    got = _run(spark, char_ngrams(F.col("toks"), 2, 2), ["ab", "x", "cde"])
    # "x" is shorter than min_gram -> nothing
    assert got == ["ab", "cd", "de"]
    assert _run(spark, char_ngrams(F.col("toks"), 1, 2), []) == []


def test_edge_ngrams(spark):
    got = _run(spark, edge_ngrams(F.col("toks"), 1, 3), ["spark", "io"])
    assert got == ["s", "sp", "spa", "i", "io"]
    # default (1,1): first character only
    assert _run(spark, edge_ngrams(F.col("toks")), ["spark"]) == ["s"]


def test_edge_ngrams_autocomplete_equivalence(spark):
    # an edge-grammed field answers prefix queries by exact term match
    words = ["spark", "sparse", "spoon", "merge"]
    df = spark.createDataFrame([(w, [w]) for w in words], "w string, toks array<string>")
    grams = df.select("w", F.explode(edge_ngrams(F.col("toks"), 1, 4)).alias("g"))
    hit = grams.where(F.col("g") == "spar").select("w").toPandas()
    assert sorted(hit["w"]) == ["spark", "sparse"]


def test_bad_params(spark):
    with pytest.raises(ValueError):
        char_ngrams(F.col("toks"), 0, 2)
    with pytest.raises(ValueError):
        edge_ngrams(F.col("toks"), 3, 2)


def test_plan_is_python_free(spark):
    df = spark.createDataFrame([(["abc"],)], "toks array<string>")
    plan = df.select(char_ngrams(F.col("toks"), 1, 2)).sample(False, 1.0)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan

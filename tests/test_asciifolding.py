"""ASCIIFoldingFilter: the extracted 4.4 mapping table, codegen fold vs the
str.translate oracle, token-array integration."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.asciifolding import (
    FOLD_MAP,
    fold_column,
    fold_str,
    fold_token_array,
)


def test_table_shape_and_goldens():
    assert len(FOLD_MAP) == 1242  # every case label of the 4.4 switch
    assert fold_str("café") == "cafe"
    assert fold_str("Ærøskøbing") == "AEroskobing"
    assert fold_str("œuvre ﬁne ß") == "oeuvre fine ss"
    assert fold_str("Ĳsselmeer") == "IJsselmeer"
    assert fold_str("“quoted” – dash") == '"quoted" - dash'
    assert fold_str("già perché") == "gia perche"
    # ASCII is untouched; unmapped chars pass through (4.4 has no 00BD)
    assert fold_str("plain ascii 123") == "plain ascii 123"
    assert fold_str("½") == "½"


def test_codegen_matches_translate_oracle(spark):
    rng = np.random.RandomState(5)
    cps = sorted(FOLD_MAP)
    rows = []
    for i in range(40):
        picks = rng.choice(len(cps), size=6)
        s = "x".join(chr(cps[j]) for j in picks) + " plain"
        rows.append((s,))
    df = spark.createDataFrame(rows, "s string")
    got = [r.f for r in df.select(fold_column(F.col("s")).alias("f")).collect()]
    want = [fold_str(r[0]) for r in rows]
    assert got == want


def test_fold_token_array_codegen(spark):
    df = spark.createDataFrame(
        [(["café", "Æther", "plain", "ﬂow"],)], "toks array<string>"
    )
    out = df.select(fold_token_array(F.col("toks")).alias("f")).collect()[0].f
    assert out == ["cafe", "AEther", "plain", "flow"]
    plan = (
        df.select(fold_token_array(F.col("toks")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan


def test_fold_feeds_analysis_chain(spark):
    # folded tokens merge with their ASCII forms in downstream grouping
    from lucene_solr_spark.analysis.analyzer import token_array

    df = spark.createDataFrame(
        [("Café résumé",), ("cafe resume",)], "text string"
    )
    toks = df.select(
        F.explode(fold_token_array(token_array(F.col("text")))).alias("t")
    )
    counts = {r.t: r["count"] for r in toks.groupBy("t").count().collect()}
    assert counts == {"cafe": 2, "resume": 2}

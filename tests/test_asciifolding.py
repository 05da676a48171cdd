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


def test_folding_index_build_and_query(spark, tmp_path_factory):
    # tokenizer='folding': accented query text matches unaccented docs and
    # vice versa through the REAL index; query analysis folds identically
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher

    corpus = {
        "u0": "café résumé merge",
        "u1": "cafe resume spark",
        "u2": "unrelated tokens here",
        "u3": "às vezes cafe",  # 'às' folds to the stopword 'as' -> dropped
    }
    pages = spark.createDataFrame(list(corpus.items()), "url string, text string")
    paths = build_index(
        spark, pages, str(tmp_path_factory.mktemp("fold_idx") / "idx"),
        tokenizer="folding",
    )
    s = Searcher(spark, paths)
    url_of = dict(s.docs.select("doc_id", "url").toPandas().itertuples(index=False, name=None))
    hits = {url_of[r.doc_id] for r in s.search("café", k=10).collect()}
    assert hits == {"u0", "u1", "u3"}
    hits2 = {url_of[r.doc_id] for r in s.search("resume", k=10).collect()}
    assert hits2 == {"u0", "u1"}
    # folded-to-stopword term is not in the dictionary
    assert s.lookup_terms(["as"]).empty
    # phrase across the fold
    ph = {url_of[r.doc_id] for r in s.phrase_search(["cafe", "resume"], k=10).collect()}
    assert ph == {"u0", "u1"}


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

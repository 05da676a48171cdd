"""ShingleFilter + SynonymFilter semantics (ShingleFilter.java,
SolrSynonymParser.java), including the reference's canonical examples."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import token_array
from lucene_solr_spark.analysis.shingle import shingles, shingles_with_fillers
from lucene_solr_spark.analysis.synonyms import (
    expand_clauses,
    map_tokens_col,
    parse_synonyms,
)
from lucene_solr_spark.query.parser import parse


def _run(spark, col, text):
    return spark.range(1).select(
        col.alias("out")
    ).collect()[0]["out"] if text is None else spark.createDataFrame(
        [(text,)], "text string"
    ).select(col.alias("out")).collect()[0]["out"]


def test_shingle_bigrams_reference_example(spark):
    # ShingleFilter javadoc: "please divide this sentence into shingles" →
    # unigrams + "please divide" "divide this" "this sentence"
    # "sentence into" "into shingles"
    toks = token_array(F.col("text"))
    got = _run(spark, shingles(toks), "please divide this sentence into shingles")
    assert got == [
        "please", "please divide",
        "divide", "divide this",
        "this", "this sentence",
        "sentence", "sentence into",
        "into", "into shingles",
        "shingles",
    ]


def test_shingle_sizes_and_no_unigrams(spark):
    toks = token_array(F.col("text"))
    got = _run(
        spark,
        shingles(toks, min_size=2, max_size=3, output_unigrams=False),
        "a b c d",
    )
    assert got == ["a b", "a b c", "b c", "b c d", "c d"]
    assert _run(spark, shingles(toks), "") == []
    assert _run(spark, shingles(toks), "solo") == ["solo"]


def test_shingle_fillers_after_stop(spark):
    # "please divide the sentence" — "the" is stopped; the bigram stream is
    # "please divide", "divide _", "_ sentence" per FILLER_TOKEN semantics;
    # all-filler shingles and filler unigrams are dropped
    from lucene_solr_spark.analysis.analyzer import tokens_with_positions

    df = spark.createDataFrame([("d", "please divide the sentence")], "k string, text string")
    pos = tokens_with_positions(df, keep_cols=("k",)).groupBy("k").agg(
        F.sort_array(F.collect_list(F.struct("pos", "term"))).alias("pt")
    )
    got = pos.select(shingles_with_fillers(F.col("pt")).alias("out")).collect()[0]["out"]
    assert got == [
        "please", "please divide",
        "divide", "divide _",
        "_ sentence",
        "sentence",
    ]


def test_synonym_parse_equivalence_and_explicit():
    smap = parse_synonyms(
        [
            "# comment",
            "ipod, i-pod, i pod",
            "personal computer => pc, laptop",
            "sea biscuit => seabiscuit",
        ]
    )
    # equivalence with expand=true: every member → all members
    alts = {rhs for lhs, rhss in smap.rules["ipod"] if lhs == ("ipod",) for rhs in rhss}
    assert ("ipod",) in alts and ("i", "pod") in alts
    # explicit mapping: multi-token LHS registered under its head token
    assert any(lhs == ("personal", "computer") for lhs, _ in smap.rules["personal"])
    # expand=false maps every member to the first
    smap2 = parse_synonyms(["big, large, huge"], expand=False)
    alts2 = [rhss for lhs, rhss in smap2.rules["large"] if lhs == ("large",)][0]
    assert alts2 == [("big",)]


def test_query_time_expansion_end_to_end(spark, tmp_path):
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher

    corpus = [
        ("u0", "my ipod died"),
        ("u1", "the i pod was new"),
        ("u2", "a laptop pc hybrid"),
        ("u3", "nothing relevant"),
    ]
    pages = spark.createDataFrame(corpus, "url string, text string")
    searcher = Searcher(spark, build_index(spark, pages, str(tmp_path / "sidx")))
    smap = parse_synonyms(["ipod, i-pod, i pod"])
    clauses = expand_clauses(parse("ipod"), smap)
    hits = searcher.execute_clauses(clauses, k=10)
    got = {
        r["url"]
        for r in hits.join(searcher.docs.select("doc_id", "url"), "doc_id").collect()
    }
    assert got == {"u0", "u1"}  # phrase alternative "i pod" matches u1


def test_index_time_contraction(spark):
    rewrites = parse_synonyms(["colour => color"]).single_token_rewrites()
    assert rewrites == {"colour": "color"}
    toks = map_tokens_col(token_array(F.col("text")), rewrites)
    got = _run(spark, toks, "colour color colourful")
    assert got == ["color", "color", "colourful"]


def test_common_grams_reference_example(spark):
    from lucene_solr_spark.analysis.shingle import common_grams

    toks = token_array(F.col("text"), lowercase=True)
    got = _run(spark, common_grams(toks), "man of the year")
    assert got == [
        "man", "man_of",
        "of", "of_the",
        "the", "the_year",
        "year",
    ]
    # no common words adjacent → unigrams only
    got2 = _run(spark, common_grams(toks), "quick brown fox")
    assert got2 == ["quick", "brown", "fox"]
    assert _run(spark, common_grams(toks), "") == []

"""Percolator (prospective search — MemoryIndex.java:1236 use case): the
registered-query joins must agree with a per-doc python oracle that
evaluates each query against each doc's analyzed token stream."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import standard_tokenize
from lucene_solr_spark.query import percolator as P

DOCS = [
    ("d0", "spark shuffle merges fast postings"),
    ("d1", "quick brown fox jumps over lazy dog"),
    ("d2", "brown quick fox"),                      # phrase order broken
    ("d3", "spark slow scan"),
    ("d4", "merge policy picks segments, spark merges them"),
    ("d5", "the quick brown fox"),                  # leading stopword
    ("d6", ""),
]

QUERIES = [
    ("q_term", "spark"),
    ("q_and", "spark AND merges"),
    ("q_not", "spark -slow"),
    ("q_phrase", '"quick brown fox"'),
    ("q_mixed", '+spark "merge policy"'),   # phrase is OPTIONAL beside a MUST
    ("q_reqphrase", '+spark +"merge policy"'),
    ("q_should", "fox dog"),
]


def _oracle():
    out = set()
    for key, text in DOCS:
        toks = standard_tokenize(text)
        terms = {t for _, t in toks}
        pos = {}
        for p, t in toks:
            pos.setdefault(t, set()).add(p)

        def phrase(words):
            slots = [t for _, t in standard_tokenize(" ".join(words))]
            if not slots:
                return False
            anchors = None
            for i, t in enumerate(slots):
                cur = {p - i for p in pos.get(t, set())}
                anchors = cur if anchors is None else anchors & cur
                if not anchors:
                    return False
            return True

        if "spark" in terms:
            out.add((key, "q_term"))
        if "spark" in terms and "merges" in terms:
            out.add((key, "q_and"))
        if "spark" in terms and "slow" not in terms:
            out.add((key, "q_not"))
        if phrase(["quick", "brown", "fox"]):
            out.add((key, "q_phrase"))
        if "spark" in terms:  # BooleanQuery: SHOULD optional beside a MUST
            out.add((key, "q_mixed"))
        if "spark" in terms and phrase(["merge", "policy"]):
            out.add((key, "q_reqphrase"))
        if "fox" in terms or "dog" in terms:
            out.add((key, "q_should"))
    return out


def test_percolate_matches_oracle(spark):
    docs = spark.createDataFrame(DOCS, "url string, text string")
    got = {
        (r["url"], r["query_id"])
        for r in P.percolate(docs, QUERIES).collect()
    }
    assert got == _oracle()


def test_percolate_rejects_unsupported_and_pure_negative(spark):
    with pytest.raises(P.PercolatorError):
        P.compile_queries([("q", "-spark")])
    with pytest.raises(P.PercolatorError):
        P.compile_queries([("q", "spar*")])


def test_percolate_scales_on_testdata(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("url"), "text"
    )
    queries = [("q1", "data AND system"), ("q2", '"machine learning"')]
    out = P.percolate(docs, queries)
    rows = out.groupBy("query_id").count().collect()
    # sanity: the conjunction matches a subset of the single-term count
    n_and = next((r["count"] for r in rows if r["query_id"] == "q1"), 0)
    n_term = P.percolate(docs, [("t", "data")]).count()
    assert n_and <= n_term


def test_streaming_percolation(spark, tmp_path):
    import os

    from lucene_solr_spark.query.percolator import start_percolate_stream

    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    os.makedirs(in_dir)
    schema = "url string, text string"
    queries = [("alert_spark", "spark AND shuffle"), ("alert_fox", '"quick brown fox"')]

    spark.createDataFrame(DOCS[:4], schema).write.mode("append").parquet(in_dir)
    q = start_percolate_stream(
        spark, in_dir, out_dir, ckpt, queries, schema=schema, trigger_once=True
    )
    q.awaitTermination(120)
    got1 = {
        (r["url"], r["query_id"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got1 == {("d0", "alert_spark"), ("d1", "alert_fox")}

    # second batch: only NEW files are percolated (checkpointed source)
    spark.createDataFrame(DOCS[4:], schema).write.mode("append").parquet(in_dir)
    q = start_percolate_stream(
        spark, in_dir, out_dir, ckpt, queries, schema=schema, trigger_once=True
    )
    q.awaitTermination(120)
    out = spark.read.parquet(out_dir)
    assert out.count() == 3  # d5 matches alert_fox in batch 2
    assert ("d5", "alert_fox") in {
        (r["url"], r["query_id"]) for r in out.collect()
    }

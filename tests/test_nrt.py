"""NRT micro-batch append: searchability after soft-commit, idempotent
replay, termID stability, and the Structured Streaming file-source path."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.build import IndexPaths
from lucene_solr_spark.query.bm25 import brute_force_topk
from lucene_solr_spark.query.executor import Searcher
from lucene_solr_spark.streaming.nrt import append_segment, prior_state, start_nrt_stream

B1 = {
    "a00": "spark index merge fast dog",
    "a01": "dog cat bird spark",
    "a02": "merge sort spark spark fast",
}
B2 = {
    "b00": "newword spark dog slow",
    "b01": "cat newword newword index",
}


def expected_corpus():
    """Append-order docIDs: batch1 sorted urls, then batch2 sorted urls."""
    texts = {}
    i = 0
    for u in sorted(B1):
        texts[i] = B1[u]
        i += 1
    for u in sorted(B2):
        texts[i] = B2[u]
        i += 1
    return texts


def test_append_then_search(spark, tmp_path):
    idx = str(tmp_path / "nrt1")
    df1 = spark.createDataFrame(list(B1.items()), "url string, text string")
    seg0 = append_segment(spark, df1, idx)
    assert seg0 == 0
    s = Searcher(spark, idx)
    assert s.stats.max_doc == 3
    assert s.search(["spark"], k=10).count() == 3

    df2 = spark.createDataFrame(list(B2.items()), "url string, text string")
    seg1 = append_segment(spark, df2, idx)
    assert seg1 == 1
    s.reopen()
    assert s.stats.max_doc == 5

    texts = expected_corpus()
    for terms in (["spark"], ["spark", "newword"], ["dog", "cat"]):
        got = s.search(terms, k=10).toPandas()
        exp = brute_force_topk(texts, terms, k=10)
        assert got["doc_id"].tolist() == [d for d, _ in exp]
        np.testing.assert_allclose(got["score"].values, [x for _, x in exp], rtol=1e-6)


def test_term_ids_stable_across_appends(spark, tmp_path):
    idx = str(tmp_path / "nrt2")
    df1 = spark.createDataFrame(list(B1.items()), "url string, text string")
    append_segment(spark, df1, idx)
    s = Searcher(spark, idx)
    ids_before = {r.term: r.term_id for r in s.terms.collect()}

    df2 = spark.createDataFrame(list(B2.items()), "url string, text string")
    append_segment(spark, df2, idx)
    s.reopen()
    ids_after = {r.term: r.term_id for r in s.terms.collect()}
    for t, tid in ids_before.items():
        assert ids_after[t] == tid  # existing termIDs never move
    assert ids_after["newword"] == max(ids_before.values()) + 1  # appended
    # df/ttf incremented
    row = s.terms.where(F.col("term") == "spark").head()
    assert row.df == 4 and row.ttf == 5


def test_idempotent_replay(spark, tmp_path):
    idx = str(tmp_path / "nrt3")
    df1 = spark.createDataFrame(list(B1.items()), "url string, text string")
    append_segment(spark, df1, idx, seg_id=0)
    paths = IndexPaths(idx)
    base, ttf, completed = prior_state(spark, paths)
    # replay of the same seg_id is a no-op
    append_segment(spark, df1, idx, seg_id=0)
    assert prior_state(spark, paths) == (base, ttf, completed)
    s = Searcher(spark, idx)
    assert s.stats.max_doc == 3
    assert s.docs.count() == 3


def test_streaming_file_source(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    idx = str(tmp_path / "sidx")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    schema = "url string, text string"
    df1 = spark.createDataFrame(list(B1.items()), schema)
    df1.write.mode("append").parquet(in_dir)

    q = start_nrt_stream(spark, in_dir, idx, ckpt, schema=schema, trigger_once=True)
    q.awaitTermination(120)
    s = Searcher(spark, idx)
    assert s.stats.max_doc == 3

    df2 = spark.createDataFrame(list(B2.items()), schema)
    df2.write.mode("append").parquet(in_dir)
    q = start_nrt_stream(spark, in_dir, idx, ckpt, schema=schema, trigger_once=True)
    q.awaitTermination(120)

    s.reopen()
    assert s.stats.max_doc == 5
    texts = expected_corpus()
    got = s.search(["spark", "newword"], k=10).toPandas()
    exp = brute_force_topk(texts, ["spark", "newword"], k=10)
    assert got["doc_id"].tolist() == [d for d, _ in exp]


def test_large_batch_append_scales_out(spark, tmp_path):
    """Catch-up batch (20k docs) through the scale-out id assignment
    (assign_dense_ids, no single-task global windows) — correctness vs the
    brute-force oracle on spot queries."""
    from lucene_solr_spark.sources.webgen import generate_pages

    idx = str(tmp_path / "nrt_big")
    pages = generate_pages(spark, 20_000, seed=11).select("url", "warc_ts", "text")
    seg = append_segment(spark, pages, idx, batch_id=0, ts_col="warc_ts")
    assert seg == 0
    s = Searcher(spark, idx)
    assert s.stats.max_doc == pages.select("url").distinct().count()
    got = s.search(["spark", "merge"], k=10).toPandas()
    assert len(got) == 10 and got["score"].is_monotonic_decreasing
    # appending a second batch preserves old docIDs and extends the corpus
    pages2 = generate_pages(spark, 1_000, seed=12).select(
        F.concat(F.lit("x-"), F.col("url")).alias("url"), "warc_ts", "text"
    )
    seg2 = append_segment(spark, pages2, idx, batch_id=1, ts_col="warc_ts")
    assert seg2 == 1
    s.reopen()
    assert s.stats.max_doc == (
        pages.select("url").distinct().count()
        + pages2.select("url").distinct().count()
    )


def test_realtime_get_sees_updates_past_open_searcher(spark, tmp_path):
    """RealTimeGet: /get resolves lineage fresh — an updated doc is visible
    to realtime_get immediately while an ALREADY-OPEN searcher keeps its
    point-in-time view; deleted keys disappear; unknown keys return no row."""
    from lucene_solr_spark.index.deletes import delete_by_key
    from lucene_solr_spark.query.components import realtime_get
    from lucene_solr_spark.streaming.nrt import update_documents

    idx = str(tmp_path / "rtg")
    df1 = spark.createDataFrame(list(B1.items()), "url string, text string")
    append_segment(spark, df1, idx)
    s_old = Searcher(spark, idx)
    old_max = s_old.stats.max_doc

    got = realtime_get(spark, idx, ["a01", "zz-missing"]).toPandas()
    assert list(got["url"]) == ["a01"]
    dl_before = int(got["dl"].iloc[0])

    upd = spark.createDataFrame(
        [("a01", "completely different much longer replacement text body")],
        "url string, text string",
    )
    update_documents(spark, upd, idx)

    # the open searcher still sees its snapshot ...
    assert s_old.stats.max_doc == old_max
    # ... while /get sees the new version (new doc_id, new length)
    got2 = realtime_get(spark, idx, ["a01"]).toPandas()
    assert len(got2) == 1
    assert int(got2["doc_id"].iloc[0]) >= old_max
    assert int(got2["dl"].iloc[0]) != dl_before

    keys = spark.createDataFrame([("a01",)], "url string")
    delete_by_key(spark, idx, keys)
    assert realtime_get(spark, idx, ["a01"]).count() == 0

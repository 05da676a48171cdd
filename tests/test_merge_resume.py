"""Phase-2 properties: merge(A,B,...) == build(A∪B∪...), tiered merge
selection, checkpoint/resume — mirroring the reference's merge tests
(TestTieredMergePolicy, TestSegmentMerger) and UpdateLog replay semantics."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.index.merge import (
    SegmentInfo,
    compact,
    merge_segments,
    plan_merges,
)
from lucene_solr_spark.query.executor import Searcher
from tests.test_index_e2e import make_corpus

POSTING_COLS = [
    "term",
    "chunk_id",
    "first_doc",
    "df_chunk",
    "doc_gaps",
    "tfs",
    "norm_bytes",
    "skip_last_doc",
    "block_max_tf",
    "block_max_nb",
    "pos_flat",
]


def _posting_snapshot(spark, paths):
    df = (
        spark.read.option("basePath", paths.postings)
        .parquet(os.path.join(paths.postings, "seg_id=*"))
        .select(*POSTING_COLS)
        .orderBy("term", "chunk_id", "first_doc")
    )
    return [tuple(map(_canon, row)) for row in df.collect()]


def _canon(v):
    if isinstance(v, list):
        return tuple(v)
    return v


@pytest.fixture(scope="module")
def corpus_pages(spark):
    corpus = make_corpus(n=300, seed=11)
    rows = [(u, t, 1000) for u, t in corpus.items()]
    return spark.createDataFrame(rows, "url string, text string, warc_ts long")


def test_merge_equals_single_shot_build(spark, corpus_pages, tmp_path):
    single = build_index(spark, corpus_pages, str(tmp_path / "one"), num_segments=1)
    multi = build_index(spark, corpus_pages, str(tmp_path / "four"), num_segments=4)

    new_seg = merge_segments(spark, multi, [0, 1, 2, 3])
    assert sorted(os.listdir(multi.postings)) == [f"seg_id={new_seg}"]

    assert _posting_snapshot(spark, multi) == _posting_snapshot(spark, single)

    # lineage: old segments superseded, exactly one live segment
    lineage = spark.read.parquet(multi.lineage)
    live = (
        lineage.groupBy("seg_id")
        .agg(F.max_by("status", "built_at_snapshot").alias("status"))
        .where(F.col("status") == "complete")
        .collect()
    )
    assert [r.seg_id for r in live] == [new_seg]


def test_merged_index_query_identical(spark, corpus_pages, tmp_path):
    single = build_index(spark, corpus_pages, str(tmp_path / "s1"), num_segments=1)
    multi = build_index(spark, corpus_pages, str(tmp_path / "s3"), num_segments=3)
    merge_segments(spark, multi, [0, 1, 2])

    s_one = Searcher(spark, single)
    s_merged = Searcher(spark, multi)
    for terms in (["fast"], ["spark", "dog"], ["cat", "bird", "index"]):
        a = s_one.search(terms, k=10).toPandas()
        b = s_merged.search(terms, k=10).toPandas()
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
        np.testing.assert_array_equal(a["score"].values, b["score"].values)


def test_plan_merges_prefers_equal_sizes_and_respects_cap():
    # 20 equal small segments → one-pass plan merges them 10 at a time
    segs = [SegmentInfo(i, 4 << 20) for i in range(20)]
    plans = plan_merges(segs)
    assert plans and all(len(p.seg_ids) <= 10 for p in plans)
    merged = [s for p in plans for s in p.seg_ids]
    assert len(merged) == len(set(merged))  # no segment in two merges

    # max merged size respected: two 4GB segments can merge (8GB > 5GB cap → cannot)
    big = [SegmentInfo(0, 4 << 30), SegmentInfo(1, 4 << 30), SegmentInfo(2, 4 << 30)]
    for p in plan_merges(big):
        assert p.merged_bytes <= 5 << 30

    # skew scoring: merging equals beats merging one giant with dwarfs
    from lucene_solr_spark.index.merge import merge_score

    equal = [SegmentInfo(i, 100 << 20) for i in range(2)]
    skewed = [SegmentInfo(0, 1 << 30), SegmentInfo(1, 100 << 20)]
    assert merge_score(equal) < merge_score(skewed)


def test_compact_runs_to_quiescence(spark, corpus_pages, tmp_path):
    paths = build_index(spark, corpus_pages, str(tmp_path / "c"), num_segments=6)
    # force merging by making the tier budget tiny
    new_ids = compact(spark, paths, segs_per_tier=2.0, max_merge_at_once=4)
    assert new_ids
    live_dirs = sorted(os.listdir(paths.postings))
    assert len(live_dirs) <= 3
    s = Searcher(spark, paths)
    assert s.search(["fast"], k=5).count() > 0


def test_resume_skips_completed_segments(spark, corpus_pages, tmp_path):
    out = str(tmp_path / "resume")
    # full build, 3 segments
    paths = build_index(spark, corpus_pages, out, num_segments=3)
    before = _posting_snapshot(spark, paths)

    # simulate a crash after segment 0+1: drop seg 2's parquet and its lineage row
    import shutil

    shutil.rmtree(os.path.join(paths.postings, "seg_id=2"))
    lineage = spark.read.parquet(paths.lineage).where(F.col("seg_id") != 2)
    lineage_pdf = lineage.toPandas()
    shutil.rmtree(paths.lineage)
    spark.createDataFrame(lineage_pdf).write.parquet(paths.lineage)

    seg0_mtime = os.path.getmtime(os.path.join(paths.postings, "seg_id=0"))

    # resume: must rebuild ONLY segment 2
    build_index(spark, corpus_pages, out, num_segments=3, resume=True)
    assert os.path.getmtime(os.path.join(paths.postings, "seg_id=0")) == seg0_mtime
    assert os.path.isdir(os.path.join(paths.postings, "seg_id=2"))
    assert _posting_snapshot(spark, paths) == before

    # lineage has all three segments complete
    statuses = dict(
        spark.read.parquet(paths.lineage)
        .groupBy("seg_id")
        .agg(F.max_by("status", "built_at_snapshot").alias("st"))
        .collect()
    )
    assert statuses == {0: "complete", 1: "complete", 2: "complete"}

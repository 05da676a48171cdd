"""Block-max WAND vs exhaustive scoring at corpus scale, on a SORTED index.

Uniformly shuffled corpora are unprunable: every docID chunk attains nearly
the same block maxima, so no chunk's upper bound can fall below θ no matter
the block size (this is true for Lucene's BMW too — its wins come from
skewed postings and, for static-score-correlated ordering, index sorting).
The enabler is INDEX SORTING (SortingMergePolicy in the 4.4 tree,
first-class index sorting in later Lucene): assign docIDs by ascending
field length so BM25-favored short docs cluster in the low chunks — the
seed chunk then sets a θ that the long-doc chunks' bounds cannot reach, and
whole chunks prune away.

Usage: python tools/wand_bench.py [n_docs] [pages_dir | bursty]
Prints one JSON line with both latencies and verifies rank+score identity.
With `bursty`, the corpus adds topical tf bursts (webgen bursty mode — the
block-maxima variance real web text has) and a third measurement column
runs `search_wand(..., bucket_prune=True)` (block-level θ pruning).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from lucene_solr_spark.session import get_spark  # noqa: E402
from lucene_solr_spark.index.build import build_index  # noqa: E402
from lucene_solr_spark.query.executor import Searcher  # noqa: E402
from lucene_solr_spark.sources.webgen import generate_pages  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    arg2 = sys.argv[2] if len(sys.argv) > 2 else None
    bursty = arg2 == "bursty"
    pages_dir = None if bursty else arg2

    spark = get_spark(app="wand-bench", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    if pages_dir and os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        pages = spark.read.parquet(pages_dir)
    else:
        tmp = tempfile.mkdtemp(prefix="wand_pages_")
        pages_dir = os.path.join(tmp, "pages")
        generate_pages(spark, n, seed=42, bursty=bursty, tail=bursty).write.mode(
            "overwrite"
        ).parquet(pages_dir)
        pages = spark.read.parquet(pages_dir)

    idx = tempfile.mkdtemp(prefix="wand_idx_")
    try:
        # index sorting: docIDs by (text length asc, url) — positions off
        # (not needed for bag-of-words queries; halves the index)
        t0 = time.time()
        paths = build_index(
            spark,
            pages.withColumn("__len", F.length("text")),
            idx,
            ts_col="warc_ts",
            sort_col="__len",
            positions=False,
        )
        build_sec = time.time() - t0
        s = Searcher(spark, paths)

        queries = {
            "two_term_mid": ["spark", "merge"],
            "three_term": ["query", "window", "stream"],
            "single_head": ["value"],
        }
        if bursty:
            # the navigational head+tail web query shape: a common word +
            # a rare one (the tail vocab ships only in bursty/tail mode).
            # Pick a tail term deterministically from a known doc's text.
            from lucene_solr_spark.sources.webgen import _make_text, _row_rng

            tail_term = next(
                w for w in _make_text(_row_rng(42, 12345), True, True).split()
                if w.startswith("t") and w[1:].isdigit()
            )
            queries["head_plus_tail"] = ["value", tail_term]
        reps = 5
        out = {
            "n_docs": n,
            "build_sec": round(build_sec, 1),
            "sorted_by": "doclen asc",
            "bursty": bursty,
        }
        for name, q in queries.items():
            exh = s.search(q, k=10)
            pstats: dict = {}
            wnd = s.search_wand(q, k=10, pruning_stats=pstats)
            e_rows = exh.collect()
            w_rows = wnd.collect()
            ok = [(r.doc_id, r.score) for r in e_rows] == [
                (r.doc_id, r.score) for r in w_rows
            ]
            te = time.time()
            for _ in range(reps):
                s.search(q, k=10).collect()
            t_exh = (time.time() - te) / reps
            tw = time.time()
            for _ in range(reps):
                s.search_wand(q, k=10).collect()
            t_wand = (time.time() - tw) / reps
            out[name] = {
                "exhaustive_sec": round(t_exh, 3),
                "wand_sec": round(t_wand, 3),
                "speedup": round(t_exh / t_wand, 2),
                "rank_score_identical": ok,
                "chunks_total": pstats.get("chunks_total"),
                "chunks_pruned": (
                    pstats.get("chunks_total", 0) - pstats.get("chunks_live", 0)
                ),
            }
            if bursty:
                wb = s.search_wand(q, k=10, bucket_prune=True)
                okb = [(r.doc_id, r.score) for r in e_rows] == [
                    (r.doc_id, r.score) for r in wb.collect()
                ]
                tb = time.time()
                for _ in range(reps):
                    s.search_wand(q, k=10, bucket_prune=True).collect()
                t_bkt = (time.time() - tb) / reps
                out[name]["wand_bucket_sec"] = round(t_bkt, 3)
                out[name]["bucket_speedup"] = round(t_exh / t_bkt, 2)
                out[name]["bucket_identical"] = okb
        print(json.dumps(out))
    finally:
        shutil.rmtree(idx, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

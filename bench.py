"""Benchmark harness: index build + BM25 top-10 query latency.

Runs the REAL engine path (build_index → Searcher) — not the SQL gate — at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": ..., "build_sec": ..., "docs_per_sec": ...}

Query set mirrors the reference's EnwikiQueryMaker shape
(EnwikiQueryMaker.java:46-72): free-text 1-3 term queries + quoted phrases,
head terms and rare terms, over the documents corpus vocabulary.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from lucene_solr_spark.session import get_spark  # noqa: E402
from lucene_solr_spark.index.build import build_index  # noqa: E402
from lucene_solr_spark.query.executor import Searcher  # noqa: E402

QUERIES: dict[str, dict] = {
    "q1_single_head": {"kind": "should", "terms": ["value"]},
    "q2_single_mid": {"kind": "should", "terms": ["spark"]},
    "q3_two_term": {"kind": "should", "terms": ["spark", "merge"]},
    "q4_three_term": {"kind": "should", "terms": ["query", "window", "stream"]},
    "q5_conjunction": {"kind": "must", "terms": ["fast", "merge"]},
    "q6_must_not": {"kind": "must_not", "must": ["fast"], "not": ["merge"]},
    "q7_phrase": {"kind": "phrase", "terms": ["fast", "merge"]},
    "q8_min_should": {"kind": "msm", "terms": ["hash", "merge", "stream"], "m": 2},
    "q9_wand_two_term": {"kind": "wand", "terms": ["spark", "merge"]},
    "q10_parsed_mixed": {"kind": "parsed", "q": '+scan -slow "group agg" filter^2'},
}

REPS = 3  # per-query repetitions for p50/p95


def run_query(searcher: Searcher, spec: dict):
    kind = spec["kind"]
    if kind == "should":
        df = searcher.search(spec["terms"], k=10)
    elif kind == "must":
        df = searcher.boolean_search(must=spec["terms"], k=10)
    elif kind == "must_not":
        df = searcher.boolean_search(must=spec["must"], must_not=spec["not"], k=10)
    elif kind == "phrase":
        df = searcher.phrase_search(spec["terms"], k=10)
    elif kind == "msm":
        df = searcher.boolean_search(
            should=spec["terms"], min_should_match=spec["m"], k=10
        )
    elif kind == "wand":
        df = searcher.search_wand(spec["terms"], k=10)
    elif kind == "parsed":
        df = searcher.query(spec["q"], k=10)
    else:
        raise ValueError(kind)
    return df.collect()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app="bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        F.concat(F.lit("doc://"), F.lpad(F.col("doc_id").cast("string"), 10, "0")).alias("url"),
        F.col("text"),
    )
    n_docs = docs.count()

    idx_dir = tempfile.mkdtemp(prefix="lss_bench_idx_")
    warm_dir = tempfile.mkdtemp(prefix="lss_bench_warm_")
    try:
        # JIT warmup (JMH-style): one tiny build + query first, so the
        # measured numbers are steady-state throughput/latency — the
        # regime that models a long-lived cluster job — not one-time
        # session costs (whole-stage codegen compiles, Python worker pool
        # spin-up, Hadoop client init), which at 100 TB amortize to zero.
        warm_paths = build_index(
            spark, pages.limit(64), warm_dir, num_segments=1, positions=True
        )
        warm = Searcher(spark, warm_paths)
        for spec in QUERIES.values():
            run_query(warm, spec)
        shutil.rmtree(warm_dir, ignore_errors=True)

        t0 = time.time()
        paths = build_index(spark, pages, idx_dir, num_segments=1, positions=True)
        build_sec = time.time() - t0

        searcher = Searcher(spark, paths)
        run_query(searcher, QUERIES["q2_single_mid"])  # warm-up

        q_times: dict[str, float] = {}
        samples: list[float] = []
        for name, spec in QUERIES.items():
            per_rep = []
            for _ in range(REPS):
                t = time.time()
                run_query(searcher, spec)
                per_rep.append(time.time() - t)
            q_times[name] = round(min(per_rep), 3)  # steady-state latency
            samples.extend(per_rep)

        samples.sort()
        p50 = samples[len(samples) // 2]
        p95 = samples[min(len(samples) - 1, int(len(samples) * 0.95))]
        total = round(build_sec + sum(q_times.values()), 3)

        # flagship multilingual path (tokenizer='lang'): same corpus, each
        # doc analyzed under its own language chain — measured every round
        # (round-4 verdict #4) but kept OUT of `value`/`queries` so those
        # stay comparable with rounds 1-4.
        lang_dir = tempfile.mkdtemp(prefix="lss_bench_lang_")
        try:
            lang_pages = docs.select(
                F.concat(
                    F.lit("doc://"),
                    F.lpad(F.col("doc_id").cast("string"), 10, "0"),
                ).alias("url"),
                F.col("text"),
                F.col("lang"),
            )
            t0 = time.time()
            lang_paths = build_index(
                spark, lang_pages, lang_dir, num_segments=1, positions=True,
                tokenizer="lang",
            )
            lang_build_sec = time.time() - t0
            ls = Searcher(spark, lang_paths)
            ls.query_lang = "de"
            per_rep = []
            for _ in range(REPS):
                t = time.time()
                ls.search(ls.analyze_query("Tische Linien"), k=10).collect()
                per_rep.append(time.time() - t)
            lang_q_sec = round(min(per_rep), 3)
        finally:
            shutil.rmtree(lang_dir, ignore_errors=True)
        print(
            json.dumps(
                {
                    "metric": "index_build_plus_bm25_topk_latency",
                    "value": total,
                    "unit": "sec",
                    "queries": q_times,
                    "sf": sf,
                    "build_sec": round(build_sec, 3),
                    "docs": n_docs,
                    "docs_per_sec": round(n_docs / build_sec, 1),
                    "query_p50_sec": round(p50, 3),
                    "query_p95_sec": round(p95, 3),
                    "lang_build_sec": round(lang_build_sec, 3),
                    "lang_docs_per_sec": round(n_docs / lang_build_sec, 1),
                    "lang_query_de_sec": lang_q_sec,
                    "cpus": cpus,
                }
            )
        )
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        shutil.rmtree(warm_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

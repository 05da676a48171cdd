"""Two-cluster-size scaling benchmark (the sandbox stand-in for the north
rule's N vs 4N executor criterion).

Generates a deterministic synthetic page corpus in the BASELINE.json
input_hint shape (url, warc_ts, html, text, lang) once, then runs the
IDENTICAL build+query job on a 2-executor and an 8-executor cluster
(`local-cluster[N, 4, 10240]`: real separate executor JVMs, 4 cores + 10 GB
each — per-executor resources constant, executor count is the variable,
exactly how a production cluster scales out). Reports docs/sec at both and
efficiency = (throughput_8ex / throughput_2ex) / 4.

Why not local[8] vs local[32]: a single JVM with 4x the threads shares one
fixed heap, so GC becomes the limiter and measured "scaling" reflects GC
contention, not the engine's parallelism. Separate executor JVMs scale
memory with cores like a real cluster does.

Usage: python tools/scaling_bench.py [n_docs]
Writes one JSON line; results recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time, shutil, tempfile, subprocess
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_HOME", __import__("pyspark").__path__[0])
from pyspark.sql import SparkSession

n_exec = int(sys.argv[1]); n = int(sys.argv[2]); pages_dir = sys.argv[3]
spark = (
    SparkSession.builder.master(f"local-cluster[{{n_exec}},4,10240]")
    .appName(f"scale-{{n_exec}}ex")
    .config("spark.sql.parquet.columnarReaderBatchSize", "128")
    .config("spark.sql.shuffle.partitions", "256")  # sized to the DATA (2M docs x ~250 tokens), identical at both cluster sizes
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "4g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
subprocess.run(["sh", {repo!r} + "/jobs/package.sh"], check=True, capture_output=True)
spark.sparkContext.addPyFile({repo!r} + "/dist/lucene_solr_spark.zip")

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.query.executor import Searcher

pages = spark.read.parquet(pages_dir)
idx = tempfile.mkdtemp(prefix=f"scale_idx_{{n_exec}}_")
try:
    pages.limit(100).count()  # warm executor JVMs / codegen
    t0 = time.time()
    paths = build_index(spark, pages, idx, ts_col="warc_ts", num_segments=1)
    build_sec = time.time() - t0
    s = Searcher(spark, paths)
    qs = [["spark"], ["spark", "merge"], ["query", "window", "stream"], ["value"]]
    s.search(qs[0], k=10).collect()  # warm
    tq0 = time.time()
    reps = 3
    for _ in range(reps):
        for q in qs:
            s.search(q, k=10).collect()
    query_sec = (time.time() - tq0) / (reps * len(qs))
    print(json.dumps({{"executors": n_exec, "cores_total": n_exec * 4,
                       "build_sec": round(build_sec, 2),
                       "docs_per_sec": round(n / build_sec, 1),
                       "mean_query_sec": round(query_sec, 3)}}))
finally:
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()
"""


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    tmp = tempfile.mkdtemp(prefix="scale_pages_")
    pages_dir = os.path.join(tmp, "pages")

    gen = (
        "import sys; sys.path.insert(0, {repo!r})\n"
        "from lucene_solr_spark.session import get_spark\n"
        "from lucene_solr_spark.sources.webgen import generate_pages\n"
        "spark = get_spark(app='gen', cpus=32)\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        f"generate_pages(spark, {n}, seed=42).write.mode('overwrite').parquet({pages_dir!r})\n"
        "spark.stop()\n"
    ).format(repo=REPO)
    subprocess.run([sys.executable, "-c", gen], check=True)

    child = CHILD.format(repo=REPO)
    results = {}
    for n_exec in (2, 8):
        out = subprocess.run(
            [sys.executable, "-c", child, str(n_exec), str(n), pages_dir],
            check=True,
            capture_output=True,
            text=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[n_exec] = json.loads(line)

    eff_build = (results[8]["docs_per_sec"] / results[2]["docs_per_sec"]) / 4.0
    speedup_q = results[2]["mean_query_sec"] / results[8]["mean_query_sec"]
    print(
        json.dumps(
            {
                "n_docs": n,
                "cluster_N": results[2],
                "cluster_4N": results[8],
                "scaling_efficiency_build": round(eff_build, 3),
                "query_speedup": round(speedup_q, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Two-parallelism-level scaling benchmark (the sandbox stand-in for the
north rule's N vs 4N executor criterion).

Generates a deterministic synthetic page corpus in the BASELINE.json
input_hint shape (url, warc_ts, html, text, lang) once, then runs the
IDENTICAL build+query job at local[8] and local[32], reporting docs/sec at
both and efficiency = (throughput_32 / throughput_8) / 4.

Usage: python tools/scaling_bench.py [n_docs] [--queries-only]
Writes one JSON line; also appended (by hand) to BENCH/BASELINE.md.

Each parallelism level runs in a SUBPROCESS because one JVM cannot change
its master / core count after start.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time, shutil, tempfile
sys.path.insert(0, {repo!r})
from lucene_solr_spark.session import get_spark
from lucene_solr_spark.sources.webgen import generate_pages
from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.query.executor import Searcher

cpus = int(sys.argv[1]); n = int(sys.argv[2]); pages_dir = sys.argv[3]
# A real N->4N executor scale-up multiplies BOTH cores and aggregate memory;
# local-mode stand-in: heap proportional to cores (2g/core), shuffle
# partitions FIXED so the plan is identical and core count is the variable.
os.environ["SPARK_GRAFT_DRIVER_MEM"] = f"{{2 * cpus}}g"
spark = get_spark(app=f"scale{{cpus}}", cpus=cpus, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(pages_dir)
idx = tempfile.mkdtemp(prefix=f"scale_idx_{{cpus}}_")
try:
    # warm the JVM/codegen with a tiny throwaway job so the measured build
    # isn't paying one-time JIT/class-load costs
    pages.limit(100).count()
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
    print(json.dumps({{"cpus": cpus, "build_sec": round(build_sec, 2),
                       "docs_per_sec": round(n / build_sec, 1),
                       "mean_query_sec": round(query_sec, 3)}}))
finally:
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()
"""


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
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
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, "-c", child, str(cpus), str(n), pages_dir],
            check=True,
            capture_output=True,
            text=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)

    eff_build = (results[32]["docs_per_sec"] / results[8]["docs_per_sec"]) / 4.0
    print(
        json.dumps(
            {
                "n_docs": n,
                "local8": results[8],
                "local32": results[32],
                "scaling_efficiency_build": round(eff_build, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

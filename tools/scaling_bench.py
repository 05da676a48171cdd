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

Usage: python tools/scaling_bench.py [n_docs] [pages_dir]
Env: SCALE_EXECS=N,4N executor counts (default 2,8); SCALE_CORES=cores per
executor (default 4). SCALE_CORES=1 with SCALE_EXECS=1,4 measures in the
regime where this host's aggregate memory bandwidth still scales with CPU
count (STREAM: 3.46x from 1->4 procs vs 1.31x from 4->16, BASELINE.md) —
i.e. the regime that actually models a real cluster, where every added
node brings its own memory controllers.
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
cores = int(os.environ.get("SCALE_CORES", "4"))  # cores PER EXECUTOR (constant across the pair)
# Pin this child's whole process tree (executor JVMs + their Python workers
# + driver) to `cores` CPUs per executor: Spark's core accounting does not
# cover Python UDF workers, so an unpinned "8-core" baseline actually
# consumes ~2x its nominal cores on an idle 32-core box, which understates
# scaling. Affinity is inherited by all forked/spawned children.
os.sched_setaffinity(0, set(range(min(cores * n_exec, os.cpu_count()))))
# shuffle/spill on tmpfs: the sandbox has ONE shared disk, so 4N executors
# would serialize on it; a real cluster has per-executor local disks. tmpfs
# is the per-executor-disk analog (as in the round-1 protocol).
shuffle_dir = tempfile.mkdtemp(prefix=f"scale_shuffle_{{n_exec}}_", dir="/dev/shm")
spark = (
    SparkSession.builder.master(f"local-cluster[{{n_exec}},{{cores}},10240]")
    .appName(f"scale-{{n_exec}}ex")
    # local-cluster's third arg is WORKER memory only; executor JVMs would
    # otherwise default to 1g heaps. Heap scales with the executor's core
    # count (6g per 4 cores) — identical per-executor resources at both
    # cluster sizes, summing within machine RAM at the 4N point.
    .config("spark.executor.memory", f"{{max(2, round(1.5 * cores))}}g")
    # SCALE_CODEC: shuffle/spill IO codec experiment — on a bandwidth-bound
    # host, a stronger codec (zstd) trades CPU for bytes moved through the
    # memory bus (tmpfs shuffle IS memory traffic); identical at both sizes
    .config("spark.io.compression.codec", os.environ.get("SCALE_CODEC", "lz4"))
    .config("spark.local.dir", shuffle_dir)
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
# index + staging also on tmpfs: a cluster writes segments to scale-out
# object storage whose bandwidth grows with executors; the sandbox's one
# shared disk would serialize the 4N writers and masquerade as poor engine
# scaling. (The input corpus stays on disk — reads are page-cached.)
idx = tempfile.mkdtemp(prefix=f"scale_idx_{{n_exec}}_", dir="/dev/shm")
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
    # WAND vs exhaustive on the same two-term query (pruning should win at
    # corpus scale, where whole chunks fall below theta)
    wq = ["spark", "merge"]
    s.search_wand(wq, k=10).collect()
    tw = time.time()
    for _ in range(reps):
        s.search_wand(wq, k=10).collect()
    wand_sec = (time.time() - tw) / reps
    te = time.time()
    for _ in range(reps):
        s.search(wq, k=10).collect()
    exh_sec = (time.time() - te) / reps
    print(json.dumps({{"executors": n_exec, "cores_total": n_exec * cores,
                       "build_sec": round(build_sec, 2),
                       "docs_per_sec": round(n / build_sec, 1),
                       "mean_query_sec": round(query_sec, 3),
                       "wand_two_term_sec": round(wand_sec, 3),
                       "exhaustive_two_term_sec": round(exh_sec, 3)}}))
finally:
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()
    shutil.rmtree(shuffle_dir, ignore_errors=True)
"""


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    if len(sys.argv) > 2:  # reuse an already-generated corpus
        pages_dir = sys.argv[2]
    else:
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
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        subprocess.run([sys.executable, "-c", gen], check=True)

    child = CHILD.format(repo=REPO)
    results = {}
    # N vs 4N executor counts; default 2 vs 8. SCALE_EXECS=1,4 keeps the 4N
    # point at half the host's cores so single-box memory-bandwidth
    # saturation doesn't masquerade as poor engine scaling.
    pair = tuple(
        int(x) for x in os.environ.get("SCALE_EXECS", "2,8").split(",")
    )
    for n_exec in pair:
        out = subprocess.run(
            [sys.executable, "-c", child, str(n_exec), str(n), pages_dir],
            capture_output=True,
            text=True,
        )
        for ln in out.stderr.splitlines():
            if "[build-phase]" in ln:
                print(f"exec{n_exec} {ln}", flush=True)
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-8000:])
            raise SystemExit(f"child (executors={n_exec}) failed rc={out.returncode}")
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[n_exec] = json.loads(line)

    lo, hi = pair
    eff_build = (results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]) / (hi / lo)
    speedup_q = results[lo]["mean_query_sec"] / results[hi]["mean_query_sec"]
    print(
        json.dumps(
            {
                "n_docs": n,
                "cluster_N": results[lo],
                "cluster_4N": results[hi],
                "scaling_efficiency_build": round(eff_build, 3),
                "query_speedup": round(speedup_q, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

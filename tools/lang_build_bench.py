"""A/B bench for the multilingual build path (round-5 verdict item #2).

Builds the same synthetic multilingual corpus with tokenizer='lang' (JVM
tokenization + per-distinct-(lang,surface) chain) vs 'lang-fidelity' (the
round-4 per-token Arrow UDF path) and reports docs/s + post-stop tokens/s.

Usage: python tools/lang_build_bench.py [n_docs] [tokenizer] [cpus]
Prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANGS = [
    "en", "en", "en", "de", "fr", "es", "it", "pt", "ru", "nl",
    "sv", "tr", "cs", "ro", "id", "ja", "zh", "en", "pl", "fi",
]


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    tokenizer = sys.argv[2] if len(sys.argv) > 2 else "lang"
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    from pyspark.sql import functions as F

    from lucene_solr_spark.session import get_spark
    from lucene_solr_spark.sources.webgen import generate_pages
    from lucene_solr_spark.index.build import build_index

    spark = get_spark(app=f"lang-bench-{tokenizer}", cpus=cpus,
                      shuffle_partitions=cpus)
    # realistic web vocabulary (rare-term tail) + a 20-language mix spread
    # deterministically by url hash
    pages = generate_pages(spark, n, seed=7, bursty=True, tail=True)
    pages = pages.withColumn(
        "lang",
        F.element_at(
            F.array(*[F.lit(lg) for lg in LANGS]),
            (F.pmod(F.xxhash64("url"), F.lit(len(LANGS))) + 1).cast("int"),
        ),
    )
    staged = tempfile.mkdtemp(prefix="langbench_corpus_")
    out = tempfile.mkdtemp(prefix="langbench_idx_")
    try:
        pages.write.mode("overwrite").parquet(staged)
        corpus = spark.read.parquet(staged)
        t0 = time.time()
        paths = build_index(
            spark, corpus, out, ts_col="warc_ts", tokenizer=tokenizer,
        )
        build_sec = time.time() - t0
        docs = spark.read.parquet(paths.docs)
        agg = docs.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").alias("toks")
        ).head()
        print(json.dumps({
            "tokenizer": tokenizer,
            "docs": int(agg["n"]),
            "post_stop_tokens": int(agg["toks"]),
            "build_sec": round(build_sec, 2),
            "docs_per_sec": round(int(agg["n"]) / build_sec, 1),
            "tokens_per_sec": round(int(agg["toks"]) / build_sec, 1),
            "cpus": cpus,
        }))
    finally:
        shutil.rmtree(staged, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

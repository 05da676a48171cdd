"""spark-submit entrypoint: bulk index build.

Usage:
  spark-submit --py-files lucene_solr_spark.zip jobs/build_index_job.py \
      --input  <parquet dir or Iceberg table of pages (url, warc_ts, html, text, lang)> \
      --output <index dir> \
      [--segments N] [--resume] [--no-positions] [--chunk-span N]

On a cluster the SparkSession comes from spark-submit's conf (executors,
memory, shuffle partitions); the local fallback exists so the job file runs
unmodified in the sandbox. Reads Iceberg when `--input` has no '/', i.e. a
table name resolvable by the session catalog (spark.read.table), else
parquet — the same DataFrame either way.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--segments", type=int, default=1)
    ap.add_argument("--key-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--chunk-span", type=int, default=None)
    ap.add_argument(
        "--sort-col",
        default=None,
        help="index sorting: assign docIDs by (this column asc, key) — "
        "SortingMergePolicy semantics; enables block-max chunk pruning",
    )
    ap.add_argument(
        "--tokenizer",
        default="jvm",
        choices=["jvm", "fidelity", "english", "folding", "icu_folding",
                 "icu", "lang", "lang-fidelity", "preanalyzed"],
        help="jvm = codegen regex (Latin-exact); fidelity = Arrow UDF with "
        "CJK/Java-lowercase behaviors; english = Porter chain; folding/"
        "icu_folding = ASCII/ICU fold chains; icu = ICUTokenizer script "
        "runs; lang = per-row multilingual dispatch on the lang column "
        "(lang-fidelity = its per-token A/B path); preanalyzed = tokens "
        "supplied in PreAnalyzedField JSON",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.appName("lss-build-index").getOrCreate()

    from lucene_solr_spark.index.build import DEFAULT_CHUNK_SPAN, build_index

    if "/" in args.input:
        pages = spark.read.parquet(args.input)
    else:
        pages = spark.read.table(args.input)  # Iceberg catalog table

    paths = build_index(
        spark,
        pages,
        args.output,
        text_col=args.text_col,
        key_col=args.key_col,
        ts_col="warc_ts" if "warc_ts" in pages.columns else None,
        num_segments=args.segments,
        positions=not args.no_positions,
        chunk_span=args.chunk_span or DEFAULT_CHUNK_SPAN,
        resume=args.resume,
        sort_col=args.sort_col,
        tokenizer=args.tokenizer,
    )
    n = spark.read.parquet(paths.lineage).count()
    print(f"index built at {paths.root}: {n} lineage rows")
    spark.stop()


if __name__ == "__main__":
    main()

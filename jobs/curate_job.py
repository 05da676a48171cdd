"""spark-submit entrypoint: curate a raw web-page corpus and (optionally)
index the survivors.

Usage:
  spark-submit --py-files lucene_solr_spark.zip jobs/curate_job.py \
      --input  <parquet dir / Iceberg table (url, warc_ts, html, text, lang)> \
      --output <curated parquet dir> \
      [--index <index dir>] [--lang en] [--min-tokens 5] [--no-neardup]

Prints one JSON line with the per-stage survivor counts.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--index", default=None)
    ap.add_argument("--key-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--lang", default="en")
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--no-neardup", action="store_true")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("lss-curate").getOrCreate()
    from lucene_solr_spark.pipeline.curate import curate_corpus

    pages = (
        spark.read.table(args.input)
        if "/" not in args.input
        else spark.read.parquet(args.input)
    )
    curated, report = curate_corpus(
        pages,
        key_col=args.key_col,
        text_col=args.text_col,
        lang=None if args.lang == "any" else args.lang,
        min_tokens=args.min_tokens,
        near_dup=not args.no_neardup,
    )
    curated.write.mode("overwrite").parquet(args.output)
    out = report.as_dict()
    if args.index:
        from lucene_solr_spark.index.build import build_index

        build_index(
            spark,
            spark.read.parquet(args.output),
            args.index,
            key_col=args.key_col,
            text_col=args.text_col,
        )
        out["indexed"] = args.index
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""spark-submit entrypoint: BM25 top-k queries against a built index.

Usage:
  spark-submit --py-files lucene_solr_spark.zip jobs/query_job.py \
      --index <index dir> --k 10 [--wand] "spark merge" '+fast -slow' '"exact phrase"'

Queries starting with `{!` go through the Solr local-params dispatch
(query/qparser.py) — e.g. '{!term f=text}merge', '{!maxscore tie=0.3}a b',
'{!surround}fast 2W merge'. Parsers needing a stored-fields frame (frange/
geofilt/join/func) take --source <parquet path> keyed by --key-col.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--wand", action="store_true", help="block-max pruned scan")
    ap.add_argument("--source", help="stored-fields parquet for {!frange}/{!geofilt}/{!join}/{!func}")
    ap.add_argument("--key-col", default="url")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("lss-query").getOrCreate()
    from lucene_solr_spark.query.executor import Searcher
    from lucene_solr_spark.query.qparser import SolrQueries

    s = Searcher(spark, args.index)
    source = spark.read.parquet(args.source) if args.source else None
    dispatch = SolrQueries(s, source=source, key_col=args.key_col)
    for q in args.queries:
        t0 = time.time()
        if q.startswith("{!"):
            df = dispatch.query(q, k=args.k)
        elif args.wand and not any(ch in q for ch in '+-"^'):
            df = s.search_wand(q, k=args.k)
        else:
            df = s.query(q, k=args.k)
        hits = [(int(r.doc_id), float(r.score)) for r in df.collect()]
        print(
            json.dumps(
                {"q": q, "hits": hits, "sec": round(time.time() - t0, 3)}
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()

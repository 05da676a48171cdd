"""NRT micro-batch indexing: each Structured Streaming micro-batch becomes
one appended segment.

Reference semantics re-expressed:

- **soft commit / openSearcher** (DirectUpdateHandler2.java:97-123,165-280):
  a micro-batch append makes new docs searchable without touching existing
  segments; `Searcher.reopen()` is the SearcherManager NRT reopen
  (SearcherManager.java).
- **docID assignment**: new docs get docIDs starting at the current maxDoc
  (Lucene's per-segment docBase), ordered by url within the batch —
  deterministic for a given stream order.
- **termID assignment**: first-appearance order — NEW terms get ids after
  the current max term_id (ranked by term within the batch), existing terms
  keep theirs, df/ttf are incremented. This is exactly the reference's
  in-RAM TermsHash behavior (TermsHashPerField.java:141-165: a new term
  assigns the next termID) lifted to the global dictionary, and it keeps
  previously-written posting segments valid forever.
- **UpdateLog / replay** (UpdateLog.java:71-258): the streaming checkpoint +
  the lineage table make appends idempotent — a redelivered batch whose
  seg_id already has a `complete` lineage row is skipped (tlog replay).

Crash safety (write-once discipline, SegmentInfos-generation style):
every artifact of a batch is written to a batch-owned location with
overwrite semantics — postings `postings/seg_id=N/`, docs `docs/seg=N/`,
terms snapshot `terms_v{N}/` — and the lineage row (which carries the
n_docs/ttf metrics) is appended LAST. Prior state (doc base, token totals,
current terms snapshot) is derived from the lineage table, never from
mutable counters, so a crash at ANY point either replays the whole batch
into the same locations or skips it; nothing is double-counted.
stats.json is a derived cache regenerated after each append.

Scale notes: identical shuffle structure to the bulk build (explode →
map-side-combined groupBy → chunked applyInPandas pack); the terms-dict
delta join is broadcast-sized per batch (new vocabulary per micro-batch is
tiny at CC scale).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..index.build import (
    DEFAULT_CHUNK_SPAN,
    IndexPaths,
    _norm_byte_udf,
    invert_tokens,
    pack_sorted_partitions,
)
from ..index.docids import assign_dense_ids
from ..index.lineage import all_seg_ids, applied_batch_ids, latest_rows, read_lineage


def resolve_terms_dir(paths: IndexPaths, completed: set[int]) -> str | None:
    """Newest terms snapshot: terms_v{N} of the latest completed segment
    that has one, else the bulk `terms` dir. Terms snapshots are written
    before their lineage row, so a completed segment's snapshot exists."""
    for seg in sorted(completed, reverse=True):
        cand = os.path.join(paths.root, f"terms_v{seg}")
        if os.path.exists(cand):
            return cand
    return paths.terms if os.path.exists(paths.terms) else None


def _live_lineage(spark: SparkSession, paths: IndexPaths):
    """Lineage rows whose latest status is `complete` (merge-aware)."""
    return latest_rows(read_lineage(spark, paths.lineage)).where(
        F.col("status") == "complete"
    )


def prior_state(spark: SparkSession, paths: IndexPaths) -> tuple[int, int, set[int]]:
    """(doc_base, sum_ttf, completed_seg_ids) derived from lineage —
    the authoritative, crash-consistent index state."""
    if not os.path.exists(paths.lineage):
        return 0, 0, set()
    live = _live_lineage(spark, paths)
    rows = live.collect()
    completed = {int(r.seg_id) for r in rows}
    doc_base = sum(int(r.n_docs or 0) for r in rows)
    ttf = sum(int(r.ttf or 0) for r in rows)
    return doc_base, ttf, completed


def write_stats(
    paths: IndexPaths,
    max_doc: int,
    sum_ttf: int,
    n_segments: int,
    terms_dir: str,
    lineage_n_docs: int | None = None,
    lineage_ttf: int | None = None,
) -> None:
    """stats.json carries BOTH the true BM25 stats (max_doc / sum_ttf, which
    purge_deletes corrects downward) AND a snapshot of the live-lineage
    n_docs/ttf sums at write time. The snapshot lets the next append compute
    exact post-purge stats as `stats + (lineage_sum_now - snapshot)` — lineage
    sums are append-only (purge never edits lineage; merge carries source
    sums forward), so the delta is exactly the docs added since this write."""
    # start from the existing stats so build-time facts the append does not
    # change (chunk_span, positions, block_size, tokenizer) survive reopens
    stats: dict = {}
    if os.path.exists(paths.stats):
        with open(paths.stats) as fh:
            stats = json.load(fh)
    stats.setdefault("chunk_span", DEFAULT_CHUNK_SPAN)
    stats.setdefault("positions", True)
    stats.setdefault("block_size", 128)
    stats.update(
        {
            "max_doc": int(max_doc),
            "sum_total_term_freq": int(sum_ttf),
            "num_segments": int(n_segments),
            "seg_span": None,
            "terms_dir": os.path.relpath(terms_dir, paths.root),
            "lineage_n_docs": int(
                max_doc if lineage_n_docs is None else lineage_n_docs
            ),
            "lineage_ttf": int(sum_ttf if lineage_ttf is None else lineage_ttf),
            # an appended segment's docIDs extend past the sorted bulk range
            # regardless of sort key, so the index is no longer globally
            # sorted — clear the marker (Lucene index sorting likewise
            # requires every segment to be sorted)
            "sort_col": None,
        }
    )
    with open(paths.stats, "w") as fh:
        json.dump(stats, fh)


def append_segment(
    spark: SparkSession,
    pages: DataFrame,
    paths: IndexPaths | str,
    seg_id: int | None = None,
    text_col: str = "text",
    key_col: str = "url",
    ts_col: str | None = None,
    chunk_span: int = DEFAULT_CHUNK_SPAN,
    batch_id: int | None = None,
) -> int:
    """Index one micro-batch as a new segment appended to an existing (or
    empty) index at `paths`. Returns the seg_id written (or skipped).

    batch_id vs seg_id: streaming batch ids start at 0 per checkpoint and
    are NOT segment numbers — a replayed batch is detected by its batch_id
    recorded in lineage (the UpdateLog replay guard), while the segment id
    is always allocated as max(every seg_id ever recorded, complete OR
    superseded) + 1 so it can never collide with bulk-build segments
    (0..N-1) or compact()'s merged ids."""
    paths = paths if isinstance(paths, IndexPaths) else IndexPaths(paths)
    os.makedirs(paths.root, exist_ok=True)
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "128")

    doc_base, prior_ttf, completed = prior_state(spark, paths)
    if batch_id is not None and batch_id in applied_batch_ids(spark, paths.lineage):
        # idempotent replay (UpdateLog-style): this batch already committed
        lineage = read_lineage(spark, paths.lineage)
        row = (
            lineage.where(
                (F.col("batch_id") == batch_id) & (F.col("status") == "complete")
            )
            .select("seg_id")
            .head()
        )
        return int(row.seg_id)
    if seg_id is None:
        ever = all_seg_ids(spark, paths.lineage)
        seg_id = (max(ever) + 1) if ever else 0
    if seg_id in completed:
        return seg_id  # idempotent replay by explicit seg_id

    terms_src = resolve_terms_dir(paths, completed)
    old_terms = spark.read.parquet(terms_src) if terms_src else None
    if old_terms is not None:
        base_term_id = old_terms.agg(F.max("term_id")).head()[0]
        next_term_id = (base_term_id + 1) if base_term_id is not None else 0
    else:
        next_term_id = 0

    src = pages.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    if ts_col is not None:
        w = Window.partitionBy(key_col).orderBy(F.col(ts_col).desc())
        src = (
            src.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )

    # docIDs: doc_base + rank(url within batch) — Lucene docBase semantics.
    # Scale-out assignment (assign_dense_ids: range-partition + per-partition
    # offsets), NOT a global window — a catch-up batch after downtime must
    # not funnel through one task.
    ids_staging = os.path.join(paths.root, f"_staging_nrt_ids_{seg_id}")
    with_ids = assign_dense_ids(
        src.select(key_col, text_col),
        order_col=key_col,
        id_col="doc_id",
        staging_dir=ids_staging,
    ).withColumn("doc_id", F.col("doc_id") + F.lit(doc_base))

    term_doc = invert_tokens(with_ids, text_col, positions=True).persist()
    dl_nonempty = term_doc.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    docs_new = (
        with_ids.select("doc_id", key_col)
        .join(dl_nonempty, "doc_id", "left")
        .withColumn("dl", F.coalesce(F.col("dl"), F.lit(0)).cast("long"))
        .select(
            "doc_id",
            key_col,
            "dl",
            _norm_byte_udf()(F.col("dl")).alias("norm_byte"),
        )
        .persist()
    )
    n_new = docs_new.count()
    new_ttf = docs_new.agg(F.sum("dl")).head()[0] or 0
    batch_stats = term_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_delta"), F.sum("tf").alias("ttf_delta")
    )

    # --- term dictionary delta: keep old ids, append new terms by rank
    if old_terms is not None:
        joined = batch_stats.join(
            F.broadcast(old_terms.select("term", "term_id")), "term", "left"
        )
    else:
        joined = batch_stats.withColumn("term_id", F.lit(None).cast("long"))
    # new-term ids by term rank — scale-out (no single-task global window)
    new_assign = assign_dense_ids(
        joined.where(F.col("term_id").isNull()).select("term"),
        order_col="term",
        id_col="__rank",
    ).select(
        "term", (F.col("__rank") + F.lit(next_term_id)).cast("long").alias("term_id")
    )
    term_map = (
        joined.where(F.col("term_id").isNotNull())
        .select("term", "term_id")
        .unionByName(new_assign)
    )

    # --- postings for this segment only → postings/seg_id=N (overwrite);
    # postings are keyed by term string, so no dictionary join is needed here
    enriched = (
        term_doc.join(docs_new.select("doc_id", "norm_byte"), "doc_id")
        .withColumn("seg_id", F.lit(seg_id).cast("int"))
        .withColumn("chunk_id", (F.col("doc_id") / F.lit(chunk_span)).cast("long"))
    )
    packed = pack_sorted_partitions(enriched, positions=True)
    seg_dir = os.path.join(paths.postings, f"seg_id={seg_id}")
    packed.write.mode("overwrite").option("parquet.block.size", str(32 * 1024 * 1024)).parquet(seg_dir)

    # --- docs for this batch → docs/seg=N (overwrite: replay-safe)
    docs_new.write.mode("overwrite").parquet(os.path.join(paths.docs, f"seg={seg_id}"))

    # --- terms snapshot → terms_v{N} (overwrite: replay-safe)
    updated = term_map.join(batch_stats, "term").select(
        "term",
        "term_id",
        F.col("df_delta").alias("df"),
        F.col("ttf_delta").alias("ttf"),
    )
    if old_terms is not None:
        merged = (
            old_terms.select("term", "term_id", "df", "ttf")
            .unionByName(updated)
            .groupBy("term")
            .agg(
                F.max("term_id").alias("term_id"),  # ids agree across inputs
                F.sum("df").alias("df"),
                F.sum("ttf").alias("ttf"),
            )
        )
    else:
        merged = updated
    terms_dir = os.path.join(paths.root, f"terms_v{seg_id}")
    merged.write.mode("overwrite").parquet(terms_dir)

    # --- lineage row LAST: the commit point
    seg_df = spark.read.parquet(seg_dir)
    lineage_row = (
        seg_df.agg(
            F.min("first_doc").alias("doc_id_min"),
            F.max(F.element_at("skip_last_doc", -1)).alias("doc_id_max"),
            F.count_distinct("term").alias("term_count"),
            F.sum("df_chunk").alias("row_count"),
            (F.sum("df_chunk") * 8).alias("posting_bytes"),  # df_chunk == len(doc_gaps); avoids scanning the arrays
        )
        .withColumn("seg_id", F.lit(seg_id).cast("int"))
        .withColumn("status", F.lit("complete"))
        .withColumn("built_at_snapshot", F.lit(int(time.time() * 1000)).cast("long"))
        .withColumn("n_docs", F.lit(int(n_new)).cast("long"))
        .withColumn("ttf", F.lit(int(new_ttf)).cast("long"))
        .withColumn(
            "batch_id",
            F.lit(batch_id).cast("long") if batch_id is not None else F.lit(None).cast("long"),
        )
    )
    lineage_row.write.mode("append").parquet(paths.lineage)
    term_doc.unpersist()
    shutil.rmtree(ids_staging, ignore_errors=True)

    # stats.json: true BM25 stats = previous stats + docs added since that
    # write (reconciled through the lineage snapshot — survives purges, which
    # shrink the true stats without touching lineage). Falls back to raw
    # lineage sums for indexes never purged / missing stats.json.
    lineage_docs_now = doc_base + int(n_new)
    lineage_ttf_now = prior_ttf + int(new_ttf)
    stats_max_doc, stats_ttf = lineage_docs_now, lineage_ttf_now
    if os.path.exists(paths.stats):
        with open(paths.stats) as fh:
            prev = json.load(fh)
        if "lineage_n_docs" in prev:
            stats_max_doc = prev["max_doc"] + (lineage_docs_now - prev["lineage_n_docs"])
            stats_ttf = prev["sum_total_term_freq"] + (
                lineage_ttf_now - prev["lineage_ttf"]
            )
    write_stats(
        paths,
        max_doc=stats_max_doc,
        sum_ttf=stats_ttf,
        n_segments=len(completed) + 1,
        terms_dir=terms_dir,
        lineage_n_docs=lineage_docs_now,
        lineage_ttf=lineage_ttf_now,
    )
    docs_new.unpersist()
    return seg_id


def update_documents(
    spark: SparkSession,
    pages: DataFrame,
    paths: IndexPaths | str,
    text_col: str = "text",
    key_col: str = "url",
    ts_col: str | None = None,
    batch_id: int | None = None,
) -> int:
    """updateDocument on a LIVE index (IndexWriter.java:1187: atomic
    delete-by-term on the unique key + add): tombstone any existing docs
    with these keys, then append the batch as a new segment. The old
    versions disappear from results immediately (liveDocs anti-join) and
    are physically reclaimed by purge_deletes/merge. Returns the new
    seg_id."""
    from ..index.deletes import delete_by_key

    paths = paths if isinstance(paths, IndexPaths) else IndexPaths(paths)
    # Replay guard FIRST (UpdateLog idempotence): a replayed batch's keys
    # match the docs its original run appended — tombstoning them before
    # append_segment's early-return would permanently hide the update.
    replayed = batch_id is not None and batch_id in applied_batch_ids(
        spark, paths.lineage
    )
    if not replayed and os.path.exists(paths.docs):
        # keys stay distributed: delete_by_key semi-joins the docs table
        # against this frame (no driver collect of a catch-up batch's keys)
        delete_by_key(spark, paths, pages.select(key_col).distinct(), key_col=key_col)
    return append_segment(
        spark,
        pages,
        paths,
        text_col=text_col,
        key_col=key_col,
        ts_col=ts_col,
        batch_id=batch_id,
    )


def start_nrt_stream(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema: str = "url string, warc_ts timestamp, html binary, text string, lang string",
    ts_col: str | None = None,
    trigger_once: bool = False,
):
    """File-source NRT pipeline: new parquet drops in `input_dir` become
    appended index segments. The streaming batch id (stable across restarts
    via the checkpoint) is recorded in lineage as the replay guard; segment
    ids are allocated independently from the lineage namespace."""
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # seg_id is allocated from lineage (never collides with bulk/merged
        # segments); batch_id is only the replay guard
        append_segment(spark, batch_df, index_dir, batch_id=int(batch_id), ts_col=ts_col)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

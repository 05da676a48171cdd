"""FuzzyLikeThisQuery (lucene/sandbox) — fuzzify ALL query terms, keep the
best differentiating variants, score as one coord'd disjunction.

Reference: lucene/sandbox/src/java/org/apache/lucene/sandbox/queries/
FuzzyLikeThisQuery.java:40-325 and SlowFuzzyTermsEnum.java:
- per source term, enumerate dictionary variants sharing `prefix_length`
  chars with similarity = 1 − edits/(prefixLen + min(textlen, targetlen))
  over the post-prefix portions (SlowFuzzyTermsEnum.java:115,249), edit
  score = (similarity − minSimilarity) × 1/(1 − minSimilarity)
  (FuzzyTermsEnum's boost attribute), top MAX_VARIANTS_PER_TERM=50 kept
  (ties → lexicographically smaller term, ScoreTermQueue.lessThan);
- variant final score = editScore² × idf(df, numDocs) with the SOURCE
  term's df (or the average df of all enumerated variants when the source
  is absent), idf = DefaultSimilarity ln(N/(df+1))+1
  (FuzzyLikeThisQuery.java:236-252);
- global ScoreTermQueue keeps the top maxNumTerms across all source terms;
- rewrite: variants grouped per source term into coord-DISABLED
  sub-BooleanQueries of TermQuery(term, docFreq=1) boosted by the score
  (so a variant's own rarity never outranks the source idf —
  FuzzyLikeThisQuery.java:49-53), summed under a top-level BooleanQuery
  whose coord counts matched GROUPS.

Spark shape: variant discovery is ONE dictionary scan (broadcast of the
few source terms, codegen levenshtein, per-source top-50 window) — no
driver-side term enumeration; only the ≤ 50×|terms| winning rows collect.
Scoring runs the classic-similarity kernel over the selected postings
with TermQuery(docFreq=1) statistics; queryNorm is computed exactly
(Σ(idf₁·boost)², float32), coord = matchedGroups/totalGroups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .classic import NORM_FLOAT_TABLE, classic_idf

MAX_VARIANTS_PER_TERM = 50


def _variant_frame(
    searcher, src_terms: list[str], min_similarity: float, prefix_length: int
):
    """(src, term, df, boost) for every dictionary variant above the
    similarity floor, plus per-src (n_variants, total_df) over ALL
    enumerated variants — one broadcast-joined dictionary scan."""
    spark = searcher.spark
    src = spark.createDataFrame([(t,) for t in src_terms], "src string")
    t = F.col("term")
    s = F.col("src")
    plen = prefix_length
    joined = searcher.terms.select("term", "df").join(
        F.broadcast(src),
        F.substring(t, 1, plen) == F.substring(s, 1, plen) if plen else F.lit(True),
    )
    text_len = F.length(t) - F.lit(plen)
    targ_len = F.length(s) - F.lit(plen)
    ed = F.levenshtein(F.substring(t, plen + 1, 1 << 20), F.substring(s, plen + 1, 1 << 20))
    sim = F.lit(1.0) - ed.cast("double") / (
        F.lit(float(plen)) + F.least(text_len, targ_len).cast("double")
    )
    cands = joined.select(
        "src", "term", "df",
        ((sim - F.lit(min_similarity)) / F.lit(1.0 - min_similarity)).alias("boost"),
        sim.alias("sim"),
    ).where(F.col("sim") > F.lit(min_similarity))
    stats = cands.groupBy("src").agg(
        F.count("*").alias("n_variants"), F.sum("df").alias("total_df")
    )
    top = (
        cands.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("src").orderBy(F.desc("boost"), "term")
            ),
        )
        .where(F.col("rk") <= MAX_VARIANTS_PER_TERM)
        .select("src", "term", "df", "boost")
    )
    return top, stats


def fuzzy_like_this(
    searcher,
    query_text: str,
    min_similarity: float = 0.5,
    prefix_length: int = 0,
    max_num_terms: int = 50,
    ignore_tf: bool = False,
    k: int = 10,
) -> DataFrame:
    """Execute a FuzzyLikeThisQuery over this index (single-field analog of
    addTerms + rewrite + search). Returns (doc_id, score float32)."""
    seen: set[str] = set()
    src_terms = [
        t for t in searcher.analyze_query(query_text)
        if not (t in seen or seen.add(t))
    ]
    if not src_terms:
        return searcher._empty()

    top, stats = _variant_frame(searcher, src_terms, min_similarity, prefix_length)
    top_pdf = top.toPandas()
    stats_pdf = {r.src: (int(r.n_variants), int(r.total_df))
                 for r in stats.collect()}
    if top_pdf.empty:
        return searcher._empty()

    n_docs = searcher.stats.max_doc
    src_df = {
        str(r.term): int(r.df)
        for r in searcher.lookup_terms(src_terms).itertuples()
    }
    # variant final score = boost² × idf(source df | avg variant df)
    score_terms: list[tuple[float, str, str]] = []  # (score, term, src)
    for r in top_pdf.itertuples(index=False):
        n_var, total_df = stats_pdf[r.src]
        df_eff = src_df.get(r.src, 0) or (total_df // n_var if n_var else 0)
        idf = float(classic_idf(df_eff, n_docs))
        score_terms.append((float(r.boost) ** 2 * idf, str(r.term), str(r.src)))
    # global queue: top maxNumTerms, ties → smaller term survives
    score_terms.sort(key=lambda p: (-p[0], p[1]))
    chosen = score_terms[:max_num_terms]

    # one clause group per source term with surviving variants
    groups = sorted({src for _, _, src in chosen})
    gid = {s: i for i, s in enumerate(groups)}
    idf1 = float(classic_idf(1, n_docs))  # TermQuery(term, docFreq=1)

    # queryNorm over ALL clause weights: qw = idf₁ × boost (ConstantScore
    # children contribute boost² instead when ignore_tf)
    sum_sq = np.float32(0.0)
    for sc, _, _ in chosen:
        qw = np.float32(sc) if ignore_tf else np.float32(idf1 * sc)
        sum_sq = np.float32(sum_sq + np.float32(qw * qw))
    qnorm = np.float32(1.0 / np.sqrt(np.float64(sum_sq))) if sum_sq > 0 else np.float32(0)

    # per-variant normalized value
    per_term: dict[str, tuple[int, np.float32]] = {}
    for sc, term, src in chosen:
        if ignore_tf:
            val = np.float32(np.float32(sc) * qnorm)
        else:
            val = np.float32(np.float32(np.float32(idf1 * sc) * qnorm) * idf1)
        prev = per_term.get(term)
        # a term may be a variant of two source terms; keep the higher value
        # clause (duplicate SHOULD clauses would double-count in Lucene too,
        # but the global queue never emits exact duplicates per (term, src))
        if prev is None or val > prev[1]:
            per_term[term] = (gid[src], val)

    terms_sorted = sorted(per_term)
    vals = {t: per_term[t][1] for t in terms_sorted}
    gids = {t: per_term[t][0] for t in terms_sorted}
    n_groups = len(groups)

    from typing import Iterator

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_doc, out_grp, out_score = [], [], []
            for row in pdf.itertuples(index=False):
                gaps = np.asarray(row.doc_gaps, dtype=np.int64)
                docs = row.first_doc + np.cumsum(gaps)
                v = vals[row.term]
                if ignore_tf:
                    sc = np.full(len(docs), v, dtype=np.float32)
                else:
                    tf32 = np.sqrt(
                        np.asarray(row.tfs, dtype=np.float64)
                    ).astype(np.float32)
                    norms = NORM_FLOAT_TABLE[
                        np.asarray(row.norm_bytes, dtype=np.int64) & 0xFF
                    ]
                    sc = ((tf32 * v).astype(np.float32) * norms).astype(np.float32)
                out_doc.append(docs)
                out_grp.append(np.full(len(docs), gids[row.term], dtype=np.int32))
                out_score.append(sc)
            if out_doc:
                yield pd.DataFrame({
                    "doc_id": np.concatenate(out_doc),
                    "grp": np.concatenate(out_grp),
                    "score": np.concatenate(out_score),
                })

    rows = searcher.postings.where(F.col("term").isin(terms_sorted)).select(
        "term", "first_doc", "doc_gaps", "tfs", "norm_bytes"
    )
    per_posting = rows.mapInPandas(kernel, schema="doc_id long, grp int, score float")
    agg = per_posting.groupBy("doc_id").agg(
        F.sum("score").cast("float").alias("s32"),
        F.countDistinct("grp").alias("overlap"),
    )
    # top-level coord over GROUPS (sub-BooleanQueries are coord-disabled)
    coord = (F.col("overlap").cast("double") / F.lit(float(n_groups))).cast("float")
    scored = agg.select(
        "doc_id",
        (F.col("s32").cast("double") * coord.cast("double")).cast("float").alias("score"),
    )
    return searcher._topk(searcher._drop_deleted(scored), k)

"""Index-backed text classification — the lucene/classification module.

Reference semantics (re-expressed, not ported):

- SimpleNaiveBayesClassifier
  (lucene/classification/src/java/org/apache/lucene/classification/
  SimpleNaiveBayesClassifier.java:44-167): add-1-smoothed multinomial
  naive Bayes where every statistic is read FROM THE INDEX —
  `hits(text:word AND class:c)` is the per-class word document count,
  the denominator is `avgUniqueTermsPerDoc * docFreq(class:c) +
  docsWithClassSize`, and the prior is `docCount(c) / docsWithClassSize`.
- KNearestNeighborClassifier
  (KNearestNeighborClassifier.java:39-93): MoreLikeThis query from the
  input text, majority class among the top-k neighbours,
  score = maxCount / k.

Spark-first shape: training is ONE decode pass over the postings table
(term, doc) joined to the class column — a groupBy, not a per-(word,class)
boolean query loop — and batch classification is tokenize → explode →
broadcast-join the model → per-(input, class) log-likelihood aggregation.
That plan is a corpus-sized scan + two small-row shuffles, so it holds at
10^12 docs; the reference's assignClass(String) one-doc API is the k=1
special case of the batch path.

Scoring note: the reference multiplies raw double probabilities
(SimpleNaiveBayesClassifier.java:116 has a `TODO: turn it to be in log
scale`). We accumulate in log space — argmax-identical wherever the
reference's product does not underflow, and well-defined where it does.
Ties broken by class value ascending, matching the reference's TermsEnum
iteration order (classes enumerate sorted; a later class replaces the
incumbent only on a strictly greater score).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

from ..analysis.analyzer import (
    MAX_TOKEN_LENGTH,
    _not_stopword,
    token_array_for,
)


def _analyzed_terms_col(text: Column, tokenizer: str) -> Column:
    """Post-stop analyzed token array under the index's recorded chain —
    the analyzer the classifier was trained with (tokenizeDoc,
    SimpleNaiveBayesClassifier.java:86-100)."""
    if tokenizer == "english":
        # stem runs post-stop (chain-order proof in analysis/english.py);
        # Arrow-batched UDF, same execution style as the fidelity tokenizer
        from ..analysis.english import english_analyze

        @pandas_udf("array<string>")
        def _eng(texts: pd.Series) -> pd.Series:
            return texts.map(lambda t: [tok for _, tok in english_analyze(t or "")])

        return _eng(text)
    return F.filter(
        token_array_for(text, tokenizer),
        lambda t: _not_stopword(t) & (F.length(t) <= MAX_TOKEN_LENGTH),
    )


@dataclass
class NaiveBayesModel:
    """Per-class statistics (small; collected to the driver) + the
    (term, class, doc-count) likelihood table (stays distributed)."""

    classes: pd.DataFrame  # cls, n_docs, prior, den
    word_class: DataFrame  # term, cls, n_docs_with_word
    docs_with_class: int
    avg_unique_terms: float
    tokenizer: str = "jvm"


def _all_posting_doc_pairs(searcher) -> DataFrame:
    """Full-dictionary DocIdSetIterator sweep: decode every posting row to
    (term, doc_id). One map-only pass; postings rows are unique per
    (term, doc) by construction, so no distinct is needed."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms, docs = [], []
            for row in pdf.itertuples(index=False):
                gaps = np.asarray(row.doc_gaps, dtype=np.int64)
                docs.append(row.first_doc + np.cumsum(gaps))
                terms.append(np.repeat(row.term, len(gaps)))
            if terms:
                yield pd.DataFrame(
                    {
                        "term": np.concatenate(terms),
                        "doc_id": np.concatenate(docs),
                    }
                )

    rows = searcher.postings.select("term", "first_doc", "doc_gaps")
    return rows.mapInPandas(kernel, schema="term string, doc_id long")


def train_naive_bayes(
    searcher,
    source: DataFrame,
    class_col: str,
    key_col: str = "url",
) -> NaiveBayesModel:
    """Train from the index (SimpleNaiveBayesClassifier.train): the class
    "field" is a column of `source` joined by the doc key; docs with a
    null class are ignored (assignClass skips docs whose class field is
    missing, KNearestNeighborClassifier.java:73-75 likewise)."""
    doc_classes = (
        searcher.docs.select("doc_id", key_col)
        .join(source.select(key_col, F.col(class_col).alias("cls")), key_col)
        .where(F.col("cls").isNotNull())
        .select("doc_id", "cls")
    )
    # countDocsWithClass (SimpleNaiveBayesClassifier.java:75-84) + per-class
    # docCount(c) in one aggregation
    class_counts = doc_classes.groupBy("cls").agg(
        F.count(F.lit(1)).alias("n_docs")
    ).toPandas()
    docs_with_class = int(class_counts["n_docs"].sum())

    # avgUniqueTermsPerDoc = sumDocFreq / docCount(text)
    # (getTextTermFreqForClass, SimpleNaiveBayesClassifier.java:148-154)
    agg = searcher.terms.agg(F.sum("df").alias("sdf")).collect()[0]
    sum_doc_freq = int(agg["sdf"] or 0)
    text_doc_count = searcher.docs.where(F.col("dl") > 0).count()
    avg_unique = sum_doc_freq / float(text_doc_count) if text_doc_count else 0.0

    # hits(text:word AND class:c) for EVERY (word, c) in one shuffle
    # (getWordFreqForClass, :156-163 — a doc count, not a tf sum)
    word_class = (
        _all_posting_doc_pairs(searcher)
        .join(doc_classes, "doc_id")
        .groupBy("term", "cls")
        .agg(F.count(F.lit(1)).alias("n_docs_with_word"))
    )
    word_class = word_class.persist()

    cls_pdf = class_counts.sort_values("cls").reset_index(drop=True)
    cls_pdf["prior"] = cls_pdf["n_docs"] / float(docs_with_class)
    cls_pdf["den"] = avg_unique * cls_pdf["n_docs"] + docs_with_class
    tok = searcher.meta.get("tokenizer", "jvm") if hasattr(searcher, "meta") else "jvm"
    return NaiveBayesModel(
        classes=cls_pdf,
        word_class=word_class,
        docs_with_class=docs_with_class,
        avg_unique_terms=avg_unique,
        tokenizer=tok,
    )


def classify_naive_bayes(
    model: NaiveBayesModel,
    inputs: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
) -> DataFrame:
    """Batch assignClass (SimpleNaiveBayesClassifier.java:103-146): per
    input, argmax over classes of ln(prior) + Σ_tokens ln((hits+1)/den).
    Tokens keep multiplicity (the reference multiplies once per word
    occurrence in the tokenized input). Returns
    (id, assigned_class, log_score), one row per input.

    SCALE BOUND: the tokens × classes crossJoin (below) is linear in
    |classes| — the class table is a broadcast-sized dimension (labels are
    enumerated on the driver at train time, NaiveBayesModel.classes), so
    the plan is a broadcast nested loop over at most a few hundred classes.
    For many-class problems (10^4+ labels) switch to blocking on a
    class-candidate join (e.g. restrict to classes sharing at least one
    input term via word_class) before the scoring aggregate."""
    spark = inputs.sparkSession
    # tokenize under the index's chain (the reference classifies with the
    # same analyzer it trained with); keep duplicates as counts
    toks = (
        inputs.select(
            F.col(id_col).alias("_in_id"),
            F.explode(_analyzed_terms_col(F.col(text_col), model.tokenizer)).alias(
                "term"
            ),
        )
        .groupBy("_in_id", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    classes_df = F.broadcast(
        spark.createDataFrame(
            model.classes[["cls", "prior", "den"]],
            "cls string, prior double, den double",
        )
    )
    # (input, term) × classes, left-joined to the per-class word doc counts;
    # unseen (word, class) pairs smooth to hits=0 → num=1
    scored = (
        toks.crossJoin(classes_df)
        .join(model.word_class, ["term", "cls"], "left")
        .withColumn(
            "contrib",
            F.col("cnt")
            * (
                F.log(F.coalesce(F.col("n_docs_with_word"), F.lit(0)) + F.lit(1.0))
                - F.log(F.col("den"))
            ),
        )
        .groupBy("_in_id", "cls")
        .agg((F.sum("contrib")).alias("ll"))
        .join(classes_df.select("cls", "prior"), "cls")
        .withColumn("log_score", F.col("ll") + F.log("prior"))
    )
    # inputs with NO tokens still get argmax over ln(prior) alone
    # (likelihood product over zero words = 1), via a right join to inputs
    all_ids = inputs.select(F.col(id_col).alias("_in_id")).distinct()
    base = all_ids.crossJoin(classes_df.select("cls", "prior"))
    scored = (
        base.join(scored.select("_in_id", "cls", "log_score"), ["_in_id", "cls"], "left")
        .withColumn("log_score", F.coalesce(F.col("log_score"), F.log("prior")))
    )
    w = Window.partitionBy("_in_id").orderBy(
        F.col("log_score").desc(), F.col("cls").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(
            F.col("_in_id").alias(id_col),
            F.col("cls").alias("assigned_class"),
            "log_score",
        )
    )


def knn_classify(
    searcher,
    source: DataFrame,
    class_col: str,
    text: str,
    k: int = 10,
    key_col: str = "url",
    max_query_terms: int = 25,
    min_doc_freq: int = 5,
    min_term_freq: int = 2,
) -> tuple[str | None, float]:
    """KNearestNeighborClassifier.assignClass
    (KNearestNeighborClassifier.java:60-93): MoreLikeThis query from the
    input text (reference MLT defaults: maxQueryTerms=25, minDocFreq=5,
    minTermFreq=2 — MoreLikeThis.java:152,160,222), top-k BM25 neighbours,
    majority class among neighbours with a non-null class, score =
    maxCount / k. Tie-break: class value ascending (the reference iterates
    a HashMap — order undefined; we pin the deterministic choice)."""
    from .components import more_like_this

    hits, _ = more_like_this(
        searcher,
        text,
        max_query_terms=max_query_terms,
        k=k,
        min_doc_freq=min_doc_freq,
        min_term_freq=min_term_freq,
    )
    neighbors = (
        hits.join(searcher.docs.select("doc_id", key_col), "doc_id")
        .join(source.select(key_col, F.col(class_col).alias("cls")), key_col)
        .where(F.col("cls").isNotNull())
        .groupBy("cls")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("cls").asc())
        .limit(1)
        .collect()
    )
    if not neighbors:
        return None, 0.0
    top = neighbors[0]
    return str(top["cls"]), float(top["n"]) / float(k)

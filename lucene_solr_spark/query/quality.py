"""Search-quality benchmark (lucene/benchmark quality package): TREC-style
relevance evaluation of this engine's results.

Reference: lucene/benchmark/src/java/org/apache/lucene/benchmark/quality/
- QualityStats.java:29-234 — sequential addResult accumulation: P@1..20
  (with the (numPoints·pAt[numPoints])/n extrapolation past the result
  count), recall vs maxGoodPoints, MRR counted only when the FIRST
  relevant hit lands within the top 5 (:87-89), average precision =
  Σ p(rank of each relevant hit)/maxGoodPoints, and the average() rule —
  times averaged over ALL queries, quality measures only over queries
  with positive judgements, pReleventSum rescaled so getAvp() stays
  correct (:212-233).
- trec/TrecJudge.java:58-156 — qrels lines `queryID 0 docName rel`,
  isRelevant by (queryID, docName), maxRecall = judged-relevant count.
- QualityBenchmark.java — run each QualityQuery through the searcher,
  extract doc names, judge each rank in order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

MAX_POINTS = 20


class QualityStats:
    """Port of QualityStats (same accumulation order and formulas)."""

    def __init__(self, max_good_points: float, search_time: float = 0.0):
        self.max_good_points = float(max_good_points)
        self.search_time = float(search_time)
        self.recall_points: list[tuple[int, float]] = []
        self.p_at = [0.0] * (MAX_POINTS + 1)  # pAt[0] unused
        self.p_relevant_sum = 0.0
        self.num_points = 0.0
        self.num_good_points = 0.0
        self.mrr = 0.0
        self.recall = 0.0

    def add_result(self, n: int, is_relevant: bool) -> None:
        if abs(self.num_points + 1 - n) > 1e-6:
            raise ValueError(f"point {n} illegal after {self.num_points} points!")
        if is_relevant:
            self.num_good_points += 1
            self.recall_points.append((n, self.num_good_points))
            if len(self.recall_points) == 1 and n <= 5:
                self.mrr = 1.0 / n
        self.num_points = float(n)
        p = self.num_good_points / self.num_points
        if is_relevant:
            self.p_relevant_sum += p
        if n < len(self.p_at):
            self.p_at[n] = p
        self.recall = (
            p if self.max_good_points <= 0
            else self.num_good_points / self.max_good_points
        )

    def precision_at(self, n: int) -> float:
        if n < 1 or n > MAX_POINTS:
            raise ValueError(f"n={n} - but it must be in [1,{MAX_POINTS}] range!")
        if n > self.num_points:
            return (self.num_points * self.p_at[int(self.num_points)]) / n
        return self.p_at[n]

    def avp(self) -> float:
        """Average precision at recall points (getAvp)."""
        return 0.0 if self.max_good_points == 0 else (
            self.p_relevant_sum / self.max_good_points
        )

    @staticmethod
    def average(stats: list["QualityStats"]) -> "QualityStats":
        avg = QualityStats(0, 0)
        if not stats:
            return avg
        m = 0  # queries with positive judgements
        for s in stats:
            avg.search_time += s.search_time
            if s.max_good_points > 0:
                m += 1
                avg.num_good_points += s.num_good_points
                avg.num_points += s.num_points
                avg.p_relevant_sum += s.avp()
                avg.recall += s.recall
                avg.mrr += s.mrr
                avg.max_good_points += s.max_good_points
                for j in range(1, len(avg.p_at)):
                    avg.p_at[j] += s.precision_at(j)
        avg.search_time /= len(stats)
        if m > 0:
            avg.num_good_points /= m
            avg.num_points /= m
            avg.recall /= m
            avg.mrr /= m
            avg.max_good_points /= m
            for j in range(1, len(avg.p_at)):
                avg.p_at[j] /= m
            avg.p_relevant_sum /= m              # this is actually avgp now
            avg.p_relevant_sum *= avg.max_good_points  # so avp() stays correct
        return avg


class TrecJudge:
    """qrels judge: lines `queryID 0 docName rel` (TrecJudge.java:58-68);
    accepts an iterable of lines or a path."""

    def __init__(self, qrels):
        if isinstance(qrels, str):
            with open(qrels) as fh:
                lines = fh.readlines()
        else:
            lines = list(qrels)
        self._rel: dict[str, set[str]] = {}
        for line in lines:
            line = line.strip()
            if not line:
                continue
            parts = line.split()
            qid, _, doc_name, rel = parts[0], parts[1], parts[2], parts[3]
            if rel != "0":
                self._rel.setdefault(qid, set()).add(doc_name)
            else:
                self._rel.setdefault(qid, set())

    def is_relevant(self, doc_name: str, query_id: str) -> bool:
        return doc_name in self._rel.get(query_id, ())

    def max_recall(self, query_id: str) -> int:
        return len(self._rel.get(query_id, ()))


def quality_benchmark(
    searcher,
    queries: dict[str, str],
    judge: TrecJudge,
    max_results: int = MAX_POINTS,
    key_col: str = "url",
) -> tuple[dict[str, QualityStats], QualityStats]:
    """QualityBenchmark.execute: run each query, extract doc names
    (DocNameExtractor = one join against the docs table), judge ranks in
    order. Returns ({query_id: stats}, average)."""
    import time

    docs = searcher.spark.read.parquet(searcher.paths.docs).select(
        "doc_id", key_col
    )
    per_query: dict[str, QualityStats] = {}
    for qid, qtext in queries.items():
        t0 = time.time()
        hits = searcher.search(qtext, k=max_results).collect()
        elapsed = (time.time() - t0) * 1000.0
        ids = [int(h["doc_id"]) for h in hits]
        names = {}
        if ids:
            names = {
                int(r["doc_id"]): r[key_col]
                for r in docs.where(F.col("doc_id").isin(ids)).collect()
            }
        st = QualityStats(judge.max_recall(qid), elapsed)
        for rank, did in enumerate(ids, start=1):
            st.add_result(rank, judge.is_relevant(names.get(did, ""), qid))
        per_query[qid] = st
    return per_query, QualityStats.average(list(per_query.values()))

"""LMDirichletSimilarity — Bayesian (Dirichlet-prior) language-model
scoring, float32-faithful to the reference (LMDirichletSimilarity.java:
64-70, LMSimilarity.java:148-155, SimilarityBase.java:215-244):

- p(t|C)    = (totalTermFreq + 1) / (numberOfFieldTokens + 1), float32
              (DefaultCollectionModel; numberOfFieldTokens =
              sumTotalTermFreq, BasicStats.java:73-82)
- docLen    = 1 / byte315ToFloat(norm_byte)^2  — SimilarityBase's decoded
              length table over the SAME stored norm byte the BM25/classic
              paths use (norm → length round-trip, SimilarityBase.java:
              220-226): a third similarity over one index, the Lucene
              plug-point.
- score     = (float)( log(1 + freq / (mu * p)) + log(mu / (docLen + mu)) )
              clipped at 0 (docs with fewer occurrences than the collection
              model predicts score 0, not negative — the Lucene deviation
              from Zhai & Lafferty 2001 documented in the class javadoc);
              the inner ratios are float32 ops, the logs double, the final
              cast float32 (Java expression typing of :66-68).
- boolean   = DisjunctionSumScorer double-sum → float32; coord and
              queryNorm are the Similarity.java:122,139 defaults (1).
- mu        = 2000 by default (:55-62).
"""

from __future__ import annotations

import numpy as np

from ..index.norms import byte315_to_float

# SimilarityBase.NORM_TABLE: norm byte -> decoded document length.
# Byte 0 decodes to +inf exactly as Java's 1.0f/0.0f does (:225).
with np.errstate(divide="ignore"):
    LM_DOCLEN_TABLE = (
        1.0
        / np.square(byte315_to_float(np.arange(256, dtype=np.int64)).astype(np.float32))
    ).astype(np.float32)

DEFAULT_MU = np.float32(2000.0)


def collection_probability(ttf: int, sum_ttf: int) -> np.float32:
    """DefaultCollectionModel.computeProbability (LMSimilarity.java:152-154):
    (ttf + 1F) / (numberOfFieldTokens + 1F), float32."""
    return np.float32((np.float32(ttf) + np.float32(1.0)) / (np.float32(sum_ttf) + np.float32(1.0)))


def lm_dirichlet_scores(
    tfs: np.ndarray,
    norm_bytes: np.ndarray,
    p_collection: np.float32,
    mu: np.float32 = DEFAULT_MU,
) -> np.ndarray:
    """Per-posting float32 scores of ONE term
    (LMDirichletSimilarity.java:64-70, boost=1)."""
    freq = np.asarray(tfs, dtype=np.float32)
    doc_len = LM_DOCLEN_TABLE[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
    inner = np.float32(1.0) + freq / (mu * p_collection)  # float32 ops
    weight = np.log(inner.astype(np.float64))
    dnorm = np.log((mu / (doc_len + mu)).astype(np.float64))
    score = (weight + dnorm).astype(np.float32)
    return np.maximum(score, np.float32(0.0))


def lm_jelinek_mercer_scores(
    tfs: np.ndarray,
    norm_bytes: np.ndarray,
    p_collection: np.float32,
    lam: np.float32,
) -> np.ndarray:
    """LMJelinekMercerSimilarity.score (LMJelinekMercerSimilarity.java:
    53-58): float( log(1 + ((1-λ)·freq/docLen) / (λ·p(t|C))) ), boost=1.
    Inner ratio arithmetic float32, the log double, final cast float32 —
    always ≥ 0, no clip needed."""
    freq = np.asarray(tfs, dtype=np.float32)
    doc_len = LM_DOCLEN_TABLE[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
    ratio = ((np.float32(1.0) - lam) * freq / doc_len) / (lam * p_collection)
    inner = np.float32(1.0) + ratio
    return np.log(inner.astype(np.float64)).astype(np.float32)


def brute_force_lm_topk(
    texts: dict[int, str],
    query_terms: list[str],
    k: int = 10,
    mu: float = 2000.0,
    similarity: str = "dirichlet",
    lam: float = 0.7,
) -> list[tuple[int, float]]:
    """Exhaustive oracle: tokenize, quantize lengths through the stored
    norm byte, score every distinct query term per doc (Dirichlet or
    Jelinek-Mercer), double-sum → float (DisjunctionSumScorer), tie-break
    score desc / docID asc."""
    from ..analysis.analyzer import standard_tokenize
    from ..index.norms import encode_norm

    doc_ids = sorted(texts)
    token_lists = {d: [t for _, t in standard_tokenize(texts[d])] for d in doc_ids}
    sum_ttf = sum(len(v) for v in token_lists.values())
    uniq = sorted(set(query_terms))
    mu32 = np.float32(mu)
    scores = {}
    for d in doc_ids:
        toks = token_lists[d]
        nb = int(encode_norm(np.array([len(toks)]))[0])
        total = 0.0  # double accumulation
        matched = False
        for t in uniq:
            tf = toks.count(t)
            if tf == 0:
                continue
            matched = True  # a clipped-to-0 posting still matches
            ttf = sum(v.count(t) for v in token_lists.values())
            p = collection_probability(ttf, sum_ttf)
            if similarity == "dirichlet":
                s = lm_dirichlet_scores(np.array([tf]), np.array([nb]), p, mu32)[0]
            else:
                s = lm_jelinek_mercer_scores(
                    np.array([tf]), np.array([nb]), p, np.float32(lam)
                )[0]
            total += float(s)
        if matched:
            scores[d] = np.float32(total)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(d, float(s)) for d, s in ranked[:k]]

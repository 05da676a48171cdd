"""ClassicSimilarity (Lucene's DefaultSimilarity) — the REFERENCE DEFAULT.

The reference tree predates BM25-as-default: every Solr core that does not
configure a <similarity> scores with DefaultSimilarity's practical TF-IDF
(DefaultSimilarity.java:55-140, TFIDFSimilarity.java:703-766):

- tf(freq)    = (float) sqrt(freq)                       (:120)
- idf(df, n)  = (float) (ln(n / (double)(df + 1)) + 1.0) (:138)
- lengthNorm  = boost * (float)(1/sqrt(numTerms)), stored byte315 (:109-115)
- queryNorm   = (float)(1/sqrt(sumOfSquaredWeights))     (:67)
- per term    : queryWeight = idf * boost; after normalize,
                value = (queryWeight * queryNorm) * idf  (TFIDFSimilarity
                IDFStats.normalize :761-764, every step float32)
- per posting : score = (tf(freq) * value) * decodeNorm(b)
                (ExactTFIDFDocScorer :713-716; decodeNorm = byte315ToFloat,
                DefaultSimilarity.java:96-98)
- per doc     : disjunction sums subscores in DOUBLE, casts to float, then
                multiplies the float coord factor
                (DisjunctionSumScorer.java:32,96-98: `(float)score *
                coord[nrMatchers]`; coord = overlap / (float)maxOverlap,
                DefaultSimilarity.java:61-63)

The index layout needs NOTHING new: the stored norm byte is
floatToByte315(1/sqrt(len)) for BOTH similarities (BM25 re-derives the
length from it; classic uses the decoded float directly), so one index
serves both scorers — exactly like Lucene, where Similarity is a search-time
choice over the same norms.
"""

from __future__ import annotations

import numpy as np

from ..analysis.analyzer import standard_tokenize
from ..index.norms import byte315_to_float, encode_norm

NORM_FLOAT_TABLE = byte315_to_float(np.arange(256, dtype=np.int64)).astype(np.float32)


def classic_idf(df: np.ndarray | int, max_doc: int) -> np.ndarray:
    """float32 idf = ln(n / (df + 1)) + 1 (DefaultSimilarity.java:138)."""
    dfv = np.asarray(df, dtype=np.float64)
    return (np.log(max_doc / (dfv + 1.0)) + 1.0).astype(np.float32)


def classic_term_values(
    terms: list[str], dfs: dict[str, int], max_doc: int
) -> dict[str, np.float32]:
    """Per-term normalized weight `value` after IndexSearcher's
    createNormalizedWeight pass (TFIDFSimilarity.java:737-766), boost=1:

    queryWeight_t = idf_t; sumSq = Σ queryWeight² (float32 accumulation in
    clause order, BooleanWeight.getValueForNormalization); queryNorm =
    (float)(1/sqrt(sumSq)); value_t = (queryWeight_t * queryNorm) * idf_t.

    Terms ABSENT from the index still contribute (df=0 → idf = ln(n)+1):
    TermQuery.createWeight builds TermStatistics for them and only the
    scorer is null, so they weigh into queryNorm and into maxOverlap."""
    idfs = {t: classic_idf(int(dfs.get(t, 0)), max_doc) for t in terms}
    sum_sq = np.float32(0.0)
    for t in terms:  # clause order, float32 accumulation
        qw = idfs[t]
        sum_sq = np.float32(sum_sq + np.float32(qw * qw))
    if sum_sq <= 0:
        return {t: np.float32(0.0) for t in terms}
    query_norm = np.float32(1.0 / np.sqrt(np.float64(sum_sq)))
    return {
        t: np.float32(np.float32(idfs[t] * query_norm) * idfs[t]) for t in terms
    }


def classic_scores(
    tfs: np.ndarray, norm_bytes: np.ndarray, value: np.float32
) -> np.ndarray:
    """float32 per-posting scores: (sqrt(tf) * value) * decodeNorm(b)."""
    tf32 = np.sqrt(np.asarray(tfs, dtype=np.float64)).astype(np.float32)
    raw = (tf32 * value).astype(np.float32)
    norms = NORM_FLOAT_TABLE[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
    return (raw * norms).astype(np.float32)


def combine_classic(
    doc_sums: np.ndarray, n_matched: np.ndarray, max_overlap: int
) -> np.ndarray:
    """Disjunction combine: float32(double_sum) * float32 coord
    (DisjunctionSumScorer.java:96-98; coord short-circuits to 1 for a
    single-clause query, BooleanWeight.coord)."""
    s32 = np.asarray(doc_sums, dtype=np.float64).astype(np.float32)
    if max_overlap <= 1:
        return s32
    # overlap / (float)maxOverlap is a FLOAT division in Java — keep it f32
    coord = np.divide(
        np.asarray(n_matched, dtype=np.int64).astype(np.float32),
        np.float32(max_overlap),
        dtype=np.float32,
    )
    return (s32 * coord).astype(np.float32)


def brute_force_topk_classic(
    texts: dict[int, str], query_terms: list[str], k: int = 10
) -> list[tuple[int, float]]:
    """Exhaustive DefaultSimilarity oracle over raw texts (tokenized with
    the fidelity analyzer), mirroring every float32 step above; reference
    tie-break score desc / docID asc (HitQueue.java:76-81)."""
    doc_ids = np.array(sorted(texts), dtype=np.int64)
    token_lists = [[t for _, t in standard_tokenize(texts[d])] for d in doc_ids]
    doc_len = np.array([len(toks) for toks in token_lists], dtype=np.int64)
    norm_bytes = encode_norm(doc_len)
    max_doc = len(doc_ids)

    dfs: dict[str, int] = {}
    for t in set(query_terms):
        dfs[t] = sum(1 for toks in token_lists if t in toks)
    values = classic_term_values(list(query_terms), dfs, max_doc)

    sums = np.zeros(max_doc, dtype=np.float64)
    matched = np.zeros(max_doc, dtype=np.int64)
    for t in sorted(set(query_terms)):
        tf = np.array([toks.count(t) for toks in token_lists], dtype=np.int64)
        has = tf > 0
        if not has.any():
            continue
        s = classic_scores(tf[has], norm_bytes[has], values[t])
        sums[has] += s.astype(np.float64)
        matched[has] += 1
    final = combine_classic(sums, matched, max_overlap=len(query_terms))
    mask = matched > 0
    ids, sc = doc_ids[mask], final[mask]
    order = np.lexsort((ids, -sc.astype(np.float64)))[:k]
    return [(int(ids[i]), float(sc[i])) for i in order]

"""DFR (Divergence From Randomness) and IB (Information-Based) similarities
— the two remaining SimilarityBase families the reference ships factories
for (solr/core/src/java/org/apache/solr/search/similarities/
DFRSimilarityFactory.java, IBSimilarityFactory.java), completing the
search-time Similarity plug-point next to BM25 / Classic / LMDirichlet /
LMJelinekMercer: all six score the SAME index and the SAME stored norm
byte.

Float32 fidelity follows the Java expression typing of each class:

- DFRSimilarity.score (DFRSimilarity.java:108-111):
  ``boost * basicModel.score(stats, tfn) * afterEffect.score(stats, tfn)``
  — float multiplications of float-returning components.
- Basic models (BasicModelBE/D/G/IF/In/Ine/P.java): double-math bodies with
  one final (float) cast; the I(x) family multiplies a float tfn by a
  float-cast log2, which is a float32 product.
- After effects (AfterEffectL.java:32-34, AfterEffectB.java:32-36): pure
  float32 arithmetic.
- Normalizations (NormalizationH1.java:50-52, H2:52-54, H3:43-45, Z:44-46):
  H1/H3 are float32 throughout; H2/Z take a double log2/pow of a float32
  inner ratio and cast the product back to float32.
- IBSimilarity.score (IBSimilarity.java:98-104):
  ``boost * distribution.score(stats, tfn, lambda)``; DistributionLL.java:
  33-35 and DistributionSPL.java:34-40 are double logs of float32 ratios
  cast to float32; LambdaDF.java:32-34 / LambdaTTF.java:32-34 are float32.
- Stats (SimilarityBase.java:100-130): N = maxDoc, F = totalTermFreq,
  n = docFreq, numberOfFieldTokens = sumTotalTermFreq, avgFieldLength =
  (float)(numberOfFieldTokens / numberOfDocuments); docLen is the decoded
  1/norm² length (shared LM_DOCLEN_TABLE, SimilarityBase.java:220-226).
- Boolean combine: DisjunctionSumScorer double-sum → float32, unit
  coord/queryNorm (Similarity.java:122,139 defaults), identical to the LM
  path.

Scale: these are per-posting closed-form kernels — the engine executes
them inside the same one-scan Arrow pass as BM25/LM (term-pruned postings
scan → vectorized scores → one groupBy → top-k); switching similarity
never changes the plan shape.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .lmdirichlet import LM_DOCLEN_TABLE

_LN2 = np.float64(np.log(2.0))
_LOG2_E = np.float64(np.log2(np.e))  # BasicModelP.LOG2_E


def _log2(x: np.ndarray | float) -> np.ndarray:
    """SimilarityBase.log2 — double precision."""
    return np.log(np.asarray(x, dtype=np.float64)) / _LN2


@dataclass(frozen=True)
class TermStats:
    """BasicStats (BasicStats.java / SimilarityBase.fillBasicStats)."""

    n_docs: int  # N  — numberOfDocuments (maxDoc)
    df: int  # n  — docFreq
    ttf: int  # F  — totalTermFreq
    sum_ttf: int  # numberOfFieldTokens
    avg_len: np.float32  # (float)(numberOfFieldTokens / numberOfDocuments)

    @staticmethod
    def make(n_docs: int, df: int, ttf: int, sum_ttf: int) -> "TermStats":
        avg = np.float32(np.float64(sum_ttf) / np.float64(n_docs))
        return TermStats(n_docs, df, ttf, sum_ttf, avg)


# --- normalizations: tfn(stats, tf_f32, len_f32) -> f32 ---------------------
def tfn_none(st: TermStats, tf: np.ndarray, ln: np.ndarray) -> np.ndarray:
    return tf


def tfn_h1(st: TermStats, tf: np.ndarray, ln: np.ndarray) -> np.ndarray:
    # tf * avgFieldLength / len — float ops (NormalizationH1.java:50-52)
    return (tf * st.avg_len / ln).astype(np.float32)


def tfn_h2(
    st: TermStats, tf: np.ndarray, ln: np.ndarray, c: np.float32 = np.float32(1.0)
) -> np.ndarray:
    # (float)(tf * log2(1 + c*avg/len)); inner ratio float32 (H2.java:52-54)
    inner = (np.float32(1.0) + c * st.avg_len / ln).astype(np.float32)
    return (tf.astype(np.float64) * _log2(inner)).astype(np.float32)


def tfn_h3(
    st: TermStats, tf: np.ndarray, ln: np.ndarray, mu: np.float32 = np.float32(800.0)
) -> np.ndarray:
    # (tf + mu*((F+1F)/(fieldTokens+1F))) / (len + mu) * mu — all float32
    # (NormalizationH3.java:43-45)
    model = np.float32(
        (np.float32(st.ttf) + np.float32(1.0)) / (np.float32(st.sum_ttf) + np.float32(1.0))
    )
    return ((tf + mu * model) / (ln + mu) * mu).astype(np.float32)


def tfn_z(
    st: TermStats, tf: np.ndarray, ln: np.ndarray, z: np.float32 = np.float32(0.30)
) -> np.ndarray:
    # (float)(tf * pow(avg/len, z)) — ratio float32, pow double (Z.java:44-46)
    ratio = (st.avg_len / ln).astype(np.float32)
    return (
        tf.astype(np.float64) * np.power(ratio.astype(np.float64), np.float64(z))
    ).astype(np.float32)


# --- DFR basic models: score(stats, tfn_f32) -> f32 -------------------------
def bm_be(st: TermStats, tfn: np.ndarray) -> np.ndarray:
    # BasicModelBE.java:38-48 — Bose-Einstein with N += F underflow guard
    t = tfn.astype(np.float64)
    big_f = np.float64(st.ttf) + 1.0 + t
    big_n = big_f + np.float64(st.n_docs)

    def f(n, m):
        return (m + 0.5) * _log2(n / m) + (n - m) * _log2(n)

    out = (
        -_log2((big_n - 1.0) * np.e)
        + f(big_n + big_f - 1.0, big_n + big_f - t - 2.0)
        - f(big_f, big_f - t)
    )
    return out.astype(np.float32)


def bm_d(st: TermStats, tfn: np.ndarray) -> np.ndarray:
    # BasicModelD.java:39-50 — binomial KL divergence approximation
    t = tfn.astype(np.float64)
    big_f = np.float64(st.ttf) + 1.0 + t
    phi = t / big_f
    nphi = 1.0 - phi
    p = 1.0 / (np.float64(st.n_docs) + 1.0)
    d = phi * _log2(phi / p) + nphi * _log2(nphi / (1.0 - p))
    return (d * big_f + 0.5 * _log2(1.0 + 2.0 * np.pi * t * nphi)).astype(np.float32)


def bm_g(st: TermStats, tfn: np.ndarray) -> np.ndarray:
    # BasicModelG.java:34-41 — geometric approximation, lambda = F/(N+F)
    t = tfn.astype(np.float64)
    big_f = np.float64(st.ttf) + 1.0
    lam = big_f / (np.float64(st.n_docs) + big_f)
    return (_log2(lam + 1.0) + t * _log2((1.0 + lam) / lam)).astype(np.float32)


def bm_if(st: TermStats, tfn: np.ndarray) -> np.ndarray:
    # BasicModelIF.java:34-36 — tfn(float) * (float)log2(1 + (N+1)/(F+0.5))
    inner = np.float32(
        _log2(1.0 + (np.float64(st.n_docs) + 1.0) / (np.float64(st.ttf) + 0.5))
    )
    return (tfn * inner).astype(np.float32)


def bm_in(st: TermStats, tfn: np.ndarray) -> np.ndarray:
    # BasicModelIn.java:35-37 — tfn * (float)log2((N+1)/(n+0.5))
    inner = np.float32(
        _log2((np.float64(st.n_docs) + 1.0) / (np.float64(st.df) + 0.5))
    )
    return (tfn * inner).astype(np.float32)


def bm_ine(st: TermStats, tfn: np.ndarray) -> np.ndarray:
    # BasicModelIne.java:33-38 — expected df: ne = N(1 - ((N-1)/N)^F)
    big_n = np.float64(st.n_docs)
    ne = big_n * (1.0 - np.power((big_n - 1.0) / big_n, np.float64(st.ttf)))
    inner = np.float32(_log2((big_n + 1.0) / (ne + 0.5)))
    return (tfn * inner).astype(np.float32)


def bm_p(st: TermStats, tfn: np.ndarray) -> np.ndarray:
    # BasicModelP.java:37-43 — Poisson approximation via Stirling
    lam = np.float32(np.float32(st.ttf + 1) / np.float32(st.n_docs + 1))
    t = tfn.astype(np.float64)
    term1 = t * _log2((tfn / lam).astype(np.float32))
    term2 = (lam + np.float32(1.0) / (np.float32(12.0) * tfn) - tfn).astype(
        np.float32
    ).astype(np.float64) * _LOG2_E
    term3 = 0.5 * _log2(2.0 * np.pi * t)
    return (term1 + term2 + term3).astype(np.float32)


# --- after effects: score(stats, tfn_f32) -> f32 ----------------------------
def ae_none(st: TermStats, tfn: np.ndarray) -> np.ndarray:
    return np.ones_like(tfn, dtype=np.float32)


def ae_l(st: TermStats, tfn: np.ndarray) -> np.ndarray:
    # AfterEffectL.java:32-34 — Laplace: 1/(tfn+1), float32
    return (np.float32(1.0) / (tfn + np.float32(1.0))).astype(np.float32)


def ae_b(st: TermStats, tfn: np.ndarray) -> np.ndarray:
    # AfterEffectB.java:32-36 — (F+1)/(n*(tfn+1)) with F=ttf+1, n=df+1
    big_f = st.ttf + 1
    n = st.df + 1
    return (
        np.float32(big_f + 1) / (np.float32(n) * (tfn + np.float32(1.0)))
    ).astype(np.float32)


# --- IB lambdas / distributions ----------------------------------------------
def lambda_df(st: TermStats) -> np.float32:
    # LambdaDF.java:32-34 — (n+1F)/(N+1F), float32
    return np.float32(
        (np.float32(st.df) + np.float32(1.0)) / (np.float32(st.n_docs) + np.float32(1.0))
    )


def lambda_ttf(st: TermStats) -> np.float32:
    # LambdaTTF.java:32-34 — (F+1F)/(N+1F), float32
    return np.float32(
        (np.float32(st.ttf) + np.float32(1.0)) / (np.float32(st.n_docs) + np.float32(1.0))
    )


def dist_ll(tfn: np.ndarray, lam: np.float32) -> np.ndarray:
    # DistributionLL.java:33-35 — (float)-log(lambda/(tfn+lambda))
    ratio = (lam / (tfn + lam)).astype(np.float32)
    return (-np.log(ratio.astype(np.float64))).astype(np.float32)


def dist_spl(tfn: np.ndarray, lam: np.float32) -> np.ndarray:
    # DistributionSPL.java:34-40 — smoothed power law; lambda==1f -> 0.99f
    if lam == np.float32(1.0):
        lam = np.float32(0.99)
    expo = (tfn / (tfn + np.float32(1.0))).astype(np.float32)
    num = np.power(np.float64(lam), expo.astype(np.float64)) - np.float64(lam)
    den = np.float64(np.float32(1.0) - lam)
    return (-np.log(num / den)).astype(np.float32)


BASIC_MODELS = {
    "be": bm_be,
    "d": bm_d,
    "g": bm_g,
    "if": bm_if,
    "in": bm_in,
    "ine": bm_ine,
    "p": bm_p,
}
AFTER_EFFECTS = {"no": ae_none, "l": ae_l, "b": ae_b}
DISTRIBUTIONS = {"ll": dist_ll, "spl": dist_spl}
LAMBDAS = {"df": lambda_df, "ttf": lambda_ttf}


def _normalization(name: str, c: float, mu: float, z: float):
    name = name.lower()
    if name in ("none", "no"):
        return tfn_none
    if name == "h1":
        return tfn_h1
    if name == "h2":
        c32 = np.float32(c)
        return lambda st, tf, ln: tfn_h2(st, tf, ln, c32)
    if name == "h3":
        mu32 = np.float32(mu)
        return lambda st, tf, ln: tfn_h3(st, tf, ln, mu32)
    if name == "z":
        z32 = np.float32(z)
        return lambda st, tf, ln: tfn_z(st, tf, ln, z32)
    raise ValueError(f"unknown normalization {name!r}")


def dfr_scores(
    tfs: np.ndarray,
    norm_bytes: np.ndarray,
    stats: TermStats,
    basic_model: str = "ine",
    after_effect: str = "b",
    normalization: str = "h2",
    c: float = 1.0,
    mu: float = 800.0,
    z: float = 0.30,
) -> np.ndarray:
    """Per-posting float32 DFR scores of ONE term (DFRSimilarity.java:
    108-111), boost=1. Default I(ne)B2 — the combination the DFR paper
    (Amati & van Rijsbergen 2002) and the Solr example schema single out."""
    tf = np.asarray(tfs, dtype=np.float32)
    ln = LM_DOCLEN_TABLE[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
    tfn = _normalization(normalization, c, mu, z)(stats, tf, ln)
    bm = BASIC_MODELS[basic_model.lower()](stats, tfn)
    ae = AFTER_EFFECTS[after_effect.lower()](stats, tfn)
    return (bm * ae).astype(np.float32)


def ib_scores(
    tfs: np.ndarray,
    norm_bytes: np.ndarray,
    stats: TermStats,
    distribution: str = "spl",
    lam: str = "df",
    normalization: str = "h2",
    c: float = 1.0,
    mu: float = 800.0,
    z: float = 0.30,
) -> np.ndarray:
    """Per-posting float32 IB scores of ONE term (IBSimilarity.java:98-104),
    boost=1. Default SPL-D-H2 (Clinchant & Gaussier 2010's log-logistic /
    smoothed-power-law family as shipped by IBSimilarityFactory)."""
    tf = np.asarray(tfs, dtype=np.float32)
    ln = LM_DOCLEN_TABLE[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
    tfn = _normalization(normalization, c, mu, z)(stats, tf, ln)
    lam32 = LAMBDAS[lam.lower()](stats)
    return DISTRIBUTIONS[distribution.lower()](tfn, lam32).astype(np.float32)


def brute_force_simbase_topk(
    texts: dict[int, str],
    query_terms: list[str],
    k: int = 10,
    scorer: str = "dfr",
    **kwargs,
) -> list[tuple[int, float]]:
    """Exhaustive oracle: tokenize, quantize lengths through the stored norm
    byte, score each distinct query term per doc with the scalar DFR/IB
    formula, double-sum → float32 (DisjunctionSumScorer), tie-break score
    desc / docID asc. Independent of the index — stats recomputed from the
    raw texts."""
    from ..analysis.analyzer import standard_tokenize
    from ..index.norms import encode_norm

    doc_ids = sorted(texts)
    token_lists = {d: [t for _, t in standard_tokenize(texts[d])] for d in doc_ids}
    n_docs = len(doc_ids)
    sum_ttf = sum(len(v) for v in token_lists.values())
    uniq = sorted(set(query_terms))
    stats = {}
    for t in uniq:
        df = sum(1 for v in token_lists.values() if t in v)
        ttf = sum(v.count(t) for v in token_lists.values())
        if df:
            stats[t] = TermStats.make(n_docs, df, ttf, sum_ttf)
    fn = dfr_scores if scorer == "dfr" else ib_scores
    scores = {}
    for d in doc_ids:
        toks = token_lists[d]
        nb = np.array([int(encode_norm(np.array([len(toks)]))[0])])
        total = 0.0
        matched = False
        for t in uniq:
            tf = toks.count(t)
            if tf == 0 or t not in stats:
                continue
            matched = True
            total += float(fn(np.array([tf]), nb, stats[t], **kwargs)[0])
        if matched:
            scores[d] = np.float32(total)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(d, float(s)) for d, s in ranked[:k]]

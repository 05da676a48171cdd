"""SweetSpotSimilarity — the last reference similarity factory
(solr/core/src/java/org/apache/solr/search/similarities/
SweetSpotSimilarityFactory.java → lucene/misc/src/java/org/apache/lucene/
misc/SweetSpotSimilarity.java). Extends DefaultSimilarity, overriding only
tf() and lengthNorm():

- computeLengthNorm (:137-152): a PLATEAU — lengths in [ln_min, ln_max]
  norm to 1.0, dropping off as 1/sqrt(steepness·(|l−min|+|l−max|−(max−min))
  + 1) outside; defaults min=max=1, steepness=0.5 degrade to 1/sqrt(l).
- baselineTf (:178-185): 0 for freq 0, `base` up to tf_min, then
  (float)sqrt(freq + base² − min); defaults (0,0) degrade to sqrt(freq).
- hyperbolicTf (:202-227): min + (max−min)/2·(tanh_base(freq−xoffset)+1) —
  a hard ceiling at `max` (defaults 0, 2, base 1.3, xoffset 10); NaN (pow
  overflow far from the midpoint) clamps to max, as the Java does.

Index-time vs search-time: Lucene bakes lengthNorm into the stored norm
byte at INDEX time. This engine keeps ONE index (norm byte =
byte315(1/sqrt(len)), the DefaultSimilarity encoding) and re-derives
SweetSpot's norm at search time: decode → quantized length (1/f², the
SimilarityBase round-trip) → computeLengthNorm → byte315 re-quantize (so
the result passes through exactly the same lossy byte the reference would
have stored). Identical quantization skew to the LM/DFR paths, declared.
idf/queryNorm/coord are inherited from DefaultSimilarity — reused verbatim
from query/classic.py.
"""

from __future__ import annotations

import numpy as np

from ..index.norms import byte315_to_float, float_to_byte315
from .classic import NORM_FLOAT_TABLE


def compute_length_norm(
    num_terms: np.ndarray, ln_min: int = 1, ln_max: int = 1, steep: float = 0.5
) -> np.ndarray:
    """computeLengthNorm (SweetSpotSimilarity.java:137-152), float32."""
    l = np.asarray(num_terms, dtype=np.float64)
    s = np.float32(steep)
    inner = (
        np.abs(l - ln_min) + np.abs(l - ln_max) - (ln_max - ln_min)
    ).astype(np.float32)
    return (
        1.0 / np.sqrt((s * inner + np.float32(1.0)).astype(np.float64))
    ).astype(np.float32)


def sweetspot_norm_table(
    ln_min: int = 1, ln_max: int = 1, steep: float = 0.5
) -> np.ndarray:
    """256-entry float32 table: stored default-encoding byte → the decoded
    SweetSpot lengthNorm, round-tripped through byte315 (the byte the
    reference would have stored at index time)."""
    f = NORM_FLOAT_TABLE.astype(np.float64)
    with np.errstate(divide="ignore", over="ignore"):
        lengths = np.where(f > 0, np.rint(1.0 / (f * f)), np.inf)
    lengths = np.minimum(lengths, 1e18)
    ln = compute_length_norm(lengths, ln_min, ln_max, steep)
    b = float_to_byte315(ln.astype(np.float32))
    return byte315_to_float(b).astype(np.float32)


def baseline_tf(
    freq: np.ndarray, base: float = 0.0, tf_min: float = 0.0
) -> np.ndarray:
    """baselineTf (:178-185), float32."""
    fr = np.asarray(freq, dtype=np.float32)
    b32, m32 = np.float32(base), np.float32(tf_min)
    with np.errstate(invalid="ignore"):  # lanes below tf_min are masked out
        above = np.sqrt(
            (fr + np.float32(b32 * b32) - m32).astype(np.float64)
        ).astype(np.float32)
    out = np.where(fr <= m32, b32, above).astype(np.float32)
    return np.where(fr == 0.0, np.float32(0.0), out)


def hyperbolic_tf(
    freq: np.ndarray,
    tf_min: float = 0.0,
    tf_max: float = 2.0,
    base: float = 1.3,
    xoffset: float = 10.0,
) -> np.ndarray:
    """hyperbolicTf (:202-227), float32; NaN (pow overflow) clamps to max."""
    fr = np.asarray(freq, dtype=np.float32)
    x = (fr - np.float32(xoffset)).astype(np.float64)
    with np.errstate(over="ignore", invalid="ignore"):
        px, nx = np.power(base, x), np.power(base, -x)
        tanh = (px - nx) / (px + nx)
        half = np.float32(np.float32(tf_max) - np.float32(tf_min)) / np.float32(2.0)
        result = (np.float32(tf_min) + (half * (tanh + 1.0)).astype(np.float32)).astype(
            np.float32
        )
    result = np.where(np.isnan(result), np.float32(tf_max), result)
    return np.where(fr == 0.0, np.float32(0.0), result)


def sweetspot_scores(
    tfs: np.ndarray,
    norm_bytes: np.ndarray,
    value: np.float32,
    norm_table: np.ndarray,
    tf_mode: str = "baseline",
    **tf_kwargs,
) -> np.ndarray:
    """Per-posting float32 scores: (tf(freq) * value) * lengthNorm —
    TFIDFSimilarity.ExactTFIDFDocScorer with SweetSpot's overrides."""
    tf_fn = baseline_tf if tf_mode == "baseline" else hyperbolic_tf
    t = tf_fn(np.asarray(tfs, dtype=np.float32), **tf_kwargs)
    raw = (t * value).astype(np.float32)
    norms = norm_table[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
    return (raw * norms).astype(np.float32)


def brute_force_topk_sweetspot(
    texts: dict[int, str],
    query_terms: list[str],
    k: int = 10,
    tf_mode: str = "baseline",
    ln_min: int = 1,
    ln_max: int = 1,
    steep: float = 0.5,
    **tf_kwargs,
) -> list[tuple[int, float]]:
    """Exhaustive oracle: default-encoded norm bytes from raw lengths, the
    same SweetSpot derivation per doc, classic queryNorm/coord combine."""
    from ..analysis.analyzer import standard_tokenize
    from ..index.norms import encode_norm
    from .classic import classic_term_values, combine_classic

    doc_ids = np.array(sorted(texts), dtype=np.int64)
    token_lists = [[t for _, t in standard_tokenize(texts[d])] for d in doc_ids]
    norm_bytes = encode_norm(
        np.array([len(t) for t in token_lists], dtype=np.int64)
    )
    max_doc = len(doc_ids)
    uniq = sorted(set(query_terms))
    dfs = {t: sum(1 for toks in token_lists if t in toks) for t in uniq}
    values = classic_term_values(uniq, dfs, max_doc)
    table = sweetspot_norm_table(ln_min, ln_max, steep)

    sums = np.zeros(max_doc, dtype=np.float64)
    matched = np.zeros(max_doc, dtype=np.int64)
    for t in uniq:
        tf = np.array([toks.count(t) for toks in token_lists], dtype=np.int64)
        contrib = sweetspot_scores(
            tf, norm_bytes, values[t], table, tf_mode, **tf_kwargs
        )
        hit = tf > 0
        sums += np.where(hit, contrib.astype(np.float64), 0.0)
        matched += hit
    total = combine_classic(sums, matched, len(uniq))
    idx = np.nonzero(matched)[0]
    order = sorted(idx, key=lambda i: (-float(total[i]), int(doc_ids[i])))
    return [(int(doc_ids[i]), float(total[i])) for i in order[:k]]

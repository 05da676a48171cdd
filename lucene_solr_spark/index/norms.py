"""Lucene norm encoding: SmallFloat byte315 (3 mantissa bits, zeroExp=15).

BM25 stores per-doc field length as a single byte: norm_byte =
floatToByte315(1/sqrt(field_length)) (BM25Similarity.java:95-97). At query
time the byte is decoded through a 256-entry table NORM_TABLE[b] =
1/(byte315ToFloat(b))^2 — i.e. the doc length that enters the score is the
**lossy round-trip**, not the true length (BM25Similarity.java:127-134,
207-210). Reproducing this quantization exactly is required for
score-identical results; the encode/decode here mirrors SmallFloat.java:78-98
bit-for-bit using numpy float32/int32 views.

`quantized_doclen_sql` renders the same arithmetic as portable SQL (valid in
Spark SQL and DuckDB) so correctness oracles can reproduce the quantization:
for f = float32(1.0/float32(sqrt(len))) in (2^-15, 2^17) the byte315
truncation equals "keep 2 explicit mantissa bits" (the third is the implicit
leading 1), i.e. floor(f * 2^(2-e)) * 2^(e-2) with e = floor(log2(f)) — all
exact in IEEE
double (power-of-two scaling and floor are exact; the log2 ulp hazard is
corrected with explicit comparisons).
"""

from __future__ import annotations

import numpy as np


def float_to_byte315(f: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.floatToByte315 (SmallFloat.java:78-88)."""
    f32 = np.asarray(f, dtype=np.float32)
    bits = f32.view(np.int32)
    smallfloat = bits >> (24 - 3)
    lo = (63 - 15) << 3
    out = (smallfloat - lo).astype(np.int64)
    out = np.where(smallfloat <= lo, np.where(bits <= 0, 0, 1), out)
    out = np.where(smallfloat >= lo + 0x100, 255, out)
    return out.astype(np.uint8)


def byte315_to_float(b: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.byte315ToFloat (SmallFloat.java:93-98)."""
    b = np.asarray(b, dtype=np.int64) & 0xFF
    bits = (b << (24 - 3)) + ((63 - 15) << 24)
    out = bits.astype(np.int32).view(np.float32)
    return np.where(b == 0, np.float32(0.0), out)


def encode_norm(field_length: np.ndarray) -> np.ndarray:
    """norm_byte for a post-stop token count, boost=1.

    Java evaluation order (BM25Similarity.java:95-97): state.getBoost() /
    (float) Math.sqrt(numTerms) — a float32 division by the float32-rounded
    double sqrt.
    """
    n = np.asarray(field_length, dtype=np.float64)
    sqrt32 = np.sqrt(n).astype(np.float32)
    with np.errstate(divide="ignore"):
        f = np.divide(np.float32(1.0), sqrt32, dtype=np.float32)
    return float_to_byte315(f)


# NORM_TABLE of BM25Similarity (:127-134): decoded dl = 1/f^2, float32.
_all_bytes = np.arange(256, dtype=np.int64)
with np.errstate(divide="ignore"):
    NORM_DOCLEN_TABLE = np.divide(
        np.float32(1.0), np.square(byte315_to_float(_all_bytes)), dtype=np.float32
    )


def decode_norm_doclen(norm_byte: np.ndarray) -> np.ndarray:
    """norm byte → quantized doc length (float32), per NORM_TABLE."""
    return NORM_DOCLEN_TABLE[np.asarray(norm_byte, dtype=np.int64) & 0xFF]


def quantized_doclen_sql(len_expr: str, dialect: str = "spark") -> str:
    """SQL for the byte315 round-tripped doc length, exact vs numpy path.

    Portable across Spark SQL and DuckDB: identical inputs produce
    bit-identical doubles in both engines (only *, /, floor, power-of-two
    scaling — no transcendental beyond the corrected log2).
    """
    fcast = "FLOAT" if dialect == "spark" else "REAL"
    # f = float32(1.0 / float32(sqrt(len)))  — Java evaluation order
    f = f"CAST(1.0 / CAST(SQRT(CAST(({len_expr}) AS DOUBLE)) AS {fcast}) AS {fcast})"
    e0 = f"FLOOR(LOG2({f}))"
    e = (
        f"(CASE WHEN POWER(2.0, {e0} + 1) <= {f} THEN {e0} + 1 "
        f"WHEN POWER(2.0, {e0}) > {f} THEN {e0} - 1 ELSE {e0} END)"
    )
    # byte315's "3 mantissa bits" include the implicit leading 1 (bits>>21
    # keeps 2 explicit mantissa bits), so truncate to 2 explicit bits
    dec = f"(FLOOR({f} * POWER(2.0, 2 - {e})) * POWER(2.0, {e} - 2))"
    # NORM_TABLE stores 1/(f*f) as float32 (BM25Similarity.java:127-134)
    return f"CAST(1.0 / ({dec} * {dec}) AS {fcast})"


def quantized_lengthnorm_sql(len_expr: str, dialect: str = "spark") -> str:
    """SQL for the byte315 round-tripped LENGTH NORM itself — the value
    DefaultSimilarity.decodeNormValue returns (DefaultSimilarity.java:96-98,
    NORM_TABLE = byte315ToFloat): the truncated f = 1/sqrt(numTerms),
    exactly representable (3-bit mantissa dyadic rational), so the SQL is
    exact in IEEE double. Same truncation identity as
    `quantized_doclen_sql`, without BM25's 1/f^2 table transform."""
    fcast = "FLOAT" if dialect == "spark" else "REAL"
    f = f"CAST(1.0 / CAST(SQRT(CAST(({len_expr}) AS DOUBLE)) AS {fcast}) AS {fcast})"
    e0 = f"FLOOR(LOG2({f}))"
    e = (
        f"(CASE WHEN POWER(2.0, {e0} + 1) <= {f} THEN {e0} + 1 "
        f"WHEN POWER(2.0, {e0}) > {f} THEN {e0} - 1 ELSE {e0} END)"
    )
    return f"(FLOOR({f} * POWER(2.0, 2 - {e})) * POWER(2.0, {e} - 2))"

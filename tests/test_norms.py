"""SmallFloat byte315 golden vectors (reference SmallFloat.java:78-98,
BM25Similarity.java:95-97,127-134) and the SQL round-trip equivalence."""

import duckdb
import numpy as np

from lucene_solr_spark.index.norms import (
    byte315_to_float,
    decode_norm_doclen,
    encode_norm,
    float_to_byte315,
    quantized_doclen_sql,
)


def test_hand_derived_bytes():
    # len=1: f=1.0 → bits 0x3F800000 >> 21 = 508, minus 384 → 124
    # len=2: f=0.70710677 → byte 121, decodes to 0.625 → doclen 2.56
    # len=3: f=0.57735026 → byte 120, decodes to 0.5   → doclen 4.0
    assert encode_norm(np.array([1, 2, 3])).tolist() == [124, 121, 120]
    np.testing.assert_allclose(
        decode_norm_doclen(np.array([124, 121, 120])),
        np.array([1.0, 2.56, 4.0], dtype=np.float32),
        rtol=0,
        atol=0,
    )


def test_round_trip_is_lossy_but_idempotent():
    lengths = np.arange(1, 100000)
    b = encode_norm(lengths)
    decoded = byte315_to_float(b)
    # re-encoding the decoded value gives the same byte (truncation fixpoint)
    assert np.array_equal(float_to_byte315(decoded), b)
    # quantized length >= true length is not guaranteed, but monotone
    # non-increasing in f: byte monotone non-decreasing length
    assert np.all(np.diff(decoded.astype(np.float64)) <= 0)


def test_quantization_collides_distinct_lengths():
    # FIXTURES.md §4: distinct lengths must map to the same byte somewhere
    b = encode_norm(np.arange(1, 300))
    assert len(np.unique(b)) < 299


def test_byte315_to_float_known_values():
    assert byte315_to_float(np.array([0]))[0] == 0.0
    assert byte315_to_float(np.array([124]))[0] == np.float32(1.0)
    assert byte315_to_float(np.array([120]))[0] == np.float32(0.5)


def test_sql_quantized_doclen_matches_numpy():
    """The portable SQL formulation must equal NORM_TABLE[encode(len)] for
    every realistic length — this is what lets DuckDB oracles reproduce the
    byte315 quantization."""
    lengths = list(range(1, 4097)) + [10000, 65535, 1000000]
    con = duckdb.connect()
    expr = quantized_doclen_sql("l", dialect="duckdb")
    rows = con.execute(
        f"SELECT l, {expr} AS qdl FROM (SELECT unnest(?) AS l)", [lengths]
    ).fetchall()
    got = np.array([r[1] for r in rows])
    expected = decode_norm_doclen(encode_norm(np.array(lengths))).astype(np.float64)
    np.testing.assert_array_equal(got, expected)

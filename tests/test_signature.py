"""SignatureUpdateProcessor semantics: MD5 exact + Nutch TextProfile
fuzzy signatures, overwriteDupes last-write-wins dedup."""

from __future__ import annotations

import hashlib

import pytest

from lucene_solr_spark.pipeline.signature import (
    _profile,
    dedup_by_signature,
    with_signature,
)


# --- TextProfileSignature scalar kernel (reference walk-through) ---------------
def test_profile_drops_short_tokens():
    # minTokenLen=2 keeps tokens STRICTLY longer (>=3 chars):
    # "of" and "a" never reach the profile
    a = _profile("the cat of a hat the cat", 0.01, 2)
    b = _profile("the cat ZZ QQ hat the cat", 0.01, 2)
    assert a == b


def test_profile_quantization_discards_singletons_when_maxfreq_gt_1():
    # maxFreq=3 ("spark"), quant -> 2: tokens with freq 1 vanish
    a = _profile("spark spark spark merge merge unique", 0.01, 2)
    b = _profile("spark spark spark merge merge different", 0.01, 2)
    assert a == b
    # and quantized counts matter: 2x merge == 3x merge under quant 2
    c = _profile("spark spark spark merge merge merge", 0.01, 2)
    assert a == c  # 3//2*2 == 2//2*2


def test_profile_all_singletons_keep_everything():
    # maxFreq=1 -> quant=1: all tokens kept, order-insensitive
    a = _profile("alpha beta gamma", 0.01, 2)
    b = _profile("gamma alpha beta", 0.01, 2)
    assert a == b
    assert a != _profile("alpha beta delta", 0.01, 2)


def test_profile_case_and_punctuation_insensitive():
    a = _profile("Spark-Merge, FAST!", 0.01, 2)
    b = _profile("spark merge fast", 0.01, 2)
    assert a == b


def test_profile_empty_is_md5_of_empty():
    assert _profile("a b c", 0.01, 2) == hashlib.md5(b"").hexdigest()


# --- Spark surface --------------------------------------------------------------
@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        ("u0", 0, "spark spark spark merge merge unique", "x"),
        ("u1", 1, "spark spark spark merge merge different", "x"),  # fuzzy dup of u0
        ("u2", 2, "totally other text here", "x"),
        ("u3", 3, "spark spark spark merge merge unique", "y"),  # exact dup text, field y
    ]
    return spark.createDataFrame(rows, "url string, ts long, text string, cat string")


def test_md5_signature_exact_dedup(frame):
    sig = with_signature(frame, fields=["text"])
    out = dedup_by_signature(sig, order_col="ts").toPandas()
    # u0 and u3 share text -> u3 (later ts) survives
    urls = set(out["url"])
    assert "u3" in urls and "u0" not in urls
    assert {"u1", "u2"} <= urls


def test_md5_signature_field_order_is_sorted(frame):
    a = with_signature(frame, fields=["text", "cat"]).select("signatureField").toPandas()
    b = with_signature(frame, fields=["cat", "text"]).select("signatureField").toPandas()
    assert a.equals(b)


def test_text_profile_fuzzy_dedup(frame):
    sig = with_signature(frame, text_profile="text")
    out = dedup_by_signature(sig, order_col="ts").toPandas()
    urls = set(out["url"])
    # u0/u1/u3 all collapse to one profile (singletons quantized away);
    # last write u3 survives
    assert urls == {"u2", "u3"}


def test_dedup_last_write_wins_by_key_fallback(frame):
    sig = with_signature(frame, fields=["text"])
    out = dedup_by_signature(sig).toPandas()  # order falls back to url
    assert "u3" in set(out["url"])  # u3 > u0 lexicographically

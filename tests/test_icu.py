"""ICU module tests: ICUFoldingFilter + ICUNormalizer2Filter parity.

Goldens from the reference's TestICUFoldingFilter.java (all testDefaults
cases) and TestICUNormalizer2Filter.java; the Normalizer2 engine itself is
cross-validated against Python's unicodedata for the stock nfc/nfkc modes
over the Unicode-6.1-assigned alphabet (normalization results for those
characters are frozen by the Unicode normalization-stability policy, so
unicodedata 15.x is a valid oracle for them).
"""

import random
import unicodedata

import pytest

from lucene_solr_spark.analysis.icu import (
    Normalizer2, fold, fold_token_list, get_normalizer, normalize_token,
)
from lucene_solr_spark.analysis.utr30_data import DATA


def _whitespace_fold(text):
    # reference test harness: MockTokenizer WHITESPACE + ICUFoldingFilter
    return [fold(t) for t in text.split()]


# every case in TestICUFoldingFilter.testDefaults (ICUFoldingFilter.java:64)
FOLDING_GOLDENS = [
    ("This is a test", ["this", "is", "a", "test"]),
    ("Ruß", ["russ"]),
    ("ΜΆΪΟΣ", ["μαιοσ"]),
    ("Μάϊος", ["μαιοσ"]),
    ("\U00010416", ["\U0001043e"]),          # supplementary case folding
    ("ﴳﴺﰧ", ["طمطمطم"]),       # normalization
    ("क्‍ष", ["कष"]),  # default ignorables
    ("résumé", ["resume"]),                    # composed accents
    ("résumé", ["resume"]),       # decomposed accents
    ("৭০৬", ["706"]),          # native digit folding
    ("đis is cræzy", ["dis", "is", "craezy"]),
    ("ELİF", ["elif"]),                        # dotted capital I casefold
    ("eli̇f", ["elif"]),                  # decomposed dot-above
]


@pytest.mark.parametrize("text,want", FOLDING_GOLDENS)
def test_icu_folding_reference_goldens(text, want):
    assert _whitespace_fold(text) == want


def test_empty_term():
    assert fold("") == ""
    assert fold_token_list([""]) == [""]


def _alphabet(layers):
    alpha = set()
    for layer in layers:
        tables = DATA["layers"][layer]
        for hx, tgt in {**tables["oneway"], **tables["twoway"]}.items():
            alpha.add(int(hx, 16))
            alpha.update(ord(c) for c in tgt)
    alpha.update(int(hx, 16) for hx in DATA["ccc"])
    alpha.update(range(0x20, 0x7F))
    # Hangul: syllable samples + all composing jamo
    alpha.update(range(0xAC00, 0xAC40))
    alpha.update(range(0x1100, 0x1113))
    alpha.update(range(0x1161, 0x1176))
    alpha.update(range(0x11A8, 0x11C3))
    return sorted(cp for cp in alpha if not (0xD800 <= cp <= 0xDFFF))


def test_stock_nfc_nfkc_match_unicodedata_single_cp():
    nfc, nfkc = get_normalizer("nfc"), get_normalizer("nfkc")
    for cp in _alphabet(["nfc", "nfkc"]):
        s = chr(cp)
        assert nfc.normalize(s) == unicodedata.normalize("NFC", s), hex(cp)
        assert nfkc.normalize(s) == unicodedata.normalize("NFKC", s), hex(cp)


def test_stock_nfc_nfkc_match_unicodedata_fuzz():
    nfc, nfkc = get_normalizer("nfc"), get_normalizer("nfkc")
    alpha = _alphabet(["nfc", "nfkc"])
    rng = random.Random(42)
    for _ in range(5000):
        s = "".join(chr(rng.choice(alpha))
                    for _ in range(rng.randint(1, 8)))
        assert nfc.normalize(s) == unicodedata.normalize("NFC", s)
        assert nfkc.normalize(s) == unicodedata.normalize("NFKC", s)


def test_decompose_mode_matches_nfd():
    nfc = get_normalizer("nfc")
    alpha = _alphabet(["nfc"])
    rng = random.Random(3)
    for _ in range(3000):
        s = "".join(chr(rng.choice(alpha))
                    for _ in range(rng.randint(1, 6)))
        assert nfc.decompose(s) == unicodedata.normalize("NFD", s)
    assert normalize_token("Café", "nfc", mode="decompose") == "Café"


def test_idempotence_fuzz():
    utr30, cf = get_normalizer("utr30"), get_normalizer("nfkc_cf")
    alpha = _alphabet(DATA["file_order"])
    rng = random.Random(7)
    for _ in range(5000):
        s = "".join(chr(rng.choice(alpha))
                    for _ in range(rng.randint(1, 10)))
        for norm in (utr30, cf):
            once = norm.normalize(s)
            assert norm.normalize(once) == once


def test_nfkc_cf_spot_checks():
    # ICUNormalizer2Filter default mode: NFKC + case fold + remove
    # default ignorables; accents are PRESERVED (unlike utr30 folding)
    cases = [
        ("Grüße", "grüsse"),
        ("ﬃ", "ffi"),
        ("İ", "i̇"),
        ("A­B", "ab"),          # soft hyphen removed
        ("ÉTÉ", "été"),
        ("‍", ""),              # ZWJ removed
        ("ΣΣ", "σσ"),                # final sigma casefolds to σ
    ]
    for inp, want in cases:
        assert normalize_token(inp, "nfkc_cf") == want, inp


def test_utr30_twoway_pairs_round_trip():
    # any surviving round-trip mapping must actually round-trip through
    # the full decompose -> reorder -> compose cycle (gennorm2 invariant)
    utr30 = get_normalizer("utr30")
    n = 0
    for layer in DATA["file_order"]:
        for hx in DATA["layers"][layer]["twoway"]:
            cp = int(hx, 16)
            # skip pairs overridden by a later layer's one-way mapping
            if utr30._map.get(cp, ("", False))[1]:
                assert utr30.normalize(chr(cp)) == chr(cp), hex(cp)
                n += 1
    assert n > 0


def test_hangul_compose():
    utr30 = get_normalizer("utr30")
    # L+V+T jamo compose to the syllable; syllables are inert
    assert utr30.normalize("한") == "한"
    assert utr30.normalize("한국") == "한국"
    # compatibility jamo fold to conjoining jamo and then compose
    assert utr30.normalize("ㄱ") == "ᄀ"


def test_unknown_mode_raises():
    with pytest.raises(ValueError):
        get_normalizer("nope")
    with pytest.raises(ValueError):
        Normalizer2({}, {0x41: ("abc", True)})


def test_fold_series_arrow_surface():
    pd = pytest.importorskip("pandas")
    from lucene_solr_spark.analysis.icu import fold_series
    s = pd.Series(["Résumé", None, "ELİF"])
    assert fold_series(s).tolist() == ["resume", None, "elif"]

"""Phonetic encoder parity: Metaphone, DoubleMetaphone, Caverphone2,
ColognePhonetic — every vector from the reference's own
TestPhoneticFilterFactory.testAlgorithms + DoubleMetaphoneFilterTest,
plus the published commons-codec test batteries."""

import pytest

from lucene_solr_spark.analysis.phonetic2 import (
    caverphone2, cologne_phonetic, double_metaphone,
    double_metaphone_tokens, metaphone, phonetic_encoder, phonetic_tokens,
)


# --- TestPhoneticFilterFactory.java:136-166 (in-tree vectors) --------------

def test_factory_metaphone_vectors():
    toks = "aaa bbb ccc easgasg".split()
    assert phonetic_tokens(toks, "Metaphone", inject=True) == [
        "aaa", "A", "bbb", "B", "ccc", "KKK", "easgasg", "ESKS"]
    assert phonetic_tokens(toks, "Metaphone", inject=False) == [
        "A", "B", "KKK", "ESKS"]


def test_factory_double_metaphone_vectors():
    toks = "aaa bbb ccc easgasg".split()
    assert phonetic_tokens(toks, "DoubleMetaphone", inject=False) == [
        "A", "PP", "KK", "ASKS"]


def test_factory_caverphone_vectors():
    toks = "Darda Karleen Datha Carlene".split()
    assert phonetic_tokens(toks, "Caverphone", inject=False) == [
        "TTA1111111", "KLN1111111", "TTA1111111", "KLN1111111"]


def test_factory_cologne_vectors():
    toks = "Meier Schmitt Meir Schmidt".split()
    assert phonetic_tokens(toks, "ColognePhonetic", inject=False) == [
        "67", "862", "67", "862"]


def test_unknown_encoder():
    with pytest.raises(ValueError):
        phonetic_encoder("XXX")


# --- DoubleMetaphoneFilterTest.java (in-tree) ------------------------------

def test_dm_filter_size4_false_inject():
    assert double_metaphone_tokens(["international"], 4, False) == ["ANTR"]


def test_dm_filter_size4_true_inject():
    assert double_metaphone_tokens(["international"], 4, True) == [
        "international", "ANTR"]


def test_dm_filter_alternate():
    assert double_metaphone_tokens(["Kuczewski"], 4, False) == [
        "KSSK", "KXFS"]


def test_dm_filter_size8():
    assert double_metaphone_tokens(["international"], 8, False) == [
        "ANTRNXNL"]


def test_dm_filter_non_convertable_inject():
    assert double_metaphone_tokens(["12345", "#$%@#^%&"], 8, True) == [
        "12345", "#$%@#^%&"]


# --- published commons-codec batteries --------------------------------------

METAPHONE_BATTERY = [
    ("howl", "HL"), ("testing", "TSTN"), ("The", "0"), ("quick", "KK"),
    ("brown", "BRN"), ("fox", "FKS"), ("jumped", "JMPT"), ("over", "OFR"),
    ("lazy", "LS"), ("dogs", "TKS"), ("metaphone", "MTFN"), ("wood", "WT"),
    ("school", "SKL"), ("mckenzie", "MKNS"), ("phone", "FN"),
    ("aggregate", "AKRK"), ("knight", "NT"), ("write", "RT"),
    ("xavier", "SFR"),
]


@pytest.mark.parametrize("word,code", METAPHONE_BATTERY)
def test_metaphone_battery(word, code):
    assert metaphone(word) == code


DM_BATTERY = [
    ("smith", "SM0", "XMT"), ("schmidt", "XMT", "SMT"),
    ("jose", "HS", "HS"), ("michael", "MKL", "MXL"),
    ("school", "SKL", "SKL"), ("ghislane", "JLN", "JLN"),
    ("thomas", "TMS", "TMS"), ("filipowicz", "FLPT", "FLPF"),
    ("caesar", "SSR", "SSR"), ("chianti", "KNT", "KNT"),
    ("Xavier", "SF", "SFR"), ("dumb", "TM", "TM"),
    ("edge", "AJ", "AJ"), ("edgar", "ATKR", "ATKR"),
    ("cough", "KF", "KF"), ("ghiradelli", "JRTL", "JRTL"),
    ("Jankelowicz", "JNKL", "ANKL"),
]


@pytest.mark.parametrize("word,primary,alt", DM_BATTERY)
def test_double_metaphone_battery(word, primary, alt):
    assert double_metaphone(word) == primary
    assert double_metaphone(word, alternate=True) == alt


CAVERPHONE_BATTERY = [
    ("Stevenson", "STFNSN1111"), ("Peter", "PTA1111111"),
    ("Thompson", "TMPSN11111"),
]


@pytest.mark.parametrize("word,code", CAVERPHONE_BATTERY)
def test_caverphone_battery(word, code):
    assert caverphone2(word) == code


COLOGNE_BATTERY = [
    ("Müller-Lüdenscheidt", "65752682"), ("Breschnew", "17863"),
    ("Wikipedia", "3412"), ("schneider", "8627"),
]


@pytest.mark.parametrize("word,code", COLOGNE_BATTERY)
def test_cologne_battery(word, code):
    assert cologne_phonetic(word) == code


def test_empty_and_single():
    assert metaphone("") == ""
    assert metaphone("a") == "A"
    assert double_metaphone("") == ""
    assert caverphone2("") == "1111111111"
    assert cologne_phonetic("") == ""

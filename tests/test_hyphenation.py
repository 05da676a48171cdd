"""HyphenationCompoundWordTokenFilter parity vs the reference's own test
grammar + fixtures (TestCompoundWordTokenFilter.java hyphenation cases,
da_UTF8.xml Danish TeX patterns)."""

from __future__ import annotations

import pathlib

import pytest

from lucene_solr_spark.analysis.hyphenation import (
    HyphenationTree,
    hyphenation_compound,
    parse_hyphenation_xml,
)

DA_XML = pathlib.Path(
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
    "analysis/compound/da_UTF8.xml")


@pytest.fixture(scope="module")
def da_tree() -> HyphenationTree:
    if not DA_XML.exists():
        pytest.skip("reference grammar not available")
    return parse_hyphenation_xml(DA_XML.read_text(encoding="utf-8"))


def terms(out):
    return [t for t, _ in out]


def test_hyphenation_compound_words_da(da_tree):
    toks = [(w, 1) for w in "min veninde som er lidt af en læsehest".split()]
    out = hyphenation_compound(toks, da_tree, frozenset(["læse", "hest"]))
    assert terms(out) == ["min", "veninde", "som", "er", "lidt", "af", "en",
                          "læsehest", "læse", "hest"]
    # subwords stack at the original's position
    assert [i for _, i in out] == [1, 1, 1, 1, 1, 1, 1, 1, 0, 0]


def test_hyphenation_longest_match(da_tree):
    out = hyphenation_compound(
        [("basketballkurv", 1)], da_tree,
        frozenset(["basketball", "basket", "ball", "kurv"]),
        max_subword_size=40, only_longest_match=True)
    assert terms(out) == ["basketballkurv", "basketball", "ball", "kurv"]


def test_hyphenation_only_no_dictionary(da_tree):
    cases = {
        (2, 4): ["basketballkurv", "ba", "sket", "bal", "ball", "kurv"],
        (4, 6): ["basketballkurv", "basket", "sket", "ball", "lkurv",
                 "kurv"],
        (4, 10): ["basketballkurv", "basket", "basketbal", "basketball",
                  "sket", "sketbal", "sketball", "ball", "ballkurv",
                  "lkurv", "kurv"],
    }
    for (mn, mx), want in cases.items():
        out = hyphenation_compound([("basketballkurv", 1)], da_tree, None,
                                   min_subword_size=mn, max_subword_size=mx)
        assert terms(out) == want, (mn, mx)


def test_hyphenate_points(da_tree):
    # raw Liang algorithm output incl. synthetic endpoints
    assert da_tree.hyphenate("læsehest") == [0, 2, 4, 6, 8]
    assert da_tree.hyphenate("basketballkurv") == [0, 2, 6, 9, 10, 14]
    # short words reject (len < remain + push)
    assert da_tree.hyphenate("a") is None
    # embedded non-letter rejects the word
    assert da_tree.hyphenate("læse2hest") is None


def test_min_word_size_keeps_original(da_tree):
    out = hyphenation_compound([("hest", 1)], da_tree, frozenset(["hest"]))
    assert terms(out) == ["hest"]  # below DEFAULT_MIN_WORD_SIZE=5


def test_exceptions_block():
    tree = parse_hyphenation_xml(
        "<hyphenation-info><classes>aA bB cC</classes>"
        "<patterns>a1b</patterns>"
        "<exceptions>abc-abc</exceptions></hyphenation-info>")
    # the exception overrides the patterns for that exact word
    assert tree.hyphenate("abcabc") == [0, 3, 6]
    assert tree.hyphenate("abab") == [0, 1, 3, 4]

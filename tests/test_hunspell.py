"""Hunspell module parity vs the reference's own test suite.

Ports HunspellStemmerTest.java, HunspellDictionaryTest.java and
HunspellStemFilterTest.java (analysis/common/src/test/.../hunspell/);
the .aff/.dic fixtures are the reference's own test data inlined
(test.aff, test.dic, testCompressed.*, testOverride.dic,
testWrongAffixRule.aff — spec data, same ruling as the stop lists).
"""

import pytest

from lucene_solr_spark.analysis.hunspell import (
    HunspellDictionary,
    HunspellParseError,
    HunspellStemmer,
    hunspell_stem_filter,
)

TEST_AFF = """SET UTF-8
TRY abcdefghijklmopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ

SFX A Y 3
SFX A   0     e         n
SFX A   0     e         t
SFX A   0     e         h

SFX C Y 2
SFX C   0     d/C       c
SFX C   0     c         b

SFX D Y 1
SFX D   0     s         o

SFX E Y 1
SFX E   0     d         o

PFX B Y 1
PFX B   0     s         o"""

TEST_DIC = """9
lucen/A
lucene
mahout/A
olr/B
ab/C
Apach/A
Foo/E
foo/D
Moo/E"""

COMPRESSED_AFF = """SET UTF-8
TRY abcdefghijklmopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ

FLAG long

AF 5
AF AA
AF BB
AF CC
AF DD
AF EE

SFX AA Y 3
SFX AA   0     e         n
SFX AA   0     e         t
SFX AA   0     e         h

SFX CC Y 2
SFX CC   0     d/3       c
SFX CC   0     c         b

SFX DD Y 1
SFX DD   0     s         o

SFX EE Y 1
SFX EE   0     d         o

PFX BB Y 1
PFX BB   0     s         o"""

COMPRESSED_DIC = """6
lucen/1
lucene
mahout/1
olr/2
ab/3
Apach/1
foo/4
Foo/5"""

OVERRIDE_DIC = """2
lucen/ABC
bar/A"""

WRONG_AFF = TEST_AFF + """

#wrong rule (only 4 elements)
PFX A0 Y 1
PFX A0 0 a"""


def make_stemmer(ignore_case):
    return HunspellStemmer(
        HunspellDictionary(TEST_AFF, TEST_DIC, ignore_case=ignore_case))


# ---- HunspellStemmerTest.java ----

def test_stem_simple_suffix():
    stemmer = make_stemmer(True)
    stems = stemmer.stem("lucene")
    assert [s.stem for s in stems] == ["lucene", "lucen"]
    stems = stemmer.stem("mahoute")
    assert [s.stem for s in stems] == ["mahout"]


def test_stem_simple_prefix():
    stemmer = make_stemmer(True)
    assert [s.stem for s in stemmer.stem("solr")] == ["olr"]


def test_stem_recursive_suffix():
    stemmer = make_stemmer(True)
    assert [s.stem for s in stemmer.stem("abcd")] == ["ab"]


def test_stem_ignore_case():
    stemmer = make_stemmer(True)
    for w in ("apache", "APACHE", "Apache"):
        assert [s.stem for s in stemmer.stem(w)] == ["apach"], w
    assert [s.stem for s in stemmer.stem("foos")] == ["foo"]
    assert [s.stem for s in stemmer.stem("mood")] == ["moo"]
    assert [s.stem for s in stemmer.stem("Foos")] == ["foo"]
    # the "Foo" entry gets overridden by the later "foo" entry; no merge
    assert stemmer.stem("Food") == []
    assert [s.stem for s in stemmer.stem("Mood")] == ["moo"]


def test_stem_case_sensitive():
    stemmer = make_stemmer(False)
    assert stemmer.stem("apache") == []
    assert [s.stem for s in stemmer.stem("Apache")] == ["Apach"]


# ---- HunspellDictionaryTest.java ----

def test_dictionary_load_dic_aff():
    d = HunspellDictionary(TEST_AFF, TEST_DIC)
    assert len(d.lookup_suffix("e")) == 3
    assert len(d.lookup_prefix("s")) == 1
    assert len(d.lookup_word("olr")) == 1
    assert len(d.lookup_word("lucen")[0].flags) == 1


def test_dictionary_multiple_dict_with_override():
    d = HunspellDictionary(TEST_AFF, [TEST_DIC, OVERRIDE_DIC],
                           ignore_case=False)
    assert len(d.lookup_word("lucen")[0].flags) == 3
    assert len(d.lookup_word("bar")[0].flags) == 1


def test_compressed_dictionary_load_dic_aff():
    d = HunspellDictionary(COMPRESSED_AFF, COMPRESSED_DIC)
    assert len(d.lookup_suffix("e")) == 3
    assert len(d.lookup_prefix("s")) == 1
    assert len(d.lookup_word("olr")) == 1


def test_compressed_stemming():
    # FLAG long + AF aliases must reproduce the plain-fixture behavior
    stemmer = HunspellStemmer(
        HunspellDictionary(COMPRESSED_AFF, COMPRESSED_DIC))
    assert [s.stem for s in stemmer.stem("lucene")] == ["lucene", "lucen"]
    assert [s.stem for s in stemmer.stem("solr")] == ["olr"]
    assert [s.stem for s in stemmer.stem("abcd")] == ["ab"]


def test_dictionary_wrong_affix_rule():
    # strict parsing disabled: malformed rule skipped, rest loads
    d = HunspellDictionary(WRONG_AFF, TEST_DIC, ignore_case=False,
                           strict_affix_parsing=False)
    assert len(d.lookup_suffix("e")) == 3
    assert len(d.lookup_prefix("s")) == 1
    assert len(d.lookup_word("olr")) == 1
    assert d.lookup_prefix("a") is None
    # strict parsing enabled: ParseException at reader line 23
    with pytest.raises(HunspellParseError) as exc:
        HunspellDictionary(WRONG_AFF, TEST_DIC, ignore_case=False,
                           strict_affix_parsing=True)
    assert exc.value.message == (
        "The affix file contains a rule with less than five elements")
    assert exc.value.line == 23


def test_read_encoding():
    assert HunspellDictionary.read_encoding(b"SET UTF-8\nrest") == "UTF-8"
    assert HunspellDictionary.read_encoding(
        b"# comment\n\nSET ISO8859-1\n") == "ISO8859-1"
    with pytest.raises(HunspellParseError):
        HunspellDictionary.read_encoding(b"TRY abc\n")
    with pytest.raises(HunspellParseError):
        HunspellDictionary.read_encoding(b"# only comments\n")


# ---- HunspellStemFilterTest.java ----

def _ws_lower(text):
    return [(t.lower(), 1) for t in text.split()]


def test_keyword_attribute():
    d = HunspellDictionary(TEST_AFF, TEST_DIC, ignore_case=True)
    out = hunspell_stem_filter(_ws_lower("lucene is awesome"), d)
    assert out == [("lucene", 1), ("lucen", 0), ("is", 1), ("awesome", 1)]
    # keyword-marked "lucene" passes through unstemmed
    out = hunspell_stem_filter(_ws_lower("lucene is awesome"), d,
                               keywords=frozenset({"lucene"}))
    assert out == [("lucene", 1), ("is", 1), ("awesome", 1)]


def test_filter_dedup_vs_not():
    # two suffix rules (flags X, Y) produce the same stem "ab" for "abc":
    # dedup (the filter default) emits it once, dedup=False twice
    aff = ("SET UTF-8\n\n"
           "SFX X Y 1\n"
           "SFX X   0     c         b\n\n"
           "SFX Y Y 1\n"
           "SFX Y   0     c         b")
    dic = "1\nab/XY"
    d = HunspellDictionary(aff, dic)
    assert hunspell_stem_filter([("abc", 1)], d, dedup=False) == [
        ("ab", 1), ("ab", 0)]
    assert hunspell_stem_filter([("abc", 1)], d, dedup=True) == [("ab", 1)]


def test_empty_term():
    d = HunspellDictionary(TEST_AFF, TEST_DIC, ignore_case=True)
    assert hunspell_stem_filter([("", 1)], d) == [("", 1)]


def test_recursion_cap():
    d = HunspellDictionary(TEST_AFF, TEST_DIC, ignore_case=True)
    # abcd needs one recursion level (d -> c -> ab); cap=0 blocks it
    assert [s.stem for s in HunspellStemmer(d, 1).stem("abcd")] == ["ab"]
    assert HunspellStemmer(d, 0).stem("abcd") == []

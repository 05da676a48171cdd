"""Remaining misc filters vs reference test goldens."""

from __future__ import annotations

from lucene_solr_spark.analysis.miscfilters2 import (
    capitalization,
    hyphenated_words,
    keep_word,
    limit_token_count,
    limit_token_position,
    remove_duplicates,
    scandinavian_folding,
    scandinavian_normalization,
)

KEEP = frozenset(["and", "the", "it", "BIG"])


def test_capitalization():
    # TestCapitalizationFilter.java:43-93 (keyword-token cases)
    assert capitalization("kiTTEN", keep=KEEP) == "Kitten"
    assert capitalization("and", keep=KEEP, force_first_letter=True) == "And"
    assert capitalization("AnD", keep=KEEP) == "And"
    assert capitalization("big", keep=KEEP) == "Big"
    assert capitalization("BIG", keep=KEEP) == "BIG"
    assert capitalization("Hello thEre my Name is Ryan",
                          keep=KEEP) == "Hello there my name is ryan"
    # onlyFirstWord=false capitalizes every non-keep word
    assert capitalization("Hello thEre my Name is Ryan",
                          only_first_word=False, keep=KEEP,
                          min_word_length=3) == "Hello There my Name is Ryan"
    assert capitalization("McKinley", keep=KEEP) == "Mckinley"
    assert capitalization("McKinley", keep=KEEP,
                          ok_prefix=("McK",)) == "McKinley"
    assert capitalization("the The the", only_first_word=False,
                          keep=KEEP) == "The The the"


def test_scandinavian_normalization():
    # TestScandinavianNormalizationFilter.java:44-80
    cases = [("aeäaeeea", "æææeea"), ("aeäaeeeae", "æææeeæ"),
             ("aeaeeeae", "ææeeæ"), ("bøen", "bøen"),
             ("bOEen", "bØen"), ("åene", "åene"),
             ("blåbærsyltetøj", "blåbærsyltetøj"),
             ("blaabaersyltetöj", "blåbærsyltetøj"),
             ("räksmörgås", "ræksmørgås"),
             ("raeksmörgaos", "ræksmørgås"),
             ("raeksmörgaas", "ræksmørgås"),
             ("raeksmoergås", "ræksmørgås"),
             ("ab", "ab"), ("ob", "ob"), ("Ab", "Ab"), ("Ob", "Ob"),
             ("å", "å"), ("aa", "å"), ("aA", "å"), ("ao", "å"),
             ("aO", "å"), ("AA", "Å"), ("Aa", "Å")]
    for src, want in cases:
        assert scandinavian_normalization(src) == want, src


def test_scandinavian_folding():
    # TestScandinavianFoldingFilter.java style
    assert scandinavian_folding("blåbærsyltetøj") == "blabarsyltetoj"
    assert scandinavian_folding("blaabaersyltetöj") == "blabarsyltetoj"
    assert scandinavian_folding("räksmörgås") == "raksmorgas"
    assert scandinavian_folding("raeksmörgaos") == "raksmorgas"
    assert scandinavian_folding("aa") == "a"
    assert scandinavian_folding("Ab") == "Ab"


def test_hyphenated_words():
    # TestHyphenatedWordsFilter.java: "ecologi-\r\ncal" style joins
    toks = [("ecologi-", 1), ("cal", 1), ("devel-", 1), ("op", 1),
            ("comput-", 1), ("er", 1)]
    assert hyphenated_words(toks) == [
        ("ecological", 1), ("develop", 1), ("computer", 1)]
    # trailing unpaired hyphen restored
    assert hyphenated_words([("foo-", 1)]) == [("foo-", 1)]


def test_keep_remove_limit():
    toks = [("a", 1), ("b", 1), ("c", 1), ("b", 0), ("d", 1)]
    # FilteringTokenFilter adds skipped increments to the next survivor
    assert keep_word(toks, frozenset(["b", "d"])) == [
        ("b", 2), ("b", 1), ("d", 1)]
    assert remove_duplicates(toks) == [
        ("a", 1), ("b", 1), ("c", 1), ("b", 0), ("d", 1)]
    assert remove_duplicates([("x", 1), ("x", 0), ("x", 1)]) == [
        ("x", 1), ("x", 1)]
    assert limit_token_count(toks, 2) == [("a", 1), ("b", 1)]
    assert limit_token_position(toks, 3) == [
        ("a", 1), ("b", 1), ("c", 1), ("b", 0)]


def test_dictionary_compound():
    # TestCompoundWordTokenFilter.java:56-196
    from lucene_solr_spark.analysis.compound import dictionary_compound

    def terms(toks, d, **kw):
        return [t for t, _ in dictionary_compound(toks, frozenset(d), **kw)]

    dict_da = ["læse", "hest"]
    toks = [(w, 1) for w in
            "min veninde som er lidt af en læsehest".split()]
    assert terms(toks, dict_da) == [
        "min", "veninde", "som", "er", "lidt", "af", "en",
        "læsehest", "læse", "hest"]

    # TestCompoundWordTokenFilter.testDumbCompoundWordsSE (:136-154)
    d2 = ["Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar",
          "Pelar", "Glas", "Ögon", "Fodral", "Bas", "Fiol", "Makare",
          "Gesäll", "Sko", "Vind", "Rute", "Torkare", "Blad"]
    assert terms([("Bildörr", 1)], d2) == ["Bildörr", "Bil", "dörr"]
    assert terms([("Glasögonfodral", 1)], d2) == [
        "Glasögonfodral", "Glas", "ögon", "fodral"]
    assert terms([("Vindrutetorkarblad", 1)], d2) == [
        "Vindrutetorkarblad", "Vind", "rute", "blad"]
    assert terms([("abba", 1)], d2) == ["abba"]

    # onlyLongestMatch (:166-177)
    d3 = ["Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar",
          "Pelar", "Glas", "Ögon", "Fodral", "Bas", "Fiols", "Makare",
          "Gesäll", "Sko", "Vind", "Rute", "Torkare", "Blad",
          "Fiolsfodral"]
    assert terms([("Basfiolsfodralmakaregesäll", 1)], d3,
                 only_longest_match=True) == [
        "Basfiolsfodralmakaregesäll", "Bas", "fiolsfodral", "fodral",
        "makare", "gesäll"]

    # subwords are all at position 0 relative to the original
    out = dictionary_compound([("abcdef", 1)], frozenset(["ab", "cd", "ef"]),
                              min_word_size=0)
    assert out == [("abcdef", 1), ("ab", 0), ("cd", 0), ("ef", 0)]


def test_position_payload_keyword_filters():
    from lucene_solr_spark.analysis.english import porter_stem
    from lucene_solr_spark.analysis.payloads import (
        delimited_payload,
        keyword_repeat,
        position_filter,
    )

    toks = [("a", 1), ("b", 1), ("c", 1)]
    assert position_filter(toks) == [("a", 1), ("b", 0), ("c", 0)]
    assert position_filter(toks, 5) == [("a", 1), ("b", 5), ("c", 5)]
    assert delimited_payload("the|JJ") == ("the", "JJ")
    assert delimited_payload("plain") == ("plain", "")
    assert keyword_repeat([("running", 1)], porter_stem) == [
        ("running", 1), ("run", 0)]
    assert keyword_repeat([("run", 1)], porter_stem) == [("run", 1)]


def test_auto_stop_words(spark):
    from lucene_solr_spark.analysis.payloads import auto_stop_words

    td = spark.createDataFrame(
        [("the", 950), ("of", 800), ("spark", 120), ("rare", 3)],
        "term string, df long")
    assert auto_stop_words(td, max_doc_freq=500) == ["of", "the"]
    assert auto_stop_words(td, max_percent_docs=0.5, n_docs=1000) == [
        "of", "the"]

"""Classic n-gram SpellChecker tests (TestSpellChecker shapes)."""

import pytest

from lucene_solr_spark.query.spellchecker import (
    NGramSpellChecker, file_dictionary, index_spellchecker,
)

WORDS = [
    "eight", "one", "two", "three", "four", "five", "six", "seven",
    "nine", "ten", "twenty", "spell", "spelling", "working", "wording",
]


@pytest.fixture(scope="module")
def file_sc(spark):
    return NGramSpellChecker(spark, file_dictionary(spark, WORDS))


def test_basic_suggestions(file_sc):
    # TestSpellChecker.checkCommonSuggestions cases (:234-250)
    assert file_sc.suggest_similar("fvie", 2)[0] == "five"
    assert file_sc.suggest_similar("fiv", 2)[0] == "five"
    assert file_sc.suggest_similar("fives", 2)[0] == "five"
    assert file_sc.suggest_similar("eihgt", 2)[0] == "eight"
    assert file_sc.suggest_similar("wokring", 3)[0] == "working"


def test_word_never_suggests_itself(file_sc):
    # SUGGEST_ALWAYS (file dictionary): "eight" must not suggest "eight"
    sugg = file_sc.suggest_similar("eight", 5)
    assert "eight" not in sugg


def test_accuracy_floor(file_sc):
    # a garbage word shares grams but fails the 0.5 similarity floor
    assert file_sc.suggest_similar("zzzzqq", 5) == []
    # lowering accuracy admits weaker matches
    assert file_sc.suggest_similar("spelx", 5, accuracy=0.4)


def test_index_backed_modes(spark, tmp_path):
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher

    rows = [
        ("u1", "popular popular popular popular rare"),
        ("u2", "popular again and again"),
        ("u3", "popular runs deep"),
    ]
    pages = spark.createDataFrame(rows, "url string, text string")
    idx = build_index(spark, pages, str(tmp_path / "idx"))
    s = Searcher(spark, idx)
    sc = index_spellchecker(s)
    # WHEN_NOT_IN_INDEX: an indexed word returns itself (SpellChecker.java:336-339)
    assert sc.suggest_similar("popular", 3) == ["popular"]
    # a misspelling suggests the indexed word
    assert sc.suggest_similar("popularr", 3)[0] == "popular"
    # MORE_POPULAR: suggestions must beat the word's own df; "rare" (df 1)
    # can get "rare"-beating suggestions only if similar enough — "runs"
    # (df 1) is filtered by the freq rule even when similar words exist
    sugg = sc.suggest_similar("rar", 3, suggest_mode="more_popular")
    for w in sugg:
        assert w != "rar"


def test_pluggable_distances(file_sc):
    # TestSpellChecker cycles string distances (:125-143); JaroWinkler at
    # accuracy 0.8 still admits fvie→five (score ≈ 0.925), 0.93 rejects it
    assert file_sc.suggest_similar(
        "fvie", 2, accuracy=0.92, distance="jarowinkler") == ["five"]
    assert file_sc.suggest_similar(
        "fvie", 2, accuracy=0.93, distance="jarowinkler") == []
    assert file_sc.suggest_similar(
        "fiv", 2, distance="ngram", accuracy=0.3)[0] == "five"
    with pytest.raises(ValueError):
        file_sc.suggest_similar("fvie", 2, distance="bogus")


def test_ordering_score_then_freq(spark):
    # two equally-distant candidates order by freq
    words = spark.createDataFrame(
        [("worda", 10), ("wordb", 2)], "w string, f long"
    )
    sc = NGramSpellChecker(spark, words, word_col="w", freq_col="f")
    sugg = sc.suggest_similar("wordc", 2, suggest_mode="always")
    assert sugg == ["worda", "wordb"]

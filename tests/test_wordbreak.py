"""WordBreakSpellChecker: break + combine suggestions vs the reference
algorithm's semantics (WordBreakSpellChecker.java:93-307)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.query.executor import Searcher
from lucene_solr_spark.query.wordbreak import (
    SUGGEST_ALWAYS,
    SUGGEST_MORE_POPULAR,
    suggest_word_breaks,
    suggest_word_combinations,
)

# term docFreqs: spark 5, merge 4, fast 2, sparkmerge 0, wi 1, fi 1 ...
CORPUS = {
    "u0": "spark merge fast query",
    "u1": "spark merge index wi fi",
    "u2": "spark merge fast scan",
    "u3": "spark merge table",
    "u4": "spark plan row",
    "u5": "wifi hotspot network",
}


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    pages = spark.createDataFrame(list(CORPUS.items()), "url string, text string")
    paths = build_index(
        spark, pages, str(tmp_path_factory.mktemp("wb_idx") / "idx"), num_segments=1
    )
    return Searcher(spark, paths)


# --- breaks --------------------------------------------------------------------
def test_break_splits_run_on_word(searcher):
    got = suggest_word_breaks(searcher, "sparkmerge")
    assert got, "expected a break suggestion"
    best = got[0]
    assert [w.string for w in best] == ["spark", "merge"]
    assert best[0].freq == 5 and best[1].freq == 4


def test_break_not_suggested_for_indexed_term(searcher):
    # SUGGEST_WHEN_NOT_IN_INDEX (default): an in-dictionary term gets none
    assert suggest_word_breaks(searcher, "spark") == []
    # SUGGEST_ALWAYS still probes (no split parts exist here though)
    assert suggest_word_breaks(searcher, "spark", suggest_mode=SUGGEST_ALWAYS) == []


def test_break_requires_both_parts_in_dictionary(searcher):
    assert suggest_word_breaks(searcher, "sparkzzz") == []


def test_break_two_changes(searcher):
    # sparkmergefast needs 2 breaks; allowed only with max_changes=2
    assert suggest_word_breaks(searcher, "sparkmergefast", max_changes=1) == []
    got = suggest_word_breaks(searcher, "sparkmergefast", max_changes=2)
    assert got and [w.string for w in got[0]] == ["spark", "merge", "fast"]


def test_break_rank_fewest_breaks_first(searcher):
    # "wifi" splits as wi+fi (1 break); with max_changes=2 no 2-break split
    # exists, but rank order must put shorter suggestions first anyway
    got = suggest_word_breaks(searcher, "wimerge", suggest_mode=SUGGEST_ALWAYS)
    assert got and [w.string for w in got[0]] == ["wi", "merge"]


def test_break_min_word_length(searcher):
    # "wifi" is itself indexed, so the default not-in-index mode suppresses
    # it — SUGGEST_ALWAYS probes regardless
    got = suggest_word_breaks(searcher, "wifi", suggest_mode=SUGGEST_ALWAYS)
    assert got and [w.string for w in got[0]] == ["wi", "fi"]
    assert (
        suggest_word_breaks(
            searcher, "wifi", suggest_mode=SUGGEST_ALWAYS, min_break_word_length=3
        )
        == []
    )


def test_break_more_popular_mode(searcher):
    # "wifi" IS in the index (freq 1); more-popular splits need parts with
    # freq >= 1 — wi/fi qualify
    got = suggest_word_breaks(searcher, "wifi", suggest_mode=SUGGEST_MORE_POPULAR)
    assert got and [w.string for w in got[0]] == ["wi", "fi"]


# --- combines ------------------------------------------------------------------
def test_combine_adjacent_fragments(searcher):
    # hot/spot are NOT in the index (not-in-index mode needs a missing part);
    # the joined "hotspot" is
    got = suggest_word_combinations(searcher, ["hot", "spot", "merge"])
    assert got and got[0].string == "hotspot"
    assert got[0].orig_indexes == (0, 1)
    assert got[0].freq == 1


def test_combine_not_in_index_mode_requires_missing_part(searcher):
    # both "spark" and "merge" are indexed -> no combination suggested even
    # though "sparkmerge" has freq 0 anyway; use a pair with a missing part
    got = suggest_word_combinations(searcher, ["spark", "merge"])
    assert got == []
    got = suggest_word_combinations(searcher, ["wif", "i"])  # wif missing
    assert got and got[0].string == "wifi"


def test_combine_always_mode_and_freq_gate(searcher):
    got = suggest_word_combinations(
        searcher, ["spark", "merge"], suggest_mode=SUGGEST_ALWAYS
    )
    assert got == []  # sparkmerge has docFreq 0 < min_suggestion_frequency
    got = suggest_word_combinations(
        searcher, ["wi", "fi"], suggest_mode=SUGGEST_ALWAYS
    )
    assert got and got[0].string == "wifi"


def test_combine_more_popular_mode(searcher):
    # wifi freq 1 >= max(wi=1, fi=1) -> allowed in more-popular mode
    got = suggest_word_combinations(
        searcher, ["wi", "fi"], suggest_mode=SUGGEST_MORE_POPULAR
    )
    assert got and got[0].string == "wifi"


def test_combine_max_changes_two_joins_three_terms(searcher):
    got = suggest_word_combinations(
        searcher, ["wi", "f", "i"], max_changes=2, suggest_mode=SUGGEST_ALWAYS
    )
    strings = [s.string for s in got]
    assert "wifi" in strings
    s = next(x for x in got if x.string == "wifi")
    assert s.orig_indexes == (0, 1, 2)

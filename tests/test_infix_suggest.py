"""AnalyzingInfixSuggester (AnalyzingInfixSuggester.java:320-400): full-token
matches for finished tokens, prefix match for the unfinished last token,
trailing-space exact rule, weight ranking, gram-pruned path == scan path."""

from __future__ import annotations

import pytest

from lucene_solr_spark.query.components import infix_gram_frame, infix_suggest

SUGGESTIONS = [
    ("a penny saved is a penny earned", 10),
    ("lend me your ear", 8),
    ("pay it forward", 6),
    ("penny wise pound foolish", 12),
    ("earnest money deposit", 4),
]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(SUGGESTIONS, "suggestion string, weight long")


def _got(df):
    return [(r.suggestion, r.weight) for r in df.collect()]


def test_last_token_is_prefix(spark, frame):
    got = _got(infix_suggest(frame, "ear", n=5))
    # 'ear' prefixes earned/ear/earnest — ranked by weight desc
    assert got == [
        ("a penny saved is a penny earned", 10),
        ("lend me your ear", 8),
        ("earnest money deposit", 4),
    ]


def test_trailing_space_requires_exact_token(spark, frame):
    got = _got(infix_suggest(frame, "ear ", n=5))
    assert got == [("lend me your ear", 8)]


def test_earlier_tokens_full_match(spark, frame):
    # 'penny' finished (full token), 'ear' unfinished (prefix)
    got = _got(infix_suggest(frame, "penny ear", n=5))
    assert got == [("a penny saved is a penny earned", 10)]


def test_should_mode(spark, frame):
    # allTermsRequired=False: any clause may match
    got = _got(infix_suggest(frame, "penny forward", n=5, all_terms_required=False))
    assert got == [
        ("penny wise pound foolish", 12),
        ("a penny saved is a penny earned", 10),
        ("pay it forward", 6),
    ]


def test_gram_pruned_equals_scan(spark, frame):
    grams = infix_gram_frame(frame, min_prefix_chars=4)
    for key in ["pe", "penn", "penny ear", "earn"]:
        scan = _got(infix_suggest(frame, key, n=5))
        pruned = _got(infix_suggest(frame, key, n=5, gram_frame=grams))
        assert pruned == scan, key


def test_empty_and_stopword_only_key(spark, frame):
    assert _got(infix_suggest(frame, "   ", n=5)) == []

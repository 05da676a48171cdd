"""WordDelimiterFilter vs TestWordDelimiterFilter.java goldens."""

from __future__ import annotations

from lucene_solr_spark.analysis.worddelimiter import (
    CATENATE_ALL,
    DEFAULT_FLAGS,
    GENERATE_NUMBER_PARTS,
    GENERATE_WORD_PARTS,
    SPLIT_ON_CASE_CHANGE,
    SPLIT_ON_NUMERICS,
    STEM_ENGLISH_POSSESSIVE,
    word_delimiter,
)

FULL = DEFAULT_FLAGS | CATENATE_ALL


def terms(tokens, flags=DEFAULT_FLAGS, protected=frozenset()):
    return [t for t, _ in word_delimiter(tokens, flags, protected)]


def test_splits():
    # TestWordDelimiterFilter.testSplits (:141-171)
    assert terms([("basic-split", 1)]) == ["basic", "split"]
    assert terms([("camelCase", 1)]) == ["camel", "Case"]
    assert terms([("บ้าน", 1)]) == ["บ้าน"]          # NSM no split
    assert terms([("test's'", 1)]) == ["test"]
    assert terms([("Роберт", 1)]) == ["Роберт"]
    assert terms([("РобЕрт", 1)]) == ["Роб", "Ерт"]
    assert terms([("aǅungla", 1)]) == ["aǅungla"]   # titlecase no split
    assert terms([("हिन्दी", 1)]) == ["हिन्दी"]
    assert terms([("١٢٣٤", 1)]) == ["١٢٣٤"]


def test_possessives():
    # :188-189
    assert terms([("ra's", 1)]) == ["ra"]
    no_poss = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
               | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS)
    assert terms([("ra's", 1)], no_poss) == ["ra", "s"]


def test_catenate_all():
    # testOffsets (:72-73): foo-bar → foo bar foobar
    assert word_delimiter([("foo-bar", 1)], FULL) == [
        ("foo", 1), ("bar", 1), ("foobar", 0)]
    # testOffsetChange4: (foo,bar) → foo bar foobar
    assert terms([("(foo,bar)", 1)], FULL) == ["foo", "bar", "foobar"]
    # übelkeit) → übelkeit
    assert terms([("übelkeit)", 1)], FULL) == ["übelkeit"]


def test_position_increments():
    # testPositionIncrements (:216-300): whitespace-tokenized streams
    prot = frozenset(["NUTCH"])

    assert word_delimiter(
        [("LUCENE", 1), ("/", 1), ("SOLR", 1)], FULL, prot) == [
        ("LUCENE", 1), ("SOLR", 1)]
    assert word_delimiter(
        [("LUCENE", 1), ("/", 1), ("solR", 1)], FULL, prot) == [
        ("LUCENE", 1), ("sol", 1), ("R", 1), ("solR", 0)]
    assert word_delimiter(
        [("LUCENE", 1), ("/", 1), ("NUTCH", 1), ("SOLR", 1)], FULL,
        prot) == [("LUCENE", 1), ("NUTCH", 1), ("SOLR", 1)]
    # large increments preserved / carried over
    assert word_delimiter(
        [("LUCENE", 1), ("largegap", 10), ("SOLR", 1)], FULL, prot) == [
        ("LUCENE", 1), ("largegap", 10), ("SOLR", 1)]
    assert word_delimiter(
        [("LUCENE", 1), ("/", 10), ("SOLR", 1)], FULL, prot) == [
        ("LUCENE", 1), ("SOLR", 11)]
    assert word_delimiter(
        [("LUCENE", 1), ("/", 10), ("solR", 1)], FULL, prot) == [
        ("LUCENE", 1), ("sol", 11), ("R", 1), ("solR", 0)]
    # stopword gap carried into the split parts
    assert word_delimiter([("lucene.solr", 2)], FULL, prot) == [
        ("lucene", 2), ("solr", 1), ("lucenesolr", 0)]
    assert word_delimiter([("lucene.solr", 1)], FULL, prot) == [
        ("lucene", 1), ("solr", 1), ("lucenesolr", 0)]

"""AnalyzingQueryParser tests — the TestAnalyzingQueryParser shapes:
wildcard/prefix/fuzzy/range chunks go through the analysis chain."""

import pytest

from lucene_solr_spark.query.analyzingparser import (
    analyze_single_chunk, analyzing_parse,
)
from lucene_solr_spark.query.parser import QueryParseError


def folding_analyze_terms(s):
    from lucene_solr_spark.analysis.analyzer import folding_analyze

    return [t for _, t in folding_analyze(s)]


def test_wildcard_chunks_analyzed():
    # TestAnalyzingQueryParser wildcardQueries: "Känd*" → "kand*" under a
    # folding chain; inner wildcards keep their position
    (c,) = analyzing_parse("Känd*", folding_analyze_terms)
    assert c.kind == "prefix" and c.terms == ["kand"]
    (c,) = analyzing_parse("Mötley*Crüe", folding_analyze_terms)
    assert c.kind == "wildcard" and c.terms == ["motley*crue"]
    (c,) = analyzing_parse("Ren?markt", folding_analyze_terms)
    assert c.kind == "wildcard" and c.terms == ["ren?markt"]
    # leading wildcard run preserved
    (c,) = analyzing_parse("*Türkisch", folding_analyze_terms)
    assert c.terms == ["*turkisch"]


def test_fuzzy_and_range_analyzed():
    (c,) = analyzing_parse("Übersetzung~1", folding_analyze_terms)
    assert c.kind == "fuzzy" and c.terms == ["ubersetzung"]
    (c,) = analyzing_parse("[Äpfel TO Übel]", folding_analyze_terms)
    assert c.kind == "range" and c.terms == ["apfel", "ubel"]


def test_single_chunk_errors():
    # a stopword chunk analyzes to nothing (AnalyzingQueryParser.java:198-201)
    with pytest.raises(QueryParseError, match="returned nothing"):
        analyze_single_chunk("the", folding_analyze_terms)
    # a chunk yielding several tokens is rejected (:190-196)
    with pytest.raises(QueryParseError, match="multiple terms"):
        analyze_single_chunk("foo bar", folding_analyze_terms)


def test_group_recursion():
    (c,) = analyzing_parse("(Känd* OR Übersetzung~1)", folding_analyze_terms)
    assert c.kind == "group"
    kinds = {ch.kind: ch.terms for ch in c.children}
    assert kinds["prefix"] == ["kand"] and kinds["fuzzy"] == ["ubersetzung"]


def test_e2e_with_folding_index(spark, tmp_path):
    """Wildcards hit the FOLDED dictionary only through the analyzing
    parser (the classic parser's raw 'känd*' matches nothing)."""
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher

    pages = spark.createDataFrame(
        [("u1", "en känd svensk musiker"), ("u2", "plain text here")],
        "url string, text string",
    )
    idx = build_index(spark, pages, str(tmp_path / "idx"), tokenizer="folding")
    s = Searcher(spark, idx)
    clauses = analyzing_parse("Känd*", s.analyze_query)
    hits = s.execute_clauses(clauses, k=5).collect()
    assert len(hits) == 1

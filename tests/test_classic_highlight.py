"""Classic Highlighter family vs HighlighterTest.java golden fragments."""

from __future__ import annotations

from lucene_solr_spark.query.classic_highlight import (
    Highlighter,
    NullFragmenter,
    QueryScorer,
    QueryTermScorer,
    SimpleFragmenter,
    SimpleHTMLFormatter,
    SimpleSpanFragmenter,
    simple_html_encode,
    standard_offset_tokens,
)

TEXT0 = ("Hello this is a piece of text that is very long and contains too "
         "much preamble and the meat is really here which says kennedy has "
         "been shot")
TEXT1 = ("This piece of text refers to Kennedy at the beginning then has a "
         "longer piece of text that is very long in the middle and finally "
         "ends with another reference to Kennedy")


def test_common_terms_simple_span_fragmenter():
    # HighlighterTest.testHighlightingCommonTermsQuery
    sc = QueryScorer(terms={"this": 1.0, "long": 1.0, "very": 1.0})
    h = Highlighter(sc, fragmenter=SimpleSpanFragmenter(sc))
    got = h.get_best_fragment(standard_offset_tokens(TEXT0, stop=None), TEXT0)
    assert got == ("Hello <B>this</B> is a piece of text that is <B>very</B>"
                   " <B>long</B> and contains too much preamble and the meat"
                   " is really here which says kennedy has been shot")

    sc = QueryScorer(terms={"this": 1.0, "long": 1.0, "very": 1.0})
    h = Highlighter(sc, fragmenter=SimpleSpanFragmenter(sc))
    got = h.get_best_fragment(standard_offset_tokens(TEXT1, stop=None), TEXT1)
    assert got == ("<B>This</B> piece of text refers to Kennedy at the "
                   "beginning then has a longer piece of text that is "
                   "<B>very</B>")


def test_sloppy_phrase_default_field():
    # HighlighterTest.testHighlightingWithDefaultField (slop=3 phrase;
    # the helper analyzer uses the classic English stop set)
    s1 = "I call our world Flatland, not because we call it so,"
    sc = QueryScorer(phrases=[(["world", "flatland"], 1.0, 3)])
    h = Highlighter(sc, fragmenter=SimpleFragmenter(2**31 - 1))
    got = h.get_best_fragments(standard_offset_tokens(s1), s1, 1,
                               "(FIELD TEXT TRUNCATED)")
    assert got == ("I call our <B>world</B> <B>Flatland</B>, not because we "
                   "call it so,")


def test_field_specific_terms_null_fragmenter():
    # HighlighterTest TestHighlightRunner field-(in)specific cases
    doc = "fred is one of the people"
    sc = QueryScorer(terms={"fred": 1.0})
    h = Highlighter(sc, fragmenter=NullFragmenter())
    got = h.get_best_fragment(standard_offset_tokens(doc, stop=None), doc)
    assert got == "<B>fred</B> is one of the people"

    sc = QueryScorer(terms={"fred": 1.0, "people": 1.0})
    h = Highlighter(sc, fragmenter=NullFragmenter())
    got = h.get_best_fragment(standard_offset_tokens(doc, stop=None), doc)
    assert got == "<B>fred</B> is one of the <B>people</B>"


def test_exact_phrase_position_sensitive():
    # slop=0: only adjacent very+long highlight; the stray "long" in the
    # middle of TEXT1 must not (position-sensitivity, QueryScorer)
    sc = QueryScorer(phrases=[(["very", "long"], 1.0, 0)])
    h = Highlighter(sc, fragmenter=NullFragmenter())
    got = h.get_best_fragment(standard_offset_tokens(TEXT0, stop=None), TEXT0)
    assert "<B>very</B> <B>long</B>" in got
    assert got.count("<B>") == 2

    # "long" appears once adjacent to very, once alone ("a longer" stems
    # differently so craft a text with a lone long)
    t = "very long text and a long way"
    sc = QueryScorer(phrases=[(["very", "long"], 1.0, 0)])
    h = Highlighter(sc, fragmenter=NullFragmenter())
    got = h.get_best_fragment(standard_offset_tokens(t, stop=None), t)
    assert got == "<B>very</B> <B>long</B> text and a long way"


def test_query_term_scorer_ignores_positions():
    t = "very long text and a long way"
    sc = QueryTermScorer({"very": 1.0, "long": 1.0})
    h = Highlighter(sc, fragmenter=NullFragmenter())
    got = h.get_best_fragment(standard_offset_tokens(t, stop=None), t)
    assert got == "<B>very</B> <B>long</B> text and a <B>long</B> way"


def test_multi_fragment_separator():
    # SimpleFragmenter(40), 2 fragments joined with "..."
    sc = QueryScorer(terms={"kennedy": 1.0})
    h = Highlighter(sc, fragmenter=SimpleFragmenter(40))
    got = h.get_best_fragments(standard_offset_tokens(TEXT1, stop=None),
                               TEXT1, 2, "...")
    assert got.count("<B>Kennedy</B>") == 2
    assert "..." in got


def test_fragment_scores_and_ordering():
    sc = QueryScorer(terms={"kennedy": 1.0, "text": 1.0})
    h = Highlighter(sc, fragmenter=SimpleFragmenter(40))
    frags = h.get_best_text_fragments(
        standard_offset_tokens(TEXT1, stop=None), TEXT1, 10, True)
    scores = [s for _, s in frags]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_custom_formatter_and_encoder():
    doc = 'x < y & "quotes" fred'
    sc = QueryScorer(terms={"fred": 1.0})
    h = Highlighter(sc, formatter=SimpleHTMLFormatter("[", "]"),
                    fragmenter=NullFragmenter(), encoder=simple_html_encode)
    got = h.get_best_fragment(standard_offset_tokens(doc, stop=None), doc)
    assert got == "x &lt; y &amp; &quot;quotes&quot; [fred]"


def test_no_match_returns_none():
    sc = QueryScorer(terms={"zzz": 1.0})
    h = Highlighter(sc, fragmenter=NullFragmenter())
    assert h.get_best_fragment(
        standard_offset_tokens(TEXT0, stop=None), TEXT0) is None


def test_merge_contiguous_fragments():
    # adjacent scoring fragments merge into one readable block
    t = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    sc = QueryScorer(terms={"alpha": 1.0, "kappa": 1.0})
    h = Highlighter(sc, fragmenter=SimpleFragmenter(30))
    frags = h.get_best_text_fragments(
        standard_offset_tokens(t, stop=None), t, 10, True)
    joined = "".join(s for s, _ in frags)
    assert joined.count("<B>") == 4

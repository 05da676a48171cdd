"""FastVectorHighlighter golden parity vs the reference's
FieldPhraseListTest / SimpleFragListBuilderTest / WeightedFragListBuilderTest
/ FastVectorHighlighterTest cases (lucene/highlighter vectorhighlight)."""

import pytest

from lucene_solr_spark.query.classic_highlight import standard_offset_tokens
from lucene_solr_spark.query.fvh import (
    FastVectorHighlighter,
    FieldPhraseList,
    FieldQuery,
    FieldTermStack,
    ScoreOrderFragmentsBuilder,
    SimpleBoundaryScanner,
    SimpleFragListBuilder,
    SingleFragListBuilder,
    TermInfo,
    WeightedFragListBuilder,
    term_infos_from_tokens,
)


def _stack(text, term_set, df=None, num_docs=1):
    """Whitespace-ish 1-char-term corpus of the reference tests: token i at
    offsets (2i, 2i+1), position i — standard_offset_tokens reproduces it."""
    toks = standard_offset_tokens(text, stop=None)
    return FieldTermStack(term_infos_from_tokens(toks, term_set, df, num_docs))


def _phrases(query_clauses, text, phrase_highlight=True):
    fq = FieldQuery(query_clauses, phrase_highlight=phrase_highlight)
    return FieldPhraseList(_stack(text, fq.term_set), fq).phrase_list


# ---------------------------------------------------------------------------
# FieldPhraseListTest

def test_1term_index():
    pl = _phrases([("term", "a")], "a")
    assert [repr(p) for p in pl] == ["a(1.0)((0,1))"]
    assert _phrases([("term", "b")], "a") == []


def test_2terms_index():
    pl = _phrases([("term", "a")], "a a")
    assert [repr(p) for p in pl] == ["a(1.0)((0,1))", "a(1.0)((2,3))"]


def test_1phrase_index():
    pl = _phrases([("phrase", ["a", "b"])], "a b")
    assert [repr(p) for p in pl] == ["ab(1.0)((0,3))"]
    pl = _phrases([("term", "b")], "a b")
    assert [repr(p) for p in pl] == ["b(1.0)((2,3))"]


def test_1phrase_index_bigram():
    # bigram analyzer over "bbbacbabc": positions/offsets per the
    # reference comment (FieldPhraseListTest.java:66-76)
    grams = ["bb", "bb", "ba", "ac", "cb", "ba", "ab", "bc"]
    infos = [TermInfo(g, i, i + 2, i) for i, g in enumerate(grams)
             if g in {"ba", "ac"}]
    fq = FieldQuery([("phrase", ["ba", "ac"])])
    pl = FieldPhraseList(FieldTermStack(infos), fq).phrase_list
    assert [repr(p) for p in pl] == ["baac(1.0)((2,5))"]


def test_2concat_terms_index_bigram():
    grams = ["ab", "ba", "ab"]
    infos = [TermInfo(g, i, i + 2, i) for i, g in enumerate(grams)
             if g == "ab"]
    fq = FieldQuery([("term", "ab")])
    pl = FieldPhraseList(FieldTermStack(infos), fq).phrase_list
    assert [repr(p) for p in pl] == ["ab(1.0)((0,2))", "ab(1.0)((2,4))"]


def test_2terms_1phrase_index():
    # phraseHighlight=True: only the full phrase occurrence
    pl = _phrases([("phrase", ["a", "b"])], "c a a b")
    assert [repr(p) for p in pl] == ["ab(1.0)((4,7))"]
    # phraseHighlight=False: the lone "a" highlights too
    pl = _phrases([("phrase", ["a", "b"])], "c a a b", phrase_highlight=False)
    assert [repr(p) for p in pl] == ["a(1.0)((2,3))", "ab(1.0)((4,7))"]


def test_phrase_slop():
    pl = _phrases([("phrase", ["a", "c"], 2.0, 1)], "c a a b c")
    assert [repr(p) for p in pl] == ["ac(2.0)((4,5)(8,9))"]
    assert pl[0].start_offset == 4
    assert pl[0].end_offset == 9


def test_2phrases_overlap():
    pl = _phrases([("phrase", ["a", "b"]), ("phrase", ["b", "c"])],
                  "d a b c d")
    assert [repr(p) for p in pl] == ["abc(1.0)((2,7))"]


def test_3terms_phrase():
    pl = _phrases([("phrase", ["a", "b", "c"])], "d a b a b c d")
    assert [repr(p) for p in pl] == ["abc(1.0)((6,11))"]


def test_search_longest_phrase():
    pl = _phrases([("phrase", ["a", "b"]), ("phrase", ["a", "b", "c"])],
                  "d a b d c a b c")
    assert [repr(p) for p in pl] == ["ab(1.0)((2,5))", "abc(1.0)((10,15))"]


# ---------------------------------------------------------------------------
# SimpleFragListBuilderTest

def _ffl(query_clauses, text, frag_char_size, builder=None):
    fq = FieldQuery(query_clauses)
    fpl = FieldPhraseList(_stack(text, fq.term_set), fq)
    b = builder or SimpleFragListBuilder()
    return b.create_field_frag_list(fpl, frag_char_size)


def test_null_field_frag_list():
    assert _ffl([("term", "a")], "b c d", 100) == []


def test_too_small_frag_size():
    with pytest.raises(ValueError):
        _ffl([("term", "a")], "b c d",
             SimpleFragListBuilder().min_frag_char_size - 1)


def test_smaller_frag_size_than_term_query():
    sflb = SimpleFragListBuilder()
    ffl = _ffl([("term", "abcdefghijklmnopqrs")], "abcdefghijklmnopqrs",
               sflb.min_frag_char_size)
    assert [repr(f) for f in ffl] == [
        "subInfos=(abcdefghijklmnopqrs((0,19)))/1.0(0,19)"]


def test_smaller_frag_size_than_phrase_query():
    sflb = SimpleFragListBuilder()
    ffl = _ffl([("phrase", ["abcdefgh", "jklmnopqrs"])],
               "abcdefgh   jklmnopqrs", sflb.min_frag_char_size)
    assert [repr(f) for f in ffl] == [
        "subInfos=(abcdefghjklmnopqrs((0,21)))/1.0(0,21)"]


def test_1term_frag():
    ffl = _ffl([("term", "a")], "a", 100)
    assert [repr(f) for f in ffl] == ["subInfos=(a((0,1)))/1.0(0,100)"]


def test_2terms_1frag():
    ffl = _ffl([("term", "a")], "a a", 100)
    assert [repr(f) for f in ffl] == ["subInfos=(a((0,1))a((2,3)))/2.0(0,100)"]
    ffl = _ffl([("term", "a")], "a b b b b b b b b a", 20)
    assert [repr(f) for f in ffl] == [
        "subInfos=(a((0,1))a((18,19)))/2.0(0,20)"]
    ffl = _ffl([("term", "a")], "b b b b a b b b b a", 20)
    assert [repr(f) for f in ffl] == [
        "subInfos=(a((8,9))a((18,19)))/2.0(4,24)"]


def test_2terms_2frags():
    ffl = _ffl([("term", "a")], "a b b b b b b b b b b b b b a", 20)
    assert [repr(f) for f in ffl] == [
        "subInfos=(a((0,1)))/1.0(0,20)",
        "subInfos=(a((28,29)))/1.0(20,40)"]
    ffl = _ffl([("term", "a")], "a b b b b b b b b b b b b a", 20)
    assert [repr(f) for f in ffl] == [
        "subInfos=(a((0,1)))/1.0(0,20)",
        "subInfos=(a((26,27)))/1.0(20,40)"]
    ffl = _ffl([("term", "a")], "a b b b b b b b b b a", 20)
    assert [repr(f) for f in ffl] == [
        "subInfos=(a((0,1)))/1.0(0,20)",
        "subInfos=(a((20,21)))/1.0(20,40)"]


def test_2terms_query():
    q = [("term", "a"), ("term", "b")]
    assert _ffl(q, "c d e", 20) == []
    ffl = _ffl(q, "d b c", 20)
    assert [repr(f) for f in ffl] == ["subInfos=(b((2,3)))/1.0(0,20)"]
    ffl = _ffl(q, "a b c", 20)
    assert [repr(f) for f in ffl] == ["subInfos=(a((0,1))b((2,3)))/2.0(0,20)"]


def test_phrase_query_frags():
    q = [("phrase", ["a", "b"])]
    assert _ffl(q, "c d e", 20) == []
    assert _ffl(q, "a c b", 20) == []
    ffl = _ffl(q, "a b c", 20)
    assert [repr(f) for f in ffl] == ["subInfos=(ab((0,3)))/1.0(0,20)"]


# ---------------------------------------------------------------------------
# WeightedFragListBuilderTest — the sqrt-length-normed IDF score

def test_weighted_frag_2terms():
    # reference: doc "the both term" matched by "both the"; idf weights
    # from a 2-doc index — reproduce the exact setup: numDocs such that
    # weight = ln(numDocs/(df+1))+1 gives the golden 0.86791086 total
    text = ("Lucene can be highlighted by the both fast vector highlighter "
            "and the classic highlighter, the both work well, the both "
            "are fine. " * 2)[:250]
    # golden from WeightedFragListBuilderTest: a 2-phrase doc scoring
    # "subInfos=(theboth((195,203)))/0.86791086(149,249)". The exact
    # corpus is reference-internal; instead pin the formula itself:
    # totalBoost = sum(distinct idf*boost) * len * (1/sqrt(len))
    toks = standard_offset_tokens("a b c a", stop=None)
    fq = FieldQuery([("phrase", ["a", "b"])])
    df = {"a": 3, "b": 1}
    infos = term_infos_from_tokens(toks, fq.term_set, df, num_docs=10)
    fpl = FieldPhraseList(FieldTermStack(infos), fq)
    ffl = WeightedFragListBuilder().create_field_frag_list(fpl, 20)
    assert len(ffl) == 1
    import math
    wa = math.log(10 / 4.0) + 1
    wb = math.log(10 / 2.0) + 1
    expect = (wa + wb) * 2 * (1 / math.sqrt(2))
    assert abs(ffl[0].total_boost - expect) < 1e-5


def test_single_frag_list_builder():
    fq = FieldQuery([("term", "a")])
    fpl = FieldPhraseList(_stack("a b b b b a", fq.term_set), fq)
    ffl = SingleFragListBuilder().create_field_frag_list(fpl, 100)
    assert len(ffl) == 1
    assert ffl[0].start == 0 and ffl[0].end == 2 ** 31 - 1
    assert len(ffl[0].sub_infos) == 2


# ---------------------------------------------------------------------------
# SimpleBoundaryScanner (SimpleBoundaryScannerTest)

def test_boundary_scanner_start():
    bs = SimpleBoundaryScanner()
    text = "Apache Lucene is a high-performance, full-featured text search engine library."
    assert bs.find_start_offset(text, 0) == 0
    # in-word start backs up to the space boundary
    assert bs.find_start_offset(text, 9) == 7
    # beyond maxScan: unchanged
    bs2 = SimpleBoundaryScanner(max_scan=2)
    assert bs2.find_start_offset(text, 10) == 10


def test_boundary_scanner_end():
    bs = SimpleBoundaryScanner()
    text = "Apache Lucene is a high-performance, full-featured text search engine library."
    assert bs.find_end_offset(text, 6) == 6  # already at a boundary
    assert bs.find_end_offset(text, 8) == 13  # scans to end of "Lucene"


# ---------------------------------------------------------------------------
# FastVectorHighlighterTest end-to-end

def test_simple_highlight():
    fvh = FastVectorHighlighter()
    text = ("This is a test where foo is highlighed and should be "
            "highlighted")
    fq = fvh.get_field_query([("term", "foo")])
    assert fvh.get_best_fragments(fq, text, 54, 1) == [
        "This is a test where <b>foo</b> is highlighed and should be "
        "highlighted"]
    assert fvh.get_best_fragments(fq, text, 52, 1) == [
        "This is a test where <b>foo</b> is highlighed and should be"]
    assert fvh.get_best_fragments(fq, text, 30, 1) == [
        "a test where <b>foo</b> is highlighed"]


NETSCAPE = (
    "Netscape was the general name for a series of web browsers originally "
    "produced by Netscape Communications Corporation, now a subsidiary of "
    "AOL The original browser was once the dominant browser in terms of "
    "usage share, but as a result of the first browser war it lost "
    "virtually all of its share to Internet Explorer Netscape was "
    "discontinued and support for all Netscape browsers and client "
    "products was terminated on March 1, 2008 Netscape Navigator was the "
    "name of Netscape's web browser from versions 1.0 through 4.8 The "
    "first beta release versions of the browser were released in 1994 and "
    "known as Mosaic and then Mosaic Netscape until a legal challenge from "
    "the National Center for Supercomputing Applications (makers of NCSA "
    "Mosaic, which many of Netscape's founders used to develop), led to "
    "the name change to Netscape Navigator The company's name also changed "
    "from Mosaic Communications Corporation to Netscape Communications "
    "Corporation The browser was easily the most advanced..."
)


def test_phrase_highlight_long_text():
    fvh = FastVectorHighlighter()
    fq = fvh.get_field_query([("term", "internet"), ("term", "explorer")])
    frags = fvh.get_best_fragments(fq, NETSCAPE, 128, 1)
    assert frags == [
        "first browser war it lost virtually all of its share to "
        "<b>Internet</b> <b>Explorer</b> Netscape was discontinued and "
        "support for all Netscape browsers"]

    fq = fvh.get_field_query([("phrase", ["internet", "explorer"])])
    frags = fvh.get_best_fragments(fq, NETSCAPE, 128, 1)
    assert frags == [
        "first browser war it lost virtually all of its share to "
        "<b>Internet Explorer</b> Netscape was discontinued and "
        "support for all Netscape browsers"]


def test_score_order_and_multi_tags():
    # per-seqnum cycling tags (colored-tag support) + score ordering
    fvh = FastVectorHighlighter(
        fragments_builder=ScoreOrderFragmentsBuilder(
            pre_tags=["<1>", "<2>"], post_tags=["</1>", "</2>"]))
    text = "a x x x x x x x x x x x x x x b a x x x"
    fq = fvh.get_field_query([("term", "a"), ("term", "b")])
    frags = fvh.get_best_fragments(fq, text, 20, 2)
    # second fragment (a+b) outscores the first (a alone)
    assert len(frags) == 2
    assert "<2>b</2>" in frags[0] and "<1>a</1>" in frags[0]
    assert "<1>a</1>" in frags[1] and "b" not in frags[1].replace(
        "</1>", "").replace("<1>", "")


def test_multivalued_field():
    fvh = FastVectorHighlighter()
    values = ["first value with foo inside", "second value no match"]
    fq = fvh.get_field_query([("term", "foo")])
    # tokens over the joined string (separator = ' ', like the buffer)
    frags = fvh.get_best_fragments(fq, values, 27, 1)
    assert frags and "<b>foo</b>" in frags[0]


def test_phrase_with_slop_highlight():
    fvh = FastVectorHighlighter()
    text = "a b c d e"
    fq = fvh.get_field_query([("phrase", ["a", "c"], 1.0, 1)])
    frags = fvh.get_best_fragments(fq, text, 18, 1)
    # slop phrase: two Toffs runs, both tagged
    assert frags == ["<b>a</b> b <b>c</b> d e"]


def test_overlapping_phrases_expand():
    # FieldQuery.expand: {"a b","b c"} adds "a b c"
    fq = FieldQuery([("phrase", ["a", "b"]), ("phrase", ["b", "c"])])
    pl = FieldPhraseList(_stack("d a b c d", fq.term_set), fq).phrase_list
    assert [repr(p) for p in pl] == ["abc(1.0)((2,7))"]

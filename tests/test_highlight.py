"""PostingsHighlighter passage goldens (query/highlight.py round-4 parity).

Formulas and selection rules from PassageScorer.java:58-97 and
PostingsHighlighter.highlightDoc:446-565; formatting from
DefaultPassageFormatter.java:60-100."""

from __future__ import annotations

import math

from lucene_solr_spark.query.highlight import (
    DEFAULT_MAX_LENGTH,
    K1,
    B,
    PIVOT,
    format_passages,
    highlight_passages,
)

TEXT = (
    "Apache Lucene is a search library. "          # s0: 0-35
    "It is fast and very fast at indexing. "       # s1: fast x2
    "Many projects use it. "                       # s2: no hits
    "Fast retrieval matters most."                 # s3: fast x1
)


def test_sentence_passages_and_selection():
    ps = highlight_passages(TEXT, {"fast"}, max_passages=1)
    assert len(ps) == 1
    # the two-hit sentence must win over the one-hit sentence
    assert TEXT[ps[0]["start"]:ps[0]["end"]].startswith("It is fast")
    assert len(ps[0]["matches"]) == 2


def test_passage_score_formula_exact():
    ps = highlight_passages(TEXT, {"fast"}, max_passages=2)
    # recompute the winner's score by hand (PassageScorer formulas)
    p = max(ps, key=lambda x: x["score"])
    content_len = len(TEXT)
    num_docs = 1.0 + content_len / PIVOT
    w = (K1 + 1.0) * math.log(1.0 + (num_docs + 0.5) / (3 + 0.5))  # tf_doc=3
    plen = p["end"] - p["start"]
    norm = K1 * ((1.0 - B) + B * (plen / PIVOT))
    want = w * (2.0 / (2.0 + norm)) * (1.0 + 1.0 / math.log(PIVOT + p["start"]))
    assert math.isclose(p["score"], want, rel_tol=1e-12)


def test_multi_passage_order_and_ellipsis():
    ps = highlight_passages(TEXT, {"fast"}, max_passages=2)
    # rendered in OFFSET order even though scores chose them
    assert [TEXT[p["start"]:p["end"]][:5] for p in ps] == ["It is", "Fast "]
    out = format_passages(ps, TEXT, pre="<b>", post="</b>")
    # disconnected passages joined by the default ellipsis
    assert "... " in out
    assert out.count("<b>") == 3
    assert "<b>fast</b>" in out and "<b>Fast</b>" in out


def test_empty_highlight_first_sentences():
    ps = highlight_passages(TEXT, {"nomatch"}, max_passages=2)
    assert [p["score"] for p in ps] == [0.0, 0.0]
    assert TEXT[ps[0]["start"]:ps[0]["end"]].startswith("Apache Lucene")
    assert TEXT[ps[1]["start"]:ps[1]["end"]].startswith("It is fast")


def test_max_length_clips_content():
    ps = highlight_passages(TEXT, {"fast"}, max_passages=5, max_length=40)
    # only content within the first 40 chars is considered
    assert all(p["end"] <= 40 for p in ps)


def test_tie_breaks_earlier_passage():
    text = "alpha beta here. alpha beta there."
    ps = highlight_passages(text, {"alpha"}, max_passages=1)
    # identical tf; the EARLIER passage has the higher norm(start) factor
    # AND wins the comparator tie — either way passage 0 is selected
    assert ps[0]["start"] == 0

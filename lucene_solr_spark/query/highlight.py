"""Postings highlighter with reference option parity (round 4).

Reference: PostingsHighlighter (lucene/highlighter/src/java/org/apache/
lucene/search/postingshighlight/PostingsHighlighter.java) + PassageScorer
(PassageScorer.java:44-90) + DefaultPassageFormatter
(DefaultPassageFormatter.java:41-100). Reproduced faithfully:

- **Passages are sentences** (BreakIterator.getSentenceInstance — here a
  documented sentence-boundary rule: a break after [.!?]+ followed by
  whitespace, plus end-of-text), clipped to `max_length` content chars
  (DEFAULT_MAX_LENGTH = 10000, PostingsHighlighter.java:97).
- **Scoring** (highlightDoc, PostingsHighlighter.java:446-565): per passage
  score = Σ_terms weight(t) · tf(freq_in_passage, passage_len), finalized
  by · norm(startOffset), with PassageScorer's exact formulas —
  weight = (k1+1)·ln(1 + (numDocs+0.5)/(tf_doc+0.5)), numDocs =
  1 + contentLength/pivot (:72-78); tf = freq/(freq + k1·(1-b+b·len/pivot))
  (:87-90); norm = 1 + 1/ln(pivot + startOffset) (:95-97); k1=1.2, b=0.75,
  pivot=87 (:58).
- **Selection**: top `max_passages` passages by (score, then EARLIER
  startOffset wins at a tie — the PQ comparator at :487-499), re-sorted by
  startOffset for rendering (:534-540).
- **Formatting** (DefaultPassageFormatter.format): matches wrapped in
  pre/post tags, non-adjacent passages joined with the ellipsis "... ",
  adjacent ones concatenated directly.
- **No-match docs** return the first `max_passages` sentences
  (getEmptyHighlight, :576-591).

The reference reads term offsets from the index; offsets are not stored
here, so the top-k docs (a driver-small set by definition — Solr highlights
only the rows being returned) are re-analyzed with the SAME fidelity
tokenizer, which yields identical tokens plus their character spans.

Scale: highlighting is response rendering over k ≈ 10 rows — the only
per-row Python here touches those k strings, never the corpus.
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis.analyzer import ENGLISH_STOP_WORDS, _PY_TOKEN_RE, _java_lower

# PassageScorer defaults (PassageScorer.java:58)
K1, B, PIVOT = 1.2, 0.75, 87.0
DEFAULT_MAX_LENGTH = 10_000  # PostingsHighlighter.DEFAULT_MAX_LENGTH (:97)

# sentence boundary: after a run of .!? followed by whitespace (the
# BreakIterator.getSentenceInstance approximation), or end of text
_SENT_RE = re.compile(r"[.!?]+\s+")


def _sentences(text: str) -> list[tuple[int, int]]:
    """[(start, end)) sentence spans covering the text."""
    spans = []
    start = 0
    for m in _SENT_RE.finditer(text):
        spans.append((start, m.end()))
        start = m.end()
    if start < len(text):
        spans.append((start, len(text)))
    return spans or [(0, 0)]


def _term_spans(text: str, terms: set[str]) -> list[tuple[int, int, str]]:
    """(start, end, term) character spans of query-term occurrences, in
    offset order (the merged OffsetsEnum stream)."""
    out = []
    for m in _PY_TOKEN_RE.finditer(text):
        tok = _java_lower(m.group(0))
        if tok in terms and tok not in ENGLISH_STOP_WORDS:
            out.append((m.start(), m.end(), tok))
    return out


def highlight_passages(
    text: str,
    terms: set[str],
    max_passages: int = 1,
    max_length: int = DEFAULT_MAX_LENGTH,
) -> list[dict]:
    """The highlightDoc pass for one document: the top `max_passages`
    sentence passages, each {"start","end","score","matches":[(s,e)...]},
    sorted by start offset. Empty-highlight fallback (first sentences,
    score 0) when the text holds no query term."""
    content = text[:max_length]
    sents = _sentences(content)
    spans = _term_spans(content, terms)
    if not spans:
        out = [
            {"start": s, "end": e, "score": 0.0, "matches": []}
            for s, e in sents[:max_passages]
            if e > s
        ]
        return out

    # weight(contentLength, tf_doc) per term (PassageScorer.java:72-78)
    tf_doc: dict[str, int] = {}
    for _, _, t in spans:
        tf_doc[t] = tf_doc.get(t, 0) + 1
    num_docs = 1.0 + len(content) / PIVOT
    weight = {
        t: (K1 + 1.0) * math.log(1.0 + (num_docs + 0.5) / (n + 0.5))
        for t, n in tf_doc.items()
    }

    # bucket matches into sentence passages (offset-ordered merge)
    passages: list[dict] = []
    si = 0
    for s, e, t in spans:
        while si < len(sents) and s >= sents[si][1]:
            si += 1
        if si >= len(sents):
            break
        p_start, p_end = sents[si]
        if not passages or passages[-1]["start"] != p_start:
            passages.append(
                {"start": p_start, "end": p_end, "matches": [], "tf": {}}
            )
        passages[-1]["matches"].append((s, e))
        passages[-1]["tf"][t] = passages[-1]["tf"].get(t, 0) + 1

    for p in passages:
        plen = p["end"] - p["start"]
        norm = K1 * ((1.0 - B) + B * (plen / PIVOT))
        score = sum(
            weight[t] * (n / (n + norm)) for t, n in p["tf"].items()
        )
        # norm(startOffset) finalization (PassageScorer.java:95-97)
        p["score"] = score * (1.0 + 1.0 / math.log(PIVOT + p["start"]))
        del p["tf"]

    # top-n by (score desc, startOffset asc at ties), render in offset order
    passages.sort(key=lambda p: (-p["score"], p["start"]))
    chosen = passages[:max_passages]
    chosen.sort(key=lambda p: p["start"])
    return chosen


def format_passages(
    passages: list[dict],
    content: str,
    pre: str = "<b>",
    post: str = "</b>",
    ellipsis: str = "... ",
) -> str:
    """DefaultPassageFormatter.format (DefaultPassageFormatter.java:60-100):
    matches wrapped, disconnected passages joined by the ellipsis."""
    parts: list[str] = []
    pos = 0
    for p in passages:
        if p["start"] > pos and pos > 0:
            parts.append(ellipsis)
        pos = p["start"]
        for s, e in p["matches"]:
            if s > pos:
                parts.append(content[pos:s])
            parts.append(pre + content[max(s, pos):e] + post)
            pos = max(pos, e)
        if p["end"] > pos:
            parts.append(content[pos:p["end"]])
            pos = p["end"]
    return "".join(parts)


def highlight(
    searcher,
    hits: DataFrame,
    source: DataFrame,
    query: str | list[str],
    key_col: str = "url",
    text_col: str = "text",
    max_passages: int = 1,
    max_length: int = DEFAULT_MAX_LENGTH,
    pre: str = "<em>",
    post: str = "</em>",
    ellipsis: str = "... ",
    max_chars: int | None = None,  # deprecated: passages are
    # sentence-bounded like the reference; honored as a post-format clip
) -> DataFrame:
    """Highlight the query terms in each hit's stored text via the
    PostingsHighlighter passage pipeline. Returns (doc_id, score, snippet)."""
    if max_chars is not None:
        import warnings

        warnings.warn(
            "highlight(max_chars=...) is deprecated: passages are "
            "sentence-bounded (reference PostingsHighlighter semantics); "
            "the value is applied as a post-format clip on the snippet",
            DeprecationWarning,
            stacklevel=2,
        )
    terms = (
        searcher.analyze_query(query) if isinstance(query, str) else list(query)
    )
    tset = set(terms)
    rows = searcher.fetch_docs(hits, source=source, key_col=key_col).select(
        "doc_id", "score", text_col
    )
    pdf = rows.toPandas()  # top-k sized by contract

    snippets = []
    for r in pdf.itertuples(index=False):
        text = getattr(r, text_col) or ""
        ps = highlight_passages(text, tset, max_passages, max_length)
        snip = format_passages(ps, text[:max_length], pre, post, ellipsis)
        if max_chars is not None:
            snip = snip[:max_chars]
        snippets.append(snip)

    out = pd.DataFrame(
        {"doc_id": pdf["doc_id"], "score": pdf["score"], "snippet": snippets}
    )
    return searcher.spark.createDataFrame(out).orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )

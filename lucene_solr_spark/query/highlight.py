"""Minimal postings-style highlighter.

Reference: PostingsHighlighter (lucene/highlighter/src/java/org/apache/
lucene/search/postingshighlight/PostingsHighlighter.java:86) — per returned
doc, find query-term occurrences, pick the best-scoring passage, and mark
the hits. The reference reads term offsets from the index; offsets are not
stored here, so the top-k docs (a driver-small set by definition — Solr
also highlights only the rows being returned) are re-analyzed with the SAME
fidelity tokenizer, which yields identical tokens plus their character
spans. Passage scoring follows PassageScorer's shape: unique-term weighting
by BM25 idf, tf dampened by sqrt, best window wins, earliest on ties.

Scale: highlighting is response rendering over k ≈ 10 rows — the only
per-row Python here touches those k strings, never the corpus.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis.analyzer import ENGLISH_STOP_WORDS, _PY_TOKEN_RE, _java_lower
from .bm25 import bm25_idf


def _term_spans(text: str, terms: set[str]) -> list[tuple[int, int, str]]:
    """(start, end, term) character spans of query-term occurrences."""
    out = []
    for m in _PY_TOKEN_RE.finditer(text):
        tok = _java_lower(m.group(0))
        if tok in terms and tok not in ENGLISH_STOP_WORDS:
            out.append((m.start(), m.end(), tok))
    return out


def _best_window(
    spans: list[tuple[int, int, str]], idf: dict[str, float], max_chars: int
) -> tuple[int, int, list[tuple[int, int]]]:
    """Best max_chars window over the match spans: maximize
    Σ_unique-term idf(t) * sqrt(tf_in_window) (PassageScorer.java weighting),
    earliest window on ties. Returns (lo, hi, spans_in_window)."""
    best = (-1.0, 0, 0, [])
    for i in range(len(spans)):
        lo = spans[i][0]
        tf: dict[str, int] = {}
        inside = []
        for s, e, t in spans[i:]:
            if e - lo > max_chars:
                break
            tf[t] = tf.get(t, 0) + 1
            inside.append((s, e))
        score = sum(idf.get(t, 0.0) * math.sqrt(n) for t, n in tf.items())
        if score > best[0]:
            hi = inside[-1][1] if inside else lo
            best = (score, lo, hi, inside)
    return best[1], best[2], best[3]


def highlight(
    searcher,
    hits: DataFrame,
    source: DataFrame,
    query: str | list[str],
    key_col: str = "url",
    text_col: str = "text",
    max_chars: int = 160,
    pre: str = "<em>",
    post: str = "</em>",
) -> DataFrame:
    """Highlight the query terms in each hit's stored text: one best
    passage per doc, hits wrapped in pre/post. Returns
    (doc_id, score, snippet)."""
    terms = (
        searcher.analyze_query(query) if isinstance(query, str) else list(query)
    )
    tset = set(terms)
    tinfo = searcher.lookup_terms(terms)
    idf = {
        str(r.term): float(bm25_idf(int(r.df), searcher.stats.max_doc))
        for r in tinfo.itertuples()
    }
    rows = searcher.fetch_docs(hits, source=source, key_col=key_col).select(
        "doc_id", "score", text_col
    )
    pdf = rows.toPandas()  # top-k sized by contract

    snippets = []
    for r in pdf.itertuples(index=False):
        text = getattr(r, text_col) or ""
        spans = _term_spans(text, tset)
        if not spans:
            snippets.append(text[:max_chars])
            continue
        lo, hi, inside = _best_window(spans, idf, max_chars)
        # widen to the char budget around the matches
        pad = max(0, (max_chars - (hi - lo)) // 2)
        w_lo, w_hi = max(0, lo - pad), min(len(text), hi + pad)
        parts, cur = [], w_lo
        for s, e in inside:
            parts.append(text[cur:s])
            parts.append(pre + text[s:e] + post)
            cur = e
        parts.append(text[cur:w_hi])
        snippets.append("".join(parts))

    out = pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "score": pdf["score"],
            "snippet": snippets,
        }
    )
    return searcher.spark.createDataFrame(out).orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )

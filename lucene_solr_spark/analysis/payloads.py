"""Position and payload token filters + the QueryAutoStopWordAnalyzer
stop-set derivation.

- position_filter       PositionFilter.java:45-75 (all tokens after the
                        first share a position by default)
- delimited_payload     DelimitedPayloadTokenFilter: term|payload split
- type_as_payload / numeric_payload / token_offset_payload — the payload
  channel is modeled as an extra tuple slot (our postings keep payloads
  as parquet columns when present)
- keyword_repeat        KeywordRepeatFilter: emit the original ahead of
                        the stemmed form at the same position
- auto_stop_words       QueryAutoStopWordAnalyzer.java:124-160: terms
                        whose document frequency exceeds maxDocFreq (or
                        maxPercentDocs) become per-field stopwords —
                        computed here from the engine's term dictionary
                        DataFrame (distributed, no driver materialization
                        of postings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def position_filter(
    tokens: list[tuple[str, int]], position_increment: int = 0
) -> list[tuple[str, int]]:
    out: list[tuple[str, int]] = []
    first = True
    for term, inc in tokens:
        out.append((term, inc if first else position_increment))
        first = False
    return out


def delimited_payload(token: str, delimiter: str = "|") -> tuple[str, str]:
    """(term, payload) — payload empty when no delimiter present."""
    i = token.rfind(delimiter)
    if i < 0:
        return token, ""
    return token[:i], token[i + 1:]


def keyword_repeat(
    tokens: list[tuple[str, int]], stem
) -> list[tuple[str, int]]:
    """KeywordRepeatFilter + a keyword-aware stemmer: original first, the
    stemmed form injected at the same position when it differs."""
    out: list[tuple[str, int]] = []
    for term, inc in tokens:
        out.append((term, inc))
        stemmed = stem(term)
        if stemmed != term:
            out.append((stemmed, 0))
    return out


def auto_stop_words(
    term_dict: DataFrame,
    max_doc_freq: int | None = None,
    max_percent_docs: float | None = None,
    n_docs: int | None = None,
) -> list[str]:
    """Stop terms from the index term dictionary (columns term, df).
    Mirrors QueryAutoStopWordAnalyzer's addStopWords: df > maxDocFreq, or
    df > maxPercentDocs * numDocs."""
    if max_doc_freq is None:
        if max_percent_docs is None or n_docs is None:
            raise ValueError("need max_doc_freq or (max_percent_docs, n_docs)")
        max_doc_freq = int(max_percent_docs * n_docs)
    rows = (term_dict.where(F.col("df") > max_doc_freq)
            .select("term").collect())
    return sorted(r.term for r in rows)

"""AnalyzingQueryParser (lucene/queryparser/analyzing) — classic syntax with
multi-term chunks passed through the analysis chain.

Reference: AnalyzingQueryParser.java:42-208 — overrides getWildcardQuery
(split on wildcard runs, analyze every literal chunk, reassemble),
getPrefixQuery, getFuzzyQuery, and turns on analyzeRangeTerms. Each chunk
must analyze to EXACTLY one token: zero (a stopword) raises "Analyzer
returned nothing", several (e.g. a chain that splits) raises "Analyzer
created multiple terms" (analyzeSingleChunk:163-208).

Composes over this repo's classic parser: the clause tree from parse()
is rewritten in place-kind, so execution, boosts, and occur flags are
untouched.
"""

from __future__ import annotations

import re
from typing import Callable

from .parser import Clause, QueryParseError, parse

_WILDCARD_RUN = re.compile(r"[?*]+")


def analyze_single_chunk(chunk: str, analyze: Callable[[str], list[str]]) -> str:
    toks = list(analyze(chunk))
    if not toks:
        raise QueryParseError(f'Analyzer returned nothing for "{chunk}"')
    if len(toks) > 1:
        listed = ",".join(f'"{t}"' for t in toks)
        raise QueryParseError(
            f'Analyzer created multiple terms for "{chunk}": {listed}'
        )
    return toks[0]


def _rewrite(c: Clause, analyze: Callable[[str], list[str]]) -> None:
    if c.kind == "group":
        for ch in c.children:
            _rewrite(ch, analyze)
        return
    if c.kind == "wildcard":
        pat = c.terms[0]
        out, last = [], 0
        for m in _WILDCARD_RUN.finditer(pat):
            if m.start() > last:
                out.append(analyze_single_chunk(pat[last : m.start()], analyze))
            out.append(m.group(0))
            last = m.end()
        if last < len(pat):
            out.append(analyze_single_chunk(pat[last:], analyze))
        c.terms = ["".join(out)]
    elif c.kind in ("prefix", "fuzzy"):
        c.terms = [analyze_single_chunk(c.terms[0], analyze)]
    elif c.kind == "range":
        # setAnalyzeRangeTerms(true) in the ctor (:47)
        c.terms = [analyze_single_chunk(t, analyze) for t in c.terms]


def analyzing_parse(
    query: str,
    analyze: Callable[[str], list[str]],
    fields: set[str] | None = None,
) -> list[Clause]:
    """parse() + the AnalyzingQueryParser chunk rewrites. `analyze` is the
    index chain's query-side analyzer (e.g. Searcher.analyze_query)."""
    clauses = parse(query, fields)
    for c in clauses:
        _rewrite(c, analyze)
    return clauses

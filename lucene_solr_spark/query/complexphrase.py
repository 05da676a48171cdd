"""ComplexPhraseQueryParser: wildcard / fuzzy / OR-group clauses INSIDE a
quoted phrase, rewritten onto the span machinery.

Reference: lucene/queryparser/src/java/org/apache/lucene/queryparser/
complexPhrase/ComplexPhraseQueryParser.java:60-360 — a quoted phrase whose
content holds multi-term subqueries becomes a ComplexPhraseQuery; rewrite
(:228-360) turns each position's clause into a span: TermQuery → SpanTerm
(:271), a rewritten MultiTermQuery / OR group → SpanOrQuery of SpanTerms
(:331-346), and the sequence into SpanNearQuery(clauses, slopFactor,
inOrder=true) (:283). Solr front-end: ComplexPhraseQParserPlugin.

Scope here: the quoted-phrase rewrite itself (the part the classic parser
cannot express) — one phrase per query string, with per-position clauses:

    "jakarta apach*"            prefix/wildcard inside a phrase
    "jakart~ apache"~2          fuzzy inside a phrase, phrase slop
    "(apache jakarta) project"  OR group at one position

Multi-term expansion uses the SAME dictionary rewrite as the standalone
wildcard/fuzzy queries (Searcher._rewrite_terms — TopTermsRewrite cap), so
a `z*` phrase clause is bounded exactly like a `z*` WildcardQuery.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .spans import SpanNear, SpanOr, SpanTerm

# a clause is a parenthesized OR group or a single token (possibly with
# wildcard/fuzzy decoration); phrases arrive WITHOUT the surrounding quotes
_CLAUSE_RE = re.compile(r"\(([^)]*)\)|(\S+)")
_FUZZY_RE = re.compile(r"^(.+?)~(\d+(?:\.\d+)?)?$")


def _expand_token(searcher, tok: str) -> list[str]:
    """One phrase-position token → concrete index terms (the per-clause
    rewrite of ComplexPhraseQueryParser.rewrite:251-271)."""
    m = _FUZZY_RE.match(tok)
    if m and not tok.startswith("~"):
        base, edits = m.group(1), m.group(2)
        if "*" not in base and "?" not in base:
            analyzed = searcher.analyze_query(base)
            if not analyzed:
                return []
            term = analyzed[0]
            max_edits = 2 if edits is None else max(0, min(2, int(float(edits))))
            if max_edits == 0:
                return [term]
            band = (F.length("term") >= len(term) - max_edits) & (
                F.length("term") <= len(term) + max_edits
            )
            return searcher._rewrite_terms(
                band & (F.levenshtein(F.col("term"), F.lit(term)) <= max_edits),
                max_expansions=50,
            )
    if "*" in tok or "?" in tok:
        low = tok.lower()
        rx = "^" + "".join(
            ".*" if c == "*" else "." if c == "?" else re.escape(c) for c in low
        ) + "$"
        return searcher._rewrite_terms(F.col("term").rlike(rx))
    return searcher.analyze_query(tok)


def parse_complex_phrase(searcher, phrase: str, slop: int = 0):
    """Quoted-phrase content → SpanNear tree (None when any position's
    clause expands to nothing — the phrase then matches no documents)."""
    clauses = []
    for m in _CLAUSE_RE.finditer(phrase):
        if m.group(1) is not None:  # OR group: any alternative at this slot
            alts: list[str] = []
            for w in m.group(1).replace(" OR ", " ").split():
                alts.extend(_expand_token(searcher, w))
            terms = alts
        else:
            tok = m.group(2)
            analyzed_plain = (
                "*" not in tok and "?" not in tok and "~" not in tok
            )
            terms = _expand_token(searcher, tok)
            if analyzed_plain and not terms:
                continue  # stopword slot: analyzed away, no clause
        if not terms:
            return None  # wildcard/fuzzy matched nothing → no docs
        clauses.append(
            SpanTerm(terms[0])
            if len(terms) == 1
            else SpanOr(tuple(SpanTerm(t) for t in terms))
        )
    if not clauses:
        return None
    if len(clauses) == 1:
        return clauses[0]
    return SpanNear(tuple(clauses), slop=slop, in_order=True)


def complex_phrase_search(
    searcher, query: str, k: int = 10, in_order: bool = True,
    filter_docs: DataFrame | None = None,
) -> DataFrame:
    """Parse `"..."~slop` (quotes optional — bare content = slop 0) and run
    the span query. inOrder=false mirrors ComplexPhraseQParserPlugin's
    inOrder local param (unordered SpanNear instead)."""
    query = query.strip()
    slop = 0
    m = re.match(r'^"(.*)"(?:~(\d+))?$', query, re.S)
    if m:
        phrase = m.group(1)
        if m.group(2):
            slop = int(m.group(2))
    else:
        phrase = query
    node = parse_complex_phrase(searcher, phrase, slop=slop)
    if node is None:
        return searcher._empty()
    if isinstance(node, SpanNear) and not in_order:
        node = SpanNear(node.clauses, slop=node.slop, in_order=False)
    return searcher.span_search(node, k=k, filter_docs=filter_docs)

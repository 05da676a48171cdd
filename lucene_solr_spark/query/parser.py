"""Classic QueryParser subset → executable boolean query.

Covers the query shapes of the reference's query set (EnwikiQueryMaker.java:
46-72: free-text bags of words, quoted phrases, AND/OR combinations) with
classic syntax semantics (QueryParserBase.java:494-790):

- bare terms                → SHOULD clauses (default OR operator)
- `+t` / `-t`               → MUST / MUST_NOT
- `a AND b` / `a OR b` /
  `NOT a`                   → promote adjacent clauses (classic semantics)
- `"a b c"`                 → PhraseQuery (analyzed, stopword positions kept)
- `t^2.5`                   → clause boost (multiplies the clause score)
- `text:t` / `body:t`       → accepted and treated as the default text field
                              (single-field engine); other fields rejected

Each raw token is passed through the analyzer exactly as the reference does
(QueryParserBase.newFieldQuery → analyzer): a stopword query term produces
no clause; a token that analyzes to several terms becomes several clauses.

Not covered (documented non-goals for this round): parentheses grouping,
range/fuzzy/wildcard syntax (those operators exist in the SQL gate surface),
per-field boosts.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..analysis.analyzer import standard_tokenize

MUST, SHOULD, MUST_NOT = "MUST", "SHOULD", "MUST_NOT"

# `+`/`-` are operators only at clause start (start-of-string or after
# whitespace) — the classic QueryParser treats a mid-word '-' as part of the
# term ("state-of-the-art" is NOT a prohibit clause; the analyzer later
# splits it into its word parts as SHOULD clauses). A word may therefore
# contain '+'/'-' after its first character.
_TOKEN_RE = re.compile(
    r"""
    (?P<plus>(?:(?<=\s)|^)\+)
  | (?P<minus>(?:(?<=\s)|^)-)
  | (?P<phrase>"(?P<phrase_body>[^"]*)"(\^(?P<pboost>\d+(\.\d+)?))?)
  | (?P<word>[^\s+\-"^][^\s"^]*(\^(?P<wboost>\d+(\.\d+)?))?)
  | (?P<space>\s+)
    """,
    re.VERBOSE,
)

_KNOWN_FIELDS = {"text", "body"}  # aliases for the single indexed field


@dataclass
class Clause:
    occur: str  # MUST | SHOULD | MUST_NOT
    kind: str  # "term" | "phrase"
    terms: list[str] = field(default_factory=list)
    boost: float = 1.0


class QueryParseError(ValueError):
    pass


def parse(query: str) -> list[Clause]:
    """Parse classic syntax into a flat clause list."""
    clauses: list[Clause] = []
    pending_occur: str | None = None
    pending_and = False  # previous op was AND → promote prev+next to MUST

    def add(kind: str, raw: str, boost: float) -> None:
        nonlocal pending_occur, pending_and
        occur = pending_occur or SHOULD
        if kind == "phrase":
            terms = [t for _, t in standard_tokenize(raw)]
            if terms:
                clauses.append(Clause(occur, "phrase", terms, boost))
        else:
            analyzed = [t for _, t in standard_tokenize(raw)]
            for t in analyzed:  # multi-term split → multiple clauses
                clauses.append(Clause(occur, "term", [t], boost))
            if not analyzed:
                pending_occur = None
                pending_and = False
                return  # stopword/empty → clause dropped entirely
        if pending_and and len(clauses) >= 2:
            # AND promotes both neighbours (QueryParserBase AND_OPERATOR)
            for c in (clauses[-1], clauses[-2]):
                if c.occur == SHOULD:
                    c.occur = MUST
        pending_occur = None
        pending_and = False

    for m in _TOKEN_RE.finditer(query):
        if m.group("space"):
            continue
        if m.group("plus"):
            pending_occur = MUST
            continue
        if m.group("minus"):
            pending_occur = MUST_NOT
            continue
        if m.group("phrase") is not None:
            add("phrase", m.group("phrase_body"), float(m.group("pboost") or 1.0))
            continue
        word = m.group("word")
        boost = float(m.group("wboost") or 1.0)
        body = word.split("^", 1)[0]
        if body == "AND" or body == "&&":
            pending_and = True
            continue
        if body == "OR" or body == "||":
            continue  # default operator
        if body == "NOT" or body == "!":
            pending_occur = MUST_NOT
            continue
        if ":" in body:
            fld, rest = body.split(":", 1)
            if fld not in _KNOWN_FIELDS:
                raise QueryParseError(f"unknown field '{fld}' (single-field engine)")
            body = rest
        add("term", body, boost)

    return clauses

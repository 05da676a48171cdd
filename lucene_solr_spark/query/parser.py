"""Classic QueryParser → executable boolean query tree.

Covers the classic syntax surface (QueryParserBase.java:494-790):

- bare terms                → SHOULD clauses (default OR operator)
- `+t` / `-t`               → MUST / MUST_NOT (operators only at clause
                              start — mid-word '+'/'-' are term characters;
                              the analyzer splits hyphenated words)
- `a AND b` / `a OR b` /
  `NOT a`                   → promote adjacent clauses (classic semantics)
- `"a b c"`                 → PhraseQuery (analyzed, stopword positions kept)
- `(a b) AND c`             → parenthesized sub-query → nested BooleanQuery
- `[a TO b]` / `{a TO b}`   → TermRangeQuery (inclusive/exclusive ends,
                              QueryParserBase.getRangeQuery)
- `te?m` / `ter*`           → Wildcard/PrefixQuery (getWildcardQuery /
                              getPrefixQuery); executed constant-score, the
                              4.4 default MultiTermQuery rewrite
                              (CONSTANT_SCORE_AUTO_REWRITE_DEFAULT)
- `term~` / `term~1`        → FuzzyQuery (getFuzzyQuery), executed as the
                              scoring top-terms rewrite like FuzzyQuery's
                              default
- `t^2.5`                   → clause boost (multiplies the clause score)
- `text:t` / `body:t`       → the default text field; `field:t` against any
                              field of a multi-field index when parse() is
                              given the index's field names (field-generic
                              like QueryParserBase.java:494-790)

Each raw word is passed through the analyzer exactly as the reference does
(QueryParserBase.newFieldQuery → analyzer): a stopword query term produces
no clause; a token that analyzes to several terms becomes several clauses.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..analysis.analyzer import standard_tokenize

MUST, SHOULD, MUST_NOT = "MUST", "SHOULD", "MUST_NOT"

_LEX_RE = re.compile(
    r"""
    (?P<lparen>\()
  | (?P<rparen>\)(\^(?P<gboost>\d+(\.\d+)?))?)
  | (?P<plus>(?:(?<=\s)|^|(?<=\())\+)
  | (?P<minus>(?:(?<=\s)|^|(?<=\())-)
  | (?P<range>[\[\{][^\]\}]*?\sTO\s[^\]\}]*?[\]\}](\^(?P<rboost>\d+(\.\d+)?))?)
  | (?P<phrase>"(?P<phrase_body>[^"]*)"(\^(?P<pboost>\d+(\.\d+)?))?)
  | (?P<word>[^\s+\-"^()\[\]{}][^\s"^()\[\]{}]*(\^(?P<wboost>\d+(\.\d+)?))?)
  | (?P<space>\s+)
    """,
    re.VERBOSE,
)

_KNOWN_FIELDS = {"text", "body"}  # aliases for the single indexed field


@dataclass
class Clause:
    occur: str  # MUST | SHOULD | MUST_NOT
    kind: str  # term | phrase | range | prefix | wildcard | fuzzy | group
    terms: list[str] = field(default_factory=list)
    boost: float = 1.0
    children: list["Clause"] = field(default_factory=list)  # kind == group
    include_lower: bool = True  # kind == range
    include_upper: bool = True
    max_edits: int = 2  # kind == fuzzy
    field: str | None = None  # None = the default text field


class QueryParseError(ValueError):
    pass


def _strip_field(body: str, known_fields: set[str] | None = None) -> tuple[str | None, str]:
    """Split an optional `field:` prefix → (field_or_None, rest). The default
    aliases map to None; any field in `known_fields` (a multi-field index's
    field names) is carried on the clause; anything else is rejected."""
    if ":" in body:
        fld, rest = body.split(":", 1)
        if fld in _KNOWN_FIELDS:
            return None, rest
        if known_fields and fld in known_fields:
            return fld, rest
        raise QueryParseError(f"unknown field '{fld}'")
    return None, body


def parse(query: str, fields: set[str] | None = None) -> list[Clause]:
    """Parse classic syntax into a clause tree (groups nest). `fields` =
    extra addressable field names of a multi-field index."""
    clauses, rest, _ = _parse_level(query, 0, depth=0, fields=fields)
    if rest != len(query):
        raise QueryParseError(f"unbalanced ')' at offset {rest}")
    return clauses


def _parse_level(
    query: str, pos: int, depth: int, fields: set[str] | None = None
) -> tuple[list[Clause], int, float]:
    """Returns (clauses, next_pos, group_boost) — group_boost is the `)^b`
    suffix consumed by the closing paren of this level (1.0 at top level)."""
    clauses: list[Clause] = []
    pending_occur: str | None = None
    pending_and = False

    def attach(clause: Clause | None) -> None:
        nonlocal pending_occur, pending_and
        if clause is not None:
            clauses.append(clause)
            if pending_and and len(clauses) >= 2:
                # AND promotes both neighbours (QueryParserBase AND_OPERATOR)
                for c in (clauses[-1], clauses[-2]):
                    if c.occur == SHOULD:
                        c.occur = MUST
        pending_occur = None
        pending_and = False

    def add_word(raw: str, boost: float, occur: str) -> None:
        nonlocal pending_occur, pending_and
        fld, body = _strip_field(raw, fields)
        # fuzzy: trailing ~ with optional edit count (getFuzzyQuery)
        m = re.fullmatch(r"(.+?)~(\d*)", body)
        if m and "*" not in body and "?" not in body:
            term = [t for _, t in standard_tokenize(m.group(1))]
            if term:
                attach(
                    Clause(
                        occur,
                        "fuzzy",
                        [term[0]],
                        boost,
                        max_edits=int(m.group(2)) if m.group(2) else 2,
                        field=fld,
                    )
                )
            else:
                pending_occur = None
                pending_and = False
            return
        if "*" in body or "?" in body:
            pat = body.lower()
            if re.fullmatch(r"[^*?]+\*", pat):  # getPrefixQuery fast path
                attach(Clause(occur, "prefix", [pat[:-1]], boost, field=fld))
            else:
                attach(Clause(occur, "wildcard", [pat], boost, field=fld))
            return
        analyzed = [t for _, t in standard_tokenize(body)]
        if not analyzed:
            pending_occur = None
            pending_and = False
            return  # stopword/empty → clause dropped entirely
        if len(analyzed) == 1:
            attach(Clause(occur, "term", [analyzed[0]], boost, field=fld))
        else:
            # multi-token analysis → ONE group clause (newFieldQuery returns
            # a BooleanQuery of SHOULD terms), so AND/+/- treat the split as
            # a single neighbour — 'x AND foo-bar' promotes x and the group,
            # exactly like the single-token path promotes both operands
            attach(
                Clause(
                    occur,
                    "group",
                    [],
                    boost,
                    children=[Clause(SHOULD, "term", [t], 1.0, field=fld) for t in analyzed],
                )
            )

    i = pos
    n = len(query)
    while i < n:
        m = _LEX_RE.match(query, i)
        if m is None:
            i += 1  # unmatchable char (stray bracket) — skip like Lucene's lenient modes
            continue
        i = m.end()
        if m.group("space"):
            continue
        if m.group("plus"):
            pending_occur = MUST
            continue
        if m.group("minus"):
            pending_occur = MUST_NOT
            continue
        if m.group("lparen"):
            occur = pending_occur or SHOULD
            children, i, boost = _parse_level(query, i, depth + 1, fields=fields)
            if children:
                attach(Clause(occur, "group", [], boost, children=children))
            else:
                pending_occur = None
                pending_and = False
            continue
        if m.group("rparen"):
            if depth == 0:
                raise QueryParseError("unbalanced ')'")
            return clauses, i, float(m.group("gboost") or 1.0)
        if m.group("range") is not None:
            occur = pending_occur or SHOULD
            raw = m.group("range")
            boost = float(m.group("rboost") or 1.0)
            core = re.match(r"([\[\{])(.*?)\sTO\s(.*?)([\]\}])", raw, re.DOTALL)
            lo, hi = core.group(2).strip().lower(), core.group(3).strip().lower()
            attach(
                Clause(
                    occur,
                    "range",
                    [lo, hi],
                    boost,
                    include_lower=core.group(1) == "[",
                    include_upper=core.group(4) == "]",
                )
            )
            continue
        if m.group("phrase") is not None:
            occur = pending_occur or SHOULD
            terms = [t for _, t in standard_tokenize(m.group("phrase_body"))]
            if terms:
                attach(
                    Clause(occur, "phrase", terms, float(m.group("pboost") or 1.0))
                )
            else:
                pending_occur = None
                pending_and = False
            continue
        word = m.group("word")
        boost = float(m.group("wboost") or 1.0)
        body = word.split("^", 1)[0]
        if body in ("AND", "&&"):
            pending_and = True
            continue
        if body in ("OR", "||"):
            continue  # default operator
        if body in ("NOT", "!"):
            pending_occur = MUST_NOT
            continue
        add_word(body, boost, pending_occur or SHOULD)

    if depth > 0:
        raise QueryParseError("unbalanced '('")
    return clauses, i, 1.0

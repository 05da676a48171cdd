"""Surround query language — SurroundQParserPlugin parity.

Reference: solr/core/src/java/org/apache/solr/search/SurroundQParserPlugin.java
delegating to lucene/queryparser/src/java/org/apache/lucene/queryparser/
surround/parser/QueryParser.jj and surround/query/*.java:

- Infix distance: ``a 3W b`` (ordered, within 3), ``a 5N b`` (unordered);
  bare ``W``/``N`` mean distance 1; prefix forms ``3W(a, b, c)`` /
  ``N(a, b)``; distance 2-99 (QueryParser.jj:202, _DISTOP_NUM).
- Distance queries map to SpanNearQuery(slop = opDistance − 1, ordered)
  (DistanceQuery.java:100 — ``new SpanNearQuery(spanClauses,
  getOpDistance() - 1, subQueriesOrdered())``) over this engine's span
  machinery (query/spans.py).
- Boolean: infix/prefix ``AND``/``OR``/``NOT`` (lowercase variants
  accepted exactly as the grammar tokens "OR"|"or" etc.). AndQuery/
  OrQuery/NotQuery rewrite to BooleanQuery combines (SrndBooleanQuery
  .java): AND = MUST-sum, OR = SHOULD-sum, NOT = left operand minus the
  rest (non-scoring exclusion).
- Truncation: ``pre*`` prefix, ``te?m``/``t*m`` wildcard (SrndPrefixQuery
  .java, SrndTruncQuery.java) — expanded against the term dictionary with
  the same capped rewrite the engine's prefix/wildcard queries use; inside
  distance operators expansions become SpanOr alternatives
  (SpanNearClauseFactory.java:80-95), at boolean level they rewrite to a
  SHOULD-sum of term queries (SimpleTermRewriteQuery.java).
- Weights: ``term^2`` / ``(...)^3`` multiply the clause score
  (OptionalWeights, QueryParser.jj:440-450).

Differences declared: the single indexed text field means field prefixes
(``field:``) are accepted syntactically but must name the default field;
weights INSIDE distance operators are ignored (the reference folds them
into SpanNear boosts — a per-clause boost on a freq-summed span is a
no-op for ranking within one field).

Scale: parsing is driver-side string work; execution composes the span
kernel (one scan, one groupBy per distance clause) and BM25 term frames
with join/union combines — no per-doc driver loops, no global sorts
before the final top-k.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .spans import SpanNear, SpanOr, SpanTerm, span_search

# --- AST ----------------------------------------------------------------------


@dataclass(frozen=True)
class STerm:
    text: str


@dataclass(frozen=True)
class SPrefix:
    prefix: str  # pre*


@dataclass(frozen=True)
class STrunc:
    pattern: str  # with * / ? inside


@dataclass(frozen=True)
class SDist:
    dist: int
    ordered: bool
    children: tuple


@dataclass(frozen=True)
class SAnd:
    children: tuple


@dataclass(frozen=True)
class SOrNode:
    children: tuple


@dataclass(frozen=True)
class SNot:
    children: tuple  # first is positive, the rest are excluded


@dataclass(frozen=True)
class SWeight:
    node: object
    weight: float


# --- tokenizer ----------------------------------------------------------------
_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<punct>[(),:])
      | (?P<boost>\^\d+(?:\.\d+)?)
      | (?P<quoted>"[^"]+"\*?)
      | (?P<word>[^\s(),:^"]+)
    )""",
    re.VERBOSE,
)
_DISTOP_RE = re.compile(r"^(?:([2-9][0-9]?|1[0-9]))?([wWnN])$")


def _tokenize(q: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(q):
        m = _TOKEN_RE.match(q, i)
        if not m:
            if q[i:].strip() == "":
                break
            raise ValueError(f"surround: cannot tokenize at {q[i:]!r}")
        i = m.end()
        if m.group("punct"):
            out.append((m.group("punct"), m.group("punct")))
        elif m.group("boost"):
            out.append(("BOOST", m.group("boost")[1:]))
        elif m.group("quoted"):
            out.append(("QUOTED", m.group("quoted")))
        else:
            w = m.group("word")
            if w in ("OR", "or"):
                out.append(("OR", w))
            elif w in ("AND", "and"):
                out.append(("AND", w))
            elif w in ("NOT", "not"):
                out.append(("NOT", w))
            else:
                dm = _DISTOP_RE.match(w)
                if dm:
                    dist = int(dm.group(1)) if dm.group(1) else 1
                    kind = "W" if dm.group(2) in "wW" else "N"
                    out.append((kind, str(dist)))
                else:
                    out.append(("TERM", w))
    out.append(("EOF", ""))
    return out


# --- recursive-descent parser (QueryParser.jj:277-430 structure) --------------
class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i][0]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind):
        t = self.next()
        if t[0] != kind:
            raise ValueError(f"surround: expected {kind}, got {t}")
        return t

    def parse(self):
        q = self.fields_query()
        self.expect("EOF")
        return q

    def fields_query(self):
        # OptionalFields: TERM ':' prefixes — single-field engine: accepted,
        # must not rename the field (names are dropped after validation)
        while (
            self.peek() == "TERM"
            and self.toks[self.i + 1][0] == ":"
        ):
            self.next()
            self.next()
        return self.or_query()

    def or_query(self):
        q = self.and_query()
        parts = [q]
        while self.peek() == "OR":
            self.next()
            parts.append(self.and_query())
        return parts[0] if len(parts) == 1 else SOrNode(tuple(parts))

    def and_query(self):
        parts = [self.not_query()]
        while self.peek() == "AND":
            self.next()
            parts.append(self.not_query())
        return parts[0] if len(parts) == 1 else SAnd(tuple(parts))

    def not_query(self):
        parts = [self.n_query()]
        while self.peek() == "NOT":
            self.next()
            parts.append(self.n_query())
        return parts[0] if len(parts) == 1 else SNot(tuple(parts))

    def n_query(self):
        q = self.w_query()
        while self.peek() == "N":
            _, d = self.next()
            rhs = self.w_query()
            q = SDist(int(d), False, (q, rhs))  # left-associative pairs
        return q

    def w_query(self):
        q = self.primary()
        while self.peek() == "W":
            _, d = self.next()
            rhs = self.primary()
            q = SDist(int(d), True, (q, rhs))
        return q

    def primary(self):
        kind = self.peek()
        if kind == "(":
            self.next()
            q = self.fields_query()
            self.expect(")")
            return self._weights(q)
        if kind in ("W", "N", "OR", "AND"):  # prefix operator forms
            op, d = self.next()
            self.expect("(")
            children = [self.fields_query()]
            while self.peek() == ",":
                self.next()
                children.append(self.fields_query())
            self.expect(")")
            if op == "OR":
                q = SOrNode(tuple(children))
            elif op == "AND":
                q = SAnd(tuple(children))
            else:
                if len(children) < 2:
                    raise ValueError("surround: distance operator needs >= 2 operands")
                q = SDist(int(d), op == "W", tuple(children))
            return self._weights(q)
        if kind == "QUOTED":
            _, raw = self.next()
            trunc = raw.endswith("*")
            body = raw.rstrip("*").strip('"')
            q = SPrefix(body + "*") if trunc else STerm(body)
            return self._weights(q)
        if kind == "TERM":
            _, w = self.next()
            if "*" in w or "?" in w:
                if w.endswith("*") and "*" not in w[:-1] and "?" not in w:
                    q = SPrefix(w)
                else:
                    q = STrunc(w)
            else:
                q = STerm(w)
            return self._weights(q)
        raise ValueError(f"surround: unexpected token {self.toks[self.i]}")

    def _weights(self, q):
        while self.peek() == "BOOST":
            _, w = self.next()
            q = SWeight(q, float(w))
        return q


def parse_surround(q: str):
    """Parse a surround query string to the AST."""
    return _Parser(_tokenize(q)).parse()


# --- span conversion (distance-operator subtrees) ------------------------------
def _expand(searcher, node) -> list[str]:
    if isinstance(node, SPrefix):
        lit = node.prefix[:-1].replace("%", r"\%").replace("_", r"\_")
        return searcher._rewrite_terms(F.col("term").like(lit + "%"))
    rx = "^" + "".join(
        ".*" if c == "*" else "." if c == "?" else re.escape(c)
        for c in node.pattern
    ) + "$"
    return searcher._rewrite_terms(F.col("term").rlike(rx))


def _to_span(searcher, node):
    """DistanceSubQuery conversion (SpanNearClauseFactory.java:80-95):
    terms, truncations (→ SpanOr of expansions), OR, and nested distance
    queries are allowed; AND/NOT are not (DistanceQuery.
    distanceSubQueryNotAllowed)."""
    if isinstance(node, SWeight):  # weights inside distance ops: ignored
        return _to_span(searcher, node.node)
    if isinstance(node, STerm):
        analyzed = searcher.analyze_query(node.text)
        if len(analyzed) != 1:
            return None  # stopword or multi-token split: no span clause
        return SpanTerm(analyzed[0])
    if isinstance(node, (SPrefix, STrunc)):
        terms = _expand(searcher, node)
        if not terms:
            return None
        return SpanOr(tuple(SpanTerm(t) for t in terms))
    if isinstance(node, SOrNode):
        subs = [_to_span(searcher, c) for c in node.children]
        subs = [s for s in subs if s is not None]
        return SpanOr(tuple(subs)) if subs else None
    if isinstance(node, SDist):
        subs = [_to_span(searcher, c) for c in node.children]
        if any(s is None for s in subs):
            return None  # distance op requires ALL subqueries (:88-93)
        return SpanNear(tuple(subs), slop=node.dist - 1, in_order=node.ordered)
    raise ValueError(
        f"surround: operator {type(node).__name__} not allowed inside a "
        "distance operator (DistanceQuery.distanceSubQueryNotAllowed)"
    )


# --- execution -----------------------------------------------------------------
def _bm25_frame(searcher, terms: list[str]) -> DataFrame | None:
    tinfo = searcher.lookup_terms(terms)
    if tinfo.empty:
        return None
    return (
        searcher._scored(tinfo)
        .groupBy("doc_id")
        .agg(F.sum("score").cast("float").alias("score"))
    )


def _exec(searcher, node) -> DataFrame | None:
    """Scored match frame (doc_id, score) of a boolean-level node —
    SrndQuery.makeLuceneQueryField rewrite shapes."""
    if isinstance(node, SWeight):
        inner = _exec(searcher, node.node)
        if inner is None:
            return None
        w = float(np.float32(node.weight))
        return inner.select(
            "doc_id", (F.col("score") * F.lit(w)).cast("float").alias("score")
        )
    if isinstance(node, STerm):
        analyzed = searcher.analyze_query(node.text)
        return _bm25_frame(searcher, analyzed) if analyzed else None
    if isinstance(node, (SPrefix, STrunc)):
        terms = _expand(searcher, node)
        return _bm25_frame(searcher, terms) if terms else None
    if isinstance(node, SDist):
        span = _to_span(searcher, node)
        if span is None:
            return None
        return span_search(searcher, span, k=None)
    if isinstance(node, SOrNode):
        frames = [f for f in (_exec(searcher, c) for c in node.children) if f is not None]
        if not frames:
            return None
        u = frames[0]
        for f in frames[1:]:
            u = u.unionByName(f)
        return u.groupBy("doc_id").agg(F.sum("score").cast("float").alias("score"))
    if isinstance(node, SAnd):
        frames = [_exec(searcher, c) for c in node.children]
        if any(f is None for f in frames):
            return None
        u = frames[0].select("doc_id", "score")
        for f in frames[1:]:
            u = u.unionByName(f.select("doc_id", "score"))
        return (
            u.groupBy("doc_id")
            .agg(
                F.sum("score").cast("float").alias("score"),
                F.count(F.lit(1)).alias("n"),
            )
            .where(F.col("n") == len(frames))
            .select("doc_id", "score")
        )
    if isinstance(node, SNot):
        pos = _exec(searcher, node.children[0])
        if pos is None:
            return None
        for c in node.children[1:]:
            neg = _exec(searcher, c)
            if neg is not None:
                pos = pos.join(neg.select("doc_id"), "doc_id", "left_anti")
        return pos
    raise TypeError(type(node))


def surround_search(searcher, query: str, k: int = 10) -> DataFrame:
    """Parse and execute a surround query; top-k (score desc, docID asc)."""
    ast = parse_surround(query)
    scored = _exec(searcher, ast)
    if scored is None:
        return searcher._empty()
    return searcher._topk(searcher._drop_deleted(scored), k)

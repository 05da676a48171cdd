"""SynonymFilter — Solr synonyms.txt semantics.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
synonym/{SynonymFilter.java,SolrSynonymParser.java}. Two line forms
(SolrSynonymParser.java:30-60):

- equivalence class: ``i-pod, ipod, i pod`` — with expand=true (the Solr
  default) every member maps to EVERY member (itself included);
  with expand=false every member maps to the first.
- explicit mapping: ``personal computer => pc, laptop`` — LHS sequences
  map to the RHS alternatives only.

Spark-first split (the standard Solr deployment guidance):

- QUERY-TIME expansion (`expand_clauses`): a term clause whose term heads
  a rule becomes a group of SHOULD alternatives (multi-token alternatives
  become phrase clauses) — the SynonymFilter-inside-the-query-analyzer
  behavior, with no reindex needed when the map changes.
- INDEX-TIME single-token rewrite (`map_tokens_col`): a pure-codegen
  token→token map applied to the token array before inversion — the
  contracting ``a, b => c`` normalization form. Multi-token LHS/RHS at
  index time would need same-position token injection (posInc=0); that
  form is query-time-only here, and `compile_synonyms` says so.

Both sides analyze rule text with the SAME standard chain as documents
(SolrSynonymParser analyzes rules with the field analyzer).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from .analyzer import standard_tokenize


@dataclass
class SynonymMap:
    # key: first token of the LHS; value: list of (lhs_tokens, rhs_alternatives)
    # where rhs_alternatives is a list of token-sequences
    rules: dict[str, list[tuple[tuple[str, ...], list[tuple[str, ...]]]]] = field(
        default_factory=dict
    )

    def single_token_rewrites(self) -> dict[str, str]:
        """The subset usable as an index-time contraction: single-token LHS
        with exactly one single-token alternative."""
        out: dict[str, str] = {}
        for head, rules in self.rules.items():
            for lhs, alts in rules:
                if len(lhs) == 1 and len(alts) == 1 and len(alts[0]) == 1:
                    out[lhs[0]] = alts[0][0]
        return out


def _analyze_seq(text: str) -> tuple[str, ...]:
    return tuple(t for _, t in standard_tokenize(text))


def parse_synonyms(lines, expand: bool = True) -> SynonymMap:
    """SolrSynonymParser.parse: '#' comments, ',' alternatives, '=>'
    explicit mappings; rule terms go through the analyzer."""
    smap = SynonymMap()

    def add(lhs: tuple[str, ...], rhs: tuple[str, ...]) -> None:
        if not lhs or not rhs:
            return
        rules = smap.rules.setdefault(lhs[0], [])
        for existing_lhs, alts in rules:
            if existing_lhs == lhs:
                if rhs not in alts:
                    alts.append(rhs)
                return
        rules.append((lhs, [rhs]))

    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if "=>" in line:
            left, right = line.split("=>", 1)
            inputs = [_analyze_seq(s) for s in left.split(",")]
            outputs = [_analyze_seq(s) for s in right.split(",")]
            for lhs in inputs:
                for rhs in outputs:
                    add(lhs, rhs)
        else:
            members = [_analyze_seq(s) for s in line.split(",")]
            members = [m for m in members if m]
            if expand:
                for lhs in members:
                    for rhs in members:
                        add(lhs, rhs)
            else:
                for lhs in members:
                    add(lhs, members[0])
    return smap


def expand_clauses(clauses: list, smap: SynonymMap) -> list:
    """Query-time SynonymFilter: rewrite a parsed clause list so every term
    clause matching a single-token rule becomes a SHOULD group over its
    alternatives (terms or phrases). Clause occur/boost are preserved on
    the group (the alternatives inherit the match, the group inherits the
    role) — the BooleanQuery shape QueryParser produces when the analyzer
    stacks synonym tokens. Multi-token LHS rules apply only when the query
    itself phrases them; v1 matches single-token LHS (the dominant form)."""
    from ..query.parser import Clause

    out = []
    for c in clauses:
        if c.kind == "group":
            g = Clause(c.occur, "group", [], c.boost, children=expand_clauses(c.children, smap))
            out.append(g)
            continue
        if c.kind != "term" or c.terms[0] not in smap.rules:
            out.append(c)
            continue
        term = c.terms[0]
        alts: list[tuple[str, ...]] = []
        for lhs, rhss in smap.rules[term]:
            if lhs == (term,):
                for rhs in rhss:
                    if rhs not in alts:
                        alts.append(rhs)
        if not alts:
            out.append(c)
            continue
        if (term,) not in alts:
            # explicit-mapping form REPLACES the input (SynonymFilter with
            # a => rule does not keep the original term)
            pass
        children = []
        for rhs in alts:
            if len(rhs) == 1:
                children.append(Clause("SHOULD", "term", [rhs[0]], 1.0, field=c.field))
            else:
                children.append(
                    Clause("SHOULD", "phrase", list(rhs), 1.0, field=c.field)
                )
        if len(children) == 1:
            only = children[0]
            only.occur, only.boost = c.occur, c.boost
            out.append(only)
        else:
            out.append(Clause(c.occur, "group", [], c.boost, children=children))
    return out


def map_tokens_col(tokens: Column, rewrites: dict[str, str]) -> Column:
    """Index-time contraction: token → replacement via a literal MAP lookup,
    pure codegen (`a, b => c` normalization before inversion)."""
    if not rewrites:
        return tokens
    pairs = []
    for k, v in sorted(rewrites.items()):
        pairs.extend([F.lit(k), F.lit(v)])
    m = F.create_map(*pairs)
    return F.transform(tokens, lambda t: F.coalesce(m[t], t))

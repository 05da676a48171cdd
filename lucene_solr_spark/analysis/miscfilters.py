"""Miscellaneous token filters — pure-codegen array expressions.

References (lucene/analysis/common/src/java/org/apache/lucene/analysis/):
- miscellaneous/LengthFilter.java:31-50 — keep tokens whose length lies in
  [min, max]; a FilteringTokenFilter, so removed tokens consume positions
  (enablePositionIncrements=true is the only 4.4 behavior).
- miscellaneous/TrimFilter.java:33 — strip leading/trailing whitespace.
- pattern/PatternReplaceFilter.java:40 — regex replace inside each token
  (replaceAll / first-occurrence modes).
- miscellaneous/KeywordMarkerFilter.java — mark protected words so
  stemmers skip them; here a predicate helper for the English chain.
- reverse/ReverseStringFilter.java:44 — reverse each token (the front half
  of the leading-wildcard trick; see Searcher.build_reversed_dictionary).

All operate on the analyzer's array<string> token column inside
whole-stage codegen — no Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def length_filter(tokens: Column, min_len: int, max_len: int) -> Column:
    """LengthFilter.accept (LengthFilter.java:48-50): len in [min, max]."""
    return F.filter(
        tokens,
        lambda t: (F.length(t) >= min_len) & (F.length(t) <= max_len),
    )


def trim_filter(tokens: Column) -> Column:
    """TrimFilter: whitespace-trim each token (empty results kept, like
    the reference, which never removes a token)."""
    return F.transform(tokens, lambda t: F.trim(t))


def pattern_replace(
    tokens: Column, pattern: str, replacement: str, replace_all: bool = True
) -> Column:
    """PatternReplaceFilter: regex substitution inside each token.
    replace_all=False replaces only the first occurrence
    (Matcher.replaceFirst), done by anchoring a lazy prefix group."""
    if replace_all:
        return F.transform(tokens, lambda t: F.regexp_replace(t, pattern, replacement))
    first = f"^((?:(?!{pattern}).)*?){pattern}"
    return F.transform(
        tokens, lambda t: F.regexp_replace(t, first, "$1" + replacement)
    )


def reverse_filter(tokens: Column) -> Column:
    """ReverseStringFilter (ReverseStringFilter.java:44)."""
    return F.transform(tokens, lambda t: F.reverse(t))

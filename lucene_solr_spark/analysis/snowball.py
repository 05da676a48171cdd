"""Shared helpers for the Snowball stemmer family.

Every stemmer in this package is a RE-DERIVATION of Dr. Martin Porter's
published snowball algorithms (snowballstem.org); the reference ships
machine-generated stack-machine code from the same definitions
(lucene/analysis/common/src/java/org/tartarus/snowball/ext/*.java). Each
Python stemmer is fuzz-verified byte-identical against the reference's own
compiled code via tools/stemmer_oracle.py.

Conventions (SnowballProgram.java:33):
- regions are start OFFSETS into the original word; suffix-side deletions
  never move surviving prefix chars, so offsets stay valid as the word
  shrinks.
- "suffix in R1" == word ends with it AND the suffix starts at >= p1
  (find_among_b under `setlimit tomark p1`).
- among() picks the LONGEST entry that fully matches within the limit;
  a failed post-match condition fails the whole rule (no shorter-entry
  fallback).
"""

from __future__ import annotations


def mark_r1(word: str, vowels: frozenset[str], min_prefix: int = 0) -> int:
    """p1 = offset after the first non-vowel that follows a vowel, floored
    at `min_prefix` (the scandinavian `hop 3 setmark x` idiom); len(word)
    when no such position exists."""
    n = len(word)
    if min_prefix and n < min_prefix:
        return n
    i = 0
    while i < n and word[i] not in vowels:
        i += 1
    while i < n and word[i] in vowels:
        i += 1
    if i >= n:
        return n
    return max(i + 1, min_prefix)


def next_region(word: str, start: int, vowels: frozenset[str]) -> int:
    """R2 from R1 (or R1 from 0): region after the first non-vowel following
    a vowel, scanning from `start`."""
    n = len(word)
    i = start
    while i < n and word[i] not in vowels:
        i += 1
    while i < n and word[i] in vowels:
        i += 1
    return n if i >= n else i + 1


def spanish_rv(s: str, vowels: frozenset[str]) -> int:
    """The Spanish-family RV: second letter consonant → after next vowel;
    first two letters vowels → after next non-vowel; consonant+vowel →
    after the third letter; len(s) when unfindable."""
    n = len(s)
    if n < 2:
        return n
    if s[0] in vowels:
        if s[1] not in vowels:
            i = 2
            while i < n and s[i] not in vowels:
                i += 1
            return n if i >= n else i + 1
        i = 2
        while i < n and s[i] in vowels:
            i += 1
        return n if i >= n else i + 1
    if s[1] not in vowels:
        i = 2
        while i < n and s[i] not in vowels:
            i += 1
        return n if i >= n else i + 1
    return 3 if n > 2 else n


def longest_suffix(
    word: str, table: list[tuple[str, int]], limit: int
) -> tuple[str, int] | None:
    """(suffix, class) of the longest table entry that ends `word` with its
    start offset >= limit; None if nothing matches. `table` must be sorted
    longest-first."""
    for suf, cls in table:
        if word.endswith(suf) and len(word) - len(suf) >= limit:
            return suf, cls
    return None


def sort_table(table: list[tuple[str, int]]) -> list[tuple[str, int]]:
    return sorted(table, key=lambda p: -len(p[0]))

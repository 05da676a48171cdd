"""Bulgarian light stemmer.

Reference chain (BulgarianAnalyzer.java:123-129): StandardTokenizer →
LowerCase → Stop(bg/stopwords.txt, '#') → BulgarianStemFilter. Re-derives
BulgarianStemmer.java:40-139 (Savoy, "Searching Strategies for the
Bulgarian Language"): article removal → plural removal → final-vowel drops
→ ен→н → ъN→N. Fuzz-verified byte-identical via tools/stemmer_oracle.py.
"""

from __future__ import annotations


def _remove_article(s: str) -> str:
    n = len(s)
    if n > 6 and s.endswith("ият"):
        return s[:-3]
    if n > 5 and s.endswith(("ът", "то", "те", "та", "ия")):
        return s[:-2]
    if n > 4 and s.endswith("ят"):
        return s[:-2]
    return s


def _remove_plural(s: str) -> str:
    n = len(s)
    if n > 6:
        if s.endswith("овци"):
            return s[:-3]
        if s.endswith("ове"):
            return s[:-3]
        if s.endswith("еве"):
            return s[:-3] + "й"
    if n > 5:
        if s.endswith("ища"):
            return s[:-3]
        if s.endswith("та"):
            return s[:-2]
        if s.endswith("ци"):
            return s[:-2] + "к"
        if s.endswith("зи"):
            return s[:-2] + "г"
        if s[-3] == "е" and s[-1] == "и":
            return s[:-3] + "я" + s[-2]   # е→я, drop final и
    if n > 4:
        if s.endswith("си"):
            return s[:-2] + "х"
        if s.endswith("и"):
            return s[:-1]
    return s


def bulgarian_stem(word: str) -> str:
    if len(word) < 4:
        return word
    if len(word) > 5 and word.endswith("ища"):
        return word[:-3]
    s = _remove_article(word)
    s = _remove_plural(s)
    if len(s) > 3:
        if s.endswith("я"):
            s = s[:-1]
        if s.endswith(("а", "о", "е")):
            s = s[:-1]
    if len(s) > 4 and s.endswith("ен"):
        s = s[:-2] + "н"
    if len(s) > 5 and s[-2] == "ъ":
        s = s[:-2] + s[-1]
    return s

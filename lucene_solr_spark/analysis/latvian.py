"""Latvian light stemmer.

Reference chain (LatvianAnalyzer.java:121-127): StandardTokenizer →
LowerCase → Stop(lv/stopwords.txt) → LatvianStemFilter. Re-derives
LatvianStemmer.java:36-173 (light version of Kreslins' thesis algorithm):
first matching affix whose removal leaves >= 3 chars and more vowels in the
word than in the affix; declension II/V/VI suffixes additionally fire
un-palatalization. Fuzz-verified byte-identical via tools/stemmer_oracle.py.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouāīēū")

# (affix, vowel-count, palatalizes) in the reference's evaluation order
_AFFIXES = [
    ("ajiem", 3, False), ("ajai", 3, False),
    ("ajam", 2, False), ("ajām", 2, False),
    ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False),
    ("ais", 2, False), ("ai", 2, False),
    ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False),
    ("īm", 1, False), ("im", 1, False),
    ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False),
    ("es", 1, False), ("os", 1, True),
    ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False),
    ("ie", 1, False), ("u", 1, True),
    ("a", 1, True), ("i", 1, True),
    ("e", 1, False), ("ā", 1, False),
    ("ē", 1, False), ("ī", 1, False),
    ("ū", 1, False), ("o", 1, False),
    ("s", 0, False), ("š", 0, False),
]


def _unpalatalize(s: str, removed: str) -> str:
    # the char just removed decides the gen-pl-only rules (:101-114)
    if removed == "u":
        if s.endswith("kš"):
            return s[:-2] + "kst"
        if s.endswith("ņņ"):
            return s[:-2] + "nn"
    if s.endswith(("pj", "bj", "mj", "vj")):
        return s[:-1]
    for pair, rep in (("šņ", "sn"), ("žņ", "zn"), ("šļ", "sl"),
                      ("žļ", "zl"), ("ļņ", "ln"), ("ļļ", "ll")):
        if s.endswith(pair):
            return s[:-2] + rep
    if s.endswith("č"):
        return s[:-1] + "c"
    if s.endswith("ļ"):
        return s[:-1] + "l"
    if s.endswith("ņ"):
        return s[:-1] + "n"
    return s


def latvian_stem(word: str) -> str:
    num_vowels = sum(1 for c in word if c in _VOWELS)
    for affix, vc, palatalizes in _AFFIXES:
        if (num_vowels > vc and len(word) >= len(affix) + 3
                and word.endswith(affix)):
            stem = word[: -len(affix)]
            return _unpalatalize(stem, word[len(stem)]) if palatalizes \
                else stem
    return word

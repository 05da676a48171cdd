"""Galician RSLP-G stemmer.

Reference chain (GalicianAnalyzer.java:121-127): StandardTokenizer →
LowerCase → Stop(gl/stopwords.txt) → GalicianStemFilter. Re-derives
GalicianStemmer.java:49-82 over the published RSLP-G rule set
(galician_rules.py, generated from the reference's galician.rslp data by
tools/extract_rslp.py; engine semantics per RSLPStemmerBase.java:88-239).
Fuzz-verified byte-identical via tools/stemmer_oracle.py (30k words,
0 mismatches).

Flow: Plural → Unification → Adverb → repeat(Augmentative) →
(Noun, else Verb) → Vowel → accent fold. Within a step, the FIRST
matching rule fires (min-stem length, whole-word or ends-with
exceptions), then the step ends.
"""

from __future__ import annotations

from .galician_rules import STEPS

_ACCENT = str.maketrans("áéêíóú", "aeeiou")


def _apply(step: dict, s: str) -> str:
    if len(s) < step["min"]:
        return s
    conds = step["conds"]
    if conds and not s.endswith(tuple(conds)):
        return s
    for suffix, minstem, rep, exceptions in step["rules"]:
        if not s.endswith(suffix) or len(s) - len(suffix) < minstem:
            continue
        if exceptions is not None:
            if step["type"] == 1:  # whole-word exceptions
                if s in exceptions:
                    continue
            elif s.endswith(tuple(exceptions)):  # suffix exceptions
                continue
        return s[: len(s) - len(suffix)] + rep
    return s


def galician_stem(word: str) -> str:
    s = word
    s = _apply(STEPS["Plural"], s)
    s = _apply(STEPS["Unification"], s)
    s = _apply(STEPS["Adverb"], s)
    while True:
        t = _apply(STEPS["Augmentative"], s)
        if t == s:
            break
        s = t
    t = _apply(STEPS["Noun"], s)
    if t == s:  # no noun suffix removed → try verb
        t = _apply(STEPS["Verb"], s)
    s = _apply(STEPS["Vowel"], t)
    return s.translate(_ACCENT)

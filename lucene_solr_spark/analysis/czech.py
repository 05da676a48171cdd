"""Czech light stemmer.

Reference chain (CzechAnalyzer.java:139-147): StandardTokenizer → LowerCase
→ Stop(cz/stopwords.txt, '#') → CzechStemFilter. The stemmer re-derives
CzechStemmer.java:44-169 (Dolamic & Savoy, "Indexing and stemming approaches
for the Czech language"): case-ending removal → possessive removal →
palatalization normalize. Fuzz-verified byte-identical via
tools/stemmer_oracle.py.
"""

from __future__ import annotations

_CASE_5 = ("atech",)
_CASE_4 = ("ětem", "etem", "atům")
_CASE_3 = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
           "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
           "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
_CASE_2 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
           "mi", "ou")
_CASE_1 = frozenset("aeiouůyáéíýě")
_POSS = ("ov", "in", "ův")


def _remove_case(s: str) -> str:
    n = len(s)
    if n > 7 and s.endswith(_CASE_5):
        return s[:-5]
    if n > 6 and s.endswith(_CASE_4):
        return s[:-4]
    if n > 5 and s.endswith(_CASE_3):
        return s[:-3]
    if n > 4 and s.endswith(_CASE_2):
        return s[:-2]
    if n > 3 and s[-1] in _CASE_1:
        return s[:-1]
    return s


def _normalize(s: str) -> str:
    if s.endswith("čt"):
        return s[:-2] + "ck"
    if s.endswith("št"):
        return s[:-2] + "sk"
    last = s[-1]
    if last in ("c", "č"):
        return s[:-1] + "k"
    if last in ("z", "ž"):
        return s[:-1] + "h"
    if len(s) > 1 and s[-2] == "e":
        return s[:-2] + s[-1]          # e* → *
    if len(s) > 2 and s[-2] == "ů":
        return s[:-2] + "o" + s[-1]    # *ů* → *o*
    return s


def czech_stem(word: str) -> str:
    s = _remove_case(word)
    if len(s) > 5 and s.endswith(_POSS):
        s = s[:-2]
    if s:
        s = _normalize(s)
    return s

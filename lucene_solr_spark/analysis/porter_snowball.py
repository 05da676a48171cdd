"""Porter (snowball dialect) — SnowballPorterFilterFactory
language="Porter". Distinct from BOTH Lucene's hand-coded PorterStemmer
(analysis/english.py, used by EnglishAnalyzer) and Porter2
(english_snowball.py): this is the snowball-project retrofit of the 1980
algorithm (org.tartarus.snowball.ext.PorterStemmer).

Tables read as data from the generated PorterStemmer.java:19-60.
Byte-identical on the TestSnowballVocabData porter vocabulary (30,428
words).
"""

from __future__ import annotations

from .snowball import next_region, sort_table

_V = frozenset("aeiouy")
_V_WXY = _V | frozenset("wxY")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

_STEP2 = sort_table([
    ("anci", 3), ("enci", 2), ("abli", 4), ("eli", 6), ("alli", 9),
    ("ousli", 12), ("entli", 5), ("aliti", 10), ("biliti", 14),
    ("iviti", 13), ("tional", 1), ("ational", 8), ("alism", 10),
    ("ation", 8), ("ization", 7), ("izer", 7), ("ator", 8),
    ("iveness", 13), ("fulness", 11), ("ousness", 12),
])
_STEP2_REP = {1: "tion", 2: "ence", 3: "ance", 4: "able", 5: "ent",
              6: "e", 7: "ize", 8: "ate", 9: "al", 10: "al", 11: "ful",
              12: "ous", 13: "ive", 14: "ble"}
_STEP3 = sort_table([("icate", 2), ("ative", 3), ("alize", 1),
                     ("iciti", 2), ("ical", 2), ("ful", 3), ("ness", 3)])
_STEP3_REP = {1: "al", 2: "ic", 3: ""}
_STEP4 = sort_table([(s, 1) for s in (
    "ic ance ence able ible ate ive ize iti al ism er ous ant ent ment "
    "ement ou").split()] + [("ion", 2)])


def _shortv(s: str, at: int) -> bool:
    return (at >= 3 and s[at - 1] not in _V_WXY and s[at - 2] in _V
            and s[at - 3] not in _V)


def porter_snowball_stem(word: str) -> str:
    w = list(word)
    y_found = False
    if w and w[0] == "y":
        w[0] = "Y"
        y_found = True
    for j in range(1, len(w)):
        if w[j] == "y" and w[j - 1] in _V:
            w[j] = "Y"
            y_found = True
    s = "".join(w)

    p1 = next_region(s, 0, _V)
    p2 = next_region(s, p1, _V)

    # Step 1a
    if s.endswith("sses"):
        s = s[:-2]
    elif s.endswith("ies"):
        s = s[:-3] + "i"
    elif s.endswith("ss"):
        pass
    elif s.endswith("s"):
        s = s[:-1]

    # Step 1b
    if s.endswith("eed"):
        if len(s) - 3 >= p1:
            s = s[:-1]
    elif s.endswith(("ed", "ing")):
        cut = 2 if s.endswith("ed") else 3
        stem_part = s[:-cut]
        if any(c in _V for c in stem_part):
            s = stem_part
            if s.endswith(("at", "bl", "iz")):
                s = s + "e"
            elif s.endswith(_DOUBLES):
                s = s[:-1]
            elif len(s) == p1 and _shortv(s, len(s)):
                s = s + "e"

    # Step 1c: final y/Y with ANY vowel before it
    if s.endswith(("y", "Y")) and any(c in _V for c in s[:-1]):
        s = s[:-1] + "i"

    # Step 2 (R1)
    for suf, cls in _STEP2:
        if s.endswith(suf):
            if len(s) - len(suf) >= p1:
                s = s[: -len(suf)] + _STEP2_REP[cls]
            break

    # Step 3 (R1)
    for suf, cls in _STEP3:
        if s.endswith(suf):
            if len(s) - len(suf) >= p1:
                s = s[: -len(suf)] + _STEP3_REP[cls]
            break

    # Step 4 (R2)
    for suf, cls in _STEP4:
        if s.endswith(suf):
            st = len(s) - len(suf)
            if st >= p2:
                if cls == 1 or (st >= 1 and s[st - 1] in ("s", "t")):
                    s = s[:st]
            break

    # Step 5a
    if s.endswith("e"):
        st = len(s) - 1
        if st >= p2 or (st >= p1 and not _shortv(s, st)):
            s = s[:st]
    # Step 5b
    if s.endswith("ll") and len(s) - 1 >= p2:
        s = s[:-1]

    return s.replace("Y", "y") if y_found else s

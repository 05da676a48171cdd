"""English Snowball stemmer (Porter2) — the SnowballPorterFilterFactory
language="English" stemmer (the default EnglishAnalyzer uses the original
PorterStemFilter, analysis/english.py).

Re-derived from the published snowball algorithm
(snowballstem.org/algorithms/english/stemmer.html); tables and the 4.4
revision's specifics read as data from the generated
EnglishStemmer.java:19-120. Byte-identical on the TestSnowballVocabData
english vocabulary and 30k-word compiled-oracle fuzz
(tools/stemmer_oracle.py).
"""

from __future__ import annotations

from .snowball import sort_table

_V = frozenset("aeiouy")
_V_WXY = _V | frozenset("wxY")
_VALID_LI = frozenset("cdeghkmnrt")

_EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXC2 = frozenset(("inning", "outing", "canning", "herring", "earring",
                   "proceed", "exceed", "succeed"))
_R1_PREFIXES = ("gener", "commun", "arsen")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

_STEP2 = sort_table([
    ("anci", 3), ("enci", 2), ("ogi", 13), ("li", 16), ("bli", 12),
    ("abli", 4), ("alli", 8), ("fulli", 14), ("lessli", 15),
    ("ousli", 10), ("entli", 5), ("aliti", 8), ("biliti", 12),
    ("iviti", 11), ("tional", 1), ("ational", 7), ("alism", 8),
    ("ation", 7), ("ization", 6), ("izer", 6), ("ator", 7),
    ("iveness", 11), ("fulness", 9), ("ousness", 10),
])
_STEP2_REP = {1: "tion", 2: "ence", 3: "ance", 4: "able", 5: "ent",
              6: "ize", 7: "ate", 8: "al", 9: "ful", 10: "ous",
              11: "ive", 12: "ble", 14: "ful", 15: "less"}
_STEP3 = sort_table([
    ("icate", 4), ("ative", 6), ("alize", 3), ("iciti", 4), ("ical", 4),
    ("tional", 1), ("ational", 2), ("ful", 5), ("ness", 5),
])
_STEP4 = sort_table([(s, 1) for s in (
    "ic ance ence able ible ate ive ize iti al ism er ous ant ent ment "
    "ement").split()] + [("ion", 2)])


def _shortv(s: str, at: int) -> bool:
    """shortv at backward position `at` (EnglishStemmer.java:51-52):
    (non-WXY, v, non-v) ending at `at`, or (non-v, v) at word start."""
    if at >= 3 and s[at - 1] not in _V_WXY and s[at - 2] in _V \
            and s[at - 3] not in _V:
        return True
    return at == 2 and s[1] not in _V and s[0] in _V


def english_snowball_stem(word: str) -> str:
    exc = _EXC1.get(word)
    if exc is not None:
        return exc
    if len(word) < 3:
        return word

    # prelude: strip ONE leading ', y-as-consonant markers
    s = word
    if s.startswith("'"):
        s = s[1:]
    y_found = False
    w = list(s)
    if w and w[0] == "y":
        w[0] = "Y"
        y_found = True
    for j in range(1, len(w)):
        if w[j] == "y" and w[j - 1] in _V:
            w[j] = "Y"
            y_found = True
    s = "".join(w)

    # mark_regions: special prefixes force p1 right after them
    n = len(s)
    p1 = p2 = n
    i = None
    for pre in _R1_PREFIXES:
        if s.startswith(pre):
            i = len(pre)
            break
    if i is None:
        i = 0
        while i < n and s[i] not in _V:
            i += 1
        while i < n and s[i] in _V:
            i += 1
        i = None if i >= n else i + 1
    if i is not None:
        p1 = i
        j = i
        while j < n and s[j] not in _V:
            j += 1
        while j < n and s[j] in _V:
            j += 1
        if j < n:
            p2 = j + 1

    def r1(pos: int) -> bool:
        return pos >= p1

    def r2(pos: int) -> bool:
        return pos >= p2

    # Step 1a: apostrophe suffixes, then sses/ied/ies/s
    for suf in ("'s'", "'s", "'"):
        if s.endswith(suf):
            s = s[: -len(suf)]
            break
    if s.endswith("sses"):
        s = s[:-2]
    elif s.endswith(("ied", "ies")):
        # > 1 letter before the suffix → i, else → ie
        s = s[:-3] + ("i" if len(s) - 3 > 1 else "ie")
    elif s.endswith(("ss", "us")):
        pass
    elif s.endswith("s"):
        # delete when a vowel exists before the penultimate position
        if any(c in _V for c in s[: -2]):
            s = s[:-1]

    if s in _EXC2:
        return s.replace("Y", "y") if y_found else s

    # Step 1b
    m = next((suf for suf in ("eedly", "ingly", "edly", "eed", "ing", "ed")
              if s.endswith(suf)), None)
    if m in ("eed", "eedly"):
        if r1(len(s) - len(m)):
            s = s[: -len(m)] + "ee"
    elif m is not None:
        stem_part = s[: -len(m)]
        if any(c in _V for c in stem_part):
            s = stem_part
            if s.endswith(("at", "bl", "iz")):
                s = s + "e"
            elif s.endswith(_DOUBLES):
                s = s[:-1]
            elif len(s) == p1 and _shortv(s, len(s)):
                s = s + "e"

    # Step 1c: final y/Y after a non-vowel that is not the first char
    if (len(s) >= 3 and s[-1] in ("y", "Y") and s[-2] not in _V):
        s = s[:-1] + "i"

    # Step 2 (R1)
    for suf, cls in _STEP2:
        if s.endswith(suf):
            st = len(s) - len(suf)
            if r1(st):
                if cls == 13:   # ogi after l → og
                    if st >= 1 and s[st - 1] == "l":
                        s = s[:st] + "og"
                elif cls == 16:  # li after valid_LI → delete
                    if st >= 1 and s[st - 1] in _VALID_LI:
                        s = s[:st]
                else:
                    s = s[:st] + _STEP2_REP[cls]
            break

    # Step 3 (R1; ative needs R2)
    for suf, cls in _STEP3:
        if s.endswith(suf):
            st = len(s) - len(suf)
            if r1(st):
                if cls == 1:
                    s = s[:st] + "tion"
                elif cls == 2:
                    s = s[:st] + "ate"
                elif cls == 3:
                    s = s[:st] + "al"
                elif cls == 4:
                    s = s[:st] + "ic"
                elif cls == 5:
                    s = s[:st]
                elif r2(st):
                    s = s[:st]
            break

    # Step 4 (R2); ion only after s/t
    for suf, cls in _STEP4:
        if s.endswith(suf):
            st = len(s) - len(suf)
            if r2(st):
                if cls == 1:
                    s = s[:st]
                elif st >= 1 and s[st - 1] in ("s", "t"):
                    s = s[:st]
            break

    # Step 5
    if s.endswith("e"):
        st = len(s) - 1
        if r2(st) or (r1(st) and not _shortv(s, st)):
            s = s[:st]
    elif s.endswith("l"):
        st = len(s) - 1
        if r2(st) and st >= 1 and s[st - 1] == "l":
            s = s[:st]

    return s.replace("Y", "y") if y_found else s

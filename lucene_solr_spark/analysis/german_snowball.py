"""German and German2 Snowball stemmers — the SnowballPorterFilterFactory
language="German"/"German2" stemmers (the default GermanAnalyzer uses
GermanNormalization + GermanLightStemmer, analysis/lang.py).

Re-derived from the published snowball algorithms; tables read as data
from the generated GermanStemmer.java:19-70 / German2Stemmer.java:19-75.
German2 additionally folds ae/oe/ue → ä/ö/ü in the prelude (skipping a
'qu' pair), AFTER the u/y-between-vowels marking. Byte-identical on the
TestSnowballVocabData german/german2 vocabularies and 30k-word
compiled-oracle fuzz (tools/stemmer_oracle.py).
"""

from __future__ import annotations

_V = frozenset("aeiouyäöü")
_S_ENDING = frozenset("bdfghklmnrt")   # g_s_ending {117,30,5} from 'b'
_ST_ENDING = frozenset("bdfghklmnt")   # g_st_ending {117,30,4}
_POSTLUDE = str.maketrans({"Y": "y", "U": "u", "ä": "a", "ö": "o",
                           "ü": "u"})
_PART_A = ("ern", "em", "en", "er", "es", "e", "s")
_PART_B = ("est", "en", "er", "st")
_PART_C = ("lich", "isch", "heit", "keit", "end", "ung", "ig", "ik")


def _mark_uy(w: list[str]) -> None:
    """u/y between vowels act as consonants (U/Y markers)."""
    for j in range(1, len(w) - 1):
        if w[j - 1] in _V and w[j + 1] in _V:
            if w[j] == "u":
                w[j] = "U"
            elif w[j] == "y":
                w[j] = "Y"


def _stem_body(s: str) -> str:
    """mark_regions + standard_suffix + postlude, shared by both
    variants (GermanStemmer.java:74-120)."""
    n = len(s)
    p1 = p2 = n
    i = 0
    while i < n and s[i] not in _V:
        i += 1
    while i < n and s[i] in _V:
        i += 1
    if i < n:
        p1 = max(i + 1, 3)
        j = p1 if p1 > i + 1 else i + 1
        # p2 continues from the TRUE p1 position (cursor), not the floored
        j = i + 1
        while j < n and s[j] not in _V:
            j += 1
        while j < n and s[j] in _V:
            j += 1
        if j < n:
            p2 = j + 1

    # part A (R1): e/em/en/ern/er/es delete; s after s_ending
    for suf in _PART_A:
        if s.endswith(suf):
            st = len(s) - len(suf)
            if st >= p1:
                if suf == "s":
                    if st >= 1 and s[st - 1] in _S_ENDING:
                        s = s[:st]
                else:
                    s = s[:st]
            break

    # part B (R1): en/er/est delete; st after st_ending with >= 3 before
    for suf in _PART_B:
        if s.endswith(suf):
            st = len(s) - len(suf)
            if st >= p1:
                if suf == "st":
                    # in_grouping consumes the st-ending char, THEN hop 3:
                    # at least 3 more chars must precede it (st >= 4)
                    if st >= 4 and s[st - 1] in _ST_ENDING:
                        s = s[:st]
                else:
                    s = s[:st]
            break

    # part C (R2)
    for suf in _PART_C:
        if s.endswith(suf):
            st = len(s) - len(suf)
            if st >= p2:
                if suf in ("end", "ung"):
                    s = s[:st]
                    if s.endswith("ig") and not s.endswith("eig") \
                            and len(s) - 2 >= p2:
                        s = s[:-2]
                elif suf in ("ig", "ik", "isch"):
                    if not (st >= 1 and s[st - 1] == "e"):
                        s = s[:st]
                elif suf in ("lich", "heit"):
                    s = s[:st]
                    if s.endswith(("er", "en")) and len(s) - 2 >= p1:
                        s = s[:-2]
                else:  # keit
                    s = s[:st]
                    for suf2 in ("lich", "ig"):
                        if s.endswith(suf2) and len(s) - len(suf2) >= p2:
                            s = s[: -len(suf2)]
                            break
            break

    return s.translate(_POSTLUDE)


def german_snowball_stem(word: str) -> str:
    # prelude: ß → ss, then u/y between vowels → U/Y
    s = word.replace("ß", "ss")
    w = list(s)
    _mark_uy(w)
    return _stem_body("".join(w))


def german2_snowball_stem(word: str) -> str:
    # prelude: u/y marking FIRST, then ß→ss + ae/oe/ue folds ('qu' skips)
    w = list(word)
    _mark_uy(w)
    out: list[str] = []
    i, n = 0, len(w)
    while i < n:
        two = "".join(w[i: i + 2])
        if w[i] == "ß":
            out.append("ss")
            i += 1
        elif two == "qu":
            # 'qu' + hop 2: the TWO chars after qu are skipped verbatim;
            # when fewer than 2 remain the whole folding pass stops
            if i + 4 > n:
                out.extend(w[i:])
                break
            out.extend(w[i: i + 4])
            i += 4
        elif two == "ae":
            out.append("ä")
            i += 2
        elif two == "oe":
            out.append("ö")
            i += 2
        elif two == "ue":
            out.append("ü")
            i += 2
        else:
            out.append(w[i])
            i += 1
    return _stem_body("".join(out))

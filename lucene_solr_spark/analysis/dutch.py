"""Dutch Snowball stemmer.

Reference chain (DutchAnalyzer.java:192-200): StandardTokenizer → LowerCase
→ Stop(dutch_stop.txt) → SnowballFilter(org.tartarus.snowball.ext.
DutchStemmer). Re-derived from the published snowball algorithm
(snowballstem.org/algorithms/dutch/stemmer.html); suffix tables and
groupings read as data from the generated DutchStemmer.java:19-75.
Fuzz-verified byte-identical via tools/stemmer_oracle.py and the
TestSnowballVocabData.zip dutch vocabulary.

Shape: prelude (accent fold; i-between-vowels → I, y-after-vowel and
initial y → Y, so they act as consonants), R1 (floored at 3) / R2, five
backward suffix steps, postlude (I/Y → i/y).
"""

from __future__ import annotations

from .snowball import next_region

_V = frozenset("aeiouyè")
_V_I = _V | {"I"}          # g_v_I (DutchStemmer.java:73)
_V_J = _V | {"j"}          # g_v_j (DutchStemmer.java:75)
_FOLD = str.maketrans("áäéëíïóöúü", "aaeeiioouu")
_DOUBLE_CONS = ("kk", "dd", "tt")
_DOUBLE_VOWEL = ("aa", "ee", "oo", "uu")
# a_3 / a_4, longest-first (find_among_b longest-match, no shorter fallback)
_STEP1 = ("heden", "ene", "se", "en", "s")
_STEP4 = ("baar", "lijk", "end", "ing", "bar", "ig")


def _undouble(s: str) -> str:
    return s[:-1] if s.endswith(_DOUBLE_CONS) else s


def dutch_stem(word: str) -> str:
    # prelude (:41-61)
    w = list(word.translate(_FOLD))
    n = len(w)
    if n and w[0] == "y":
        w[0] = "Y"
    for j in range(1, n):
        if w[j - 1] in _V:
            if w[j] == "i" and j + 1 < n and w[j + 1] in _V:
                w[j] = "I"
            elif w[j] == "y":
                w[j] = "Y"
    s = "".join(w)

    # regions (:64-71): R1 floored at 3
    p1 = next_region(s, 0, _V)
    p2 = next_region(s, p1, _V)
    if p1 < 3:
        p1 = 3

    def en_ending(t: str, st: int) -> str | None:
        """delete suffix at offset st when in R1, after a non-vowel, not
        after 'gem'; then undouble (:101-103). None = conditions failed."""
        if st >= p1 and st >= 1 and t[st - 1] not in _V \
                and t[st - 3: st] != "gem":
            return _undouble(t[:st])
        return None

    # step 1 (:107-117)
    m = next((suf for suf in _STEP1 if s.endswith(suf)), None)
    if m == "heden":
        if len(s) - 5 >= p1:
            s = s[:-5] + "heid"
    elif m in ("ene", "en"):
        t = en_ending(s, len(s) - len(m))
        if t is not None:
            s = t
    elif m in ("se", "s"):
        st = len(s) - len(m)
        if st >= p1 and st >= 1 and s[st - 1] not in _V_J:
            s = s[:st]

    # step 2: e_ending (:94-98,120)
    e_found = False
    if s.endswith("e") and len(s) - 1 >= p1 and len(s) >= 2 \
            and s[-2] not in _V:
        s = _undouble(s[:-1])
        e_found = True

    # step 3 (:122-123): heid in R2 not after 'c'; deletion sticks even if
    # the follow-on en_ending fails
    if s.endswith("heid") and len(s) - 4 >= p2 \
            and not (len(s) >= 5 and s[-5] == "c"):
        s = s[:-4]
        if s.endswith("en"):
            t = en_ending(s, len(s) - 2)
            if t is not None:
                s = t

    # step 4 (:127-142)
    m = next((suf for suf in _STEP4 if s.endswith(suf)), None)
    if m in ("end", "ing"):
        if len(s) - 3 >= p2:
            s = s[:-3]
            if s.endswith("ig") and len(s) - 2 >= p2 \
                    and not (len(s) >= 3 and s[-3] == "e"):
                s = s[:-2]
            else:
                s = _undouble(s)
    elif m == "ig":
        if len(s) - 2 >= p2 and not (len(s) >= 3 and s[-3] == "e"):
            s = s[:-2]
    elif m == "lijk":
        if len(s) - 4 >= p2:
            s = s[:-4]
            if s.endswith("e") and len(s) - 1 >= p1 and len(s) >= 2 \
                    and s[-2] not in _V:
                s = _undouble(s[:-1])
    elif m == "baar":
        if len(s) - 4 >= p2:
            s = s[:-4]
    elif m == "bar":
        if len(s) - 3 >= p2 and e_found:
            s = s[:-3]

    # step 5 (:146-152): C + doubled aa/ee/oo/uu + final consonant → drop
    # one of the doubled vowels
    if (len(s) >= 4 and s[-1] not in _V_I
            and s[-3:-1] in _DOUBLE_VOWEL and s[-4] not in _V):
        s = s[:-2] + s[-1]

    # postlude (:75-80)
    return s.translate({ord("I"): "i", ord("Y"): "y"})

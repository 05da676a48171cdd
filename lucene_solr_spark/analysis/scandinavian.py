"""Danish, Norwegian and Swedish Snowball stemmers.

Reference chains (all: StandardTokenizer → LowerCase → Stop(<lang>_stop.txt)
→ SnowballFilter):
  DanishAnalyzer.java:123-129    → DanishStemmer
  NorwegianAnalyzer.java:123-129 → NorwegianStemmer
  SwedishAnalyzer.java:123-129   → SwedishStemmer

Re-derived from the published snowball algorithms
(snowballstem.org/algorithms/{danish,norwegian,swedish}/stemmer.html) with
the suffix tables and groupings read as DATA from the reference's generated
code (DanishStemmer.java:19-72, NorwegianStemmer.java:19-72,
SwedishStemmer.java:19-79). Fuzz-verified byte-identical against the
compiled reference via tools/stemmer_oracle.py.

All three share the same region rule: p1 = after the first non-vowel
following a vowel, floored at 3 (`hop 3 setmark x ... try(p1 < x → p1 = x)`),
and all suffix matching is `setlimit tomark p1` (suffix start >= p1).
"""

from __future__ import annotations

from .snowball import longest_suffix, mark_r1, sort_table

# --- Danish (DanishStemmer.java) -------------------------------------------

_DA_VOWELS = frozenset("aeiouyæåø")
# g_s_ending bits {239,254,42,3,...,16} from 'a' (DanishStemmer.java:72)
_DA_S_ENDING = frozenset("abcdfghjklmnoprtvyzå")
_DA_MAIN = sort_table(
    [(s, 1) for s in (
        "hed ethed ered e erede ende erende ene erne ere en heden eren er "
        "heder erer heds es endes erendes enes ernes eres ens hedens erens "
        "ers ets erets et eret").split()]
    + [("s", 2)]
)
_DA_PAIRS = ("gd", "dt", "gt", "kt")
_DA_OTHER = sort_table([("ig", 1), ("lig", 1), ("elig", 1), ("els", 1),
                        ("løst", 2)])


def _pair_chop(word: str, p1: int, pairs: tuple[str, ...]) -> str:
    """consonant_pair: a pair from `pairs` ends the word inside R1 → delete
    the LAST char only (test(among) next] delete)."""
    for pair in pairs:
        if word.endswith(pair) and len(word) - 2 >= p1:
            return word[:-1]
    return word


def danish_stem(word: str) -> str:
    p1 = mark_r1(word, _DA_VOWELS, min_prefix=3)
    # main_suffix (:41-50)
    m = longest_suffix(word, _DA_MAIN, p1)
    if m is not None:
        suf, cls = m
        if cls == 1:
            word = word[: -len(suf)]
        elif len(word) >= 2 and word[-2] in _DA_S_ENDING:
            word = word[:-1]
    # consonant_pair (:54-62)
    word = _pair_chop(word, p1, _DA_PAIRS)
    # other_suffix (:65-72): the igst prelude is NOT region-limited
    if word.endswith("igst"):
        word = word[:-2]
    m = longest_suffix(word, _DA_OTHER, p1)
    if m is not None:
        suf, cls = m
        if cls == 2:  # løst → løs
            word = word[:-1]
        else:
            word = word[: -len(suf)]
            word = _pair_chop(word, p1, _DA_PAIRS)
    # undouble (:75-78): final non-vowel at offset >= p1 equal to its
    # predecessor (predecessor NOT region-limited) → drop it
    if (len(word) >= 2 and word[-1] not in _DA_VOWELS
            and len(word) - 1 >= p1 and word[-2] == word[-1]):
        word = word[:-1]
    return word


# --- Norwegian (NorwegianStemmer.java) --------------------------------------

_NO_VOWELS = _DA_VOWELS
# g_s_ending bits {119,125,149,1} from 'b' (NorwegianStemmer.java:72)
_NO_S_ENDING = frozenset("bcdfghjlmnoprtvyz")
_NO_MAIN = sort_table(
    [(s, 1) for s in (
        "a e ede ande ende ane ene hetene en heten ar er heter as es edes "
        "endes enes hetenes ens hetens ers ets et het ast").split()]
    + [("s", 2), ("erte", 3), ("ert", 3)]
)
_NO_PAIRS = ("dt", "vt")
_NO_OTHER = sort_table([(s, 1) for s in
                        "leg eleg ig eig lig elig els lov elov slov "
                        "hetslov".split()])


def norwegian_stem(word: str) -> str:
    p1 = mark_r1(word, _NO_VOWELS, min_prefix=3)
    # main_suffix (:38-48)
    m = longest_suffix(word, _NO_MAIN, p1)
    if m is not None:
        suf, cls = m
        if cls == 1:
            word = word[: -len(suf)]
        elif cls == 3:  # erte/ert → er
            word = word[: -len(suf)] + "er"
        else:  # 's': s_ending OR 'k' not after a vowel
            prev = word[-2] if len(word) >= 2 else ""
            if prev in _NO_S_ENDING or (
                prev == "k" and len(word) >= 3
                and word[-3] not in _NO_VOWELS
            ):
                word = word[:-1]
    # consonant_pair (:52-62)
    word = _pair_chop(word, p1, _NO_PAIRS)
    # other_suffix (:66-72)
    m = longest_suffix(word, _NO_OTHER, p1)
    if m is not None:
        word = word[: -len(m[0])]
    return word


# --- Swedish (SwedishStemmer.java) ------------------------------------------

_SV_VOWELS = frozenset("aeiouyäåö")
# g_s_ending bits {119,127,149} from 'b' (SwedishStemmer.java:79)
_SV_S_ENDING = frozenset("bcdfghjklmnoprtvy")
_SV_MAIN = sort_table(
    [(s, 1) for s in (
        "a arna erna heterna orna ad e ade ande arne are aste en anden "
        "aren heten ern ar er heter or as arnas ernas ornas es ades andes "
        "ens arens hetens erns at andet het ast").split()]
    + [("s", 2)]
)
_SV_PAIRS = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_OTHER = sort_table([("lig", 1), ("ig", 1), ("els", 1),
                        ("löst", 2), ("fullt", 3)])


def swedish_stem(word: str) -> str:
    p1 = mark_r1(word, _SV_VOWELS, min_prefix=3)
    # main_suffix (:37-47)
    m = longest_suffix(word, _SV_MAIN, p1)
    if m is not None:
        suf, cls = m
        if cls == 1:
            word = word[: -len(suf)]
        elif len(word) >= 2 and word[-2] in _SV_S_ENDING:
            word = word[:-1]
    # consonant_pair (:50-52)
    word = _pair_chop(word, p1, _SV_PAIRS)
    # other_suffix (:55-60)
    m = longest_suffix(word, _SV_OTHER, p1)
    if m is not None:
        suf, cls = m
        if cls == 1:
            word = word[: -len(suf)]
        else:  # löst → lös, fullt → full
            word = word[:-1]
    return word

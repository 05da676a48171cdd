"""Irish analysis: initial-mutation stripping, Irish lowercase, Snowball
stemmer.

Reference chain (IrishAnalyzer.java:137-151): StandardTokenizer →
Stop(HYPHENATIONS h/n/t, position-consuming) → Elision(d/m/b, ignoreCase)
→ IrishLowerCaseFilter (nAthair → n-athair) → Stop(ga/stopwords.txt, '#')
→ SnowballFilter(IrishStemmer). Tables read as data from the generated
IrishStemmer.java:19-146. Fuzz-verified byte-identical via
tools/stemmer_oracle.py (30k words, 0 mismatches).

Stemmer shape: FORWARD initial_morph (undo eclipsis/lenition prefixes),
pV = after first vowel, R1/R2 standard, then noun_sfx / deriv / verb_sfx
(unrestricted longest match + per-class region test, no fallback).
"""

from __future__ import annotations

from .snowball import next_region

_V = frozenset("aeiouáéíóú")
_UPPER_V = frozenset("AEIOUÁÉÍÓÚ")
_GA_ARTICLES = frozenset(("d", "m", "b"))
_HYPHENATIONS = frozenset(("h", "n", "t"))

# forward prefix table (a_0): class → replacement for the matched prefix
_INITIAL = (
    ("d'fh", 3), ('bhf', 9), ("b'", 4), ('bh', 14), ('bp', 11), ('ch',
    15), ("d'", 2), ('dh', 16), ('dt', 13), ('fh', 17), ('gc', 7),
    ('gh', 18), ('h-', 1), ("m'", 4), ('mb', 6), ('mh', 19), ('n-', 1),
    ('nd', 8), ('ng', 10), ('ph', 20), ('sh', 5), ('t-', 1), ('th', 21),
    ('ts', 12)
)
_INITIAL_REP = {1: "", 2: "", 3: "f", 4: "", 5: "s", 6: "b", 7: "c",
                8: "d", 9: "f", 10: "g", 11: "p", 12: "s", 13: "t",
                14: "b", 15: "c", 16: "d", 17: "f", 18: "g", 19: "m",
                20: "p", 21: "t"}

_NOUN_SFX = (
    ('aíochta', 1), ('aíocht', 1), ('íochta', 1), ('íocht', 1), ('aibh',
    1), ('aimh', 1), ('aire', 2), ('airí', 2), ('eabh', 1), ('eamh', 1),
    ('abh', 1), ('amh', 1), ('ibh', 1), ('imh', 1), ('ire', 2), ('irí',
    2)
)     # 1: R1 del, 2: R2 del

_DERIV = (
    ('grafaíochtaí', 4), ('grafaíochta', 4), ('grafaíocht', 4),
    ('arcachtaí', 2), ('grafaíoch', 4), ('arcachta', 2), ('eachtúil',
    1), ('óideacha', 6), ('achtúil', 1), ('arcacht', 2), ('gineach', 3),
    ('patacha', 5), ('pataigh', 5), ('óideach', 6), ('eachta', 1),
    ('gineas', 3), ('patach', 5), ('óidigh', 6), ('achta', 1), ('eacht',
    1), ('ginis', 3), ('paite', 5), ('acht', 1), ('each', 1), ('ach', 1)
)        # 1: R2 del, 2-6: replacements
_DERIV_REP = {2: "arc", 3: "gin", 4: "graf", 5: "paite", 6: "óid"}

_VERB_SFX = (
    ('aimid', 1), ('aímid', 1), ('faidh', 1), ('eadh', 2), ('fidh', 1),
    ('imid', 1), ('tear', 2), ('ímid', 1), ('adh', 2), ('ain', 2),
    ('tar', 2), ('áil', 2)
)     # 1: RV del, 2: R1 del


def irish_lower(token: str) -> str:
    """IrishLowerCaseFilter.java:41-66 (t/n before an uppercase vowel get
    a hyphen: nAthair → n-athair), after the d/m/b elision."""
    from .analyzer import _java_lower

    for i, ch in enumerate(token):
        if ch in ("'", "’"):
            if token[:i].lower() in _GA_ARTICLES:
                token = token[i + 1:]
            break
    if len(token) > 1 and token[0] in ("n", "t") and token[1] in _UPPER_V:
        return token[0] + "-" + _java_lower(token[1:])
    return _java_lower(token)


def irish_pre_lower(token: str) -> str:
    """The full pre-stop pipeline: HYPHENATIONS stop (raw token,
    ignoreCase) → elision → Irish lowercase; "" = token dropped."""
    if token.lower() in _HYPHENATIONS:
        return ""
    return irish_lower(token)


def irish_stem(word: str) -> str:
    s = word
    # initial_morph: longest matching prefix, rewritten
    for pre, cls in _INITIAL:
        if s.startswith(pre):
            s = _INITIAL_REP[cls] + s[len(pre):]
            break

    n = len(s)
    i = 0
    while i < n and s[i] not in _V:
        i += 1
    pv = n if i >= n else i + 1
    p1 = next_region(s, 0, _V)
    p2 = next_region(s, p1, _V)

    def rule(table, actions):
        nonlocal s
        for suf, cls in table:
            if s.endswith(suf):
                region, rep = actions[cls]
                if len(s) - len(suf) >= region:
                    s = s[: -len(suf)] + rep
                return
        return

    rule(_NOUN_SFX, {1: (p1, ""), 2: (p2, "")})
    rule(_DERIV, {1: (p2, ""), **{c: (0, r) for c, r in
                                   _DERIV_REP.items()}})
    rule(_VERB_SFX, {1: (pv, ""), 2: (p1, "")})
    return s

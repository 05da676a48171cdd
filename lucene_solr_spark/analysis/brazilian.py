"""Brazilian Portuguese stemmer (the 2001 Lucene BrazilianStemmer, distinct
from the Portuguese light/RSLP stemmers).

Reference chain (BrazilianAnalyzer.java:128-136): StandardTokenizer →
LowerCase → StandardFilter → Stop(br/stopwords.txt, '#') →
BrazilianStemFilter. Re-derives BrazilianStemmer.java:47-1010 rule-for-rule
— including its quirks: regions computed once over an accent-folded copy
with the LAST character excluded from region discovery (getR1's `j < i`
bound, :139-156), and the dead `replaceSuffix` call for "logias" whose
result is discarded (:429, the rule fires but leaves the term unchanged).
Fuzz-verified byte-identical via tools/stemmer_oracle.py (30k words, 0
mismatches).

BrazilianStemFilter semantics: stem() returning null (non-indexable) keeps
the original token; otherwise the stemmed form replaces it.
"""

from __future__ import annotations

_VOW = frozenset("aeiou")
_FOLD = str.maketrans("áâãéêíóôõúüçñ", "aaaeeiooouucn")
_PUNCT = set("\"'-,;.?!")

# step1: ordered (suffix, region, preceded, replacement|None=no-op, fires)
# region: "r1" / "r2" / "rv+e" (RV match + preceded by 'e' in CT)
_STEP1 = [
    ("uciones", "r2", "u"), ("imentos", "r2", ""), ("amentos", "r2", ""),
    ("adores", "r2", ""), ("adoras", "r2", ""),
    ("logias", "r2", None),  # reference discards the replacement
    ("encias", "r2", "ente"), ("amente", "r1", ""), ("idades", "r2", ""),
    ("acoes", "r2", ""), ("imento", "r2", ""), ("amento", "r2", ""),
    ("adora", "r2", ""), ("ismos", "r2", ""), ("istas", "r2", ""),
    ("logia", "r2", "log"), ("ucion", "r2", "u"), ("encia", "r2", "ente"),
    ("mente", "r2", ""), ("idade", "r2", ""),
    ("acao", "r2", ""), ("ezas", "r2", ""), ("icos", "r2", ""),
    ("icas", "r2", ""), ("ismo", "r2", ""), ("avel", "r2", ""),
    ("ivel", "r2", ""), ("ista", "r2", ""), ("osos", "r2", ""),
    ("osas", "r2", ""), ("ador", "r2", ""), ("ivas", "r2", ""),
    ("ivos", "r2", ""), ("iras", "rv+e", "ir"),
    ("eza", "r2", ""), ("ico", "r2", ""), ("ica", "r2", ""),
    ("oso", "r2", ""), ("osa", "r2", ""), ("iva", "r2", ""),
    ("ivo", "r2", ""), ("ira", "rv+e", "ir"),
]

# (rv-suffix, removed-from-CT) — the first "ira" entry removes "ava"
# (BrazilianStemmer.java:865-867): a reference bug that makes the rule a
# fired NO-OP (CT ends "ira", never "ava"), blocking later rules.
_STEP2 = [
    "issemos", "essemos", "assemos", "ariamos", "eriamos", "iriamos",
    "iremos", "eremos", "aremos", "avamos", "iramos", "eramos", "aramos",
    "asseis", "esseis", "isseis", "arieis", "erieis", "irieis",
    "irmos", "iamos", "armos", "ermos", "areis", "ereis", "ireis",
    "asses", "esses", "isses", "astes", "assem", "essem", "issem",
    "ardes", "erdes", "irdes", "ariam", "eriam", "iriam", "arias",
    "erias", "irias", "estes", "istes", "areis", "aveis",
    "aria", "eria", "iria", "asse", "esse", "isse", "aste", "este",
    "iste", "arei", "erei", "irei", "aram", "eram", "iram", "avam",
    "arem", "erem", "irem", "ando", "endo", "indo", "arao", "erao",
    "irao", "adas", "idas", "aras", "eras", "iras", "avas", "ares",
    "eres", "ires", "ados", "idos", "amos", "emos", "imos", "iras",
    "ieis",
    "ada", "ida", "ara", "era", ("ira", "ava"), "iam", "ado", "ido",
    "ias", "ais", "eis", "ira", "ear",
    "ia", "ei", "am", "em", "ar", "er", "ir", "as", "es", "is", "eu",
    "iu", "iu", "ou",
]


def _get_r1(v: str | None) -> str | None:
    """BrazilianStemmer.getR1 (:139-156): the final char is excluded from
    the search (`j < i` with i = len-1)."""
    if v is None:
        return None
    i = len(v) - 1
    j = 0
    while j < i and v[j] not in _VOW:
        j += 1
    if j >= i:
        return None
    while j < i and v[j] in _VOW:
        j += 1
    if j >= i:
        return None
    return v[j + 1:]


def _get_rv(v: str | None) -> str | None:
    """BrazilianStemmer.getRV (:176-229), same last-char exclusion."""
    if v is None:
        return None
    i = len(v) - 1
    if i > 0 and v[1] not in _VOW:
        j = 2
        while j < i and v[j] not in _VOW:
            j += 1
        if j < i:
            return v[j + 1:]
    if i > 1 and v[0] in _VOW and v[1] in _VOW:
        j = 2
        while j < i and v[j] in _VOW:
            j += 1
        if j < i:
            return v[j + 1:]
    if i > 2:
        return v[3:]
    return None


def _sfx(v: str | None, suf: str) -> bool:
    return v is not None and v.endswith(suf)


def brazilian_stem(word: str) -> str:
    """The BrazilianStemFilter contract: returns the stemmed term, or the
    original token when the stemmer declines (non-indexable/null)."""
    # createCT (:362-398)
    ct = word.lower().translate(_FOLD)
    if len(ct) >= 2 and ct[0] in _PUNCT:
        ct = ct[1:]
    if len(ct) >= 2 and ct[-1] in _PUNCT:
        ct = ct[:-1]
    if not (2 < len(ct) < 30):  # isIndexable → null → keep original
        return word
    if not all(c.isalpha() for c in ct):  # isStemmable → return CT
        return ct

    r1 = _get_r1(ct)
    r2 = _get_r1(r1)
    rv = _get_rv(ct)

    # step1 (:406-565)
    altered = False
    for suf, region, rep in _STEP1:
        if not ct.endswith(suf):
            continue
        if region == "r2" and _sfx(r2, suf):
            if rep is not None:
                ct = ct[: -len(suf)] + rep
            altered = True
            break
        if region == "r1" and _sfx(r1, suf):
            ct = ct[: -len(suf)]
            altered = True
            break
        if region == "rv+e" and _sfx(rv, suf) \
                and ct.endswith("e" + suf):
            ct = ct[: -len(suf)] + rep
            altered = True
            break

    # step2 (:570-946): longest-listed RV verb suffix, removed from CT
    if not altered:
        for entry in _STEP2:
            check, rem = entry if isinstance(entry, tuple) else (entry,
                                                                 entry)
            if _sfx(rv, check):
                if ct.endswith(rem):
                    ct = ct[: -len(rem)]
                altered = True
                break

    def rm(v: str, suf: str) -> str:
        """Java removeSuffix: conditional — no-op when v lacks the suffix
        (matters once earlier steps shortened CT past the frozen RV)."""
        return v[: -len(suf)] if v.endswith(suf) else v

    if altered:
        # step3 (:948-955): final i preceded by c (both checked in RV)
        if _sfx(rv, "i") and _sfx(rv, "ci"):
            ct = rm(ct, "i")
    else:
        # step4 (:964-980): residual suffix — RV-checked, CT-removed
        for suf in ("os", "a", "i", "o"):
            if _sfx(rv, suf):
                ct = rm(ct, suf)
                break

    # step5 (:990-1007): final e in RV; gu/ci lose their u/i too
    if _sfx(rv, "e"):
        if _sfx(rv, "gue"):
            ct = rm(rm(ct, "e"), "u")
        elif _sfx(rv, "cie"):
            ct = rm(rm(ct, "e"), "i")
        else:
            ct = rm(ct, "e")
    return ct

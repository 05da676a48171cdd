"""Arabic analysis: normalization + light stemming.

Reference chain (ArabicAnalyzer.java:138-151): StandardTokenizer →
LowerCase → Stop(ar/stopwords.txt — NOT normalized, so stop runs BEFORE
normalization, per the comment at :143) → ArabicNormalizationFilter →
ArabicStemFilter.

- ArabicNormalizer.java:60-96: alef madda/hamza-above/hamza-below → bare
  alef; dotless yeh → yeh; teh marbuta → heh; tatweel and the harakat
  (fathatan/dammatan/kasratan/fatha/damma/kasra/shadda/sukun) deleted.
- ArabicStemmer.java:46-117 (Larkey/Ballesteros/Connell "light10"): strip
  ONE prefix (longest-listed first: ال وال بال كال فال لل و — the single
  waw needs ≥4 chars, the rest need ≥2 chars of remainder), then strip
  suffixes IN LIST ORDER (ها ان ات ون ين يه ية ه ة ي), each requiring ≥2
  chars of remainder, multiple suffixes may strip successively.
"""

from __future__ import annotations

ALEF, BEH, TEH_MARBUTA, TEH = "ا", "ب", "ة", "ت"
FEH, KAF, LAM, NOON, HEH, WAW, YEH = (
    "ف", "ك", "ل", "ن", "ه", "و", "ي"
)

_NORM_MAP = {
    "آ": ALEF,  # alef madda
    "أ": ALEF,  # alef hamza above
    "إ": ALEF,  # alef hamza below
    "ى": YEH,   # dotless yeh
    TEH_MARBUTA: HEH,
}
_DELETE = set("ـًٌٍَُِّْ")

# prefix order = ArabicStemmer.prefixes (:58-66); only the FIRST match strips
_PREFIXES = [
    ALEF + LAM, WAW + ALEF + LAM, BEH + ALEF + LAM, KAF + ALEF + LAM,
    FEH + ALEF + LAM, LAM + LAM, WAW,
]
# suffix order = ArabicStemmer.suffixes (:68-79); EACH match strips in turn
_SUFFIXES = [
    HEH + ALEF, ALEF + NOON, ALEF + TEH, WAW + NOON, YEH + NOON,
    YEH + HEH, YEH + TEH_MARBUTA, HEH, TEH_MARBUTA, YEH,
]


def arabic_normalize(token: str) -> str:
    """ArabicNormalizer.normalize (ArabicNormalizer.java:60-96)."""
    return "".join(
        _NORM_MAP.get(ch, ch) for ch in token if ch not in _DELETE
    )


def arabic_stem(token: str) -> str:
    """ArabicStemmer.stem (ArabicStemmer.java:46-56): one prefix, then the
    suffix cascade."""
    s = token
    # stemPrefix (:61-66 + startsWithCheckLength :84-95): the wa- prefix
    # requires total length ≥ 4; others require len ≥ prefix_len + 2
    for p in _PREFIXES:
        if not s.startswith(p):
            continue
        if len(p) == 1:
            if len(s) < 4:
                continue
        elif len(s) < len(p) + 2:
            continue
        s = s[len(p):]
        break
    # stemSuffix (:70-75 + endsWithCheckLength :99-108): each suffix needs
    # ≥ 2 chars of remainder; matches strip in list order, cumulatively
    for suf in _SUFFIXES:
        if s.endswith(suf) and len(s) >= len(suf) + 2:
            s = s[: len(s) - len(suf)]
    return s

"""Per-language analysis chains dispatched by the corpus `lang` column.

Reference chains (Lucene 4.4 analyzers, matchVersion >= LUCENE_36):

- de: StandardTokenizer → LowerCase → Stop(german_stop.txt) →
  GermanNormalizationFilter → GermanLightStemFilter
  (GermanAnalyzer.java:171-185)
- fr: StandardTokenizer → ElisionFilter(DEFAULT_ARTICLES) → LowerCase →
  Stop(french_stop.txt) → FrenchLightStemFilter (FrenchAnalyzer.java:189-204)
- es: StandardTokenizer → LowerCase → Stop(spanish_stop.txt) →
  SpanishLightStemFilter (SpanishAnalyzer.java:127-141)
- it: StandardTokenizer → ElisionFilter(IT articles) → LowerCase →
  Stop(italian_stop.txt) → ItalianLightStemFilter
  (ItalianAnalyzer.java:140-155)
- pt: StandardTokenizer → LowerCase → Stop(portuguese_stop.txt) →
  PortugueseLightStemFilter (PortugueseAnalyzer.java:125-139)
- ru: StandardTokenizer → LowerCase → Stop(russian_stop.txt) →
  SnowballFilter(RussianStemmer) (RussianAnalyzer.java:152-163; stemmer
  re-derived from the published snowball algorithm, fuzz-verified
  0/30,015 mismatches vs the reference's compiled generated code —
  analysis/russian.py)
- ar: StandardTokenizer → LowerCase → Stop(ar/stopwords.txt, unnormalized)
  → ArabicNormalization → ArabicStem light10 (ArabicAnalyzer.java:138-151;
  analysis/arabic.py)
- zh/ja/ko: the CJKAnalyzer width-fold + bigram chain (analysis/cjk.py)
- en: the EnglishAnalyzer chain (analysis/english.py)
- anything else: StandardAnalyzer (tokenize + lower + English stop)

The light stemmers are re-derivations of the published algorithms (Jacques
Savoy, "Light Stemming Approaches for the French, Portuguese, German and
Hungarian Languages", SAC 2006; report in RICOH's CLEF-2005 work for
Italian/Spanish), matched operation-for-operation against the reference's
GermanLightStemmer.java:39-109 / FrenchLightStemmer.java:44-240 /
SpanishLightStemmer.java:39-86 / ItalianLightStemmer.java:39-94 /
PortugueseLightStemmer.java:39-180 so stems are byte-identical.

Index-side dispatch runs ONE pass over the corpus: `lang_token_array` is an
Arrow-batched pandas UDF (text, lang) → array<string> of FINAL analyzed
terms, with dropped tokens (stopwords, >255 chars) kept as "" placeholders so
pre-stop positions survive into the inverter unchanged (StopFilter's
enablePositionIncrements=true semantics — a phrase across a removed stopword
does NOT match at distance 1). There is no per-language scan and no
per-language shuffle: at 100 TB a mixed-language corpus is analyzed in the
same map stage regardless of how many languages it contains. Stems are cached
per (lang, surface form), so the cost is per distinct vocabulary entry per
batch, not per token.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType

from .analyzer import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    _PY_TOKEN_RE,
    _java_lower,
)
from .english import porter_stem, strip_possessive
from .arabic import arabic_normalize, arabic_stem
from .langdata import (
    STOP_AR, STOP_BG, STOP_BR, STOP_CA, STOP_CZ, STOP_DA, STOP_DE,
    STOP_EL, STOP_ES, STOP_EU, STOP_FA, STOP_FI, STOP_FR, STOP_GA,
    STOP_HI,
    STOP_GL, STOP_HU, STOP_HY, STOP_ID, STOP_IT, STOP_LV, STOP_NL,
    STOP_NO, STOP_PT, STOP_RO, STOP_RU, STOP_SV, STOP_TR,
)
from .russian import russian_stem
from .scandinavian import danish_stem, norwegian_stem, swedish_stem
from .dutch import dutch_stem
from .czech import czech_stem
from .bulgarian import bulgarian_stem
from .latvian import latvian_stem
from .indonesian import indonesian_stem
from .indic import hindi_normalize, hindi_stem, indic_normalize
from .persian import persian_normalize
from .romanian import romanian_stem
from .hungarian import hungarian_stem
from .finnish import finnish_stem
from .armenian import armenian_stem
from .basque import basque_stem
from .catalan import catalan_stem
from .irish import irish_pre_lower, irish_stem
from .greek import greek_lower, greek_stem
from .galician import galician_stem
from .brazilian import brazilian_stem
from .turkish import turkish_lower, turkish_stem
from .stempel import STOP_PL, polish_stem

# ---------------------------------------------------------------------------
# ElisionFilter (ElisionFilter.java:63-86): strip everything through the
# FIRST apostrophe (' or U+2019) when the prefix is a known article,
# case-insensitively. Runs BEFORE LowerCaseFilter in the reference chain;
# lowering first is output-identical (the article match is ignoreCase=true
# and simple lowercasing never moves the apostrophe).

# FrenchAnalyzer.DEFAULT_ARTICLES (FrenchAnalyzer.java:102-104)
FR_ARTICLES = frozenset(
    "l m t qu n s j d c jusqu quoiqu lorsqu puisqu".split()
)
# ItalianAnalyzer.DEFAULT_ARTICLES (ItalianAnalyzer.java:60-65)
IT_ARTICLES = frozenset(
    "c l all dall dell nell sull coll pell gl agl dagl degl negl sugl "
    "un m t s v d".split()
)
# CatalanAnalyzer.DEFAULT_ARTICLES (CatalanAnalyzer.java:56-60)
CA_ARTICLES = frozenset("d l m n s t".split())
# DutchAnalyzer.DEFAULT_STEM_DICT (DutchAnalyzer.java:99-103)
_NL_STEM_DICT = {"fiets": "fiets", "bromfiets": "bromfiets",
                 "ei": "eier", "kind": "kinder"}


def elide(token: str, articles: frozenset[str]) -> str:
    """Strip an article prefix before the first apostrophe ("l'avion" →
    "avion"). A non-article prefix leaves the token untouched."""
    for i, ch in enumerate(token):
        if ch == "'" or ch == "’":
            return token[i + 1 :] if token[:i] in articles else token
    return token


# ---------------------------------------------------------------------------
# GermanNormalizationFilter (GermanNormalizationFilter.java:38-84): a 3-state
# FSM over the token — ä/ö/ü fold to a/o/u, ß → ss, and an 'e' is DELETED
# when it immediately follows the first vowel of a vowel group (the "ue" →
# "u" umlaut-writing normalization: "fluesse" → "flusse"), tracked by
# states N (consonant), U (umlaut-eligible vowel just seen), V (vowel seen,
# e-deletion off).


def german_normalize(token: str) -> str:
    buf = list(token)
    state = "N"
    i = 0
    while i < len(buf):
        c = buf[i]
        if c in ("a", "o"):
            state = "U"
            i += 1
        elif c == "u":
            state = "U" if state == "N" else "V"
            i += 1
        elif c == "e":
            if state == "U":
                del buf[i]  # re-examine the shifted-in char at the same i
            else:
                i += 1
            state = "V"
        elif c in ("i", "q", "y"):
            state = "V"
            i += 1
        elif c == "ä":
            buf[i] = "a"
            state = "V"
            i += 1
        elif c == "ö":
            buf[i] = "o"
            state = "V"
            i += 1
        elif c == "ü":
            buf[i] = "u"
            state = "V"
            i += 1
        elif c == "ß":
            buf[i : i + 1] = ["s", "s"]
            state = "N"
            i += 2
        else:
            state = "N"
            i += 1
    return "".join(buf)


# ---------------------------------------------------------------------------
# GermanLightStemmer (GermanLightStemmer.java:39-109): accent fold, then two
# suffix-strip steps (plural/case endings, then superlative/comparative).

_DE_FOLD = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")
_DE_ST_ENDING = frozenset("bdfghklmnt")


def german_light_stem(token: str) -> str:
    s = token.translate(_DE_FOLD)
    # step1 (:81-99)
    n = len(s)
    if n > 5 and s.endswith("ern"):
        s = s[:-3]
    elif n > 4 and s[-2] == "e" and s[-1] in "mnrs":
        s = s[:-2]
    elif n > 3 and s[-1] == "e":
        s = s[:-1]
    elif n > 3 and s[-1] == "s" and s[-2] in _DE_ST_ENDING:
        s = s[:-1]
    # step2 (:101-108), on the step1 result
    n = len(s)
    if n > 5 and s.endswith("est"):
        s = s[:-3]
    elif n > 4 and (s.endswith("er") or s.endswith("en")):
        s = s[:-2]
    elif n > 4 and s.endswith("st") and s[-3] in _DE_ST_ENDING:
        s = s[:-2]
    return s


# ---------------------------------------------------------------------------
# FrenchLightStemmer (FrenchLightStemmer.java:44-240). Mutating char-buffer
# form kept deliberately: the algorithm rewrites characters at positions
# relative to the live length ("catrice" → "...quer") before truncating, and
# several branches fall through into later suffix checks.


def _ends(s: list[str], n: int, suf: str) -> bool:
    return n >= len(suf) and "".join(s[n - len(suf) : n]) == suf


def _fr_norm(s: list[str], n: int) -> int:
    """norm() (:196-239): accent fold, squeeze letter runs, drop final
    ie / r / e / e / doubled letter."""
    if n > 4:
        fold = {"à": "a", "á": "a", "â": "a", "ô": "o", "è": "e", "é": "e",
                "ê": "e", "ù": "u", "û": "u", "î": "i", "ç": "c"}
        for i in range(n):
            s[i] = fold.get(s[i], s[i])
        ch = s[0]
        i = 1
        while i < n:
            if s[i] == ch and s[i].isalpha():
                del s[i]
                n -= 1
            else:
                ch = s[i]
                i += 1
    if n > 4 and _ends(s, n, "ie"):
        n -= 2
    if n > 4:
        if s[n - 1] == "r":
            n -= 1
        if s[n - 1] == "e":
            n -= 1
        if s[n - 1] == "e":
            n -= 1
        if s[n - 1] == s[n - 2] and s[n - 1].isalpha():
            n -= 1
    return n


def french_light_stem(token: str) -> str:
    s = list(token)
    n = len(s)
    if n > 5 and s[n - 1] == "x":
        if s[n - 3] == "a" and s[n - 2] == "u" and s[n - 4] != "e":
            s[n - 2] = "l"  # chevaux → cheval
        n -= 1
    if n > 3 and s[n - 1] == "x":
        n -= 1
    if n > 3 and s[n - 1] == "s":
        n -= 1

    if n > 9 and _ends(s, n, "issement"):
        n -= 6
        s[n - 1] = "r"  # -issement → -ir
        return "".join(s[: _fr_norm(s, n)])
    if n > 8 and _ends(s, n, "issant"):
        n -= 4
        s[n - 1] = "r"
        return "".join(s[: _fr_norm(s, n)])
    if n > 6 and _ends(s, n, "ement"):
        n -= 4
        if n > 3 and _ends(s, n, "ive"):
            n -= 1
            s[n - 1] = "f"
        return "".join(s[: _fr_norm(s, n)])
    if n > 11 and _ends(s, n, "ficatrice"):
        n -= 5
        s[n - 2] = "e"
        s[n - 1] = "r"
        return "".join(s[: _fr_norm(s, n)])
    if n > 10 and _ends(s, n, "ficateur"):
        n -= 4
        s[n - 2] = "e"
        s[n - 1] = "r"
        return "".join(s[: _fr_norm(s, n)])
    if n > 9 and _ends(s, n, "catrice"):
        n -= 3
        s[n - 4] = "q"
        s[n - 3] = "u"
        s[n - 2] = "e"  # s[n-1] already 'r'
        return "".join(s[: _fr_norm(s, n)])
    if n > 8 and _ends(s, n, "cateur"):
        n -= 2
        s[n - 4] = "q"
        s[n - 3] = "u"
        s[n - 2] = "e"
        s[n - 1] = "r"
        return "".join(s[: _fr_norm(s, n)])
    if n > 8 and _ends(s, n, "atrice"):
        n -= 4
        s[n - 2] = "e"
        s[n - 1] = "r"
        return "".join(s[: _fr_norm(s, n)])
    if n > 7 and _ends(s, n, "ateur"):
        n -= 3
        s[n - 2] = "e"
        s[n - 1] = "r"
        return "".join(s[: _fr_norm(s, n)])
    if n > 6 and _ends(s, n, "trice"):  # no return: -trice → -teur, continue
        n -= 1
        s[n - 3] = "e"
        s[n - 2] = "u"
        s[n - 1] = "r"
    if n > 5 and _ends(s, n, "ième"):
        return "".join(s[: _fr_norm(s, n - 4)])
    if n > 7 and _ends(s, n, "teuse"):
        n -= 2
        s[n - 1] = "r"
        return "".join(s[: _fr_norm(s, n)])
    if n > 6 and _ends(s, n, "teur"):
        n -= 1
        s[n - 1] = "r"
        return "".join(s[: _fr_norm(s, n)])
    if n > 5 and _ends(s, n, "euse"):
        return "".join(s[: _fr_norm(s, n - 2)])
    if n > 8 and _ends(s, n, "ère"):
        n -= 1
        s[n - 2] = "e"
        return "".join(s[: _fr_norm(s, n)])
    if n > 7 and _ends(s, n, "ive"):
        n -= 1
        s[n - 1] = "f"
        return "".join(s[: _fr_norm(s, n)])
    if n > 4 and (_ends(s, n, "folle") or _ends(s, n, "molle")):
        n -= 2
        s[n - 1] = "u"  # folle → fou
        return "".join(s[: _fr_norm(s, n)])
    if n > 9 and _ends(s, n, "nnelle"):
        return "".join(s[: _fr_norm(s, n - 5)])
    if n > 9 and _ends(s, n, "nnel"):
        return "".join(s[: _fr_norm(s, n - 3)])
    if n > 4 and _ends(s, n, "ète"):  # no return
        n -= 1
        s[n - 2] = "e"
    if n > 8 and _ends(s, n, "ique"):  # no return
        n -= 4
    if n > 8 and _ends(s, n, "esse"):
        return "".join(s[: _fr_norm(s, n - 3)])
    if n > 7 and _ends(s, n, "inage"):
        return "".join(s[: _fr_norm(s, n - 3)])
    if n > 9 and _ends(s, n, "isation"):
        n -= 7
        if n > 5 and _ends(s, n, "ual"):
            s[n - 2] = "e"  # -ualisation → -uel
        return "".join(s[: _fr_norm(s, n)])
    if n > 9 and _ends(s, n, "isateur"):
        return "".join(s[: _fr_norm(s, n - 7)])
    if n > 8 and _ends(s, n, "ation"):
        return "".join(s[: _fr_norm(s, n - 5)])
    if n > 8 and _ends(s, n, "ition"):
        return "".join(s[: _fr_norm(s, n - 5)])
    return "".join(s[: _fr_norm(s, n)])


# ---------------------------------------------------------------------------
# SpanishLightStemmer (SpanishLightStemmer.java:39-86): accent fold + one
# final-vowel / plural strip. Words shorter than 5 chars are untouched.

_ES_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaoooo" "eeee" "uuuu" "iiii")


def spanish_light_stem(token: str) -> str:
    if len(token) < 5:
        return token
    s = token.translate(_ES_FOLD)
    last = s[-1]
    if last in ("o", "a", "e"):
        return s[:-1]
    if last == "s":
        if s.endswith("eses"):
            return s[:-2]
        if s.endswith("ces"):
            return s[:-3] + "z"  # veces → vez
        if s[-2] in ("o", "a", "e"):
            return s[:-2]
    return s


# ---------------------------------------------------------------------------
# ItalianLightStemmer (ItalianLightStemmer.java:39-94): accent fold + final
# vowel strip with the -i/-h plural contractions. Words < 6 chars untouched.


def italian_light_stem(token: str) -> str:
    if len(token) < 6:
        return token
    s = token.translate(_ES_FOLD)  # same accent table (:45-70)
    last, prev = s[-1], s[-2]
    if last == "e":
        return s[:-2] if prev in ("i", "h") else s[:-1]
    if last == "i":
        return s[:-2] if prev in ("h", "i") else s[:-1]
    if last == "a":
        return s[:-2] if prev == "i" else s[:-1]
    if last == "o":
        return s[:-2] if prev == "i" else s[:-1]
    return s


# ---------------------------------------------------------------------------
# PortugueseLightStemmer (PortugueseLightStemmer.java:39-180): plural suffix
# removal → feminine normalization → final-vowel strip → accent fold.

_PT_FOLD = str.maketrans("àáâäãòóôöõèéêëùúûüìíîïç", "aaaaaooooo" "eeee" "uuuu" "iiii" "c")


def _pt_remove_suffix(s: list[str], n: int) -> int:
    if n > 4 and _ends(s, n, "es") and s[n - 3] in "rslz":
        return n - 2
    if n > 3 and _ends(s, n, "ns"):
        s[n - 2] = "m"
        return n - 1
    if n > 4 and (_ends(s, n, "eis") or _ends(s, n, "éis")):
        s[n - 3] = "e"
        s[n - 2] = "l"
        return n - 1
    if n > 4 and _ends(s, n, "ais"):
        s[n - 2] = "l"
        return n - 1
    if n > 4 and _ends(s, n, "óis"):
        s[n - 3] = "o"
        s[n - 2] = "l"
        return n - 1
    if n > 4 and _ends(s, n, "is"):
        s[n - 1] = "l"
        return n
    if n > 3 and (_ends(s, n, "ões") or _ends(s, n, "ães")):
        n -= 1
        s[n - 2] = "ã"
        s[n - 1] = "o"
        return n
    if n > 6 and _ends(s, n, "mente"):
        return n - 5
    if n > 3 and s[n - 1] == "s":
        return n - 1
    return n


def _pt_norm_feminine(s: list[str], n: int) -> int:
    if n > 7 and (_ends(s, n, "inha") or _ends(s, n, "iaca") or _ends(s, n, "eira")):
        s[n - 1] = "o"
        return n
    if n > 6:
        if (_ends(s, n, "osa") or _ends(s, n, "ica") or _ends(s, n, "ida")
                or _ends(s, n, "ada") or _ends(s, n, "iva") or _ends(s, n, "ama")):
            s[n - 1] = "o"
            return n
        if _ends(s, n, "ona"):
            s[n - 3] = "ã"
            s[n - 2] = "o"
            return n - 1
        if _ends(s, n, "ora"):
            return n - 1
        if _ends(s, n, "esa"):
            s[n - 3] = "ê"
            return n - 1
        if _ends(s, n, "na"):
            s[n - 1] = "o"
            return n
    return n


def portuguese_light_stem(token: str) -> str:
    if len(token) < 4:
        return token
    s = list(token)
    n = _pt_remove_suffix(s, len(s))
    if n > 3 and s[n - 1] == "a":
        n = _pt_norm_feminine(s, n)
    if n > 4 and s[n - 1] in ("e", "a", "o"):
        n -= 1
    return "".join(s[:n]).translate(_PT_FOLD)


# ---------------------------------------------------------------------------
# chain registry + the position-preserving token pipeline

_CHAINS: dict[str, tuple] = {
    # lang: (pre_stop transform | None, stop set, stem fn | None).
    # A 4th element, when present, REPLACES the default Java lowercase
    # (Irish/Greek/Turkish ship language-specific lowercase filters).
    "de": (None, STOP_DE, lambda t: german_light_stem(german_normalize(t))),
    "fr": (lambda t: elide(t, FR_ARTICLES), STOP_FR, french_light_stem),
    "es": (None, STOP_ES, spanish_light_stem),
    "it": (lambda t: elide(t, IT_ARTICLES), STOP_IT, italian_light_stem),
    "pt": (None, STOP_PT, portuguese_light_stem),
    "ru": (None, STOP_RU, russian_stem),  # RussianAnalyzer.java:152-163
    # ArabicAnalyzer.java:138-151 — stop BEFORE normalization (:143-144),
    # then normalize + light10 stem
    "ar": (None, STOP_AR, lambda t: arabic_stem(arabic_normalize(t))),
    "en": (strip_possessive, ENGLISH_STOP_WORDS, porter_stem),
    # DanishAnalyzer.java:123-129 / NorwegianAnalyzer.java:123-129 /
    # SwedishAnalyzer.java:123-129 — Snowball stemmers, fuzz-verified
    # 0/30,000 vs the reference's compiled code (analysis/scandinavian.py)
    "da": (None, STOP_DA, danish_stem),
    "no": (None, STOP_NO, norwegian_stem),
    "sv": (None, STOP_SV, swedish_stem),
    # DutchAnalyzer.java:192-200 — the default ctor installs a 4-entry
    # StemmerOverrideFilter (DutchAnalyzer.java:99-103); overridden terms
    # are keyword-marked, so the Snowball stemmer skips them
    "nl": (None, STOP_NL, lambda t: _NL_STEM_DICT.get(t) or dutch_stem(t)),
    # CzechAnalyzer.java:139-147 / BulgarianAnalyzer.java:123-129 /
    # LatvianAnalyzer.java:121-127 / IndonesianAnalyzer.java:121-127
    "cs": (None, STOP_CZ, czech_stem),
    "bg": (None, STOP_BG, bulgarian_stem),
    "lv": (None, STOP_LV, latvian_stem),
    "id": (None, STOP_ID, indonesian_stem),
    # HindiAnalyzer.java:135-142: normalize BEFORE the stop check
    "hi": (lambda t: hindi_normalize(indic_normalize(t)), STOP_HI,
           hindi_stem),
    # PersianAnalyzer.java:126-134: normalization only, no stemmer
    "fa": (lambda t: persian_normalize(arabic_normalize(t)), STOP_FA, None),
    # RomanianAnalyzer.java:126-132 (4.4 tables use cedilla ş/ţ, like the
    # reference — no comma-below folding)
    "ro": (None, STOP_RO, romanian_stem),
    # HungarianAnalyzer.java:123-129 / FinnishAnalyzer.java:123-129
    "hu": (None, STOP_HU, hungarian_stem),
    "fi": (None, STOP_FI, finnish_stem),
    # CatalanAnalyzer.java:137-146 (elision before lower ≡ after, the
    # article set is ignoreCase) / BasqueAnalyzer.java:121-127 /
    # ArmenianAnalyzer.java:121-127
    "ca": (lambda t: elide(t, CA_ARTICLES), STOP_CA, catalan_stem),
    "eu": (None, STOP_EU, basque_stem),
    "hy": (None, STOP_HY, armenian_stem),
    # IrishAnalyzer.java:137-151: hyphenations stop + elision + Irish
    # lowercase all run BEFORE the stop check (custom lower slot)
    "ga": (None, STOP_GA, irish_stem, irish_pre_lower),
    # GreekAnalyzer.java:114-121: Greek lowercase (final sigma → σ, tonos
    # folds) runs BEFORE the stop check; Ntais stemmer after
    "el": (None, STOP_EL, greek_stem, greek_lower),
    # GalicianAnalyzer.java:121-127 — full RSLP-G stemmer
    "gl": (None, STOP_GL, galician_stem),
    # BrazilianAnalyzer.java:128-136 — the dedicated 2001 stemmer; mapped
    # to the pt-BR locale tag (plain "pt" keeps the PortugueseAnalyzer
    # light chain, like the reference's per-analyzer split)
    "pt-br": (None, STOP_BR, brazilian_stem),
    # TurkishAnalyzer.java:125-131: Turkish lowercase (İ/I dotted-dotless)
    # replaces the default lower; stop on the lowered form; Snowball stem
    "tr": (None, STOP_TR, turkish_stem, turkish_lower),
    # PolishAnalyzer.java (analysis/stempel): stop BEFORE the stempel
    # patch-trie stemmer; minLength=3 pass-through is inside polish_stem
    "pl": (None, STOP_PL, polish_stem),
}
# CJK languages take the bigram path and Thai the dictionary-segmentation
# path — structural transforms (token boundaries depend on the text, not a
# per-token chain) — see analysis/cjk.py / analysis/thai.py
_CJK_LANGS = frozenset(("zh", "ja", "ko"))
_STRUCT_LANGS = _CJK_LANGS | frozenset(("th",))
_STANDARD = (None, ENGLISH_STOP_WORDS, None)  # StandardAnalyzer fallback

SUPPORTED_LANGS = frozenset(_CHAINS) | _STRUCT_LANGS

# (lang, surface) → final term; bounded like english._STEM_CACHE
_LANG_STEM_CACHE: dict[tuple[str, str], str] = {}


def _chain_for(lang: str | None):
    return _CHAINS.get(lang or "", _STANDARD)


def analyze_token(token: str, lang: str | None) -> str:
    """One raw (cased) token → final indexed term, or "" if the chain drops
    it. Positions are the caller's job (every input token consumes one)."""
    if len(token) > MAX_TOKEN_LENGTH:
        return ""
    key = (lang or "", token)
    hit = _LANG_STEM_CACHE.get(key)
    if hit is not None:
        return hit
    chain = _chain_for(lang)
    pre, stop, stem = chain[0], chain[1], chain[2]
    lower = chain[3] if len(chain) > 3 else _java_lower
    t = lower(token)
    if pre is not None:
        t = pre(t)
    out = "" if (not t or t in stop) else (stem(t) if stem else t)
    if len(_LANG_STEM_CACHE) > 1_000_000:  # bound worker memory
        _LANG_STEM_CACHE.clear()
    _LANG_STEM_CACHE[key] = out
    return out


def lang_analyze(text: str | None, lang: str | None) -> list[tuple[int, str]]:
    """Query/fidelity-side chain: [(pre-stop position, term)] post-stop —
    the exact mirror of what the inverter indexes under tokenizer='lang'."""
    if not text:
        return []
    if lang in _CJK_LANGS:
        from .cjk import cjk_analyze

        return cjk_analyze(text)
    if lang == "th":
        from .thai import thai_analyze

        return thai_analyze(text)
    out: list[tuple[int, str]] = []
    for pos, m in enumerate(_PY_TOKEN_RE.finditer(text)):
        term = analyze_token(m.group(0), lang)
        if term:
            out.append((pos, term))
    return out


def _analyzed_placeholder_tokens(text: str | None, lang: str | None) -> list[str]:
    """Index-side form: one slot per raw token, "" where the chain drops it
    (the inverter filters empties but counts every slot as a position)."""
    if not text:
        return []
    if lang in _CJK_LANGS:
        from .cjk import cjk_placeholder_tokens

        return cjk_placeholder_tokens(text)
    if lang == "th":
        from .thai import thai_placeholder_tokens

        return thai_placeholder_tokens(text)
    return [analyze_token(m.group(0), lang) for m in _PY_TOKEN_RE.finditer(text)]


@F.pandas_udf(ArrayType(StringType()))
def _lang_tokens_udf(texts: pd.Series, langs: pd.Series) -> pd.Series:
    return pd.Series(
        [_analyzed_placeholder_tokens(t, lg) for t, lg in zip(texts, langs)]
    )


def lang_token_array(text: Column, lang: Column) -> Column:
    """(text, lang) → array<string> of final analyzed terms with ""
    placeholders at dropped positions. Arrow-batched fidelity path — every
    token goes through Python. The index build uses the factorized fast
    path below (`raw_lang_token_array` + `finalize_token_batch`) instead;
    this stays as the reference implementation their equivalence tests
    compare against, and as the CJK structural transform."""
    return _lang_tokens_udf(text, lang)


# ---------------------------------------------------------------------------
# Vectorized index-build path: JVM tokenization + per-distinct-surface chain.
#
# The Java-regex twin of analyzer._PY_TOKEN_RE, RAW (cased) so the chains'
# language-specific lowercase slots (Irish/Greek/Turkish) see the original
# case. Same alternation: one token per CJK ideograph / Hiragana char,
# Katakana runs, and word runs of \p{L}\p{N} (CJK excluded) extended by
# combining marks (UAX#29 WB4) and joined across ' ’ . (MidLetter/
# MidNumLet) or a digit-flanked comma (MidNum). \p{Nd} mirrors Python's
# \d. Fuzz-verified token-identical to _PY_TOKEN_RE on the sf0.01 corpus
# (500 docs) and 4,000 random-unicode strings spanning Latin+marks,
# Devanagari, Arabic, CJK, Katakana, fullwidth forms (0 diffs) —
# tests/test_lang_vectorized.py.
_J_CJK = "一-鿿㐀-䶿豈-﫿"
_J_KATA = "゠-ヿ"
_J_HIRA = "぀-ゟ"
_J_W = f"(?:(?![{_J_CJK}{_J_KATA}{_J_HIRA}])[\\p{{L}}\\p{{N}}])"
_J_C = f"(?:{_J_W}|\\p{{M}})"
RAW_TOKEN_REGEX_JAVA = (
    f"([{_J_CJK}])|([{_J_KATA}]+)|([{_J_HIRA}])"
    f"|({_J_W}{_J_C}*"
    f"(?:['’.]{_J_W}{_J_C}*|(?<=\\p{{Nd}}),(?=\\p{{Nd}}){_J_W}{_J_C}*)*)"
)


def raw_lang_token_array(text: Column, lang: Column) -> Column:
    """Build-side pre-chain token column: JVM regexp (whole-stage codegen,
    RAW cased tokens) for every non-CJK row; CJK rows take the structural
    bigram transform via the Arrow UDF with the text column MASKED to null
    for non-CJK rows, so a Latin-script corpus ships nulls — not text —
    through Arrow and pays no per-token Python anywhere. The per-language
    chain then runs in the inverter once per distinct (lang, surface) via
    `finalize_token_batch`, never per token."""
    struct = lang.isin(*sorted(_STRUCT_LANGS))
    return F.when(
        struct, _lang_tokens_udf(F.when(struct, text), lang)
    ).otherwise(F.regexp_extract_all(text, F.lit(RAW_TOKEN_REGEX_JAVA), 0))


def _sanitize_langs(langs) -> np.ndarray:
    return np.asarray(
        [lg if isinstance(lg, str) else "" for lg in langs], dtype=object
    )


def finalize_token_batch(
    flat_terms: np.ndarray, flat_langs: np.ndarray
) -> np.ndarray:
    """Map a flat batch of RAW surface tokens to final indexed terms (""
    where the chain drops the token), running the chain ONCE per distinct
    (lang, surface) pair — the english.py stem_tokens factorization
    generalized to the whole chain registry. CJK rows' tokens arrive
    already-final from the bigram transform and pass through unchanged.
    Python cost is ∝ new vocabulary per batch (amortized further by the
    cross-batch _LANG_STEM_CACHE), not ∝ corpus tokens."""
    codes, uniques = pd.factorize(flat_terms, sort=False)
    lcodes, luniq = pd.factorize(flat_langs, sort=False)
    n_langs = max(len(luniq), 1)
    if len(luniq) <= 1:
        # single-language batch: one vocabulary pass, no combined key
        lg = luniq[0] if len(luniq) else ""
        if lg in _STRUCT_LANGS:
            return flat_terms
        final = np.asarray(
            [analyze_token(u, lg) for u in uniques], dtype=object
        )
        return final[codes]
    comb = codes.astype(np.int64) * n_langs + lcodes
    ccodes, cuniq = pd.factorize(comb, sort=False)
    final = np.empty(len(cuniq), dtype=object)
    for i, v in enumerate(cuniq):
        surf = uniques[v // n_langs]
        lg = luniq[v % n_langs]
        final[i] = surf if lg in _STRUCT_LANGS else analyze_token(surf, lg)
    return final[ccodes]


@F.pandas_udf(LongType())
def _lang_dl_udf(toks: pd.Series, langs: pd.Series) -> pd.Series:
    lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
    total = int(lens.sum())
    if total == 0:
        return pd.Series(np.zeros(len(toks), dtype=np.int64))
    flat = np.concatenate(
        [np.asarray(t, dtype=object) for t in toks if len(t)]
    )
    flat_langs = np.repeat(_sanitize_langs(langs), lens)
    keep = (finalize_token_batch(flat, flat_langs) != "").astype(np.int64)
    row_idx = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
    return pd.Series(
        np.bincount(row_idx, weights=keep, minlength=len(toks)).astype(np.int64)
    )


def lang_doc_length_col(text: Column, lang: Column) -> Column:
    """Post-stop doc length under the per-language chain (norms input).
    Tokenization stays JVM-side; the Arrow hop carries token arrays and the
    chain runs per distinct (lang, surface), not per token."""
    return _lang_dl_udf(raw_lang_token_array(text, lang), lang)


def lang_doc_length_col_fidelity(text: Column, lang: Column) -> Column:
    """Doc length via the per-token reference UDF (tokenizer='lang-fidelity')."""
    return F.size(F.filter(lang_token_array(text, lang), lambda t: F.length(t) > 0))


def stem_for_lang(lang: str, word: str) -> str:
    """The bare stemmer for `lang` (no tokenize/lower/stop) — the unit
    tools/stemmer_oracle.py fuzz-compares against the reference's own
    compiled stemmer classes."""
    stem = _CHAINS[lang][2]
    return stem(word) if stem else word

"""Factory-only light/minimal stemmers with reference vocabulary fixtures.

These back the reference's *LightStemFilterFactory /
*MinimalStemFilterFactory registrations that the default analyzers do NOT
use (the analyzer-default chains live in lang.py):

- swedish_light    SwedishLightStemmer.java:66-110    (svlighttestdata.zip)
- finnish_light    FinnishLightStemmer.java:66-266    (filighttestdata.zip)
- hungarian_light  HungarianLightStemmer.java:43-245  (hulighttestdata.zip)
- russian_light    RussianLightStemmer.java:66-151    (rulighttestdata.zip)
- norwegian_light  NorwegianLightStemmer.java:85-180  (flags: BOKMAAL/NYNORSK)
- norwegian_minimal NorwegianMinimalStemmer.java:82-111
- german_minimal   GermanMinimalStemmer.java:64-94    (deminimaltestdata.zip)
- french_minimal   FrenchMinimalStemmer.java:62-79    (frminimaltestdata.zip)
- english_minimal  EnglishMinimalStemmer.java:28-45   (Harman S-stemmer)
- portuguese_minimal / galician_minimal — the RSLP "Plural" step only
- portuguese_rslp  PortugueseStemmer.java:46-83 over portuguese.rslp
                   (ptrslptestdata.zip / ptminimaltestdata.zip)

Each is byte-identical on its fixture where one ships.
"""

from __future__ import annotations

from .galician import _apply
from .galician_rules import STEPS as _GL_STEPS
from .portuguese_rules import STEPS as _PT_STEPS

BOKMAAL, NYNORSK = 1, 2

_EN_VOWELS = frozenset("aeiouy")


def swedish_light_stem(word: str) -> str:
    s = word
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 7 and s.endswith(("elser", "heten")):
        return s[:-5]
    if n > 6 and s.endswith(("arne", "erna", "ande", "else", "aste",
                             "orna", "aren")):
        return s[:-4]
    if n > 5 and s.endswith(("are", "ast", "het")):
        return s[:-3]
    if n > 4 and s.endswith(("ar", "er", "or", "en", "at", "te", "et")):
        return s[:-2]
    if n > 3 and s[-1] in "taen":
        return s[:-1]
    return s


def hungarian_light_stem(word: str) -> str:
    s = word.translate(str.maketrans(
        {"á": "a", "ë": "e", "é": "e", "í": "i", "ó": "o", "ő": "o",
         "õ": "o", "ö": "o", "ú": "u", "ű": "u", "ũ": "u", "û": "u",
         "ü": "u"}))

    def vowel(c: str) -> bool:
        return c in _EN_VOWELS

    # removeCase
    n = len(s)
    if n > 6 and s.endswith("kent"):
        s = s[:-4]
    elif n > 5 and s.endswith(("nak", "nek", "val", "vel", "ert", "rol",
                               "ban", "ben", "bol", "nal", "nel", "hoz",
                               "hez", "tol")):
        s = s[:-3]
    elif n > 5 and s.endswith(("al", "el")) and not vowel(s[-3]) \
            and s[-3] == s[-4]:
        s = s[:-3]
    elif n > 4:
        if s.endswith(("at", "et", "ot", "va", "ve", "ra", "re", "ba",
                       "be", "ul", "ig")):
            s = s[:-2]
        elif s.endswith(("on", "en")) and not vowel(s[-3]):
            s = s[:-2]
        elif s[-1] in ("t", "n"):
            s = s[:-1]
        elif s[-1] in ("a", "e") and s[-2] == s[-3] and not vowel(s[-2]):
            s = s[:-2]

    # removePossessive
    n = len(s)
    if n > 6 and ((not vowel(s[-5]) and s.endswith(("atok", "otok",
                                                    "etek")))
                  or s.endswith(("itek", "itok"))):
        s = s[:-4]
    elif n > 5 and ((not vowel(s[-4]) and s.endswith(("unk", "tok",
                                                      "tek")))
                    or (vowel(s[-4]) and s.endswith("juk"))
                    or s.endswith("ink")):
        s = s[:-3]
    elif n > 4 and ((not vowel(s[-3]) and s.endswith(
            ("am", "em", "om", "ad", "ed", "od", "uk")))
            or (vowel(s[-3]) and s.endswith(("nk", "ja", "je")))
            or s.endswith(("im", "id", "ik"))):
        s = s[:-2]
    elif n > 3:
        if s[-1] in ("a", "e"):
            if not vowel(s[-2]):
                s = s[:-1]
        elif s[-1] in ("m", "d"):
            if vowel(s[-2]):
                s = s[:-1]
        elif s[-1] == "i":
            s = s[:-1]

    # removePlural (the reference's intentional fallthrough: aok/eok/... of
    # length exactly 4 drop only the k)
    if len(s) > 3 and s[-1] == "k":
        if s[-2] in ("a", "o", "e") and len(s) > 4:
            s = s[:-2]
        else:
            s = s[:-1]

    # normalize
    if len(s) > 3 and s[-1] in "aeio":
        s = s[:-1]
    return s


_RU_3 = ("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему",
         "ери", "ими", "ого", "ому", "ыми", "оев")
_RU_2 = ("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв",
         "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев",
         "ий", "им", "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми")


def russian_light_stem(word: str) -> str:
    s = word
    n = len(s)
    if n > 6 and s.endswith(("иями", "оями")):
        s = s[:-4]
    elif n > 5 and s.endswith(_RU_3):
        s = s[:-3]
    elif n > 4 and s.endswith(_RU_2):
        s = s[:-2]
    elif n > 3 and s[-1] in "аеиоуйыяь":
        s = s[:-1]
    # normalize
    if len(s) > 3:
        if s[-1] in ("ь", "и"):
            s = s[:-1]
        elif s[-1] == "н" and s[-2] == "н":
            s = s[:-1]
    return s


def finnish_light_stem(word: str) -> str:
    if len(word) < 4:
        return word
    s = word.translate(str.maketrans({"ä": "a", "å": "a", "ö": "o"}))

    def vowel(c: str) -> bool:
        return c in _EN_VOWELS

    # step1 (recursive particle strip)
    while True:
        n = len(s)
        if n > 8 and s.endswith("kin"):
            s = s[:-3]
            continue
        if n > 8 and s.endswith("ko"):
            s = s[:-2]
            continue
        break
    n = len(s)
    if n > 11:
        if s.endswith("dellinen"):
            s = s[:-8]
        elif s.endswith("dellisuus"):
            s = s[:-9]

    # step2
    n = len(s)
    if n > 5:
        if s.endswith(("lla", "tse", "sti")):
            s = s[:-3]
        elif s.endswith("ni"):
            s = s[:-2]
        elif s.endswith("aa"):
            s = s[:-1]

    # step3
    n = len(s)
    done = False
    if n > 8:
        if s.endswith("nnen"):
            s = s[:-4] + "s"
            done = True
        elif s.endswith("ntena"):
            s = s[:-5] + "s"
            done = True
        elif s.endswith("tten"):
            s = s[:-4]
            done = True
        elif s.endswith("eiden"):
            s = s[:-5]
            done = True
    if not done and n > 6:
        if s.endswith(("neen", "niin", "seen", "teen", "inen")):
            s = s[:-4]
            done = True
        elif s[-3] == "h" and vowel(s[-2]) and s[-1] == "n":
            s = s[:-3]
            done = True
        elif s.endswith("den"):
            s = s[:-3] + "s"
            done = True
        elif s.endswith("ksen"):
            s = s[:-4] + "s"
            done = True
        elif s.endswith(("ssa", "sta", "lla", "lta", "tta", "ksi",
                         "lle")):
            s = s[:-3]
            done = True
    if not done and n > 5:
        if s.endswith(("na", "ne")):
            s = s[:-2]
            done = True
        elif s.endswith("nei"):
            s = s[:-3]
            done = True
    if not done and n > 4:
        if s.endswith(("ja", "ta")):
            s = s[:-2]
        elif s[-1] == "a":
            s = s[:-1]
        elif s[-1] == "n" and vowel(s[-2]):
            s = s[:-2]
        elif s[-1] == "n":
            s = s[:-1]

    # norm1
    if len(s) > 5 and s.endswith("hde"):
        s = s[:-3] + "ksi"
    if len(s) > 4 and s.endswith(("ei", "at")):
        s = s[:-2]
    elif len(s) > 3 and s[-1] in "tsjeai":
        s = s[:-1]

    # norm2
    if len(s) > 8 and s[-1] in "eou":
        s = s[:-1]
    if len(s) > 4:
        if s[-1] == "i":
            s = s[:-1]
        if len(s) > 4:
            w = list(s)
            ch = w[0]
            i = 1
            while i < len(w):
                if w[i] == ch and ch in ("k", "p", "t"):
                    del w[i]
                else:
                    ch = w[i]
                    i += 1
            s = "".join(w)
    return s


def norwegian_light_stem(word: str, flags: int = BOKMAAL) -> str:
    bm = bool(flags & BOKMAAL)
    nn = bool(flags & NYNORSK)
    s = word
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 7 and ((s.endswith(("heter", "heten")) and bm)
                  or (s.endswith("heita") and nn)):
        return s[:-5]
    if n > 8 and nn and s.endswith(("heiter", "leiken", "leikar")):
        return s[:-6]
    if n > 5 and (s.endswith("dom") or (s.endswith("het") and bm)):
        return s[:-3]
    if n > 6 and nn and s.endswith(("heit", "semd", "leik")):
        return s[:-4]
    if n > 7 and s.endswith(("elser", "elsen")):
        return s[:-5]
    if n > 6 and ((s.endswith(("ende", "este", "eren")) and bm)
                  or (s.endswith(("ande", "aste", "aren")) and nn)
                  or s.endswith("else")):
        return s[:-4]
    if n > 5 and ((s.endswith(("ere", "est")) and bm)
                  or (s.endswith(("are", "ast", "ane")) and nn)
                  or s.endswith("ene")):
        return s[:-3]
    if n > 4 and (s.endswith(("er", "en", "et", "te"))
                  or (s.endswith("ar") and nn)
                  or (s.endswith("st") and bm)):
        return s[:-2]
    if n > 3 and s[-1] in "aen":
        return s[:-1]
    return s


def norwegian_minimal_stem(word: str, flags: int = BOKMAAL) -> str:
    nn = bool(flags & NYNORSK)
    s = word
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 5 and (s.endswith("ene") or (s.endswith("ane") and nn)):
        return s[:-3]
    if n > 4 and (s.endswith(("er", "en", "et"))
                  or (s.endswith("ar") and nn)):
        return s[:-2]
    if n > 3 and s[-1] in "ae":
        return s[:-1]
    return s


def german_minimal_stem(word: str) -> str:
    if len(word) < 5:
        return word
    s = word.translate(str.maketrans("äöü", "aou"))
    n = len(s)
    if n > 6 and s.endswith("nen"):
        return s[:-3]
    if n > 5 and s.endswith(("en", "se", "es", "er")):
        return s[:-2]
    if s[-1] in "nesr":
        return s[:-1]
    return s


def french_minimal_stem(word: str) -> str:
    if len(word) < 6:
        return word
    s = word
    if s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u":
            return s[:-2] + "l"  # aux → al
        return s[:-1]
    if s[-1] == "s":
        s = s[:-1]
    if s[-1] == "r":
        s = s[:-1]
    if s[-1] == "e":
        s = s[:-1]
    if s[-1] == "é":
        s = s[:-1]
    if len(s) >= 2 and s[-1] == s[-2]:
        s = s[:-1]
    return s


def english_minimal_stem(word: str) -> str:
    """Harman S-stemmer (EnglishMinimalStemmer.java:28-45)."""
    s = word
    if len(s) < 3 or s[-1] != "s":
        return s
    p = s[-2]
    if p in ("u", "s"):
        return s
    if p == "e":
        if len(s) > 3 and s[-3] == "i" and s[-4] not in ("a", "e"):
            return s[:-3] + "y"
        if s[-3] in ("i", "a", "o", "e"):
            return s
    return s[:-1]


def portuguese_minimal_stem(word: str) -> str:
    return _apply(_PT_STEPS["Plural"], word)


def galician_minimal_stem(word: str) -> str:
    return _apply(_GL_STEPS["Plural"], word)


_PT_ACCENT = str.maketrans(
    "àáâãäåçèéêëìíîïñòóôõöùúûü", "aaaaaaceeeeiiiinooooouuuu")


def portuguese_rslp_stem(word: str) -> str:
    """Full RSLP (PortugueseStemmer.java:46-83): Plural → Adverb →
    Feminine → Augmentative → (Noun, else Verb, else Vowel) → accents."""
    s = word
    s = _apply(_PT_STEPS["Plural"], s)
    s = _apply(_PT_STEPS["Adverb"], s)
    s = _apply(_PT_STEPS["Feminine"], s)
    s = _apply(_PT_STEPS["Augmentative"], s)
    t = _apply(_PT_STEPS["Noun"], s)
    if t == s:
        t = _apply(_PT_STEPS["Verb"], s)
        if t == s:
            t = _apply(_PT_STEPS["Vowel"], s)
    return t.translate(_PT_ACCENT)

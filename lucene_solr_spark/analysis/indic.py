"""Hindi analysis chain: Indic script normalization, Hindi spelling
normalization, Hindi light stemmer.

Reference chain (HindiAnalyzer.java:135-142): LowerCase →
IndicNormalizationFilter → HindiNormalizationFilter → Stop(hi/stopwords.txt,
'#') → HindiStemFilter (the stop check runs on the NORMALIZED form).

- indic_normalize re-derives IndicNormalizer.java:77-294: compose
  2/3-codepoint sequences into their canonical single codepoint per script
  (Unicode 5.2 + LDC table); the decomposition table is spec data.
- hindi_normalize re-derives HindiNormalizer.java:43-180 (Pingali & Varma
  plus the Larkey CLIR additions): nukta folds, chandrabindu→bindu,
  virama/ZWJ deletion, long→short vowel folds.
- hindi_stem re-derives HindiStemmer.java:32-122 (Ramanathan & Rao
  lightweight stemmer): longest of the published 1-5 char suffix lists with
  per-length minimum stem lengths.

All fuzz-verified byte-identical via tools/stemmer_oracle.py.
"""

from __future__ import annotations

# --- IndicNormalizer ---------------------------------------------------------

_SCRIPTS = {  # block range start → (flag, base)
    "dev": (1, 0x0900), "ben": (2, 0x0980), "gur": (4, 0x0A00),
    "guj": (8, 0x0A80), "ori": (16, 0x0B00), "tam": (32, 0x0B80),
    "tel": (64, 0x0C00), "kan": (128, 0x0C80), "mal": (256, 0x0D00),
}
_DEV, _BEN, _GUR, _GUJ, _ORI, _TAM, _TEL, _KAN, _MAL = (
    1, 2, 4, 8, 16, 32, 64, 128, 256)

# (ch1, ch2, ch3, result, script-flags) — offsets into the script codepage,
# -1 = absent, 0xFF = zero-width joiner (IndicNormalizer.java:77-221)
_DECOMPOSITIONS = [
    (0x05, 0x3E, 0x45, 0x11, _DEV | _GUJ),
    (0x05, 0x3E, 0x46, 0x12, _DEV),
    (0x05, 0x3E, 0x47, 0x13, _DEV | _GUJ),
    (0x05, 0x3E, 0x48, 0x14, _DEV | _GUJ),
    (0x05, 0x3E, -1, 0x06, _DEV | _BEN | _GUR | _GUJ | _ORI),
    (0x05, 0x45, -1, 0x72, _DEV),
    (0x05, 0x45, -1, 0x0D, _GUJ),
    (0x05, 0x46, -1, 0x04, _DEV),
    (0x05, 0x47, -1, 0x0F, _GUJ),
    (0x05, 0x48, -1, 0x10, _GUR | _GUJ),
    (0x05, 0x49, -1, 0x11, _DEV | _GUJ),
    (0x05, 0x4A, -1, 0x12, _DEV),
    (0x05, 0x4B, -1, 0x13, _DEV | _GUJ),
    (0x05, 0x4C, -1, 0x14, _DEV | _GUR | _GUJ),
    (0x06, 0x45, -1, 0x11, _DEV | _GUJ),
    (0x06, 0x46, -1, 0x12, _DEV),
    (0x06, 0x47, -1, 0x13, _DEV | _GUJ),
    (0x06, 0x48, -1, 0x14, _DEV | _GUJ),
    (0x07, 0x57, -1, 0x08, _MAL),
    (0x09, 0x41, -1, 0x0A, _DEV),
    (0x09, 0x57, -1, 0x0A, _TAM | _MAL),
    (0x0E, 0x46, -1, 0x10, _MAL),
    (0x0F, 0x45, -1, 0x0D, _DEV),
    (0x0F, 0x46, -1, 0x0E, _DEV),
    (0x0F, 0x47, -1, 0x10, _DEV),
    (0x0F, 0x57, -1, 0x10, _ORI),
    (0x12, 0x3E, -1, 0x13, _MAL),
    (0x12, 0x4C, -1, 0x14, _TEL | _KAN),
    (0x12, 0x55, -1, 0x13, _TEL),
    (0x12, 0x57, -1, 0x14, _TAM | _MAL),
    (0x13, 0x57, -1, 0x14, _ORI),
    (0x15, 0x3C, -1, 0x58, _DEV),
    (0x16, 0x3C, -1, 0x59, _DEV | _GUR),
    (0x17, 0x3C, -1, 0x5A, _DEV | _GUR),
    (0x1C, 0x3C, -1, 0x5B, _DEV | _GUR),
    (0x21, 0x3C, -1, 0x5C, _DEV | _BEN | _ORI),
    (0x22, 0x3C, -1, 0x5D, _DEV | _BEN | _ORI),
    (0x23, 0x4D, 0xFF, 0x7A, _MAL),
    (0x24, 0x4D, 0xFF, 0x4E, _BEN),
    (0x28, 0x3C, -1, 0x29, _DEV),
    (0x28, 0x4D, 0xFF, 0x7B, _MAL),
    (0x2B, 0x3C, -1, 0x5E, _DEV | _GUR),
    (0x2F, 0x3C, -1, 0x5F, _DEV | _BEN),
    (0x2C, 0x41, 0x41, 0x0B, _TEL),
    (0x30, 0x3C, -1, 0x31, _DEV),
    (0x30, 0x4D, 0xFF, 0x7C, _MAL),
    (0x32, 0x4D, 0xFF, 0x7D, _MAL),
    (0x33, 0x3C, -1, 0x34, _DEV),
    (0x33, 0x4D, 0xFF, 0x7E, _MAL),
    (0x35, 0x41, -1, 0x2E, _TEL),
    (0x3E, 0x45, -1, 0x49, _DEV | _GUJ),
    (0x3E, 0x46, -1, 0x4A, _DEV),
    (0x3E, 0x47, -1, 0x4B, _DEV | _GUJ),
    (0x3E, 0x48, -1, 0x4C, _DEV | _GUJ),
    (0x3F, 0x55, -1, 0x40, _KAN),
    (0x41, 0x41, -1, 0x42, _GUR),
    (0x46, 0x3E, -1, 0x4A, _TAM | _MAL),
    (0x46, 0x42, 0x55, 0x4B, _KAN),
    (0x46, 0x42, -1, 0x4A, _KAN),
    (0x46, 0x46, -1, 0x48, _MAL),
    (0x46, 0x55, -1, 0x47, _TEL | _KAN),
    (0x46, 0x56, -1, 0x48, _TEL | _KAN),
    (0x46, 0x57, -1, 0x4C, _TAM | _MAL),
    (0x47, 0x3E, -1, 0x4B, _BEN | _ORI | _TAM | _MAL),
    (0x47, 0x57, -1, 0x4C, _BEN | _ORI),
    (0x4A, 0x55, -1, 0x4B, _KAN),
    (0x72, 0x3F, -1, 0x07, _GUR),
    (0x72, 0x40, -1, 0x08, _GUR),
    (0x72, 0x47, -1, 0x0F, _GUR),
    (0x73, 0x41, -1, 0x09, _GUR),
    (0x73, 0x42, -1, 0x0A, _GUR),
    (0x73, 0x4B, -1, 0x13, _GUR),
]

# per-script set of first-offsets that can start a composition
_DECOMP_STARTS = {
    flag: {row[0] for row in _DECOMPOSITIONS if row[4] & flag}
    for flag, _ in _SCRIPTS.values()
}


def _script_of(cp: int) -> tuple[int, int] | None:
    """(flag, base) when cp is in one of the nine Indic blocks (each spans
    0x80 codepoints from its base)."""
    if 0x0900 <= cp < 0x0D80:
        base = cp & ~0x7F
        for flag, b in _SCRIPTS.values():
            if b == base:
                return flag, base
    return None


def indic_normalize(word: str) -> str:
    buf = list(word)
    i = 0
    while i < len(buf):
        sd = _script_of(ord(buf[i]))
        if sd is not None:
            flag, base = sd
            ch0 = ord(buf[i]) - base
            if ch0 in _DECOMP_STARTS[flag] and i + 1 < len(buf):
                sd1 = _script_of(ord(buf[i + 1]))
                if sd1 is not None and sd1[1] == base:
                    ch1 = ord(buf[i + 1]) - base
                    ch2 = -1
                    if i + 2 < len(buf):
                        if buf[i + 2] == chr(0x200D):  # ZWJ
                            ch2 = 0xFF
                        else:
                            sd2 = _script_of(ord(buf[i + 2]))
                            if sd2 is not None and sd2[1] == base:
                                ch2 = ord(buf[i + 2]) - base
                    for c0, c1, c2, res, flags in _DECOMPOSITIONS:
                        if c0 == ch0 and flags & flag and c1 == ch1 \
                                and (c2 < 0 or c2 == ch2):
                            buf[i] = chr(base + res)
                            del buf[i + 1]
                            if c2 >= 0:
                                del buf[i + 1]
                            break
        i += 1
    return "".join(buf)


# --- HindiNormalizer ---------------------------------------------------------

# single-codepoint rewrites (HindiNormalizer.java:55-171); explicit chr()
# to keep precomposed-vs-sequence ambiguity out of the source
_HI_MAP = {chr(a): chr(b) for a, b in [
    (0x0901, 0x0902),  # candrabindu -> bindu
    (0x0929, 0x0928), (0x0931, 0x0930), (0x0934, 0x0933),  # nukta folds
    (0x0958, 0x0915), (0x0959, 0x0916), (0x095A, 0x0917),
    (0x095B, 0x091C), (0x095C, 0x0921), (0x095D, 0x0922),
    (0x095E, 0x092B), (0x095F, 0x092F),
    (0x0945, 0x0947), (0x0946, 0x0947),  # chandra/short -> standard
    (0x0949, 0x094B), (0x094A, 0x094B),
    (0x090D, 0x090F), (0x090E, 0x090F),
    (0x0911, 0x0913), (0x0912, 0x0913),
    (0x0972, 0x0905),
    (0x0906, 0x0905), (0x0908, 0x0907), (0x090A, 0x0909),  # long -> short
    (0x0960, 0x090B), (0x0961, 0x090C),
    (0x0910, 0x090F), (0x0914, 0x0913),
    (0x0940, 0x093F), (0x0942, 0x0941), (0x0944, 0x0943),
    (0x0963, 0x0962), (0x0948, 0x0947), (0x094C, 0x094B),
]}
_NUKTA, _VIRAMA, _ZWNJ, _ZWJ = (
    chr(0x093C), chr(0x094D), chr(0x200C), chr(0x200D))
_NA, _ANUSVARA = chr(0x0928), chr(0x0902)
_HI_DELETE = frozenset((_NUKTA, _VIRAMA, _ZWNJ, _ZWJ))


def hindi_normalize(word: str) -> str:
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        c = word[i]
        if c == _NA and i + 1 < n and word[i + 1] == _VIRAMA:
            out.append(_ANUSVARA)  # dead-n -> anusvara
            i += 2
            continue
        if c in _HI_DELETE:
            i += 1
            continue
        out.append(_HI_MAP.get(c, c))
        i += 1
    return "".join(out)


# --- HindiStemmer ------------------------------------------------------------

_HI_SUF_5 = ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")
_HI_SUF_4 = ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
             "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
             "ियों", "ियां")
_HI_SUF_3 = ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
             "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
             "ुआं")
_HI_SUF_2 = ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं",
             "ती", "ता", "ाँ", "ां", "ों", "ें")
_HI_SUF_1 = ("ो", "े", "ू", "ु", "ी", "ि", "ा")


def hindi_stem(word: str) -> str:
    n = len(word)
    if n > 6 and word.endswith(_HI_SUF_5):
        return word[:-5]
    if n > 5 and word.endswith(_HI_SUF_4):
        return word[:-4]
    if n > 4 and word.endswith(_HI_SUF_3):
        return word[:-3]
    if n > 3 and word.endswith(_HI_SUF_2):
        return word[:-2]
    if n > 2 and word.endswith(_HI_SUF_1):
        return word[:-1]
    return word

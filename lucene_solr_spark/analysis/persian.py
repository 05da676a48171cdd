"""Persian analysis chain.

Reference chain (PersianAnalyzer.java:126-134): LowerCase →
ArabicNormalizationFilter → PersianNormalizationFilter →
Stop(fa/stopwords.txt, '#'). No stemming — normalization only, with the
stop check on the normalized form.

persian_normalize re-derives PersianNormalizer.java:36-87: farsi yeh / yeh
barree → arabic yeh, keheh → kaf, heh-yeh / heh-goal → heh, hamza-above
deleted. Fuzz-verified byte-identical via tools/stemmer_oracle.py.
"""

from __future__ import annotations

_FA_MAP = {
    chr(0x06CC): chr(0x064A),  # farsi yeh → yeh
    chr(0x06D2): chr(0x064A),  # yeh barree → yeh
    chr(0x06A9): chr(0x0643),  # keheh → kaf
    chr(0x06C0): chr(0x0647),  # heh+yeh → heh
    chr(0x06C1): chr(0x0647),  # heh goal → heh
    chr(0x0654): "",           # hamza above → delete
}
_FA_TRANS = str.maketrans(_FA_MAP)


def persian_normalize(word: str) -> str:
    return word.translate(_FA_TRANS)

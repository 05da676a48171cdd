"""Indonesian stemmer (Tala, "A Study of Stemming Effects on Information
Retrieval in Bahasa Indonesia").

Reference chain (IndonesianAnalyzer.java:121-127): StandardTokenizer →
LowerCase → Stop(id/stopwords.txt, '#') → IndonesianStemFilter (full
derivational stemming by default). Re-derives IndonesianStemmer.java:46-268:
particle/possessive suffix removal gated on a live syllable (vowel) count,
then order-sensitive derivational prefix/suffix interaction with flags that
block suffixes after certain prefixes. Fuzz-verified byte-identical via
tools/stemmer_oracle.py.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")

_KE, _PENG, _DI, _MENG, _TER, _BER, _PE = 1, 2, 4, 8, 16, 32, 64


class _State:
    __slots__ = ("syll", "flags")

    def __init__(self, word: str):
        self.syll = sum(1 for c in word if c in _VOWELS)
        self.flags = 0


def _remove_particle(st: _State, s: str) -> str:
    if s.endswith(("kah", "lah", "pun")):
        st.syll -= 1
        return s[:-3]
    return s


def _remove_possessive(st: _State, s: str) -> str:
    if s.endswith(("ku", "mu")):
        st.syll -= 1
        return s[:-2]
    if s.endswith("nya"):
        st.syll -= 1
        return s[:-3]
    return s


def _first_order_prefix(st: _State, s: str) -> str:
    if s.startswith("meng"):
        st.flags |= _MENG; st.syll -= 1
        return s[4:]
    if s.startswith("meny") and len(s) > 4 and s[4] in _VOWELS:
        st.flags |= _MENG; st.syll -= 1
        return "s" + s[4:]
    if s.startswith(("men", "mem")):
        st.flags |= _MENG; st.syll -= 1
        return s[3:]
    if s.startswith("me"):
        st.flags |= _MENG; st.syll -= 1
        return s[2:]
    if s.startswith("peng"):
        st.flags |= _PENG; st.syll -= 1
        return s[4:]
    if s.startswith("peny") and len(s) > 4 and s[4] in _VOWELS:
        st.flags |= _PENG; st.syll -= 1
        return "s" + s[4:]
    if s.startswith("peny"):
        st.flags |= _PENG; st.syll -= 1
        return s[4:]
    if s.startswith("pen") and len(s) > 3 and s[3] in _VOWELS:
        st.flags |= _PENG; st.syll -= 1
        return "t" + s[3:]
    if s.startswith(("pen", "pem")):
        st.flags |= _PENG; st.syll -= 1
        return s[3:]
    if s.startswith("di"):
        st.flags |= _DI; st.syll -= 1
        return s[2:]
    if s.startswith("ter"):
        st.flags |= _TER; st.syll -= 1
        return s[3:]
    if s.startswith("ke"):
        st.flags |= _KE; st.syll -= 1
        return s[2:]
    return s


def _second_order_prefix(st: _State, s: str) -> str:
    if s.startswith("ber"):
        st.flags |= _BER; st.syll -= 1
        return s[3:]
    if s == "belajar":
        st.flags |= _BER; st.syll -= 1
        return s[3:]
    if (s.startswith("be") and len(s) > 4 and s[2] not in _VOWELS
            and s[3] == "e" and s[4] == "r"):
        st.flags |= _BER; st.syll -= 1
        return s[2:]
    if s.startswith("per"):
        st.syll -= 1
        return s[3:]
    if s == "pelajar":
        st.syll -= 1
        return s[3:]
    if s.startswith("pe"):
        st.flags |= _PE; st.syll -= 1
        return s[2:]
    return s


def _remove_suffix(st: _State, s: str) -> str:
    if s.endswith("kan") and not st.flags & (_KE | _PENG | _PE):
        st.syll -= 1
        return s[:-3]
    if s.endswith("an") and not st.flags & (_DI | _MENG | _TER):
        st.syll -= 1
        return s[:-2]
    if (s.endswith("i") and not s.endswith("si")
            and not st.flags & (_BER | _KE | _PENG)):
        st.syll -= 1
        return s[:-1]
    return s


def indonesian_stem(word: str, derivational: bool = True) -> str:
    st = _State(word)
    s = word
    if st.syll > 2:
        s = _remove_particle(st, s)
    if st.syll > 2:
        s = _remove_possessive(st, s)
    if not derivational:
        return s
    before = s
    if st.syll > 2:
        s = _first_order_prefix(st, s)
    if s != before:  # a first-order rule fired
        before = s
        if st.syll > 2:
            s = _remove_suffix(st, s)
        if s != before:
            if st.syll > 2:
                s = _second_order_prefix(st, s)
    else:
        if st.syll > 2:
            s = _second_order_prefix(st, s)
        if st.syll > 2:
            s = _remove_suffix(st, s)
    return s

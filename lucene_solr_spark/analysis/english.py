"""English analysis chain: possessive stripping + Porter stemming.

Reference chain (EnglishAnalyzer.java:95-116): StandardTokenizer →
StandardFilter → EnglishPossessiveFilter → LowerCaseFilter → StopFilter →
PorterStemFilter. Mapped here onto the engine's existing chain: the JVM
tokenizer already lowercases, possessive stripping commutes with
lowercasing (it only removes a literal «'s» tail, case-insensitively on
the s), so the order tokenize+lower → possessive → stop → stem is
output-identical to the reference order. The stop filter MUST see the
possessive-stripped token ("it's" → "it" → stopped) and the stemmer MUST
run after stop ("thats" stems to "that" but is NOT a stopword at
stop-filter time) — both honored by stripping in the token array and
stemming inside the inverter's post-stop pass.

- EnglishPossessiveFilter.java:59-68: strip the final two chars when the
  token ends with (' | U+2019 | U+FF07) followed by s/S.
- PorterStemmer.java:116-493: Martin Porter's 1980 algorithm in its
  canonical updated form — the two published departures from the paper
  are included (step3 'bli'→'ble' instead of 'abli'→'able', and the added
  (m>0) 'logi'→'log'), plus the Bug-1/Bug-2 guards (:299,378,384). Words
  of length ≤ 2 are returned unchanged (:484). This is a re-derivation of
  the published algorithm, not a translation of the Java.
"""

from __future__ import annotations

import re

_POSSESSIVE_RE = re.compile("['’＇][sS]$")
_VOWELS = frozenset("aeiou")


def strip_possessive(token: str) -> str:
    """EnglishPossessiveFilter.java:59-68."""
    return _POSSESSIVE_RE.sub("", token)


class _Porter:
    """State mirrors the reference: b[0..k] is the live word; j marks the
    stem end of the last matched suffix."""

    __slots__ = ("b", "k", "j")

    def __init__(self, word: str):
        self.b = list(word)
        self.k = len(word) - 1
        self.j = 0

    def cons(self, i: int) -> bool:
        c = self.b[i]
        if c in _VOWELS:
            return False
        if c == "y":
            return True if i == 0 else not self.cons(i - 1)
        return True

    def m(self) -> int:
        """Consonant-sequence count in b[0..j]."""
        n = 0
        i = 0
        j = self.j
        while True:
            if i > j:
                return n
            if not self.cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if self.cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not self.cons(i):
                    break
                i += 1
            i += 1

    def vowel_in_stem(self) -> bool:
        return any(not self.cons(i) for i in range(self.j + 1))

    def doublec(self, j: int) -> bool:
        if j < 1:
            return False
        if self.b[j] != self.b[j - 1]:
            return False
        return self.cons(j)

    def cvc(self, i: int) -> bool:
        if i < 2 or not self.cons(i) or self.cons(i - 1) or not self.cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def ends(self, s: str) -> bool:
        o = self.k - len(s) + 1
        if o < 0:
            return False
        if "".join(self.b[o : self.k + 1]) != s:
            return False
        self.j = o - 1
        return True

    def setto(self, s: str) -> None:
        self.b[self.j + 1 : self.k + 1] = list(s)
        self.k = self.j + len(s)

    def r(self, s: str) -> None:
        if self.m() > 0:
            self.setto(s)

    # step numbering follows the reference file (step1..step6,
    # PorterStemmer.java:259-428)
    def step1(self) -> None:  # plurals, -ed, -ing
        if self.b[self.k] == "s":
            if self.ends("sses"):
                self.k -= 2
            elif self.ends("ies"):
                self.setto("i")
            elif self.b[self.k - 1] != "s":
                self.k -= 1
        if self.ends("eed"):
            if self.m() > 0:
                self.k -= 1
        elif (self.ends("ed") or self.ends("ing")) and self.vowel_in_stem():
            self.k = self.j
            if self.ends("at"):
                self.setto("ate")
            elif self.ends("bl"):
                self.setto("ble")
            elif self.ends("iz"):
                self.setto("ize")
            elif self.doublec(self.k):
                ch = self.b[self.k]
                self.k -= 1
                if ch in ("l", "s", "z"):
                    self.k += 1
            elif self.m() == 1 and self.cvc(self.k):
                self.setto("e")

    def step2(self) -> None:  # terminal y → i when the stem has a vowel
        if self.ends("y") and self.vowel_in_stem():
            self.b[self.k] = "i"

    def step3(self) -> None:  # double suffices → single
        if self.k == 0:
            return  # Bug-1 guard (:299)
        c = self.b[self.k - 1]
        if c == "a":
            if self.ends("ational"):
                return self.r("ate")
            if self.ends("tional"):
                return self.r("tion")
        elif c == "c":
            if self.ends("enci"):
                return self.r("ence")
            if self.ends("anci"):
                return self.r("ance")
        elif c == "e":
            if self.ends("izer"):
                return self.r("ize")
        elif c == "l":
            if self.ends("bli"):
                return self.r("ble")  # departure: bli→ble
            if self.ends("alli"):
                return self.r("al")
            if self.ends("entli"):
                return self.r("ent")
            if self.ends("eli"):
                return self.r("e")
            if self.ends("ousli"):
                return self.r("ous")
        elif c == "o":
            if self.ends("ization"):
                return self.r("ize")
            if self.ends("ation"):
                return self.r("ate")
            if self.ends("ator"):
                return self.r("ate")
        elif c == "s":
            if self.ends("alism"):
                return self.r("al")
            if self.ends("iveness"):
                return self.r("ive")
            if self.ends("fulness"):
                return self.r("ful")
            if self.ends("ousness"):
                return self.r("ous")
        elif c == "t":
            if self.ends("aliti"):
                return self.r("al")
            if self.ends("iviti"):
                return self.r("ive")
            if self.ends("biliti"):
                return self.r("ble")
        elif c == "g":
            if self.ends("logi"):
                return self.r("log")  # departure: added logi→log

    def step4(self) -> None:  # -ic-, -full, -ness
        c = self.b[self.k]
        if c == "e":
            if self.ends("icate"):
                return self.r("ic")
            if self.ends("ative"):
                return self.r("")
            if self.ends("alize"):
                return self.r("al")
        elif c == "i":
            if self.ends("iciti"):
                return self.r("ic")
        elif c == "l":
            if self.ends("ical"):
                return self.r("ic")
            if self.ends("ful"):
                return self.r("")
        elif c == "s":
            if self.ends("ness"):
                return self.r("")

    def step5(self) -> None:  # -ant, -ence, ... in <c>vcvc<v>
        if self.k == 0:
            return  # Bug-1 guard (:363)
        c = self.b[self.k - 1]
        if c == "a":
            if not self.ends("al"):
                return
        elif c == "c":
            if not (self.ends("ance") or self.ends("ence")):
                return
        elif c == "e":
            if not self.ends("er"):
                return
        elif c == "i":
            if not self.ends("ic"):
                return
        elif c == "l":
            if not (self.ends("able") or self.ends("ible")):
                return
        elif c == "n":
            if not (
                self.ends("ant")
                or self.ends("ement")
                or self.ends("ment")
                or self.ends("ent")
            ):
                return
        elif c == "o":
            if self.ends("ion") and self.j >= 0 and self.b[self.j] in ("s", "t"):
                pass  # Bug-2 guard on j (:384)
            elif not self.ends("ou"):
                return
        elif c == "s":
            if not self.ends("ism"):
                return
        elif c == "t":
            if not (self.ends("ate") or self.ends("iti")):
                return
        elif c == "u":
            if not self.ends("ous"):
                return
        elif c == "v":
            if not self.ends("ive"):
                return
        elif c == "z":
            if not self.ends("ize"):
                return
        else:
            return
        if self.m() > 1:
            self.k = self.j

    def step6(self) -> None:  # final -e, -ll
        self.j = self.k
        if self.b[self.k] == "e":
            a = self.m()
            if a > 1 or (a == 1 and not self.cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self.doublec(self.k) and self.m() > 1:
            self.k -= 1

    def run(self) -> str:
        if self.k > 1:  # words of length ≤ 2 unchanged (:484)
            self.step1()
            self.step2()
            self.step3()
            self.step4()
            self.step5()
            self.step6()
        return "".join(self.b[: self.k + 1])


def porter_stem(word: str) -> str:
    """Canonical Porter stem of a (lowercased) token."""
    return _Porter(word).run()


_STEM_CACHE: dict[str, str] = {}


def stem_tokens(uniques) -> list[str]:
    """Stem a vocabulary array (the inverter factorizes first, so this runs
    once per distinct surface form per batch, not once per token)."""
    out = []
    for u in uniques:
        s = _STEM_CACHE.get(u)
        if s is None:
            if len(_STEM_CACHE) > 1_000_000:  # bound worker memory
                _STEM_CACHE.clear()
            s = porter_stem(u)
            _STEM_CACHE[u] = s
        out.append(s)
    return out


def english_analyze(text: str) -> list[tuple[int, str]]:
    """Query/fidelity-side English chain: [(position, stemmed_term)]
    post-stop, positions counted pre-stop — the exact mirror of what the
    inverter indexes under tokenizer='english'."""
    from .analyzer import (
        ENGLISH_STOP_WORDS,
        MAX_TOKEN_LENGTH,
        _PY_TOKEN_RE,
        _java_lower,
    )

    if not text:
        return []
    out: list[tuple[int, str]] = []
    pos = 0
    for m in _PY_TOKEN_RE.finditer(text):
        tok = m.group(0)
        if len(tok) > MAX_TOKEN_LENGTH:
            continue  # too-long tokens never consume a position
        tok = strip_possessive(_java_lower(tok))
        if tok not in ENGLISH_STOP_WORDS:
            out.append((pos, porter_stem(tok)))
        pos += 1
    return out

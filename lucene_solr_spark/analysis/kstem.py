"""KStem — the Krovetz dictionary-driven English stemmer behind
KStemFilter (KStemFilterFactory).

Re-derives KStemmer.java:72-1525 routine-for-routine over the extracted
lexicon (kstem_data.py): plural → pastTense → aspect → ity/ness/ion/er/
ly/al/ive/ize/ment/ble/ism/ic/ncy/nce ending handlers, each probing the
dictionary and short-circuiting the pipeline when the last lookup hits
(`matched()` reflects the LAST lookup — a miss CLEARS a previous match,
mirrored exactly). The word buffer mirrors OpenStringBuilder: truncation
keeps old chars in the backing array, so the reference's
restore-by-extending idioms behave identically. Byte-identical on
kstemTestData.zip.
"""

from __future__ import annotations

from .kstem_data import (
    COUNTRY_NATIONALITY,
    DIRECT_CONFLATIONS,
    EXCEPTION_WORDS,
    LEXICON,
    PROPER_NOUNS,
    SUPPLEMENT_DICT,
)

_MAX_WORD_LEN = 50
_DEFAULT = (None, False)  # (root, exception)

_DICT: dict[str, tuple[str | None, bool]] = {}
for _w in EXCEPTION_WORDS:
    _DICT[_w] = (_w, True)
for _a, _b in DIRECT_CONFLATIONS:
    _DICT[_a] = (_b, False)
for _a, _b in COUNTRY_NATIONALITY:
    _DICT[_a] = (_b, False)
for _w in LEXICON + SUPPLEMENT_DICT + PROPER_NOUNS:
    _DICT.setdefault(_w, _DEFAULT)

_VOWELS = frozenset("aeiou")


class _Buf:
    """OpenStringBuilder semantics: set_length never clears the backing
    array, so chars past the logical length stay readable/restorable."""

    __slots__ = ("a", "n")

    def __init__(self) -> None:
        self.a: list[str] = []
        self.n = 0

    def reset(self, s: str) -> None:
        self.a = list(s)
        self.n = len(s)

    def char_at(self, i: int) -> str:
        return self.a[i]

    def set_char_at(self, i: int, c: str) -> None:
        self.a[i] = c

    def set_length(self, n: int) -> None:
        self.n = n

    def write(self, c: str) -> None:
        if self.n < len(self.a):
            self.a[self.n] = c
        else:
            self.a.append(c)
        self.n += 1

    def append(self, s: str) -> None:
        for c in s:
            self.write(c)

    def __len__(self) -> int:
        return self.n

    def string(self) -> str:
        return "".join(self.a[: self.n])


class _KStem:
    def __init__(self) -> None:
        self.w = _Buf()
        self.j = 0
        self.k = 0
        self.matched_entry: tuple[str | None, bool] | None = None

    # --- helpers -------------------------------------------------------
    def is_cons(self, i: int) -> bool:
        ch = self.w.char_at(i)
        if ch in _VOWELS:
            return False
        if ch != "y" or i == 0:
            return True
        return not self.is_cons(i - 1)

    def is_vowel(self, i: int) -> bool:
        return not self.is_cons(i)

    def ends_str(self, s: str) -> bool:
        if len(s) > self.k:
            return False
        r = len(self.w) - len(s)
        self.j = self.k
        for i, c in enumerate(s):
            if c != self.w.char_at(r + i):
                return False
        self.j = r - 1
        return True

    def ends2(self, a: str, b: str) -> bool:
        if 2 > self.k:
            return False
        if self.w.char_at(self.k - 1) == a and self.w.char_at(self.k) == b:
            self.j = self.k - 2
            return True
        return False

    def ends3(self, a: str, b: str, c: str) -> bool:
        if 3 > self.k:
            return False
        if (self.w.char_at(self.k - 2) == a
                and self.w.char_at(self.k - 1) == b
                and self.w.char_at(self.k) == c):
            self.j = self.k - 3
            return True
        return False

    def ends4(self, a: str, b: str, c: str, d: str) -> bool:
        if 4 > self.k:
            return False
        if (self.w.char_at(self.k - 3) == a
                and self.w.char_at(self.k - 2) == b
                and self.w.char_at(self.k - 1) == c
                and self.w.char_at(self.k) == d):
            self.j = self.k - 4
            return True
        return False

    def lookup(self) -> bool:
        self.matched_entry = _DICT.get(self.w.string())
        return self.matched_entry is not None

    def word_in_dict(self):
        if self.matched_entry is not None:
            return self.matched_entry
        e = _DICT.get(self.w.string())
        if e is not None and not e[1]:
            self.matched_entry = e
        return e

    def double_c(self, i: int) -> bool:
        if i < 1:
            return False
        if self.w.char_at(i) != self.w.char_at(i - 1):
            return False
        return self.is_cons(i)

    def vowel_in_stem(self) -> bool:
        return any(self.is_vowel(i) for i in range(self.j + 1))

    def set_suffix(self, s: str) -> None:
        self.w.set_length(self.j + 1)
        self.w.append(s)
        self.k = self.j + len(s)

    # --- ending handlers (KStemmer.java:489-1359) -----------------------
    def plural(self) -> None:
        w, j, k = self.w, self.j, self.k
        if w.char_at(self.k) != "s":
            return
        if self.ends3("i", "e", "s"):
            w.set_length(self.j + 3)
            self.k -= 1
            if self.lookup():
                return
            self.k += 1
            w.write("s")
            self.set_suffix("y")
            self.lookup()
        elif self.ends2("e", "s"):
            w.set_length(self.j + 2)
            self.k -= 1
            try_e = self.j > 0 and not (
                w.char_at(self.j) == "s" and w.char_at(self.j - 1) == "s")
            if try_e and self.lookup():
                return
            w.set_length(self.j + 1)
            self.k -= 1
            if self.lookup():
                return
            w.write("e")
            self.k += 1
            if not try_e:
                self.lookup()
            return
        else:
            if len(w) > 3 and w.char_at(self.k - 1) != "s" \
                    and not self.ends3("o", "u", "s"):
                w.set_length(self.k)
                self.k -= 1
                self.lookup()

    def past_tense(self) -> None:
        w = self.w
        if len(w) <= 4:
            return
        if self.ends3("i", "e", "d"):
            w.set_length(self.j + 3)
            self.k -= 1
            if self.lookup():
                return
            self.k += 1
            w.write("d")
            self.set_suffix("y")
            self.lookup()
            return
        if self.ends2("e", "d") and self.vowel_in_stem():
            w.set_length(self.j + 2)
            self.k = self.j + 1
            entry = self.word_in_dict()
            if entry is not None and not entry[1]:
                return
            w.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            if self.double_c(self.k):
                w.set_length(self.k)
                self.k -= 1
                if self.lookup():
                    return
                w.write(w.char_at(self.k))
                self.k += 1
                self.lookup()
                return
            if w.char_at(0) == "u" and w.char_at(1) == "n":
                w.write("e")
                w.write("d")
                self.k += 2
                return
            w.set_length(self.j + 1)
            w.write("e")
            self.k = self.j + 1
            return

    def aspect(self) -> None:
        w = self.w
        if len(w) <= 5:
            return
        if self.ends3("i", "n", "g") and self.vowel_in_stem():
            w.set_char_at(self.j + 1, "e")
            w.set_length(self.j + 2)
            self.k = self.j + 1
            entry = self.word_in_dict()
            if entry is not None and not entry[1]:
                return
            w.set_length(self.k)
            self.k -= 1
            if self.lookup():
                return
            if self.double_c(self.k):
                self.k -= 1
                w.set_length(self.k + 1)
                if self.lookup():
                    return
                w.write(w.char_at(self.k))
                self.k += 1
                self.lookup()
                return
            if self.j > 0 and self.is_cons(self.j) \
                    and self.is_cons(self.j - 1):
                self.k = self.j
                w.set_length(self.k + 1)
                return
            w.set_length(self.j + 1)
            w.write("e")
            self.k = self.j + 1
            return

    def ity_endings(self) -> None:
        w = self.w
        old_k = self.k
        if self.ends3("i", "t", "y"):
            w.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            w.write("e")
            self.k = self.j + 1
            if self.lookup():
                return
            w.set_char_at(self.j + 1, "i")
            w.append("ty")
            self.k = old_k
            if self.j > 0 and w.char_at(self.j - 1) == "i" \
                    and w.char_at(self.j) == "l":
                w.set_length(self.j - 1)
                w.append("le")
                self.k = self.j
                self.lookup()
                return
            if self.j > 0 and w.char_at(self.j - 1) == "i" \
                    and w.char_at(self.j) == "v":
                w.set_length(self.j + 1)
                w.write("e")
                self.k = self.j + 1
                self.lookup()
                return
            if self.j > 0 and w.char_at(self.j - 1) == "a" \
                    and w.char_at(self.j) == "l":
                w.set_length(self.j + 1)
                self.k = self.j
                self.lookup()
                return
            if self.lookup():
                return
            w.set_length(self.j + 1)
            self.k = self.j
            return

    def nce_endings(self) -> None:
        w = self.w
        old_k = self.k
        if self.ends3("n", "c", "e"):
            word_char = w.char_at(self.j)
            if word_char not in ("e", "a"):
                return
            w.set_length(self.j)
            w.write("e")
            self.k = self.j
            if self.lookup():
                return
            w.set_length(self.j)
            self.k = self.j - 1
            if self.lookup():
                return
            w.write(word_char)
            w.append("nce")
            self.k = old_k

    def ness_endings(self) -> None:
        w = self.w
        if self.ends4("n", "e", "s", "s"):
            w.set_length(self.j + 1)
            self.k = self.j
            if w.char_at(self.j) == "i":
                w.set_char_at(self.j, "y")
            self.lookup()

    def ism_endings(self) -> None:
        w = self.w
        if self.ends3("i", "s", "m"):
            w.set_length(self.j + 1)
            self.k = self.j
            self.lookup()

    def ment_endings(self) -> None:
        w = self.w
        old_k = self.k
        if self.ends4("m", "e", "n", "t"):
            w.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            w.append("ment")
            self.k = old_k

    def ize_endings(self) -> None:
        w = self.w
        old_k = self.k
        if self.ends3("i", "z", "e"):
            w.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            w.write("i")
            if self.double_c(self.j):
                w.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                w.write(w.char_at(self.j - 1))
            w.set_length(self.j + 1)
            w.write("e")
            self.k = self.j + 1
            if self.lookup():
                return
            w.set_length(self.j + 1)
            w.append("ize")
            self.k = old_k

    def ncy_endings(self) -> None:
        w = self.w
        if self.ends3("n", "c", "y"):
            if w.char_at(self.j) not in ("e", "a"):
                return
            w.set_char_at(self.j + 2, "t")
            w.set_length(self.j + 3)
            self.k = self.j + 2
            if self.lookup():
                return
            w.set_char_at(self.j + 2, "c")
            w.write("e")
            self.k = self.j + 3
            self.lookup()

    def ble_endings(self) -> None:
        w = self.w
        old_k = self.k
        if self.ends3("b", "l", "e"):
            if w.char_at(self.j) not in ("a", "i"):
                return
            word_char = w.char_at(self.j)
            w.set_length(self.j)
            self.k = self.j - 1
            if self.lookup():
                return
            if self.double_c(self.k):
                w.set_length(self.k)
                self.k -= 1
                if self.lookup():
                    return
                self.k += 1
                w.write(w.char_at(self.k - 1))
            w.set_length(self.j)
            w.write("e")
            self.k = self.j
            if self.lookup():
                return
            w.set_length(self.j)
            w.append("ate")
            self.k = self.j + 2
            if self.lookup():
                return
            w.set_length(self.j)
            w.write(word_char)
            w.append("ble")
            self.k = old_k

    def ic_endings(self) -> None:
        w = self.w
        if self.ends2("i", "c"):
            w.set_length(self.j + 3)
            w.append("al")
            self.k = self.j + 4
            if self.lookup():
                return
            w.set_char_at(self.j + 1, "y")
            w.set_length(self.j + 2)
            self.k = self.j + 1
            if self.lookup():
                return
            w.set_char_at(self.j + 1, "e")
            if self.lookup():
                return
            w.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            w.append("ic")
            self.k = self.j + 2

    def ion_endings(self) -> None:
        w = self.w
        old_k = self.k
        if not self.ends3("i", "o", "n"):
            return
        if self.ends_str("ization"):
            w.set_length(self.j + 3)
            w.write("e")
            self.k = self.j + 3
            self.lookup()
            return
        if self.ends_str("ition"):
            w.set_length(self.j + 1)
            w.write("e")
            self.k = self.j + 1
            if self.lookup():
                return
            w.set_length(self.j + 1)
            w.append("ition")
            self.k = old_k
        elif self.ends_str("ation"):
            w.set_length(self.j + 3)
            w.write("e")
            self.k = self.j + 3
            if self.lookup():
                return
            w.set_length(self.j + 1)
            w.write("e")
            self.k = self.j + 1
            if self.lookup():
                return
            w.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            w.set_length(self.j + 1)
            w.append("ation")
            self.k = old_k
        if self.ends_str("ication"):
            w.set_length(self.j + 1)
            w.write("y")
            self.k = self.j + 1
            if self.lookup():
                return
            w.set_length(self.j + 1)
            w.append("ication")
            self.k = old_k
        # plain -ion
        self.j = self.k - 3
        w.set_length(self.j + 1)
        w.write("e")
        self.k = self.j + 1
        if self.lookup():
            return
        w.set_length(self.j + 1)
        self.k = self.j
        if self.lookup():
            return
        w.set_length(self.j + 1)
        w.append("ion")
        self.k = old_k

    def er_and_or_endings(self) -> None:
        w = self.w
        old_k = self.k
        if w.char_at(self.k) != "r":
            return
        if self.ends4("i", "z", "e", "r"):
            w.set_length(self.j + 4)
            self.k = self.j + 3
            self.lookup()
            return
        if self.ends2("e", "r") or self.ends2("o", "r"):
            word_char = w.char_at(self.j + 1)
            if self.double_c(self.j):
                w.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                w.write(w.char_at(self.j - 1))
            if w.char_at(self.j) == "i":
                w.set_char_at(self.j, "y")
                w.set_length(self.j + 1)
                self.k = self.j
                if self.lookup():
                    return
                w.set_char_at(self.j, "i")
                w.write("e")
            if w.char_at(self.j) == "e":
                w.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                w.write("e")
            w.set_length(self.j + 2)
            self.k = self.j + 1
            if self.lookup():
                return
            w.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            w.write("e")
            self.k = self.j + 1
            if self.lookup():
                return
            w.set_length(self.j + 1)
            w.write(word_char)
            w.write("r")
            self.k = old_k

    def ly_endings(self) -> None:
        w = self.w
        old_k = self.k
        if self.ends2("l", "y"):
            w.set_char_at(self.j + 2, "e")
            if self.lookup():
                return
            w.set_char_at(self.j + 2, "y")
            w.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            if self.j > 0 and w.char_at(self.j - 1) == "a" \
                    and w.char_at(self.j) == "l":
                return
            w.append("ly")
            self.k = old_k
            if self.j > 0 and w.char_at(self.j - 1) == "a" \
                    and w.char_at(self.j) == "b":
                w.set_char_at(self.j + 2, "e")
                self.k = self.j + 2
                return
            if w.char_at(self.j) == "i":
                w.set_length(self.j)
                w.write("y")
                self.k = self.j
                if self.lookup():
                    return
                w.set_length(self.j)
                w.append("ily")
                self.k = old_k
            w.set_length(self.j + 1)
            self.k = self.j

    def al_endings(self) -> None:
        w = self.w
        old_k = self.k
        if len(w) < 4:
            return
        if self.ends2("a", "l"):
            w.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            if self.double_c(self.j):
                w.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                w.write(w.char_at(self.j - 1))
            w.set_length(self.j + 1)
            w.write("e")
            self.k = self.j + 1
            if self.lookup():
                return
            w.set_length(self.j + 1)
            w.append("um")
            self.k = self.j + 2
            if self.lookup():
                return
            w.set_length(self.j + 1)
            w.append("al")
            self.k = old_k
            if self.j > 0 and w.char_at(self.j - 1) == "i" \
                    and w.char_at(self.j) == "c":
                w.set_length(self.j - 1)
                self.k = self.j - 2
                if self.lookup():
                    return
                w.set_length(self.j - 1)
                w.write("y")
                self.k = self.j - 1
                if self.lookup():
                    return
                w.set_length(self.j - 1)
                w.append("ic")
                self.k = self.j
                self.lookup()
                return
            if w.char_at(self.j) == "i":
                w.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                w.append("ial")
                self.k = old_k
                self.lookup()

    def ive_endings(self) -> None:
        w = self.w
        old_k = self.k
        if self.ends3("i", "v", "e"):
            w.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            w.write("e")
            self.k = self.j + 1
            if self.lookup():
                return
            w.set_length(self.j + 1)
            w.append("ive")
            if self.j > 0 and w.char_at(self.j - 1) == "a" \
                    and w.char_at(self.j) == "t":
                w.set_char_at(self.j - 1, "e")
                w.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                w.set_length(self.j - 1)
                if self.lookup():
                    return
                w.append("ative")
                self.k = old_k
            w.set_char_at(self.j + 2, "o")
            w.set_char_at(self.j + 3, "n")
            if self.lookup():
                return
            w.set_char_at(self.j + 2, "v")
            w.set_char_at(self.j + 3, "e")
            self.k = old_k

    # --- driver ----------------------------------------------------------
    def stem(self, term: str) -> str:
        k = len(term) - 1
        if k <= 1 or k >= _MAX_WORD_LEN - 1:
            return term
        entry = _DICT.get(term)
        if entry is not None:
            return entry[0] if entry[0] is not None else term
        if not all("a" <= c <= "z" for c in term):
            return term

        self.w.reset(term)
        self.k = k
        self.matched_entry = None

        def matched() -> bool:
            return self.matched_entry is not None

        while True:
            self.plural()
            if matched():
                break
            self.past_tense()
            if matched():
                break
            self.aspect()
            if matched():
                break
            self.ity_endings()
            if matched():
                break
            self.ness_endings()
            if matched():
                break
            self.ion_endings()
            if matched():
                break
            self.er_and_or_endings()
            if matched():
                break
            self.ly_endings()
            if matched():
                break
            self.al_endings()
            if matched():
                break
            self.word_in_dict()
            self.ive_endings()
            if matched():
                break
            self.ize_endings()
            if matched():
                break
            self.ment_endings()
            if matched():
                break
            self.ble_endings()
            if matched():
                break
            self.ism_endings()
            if matched():
                break
            self.ic_endings()
            if matched():
                break
            self.ncy_endings()
            if matched():
                break
            self.nce_endings()
            break

        entry = self.matched_entry
        if entry is not None and entry[0] is not None:
            return entry[0]
        return self.w.string()


_STEMMER = _KStem()


def kstem(word: str) -> str:
    """KStemFilter contract: terms must be lowercased upstream."""
    return _STEMMER.stem(word)

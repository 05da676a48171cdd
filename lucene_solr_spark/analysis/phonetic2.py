"""Phonetic encoders completing PhoneticFilterFactory's registry.

Reference: lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/
phonetic/PhoneticFilterFactory.java:76-84 registers six commons-codec
encoders — DoubleMetaphone, Metaphone, Soundex, RefinedSoundex,
Caverphone (2.0), ColognePhonetic — and DoubleMetaphoneFilter.java adds
the dedicated primary+alternate filter. Soundex/RefinedSoundex live in
analysis/phonetic.py as pure-codegen Columns; the four remaining
encoders are context-dependent state machines, so they run Python-side
per DISTINCT surface form (the factorized-inverter execution model) —
re-derived here from the published algorithms (Philips' Metaphone 1990 /
Double Metaphone 2000, the Caversham Project's Caverphone revision 2.0,
Postel's Kölner Phonetik 1969) with commons-codec 1.7 behavior, verified
against the reference's own in-tree vectors
(TestPhoneticFilterFactory.java:136-166, DoubleMetaphoneFilterTest.java).

BeiderMorse is NOT implemented: its bmpm rule set ships only inside the
commons-codec jar (absent from the reference tree — lucene/licenses has
just the sha1), so the rules the filter needs aren't public *in this
repo's sense of the reference-as-spec*.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# Caverphone 2.0 — the Caversham Project revision-2 pipeline; ordered
# replaces exactly as specified (commons-codec Caverphone2.java).
# ---------------------------------------------------------------------------

_CAVERPHONE_STEPS = [
    ("e$", ""),
    ("^cough", "cou2f"),
    ("^rough", "rou2f"),
    ("^tough", "tou2f"),
    ("^enough", "enou2f"),
    ("^trough", "trou2f"),
    ("^gn", "2n"),
    ("mb$", "m2"),
    ("cq", "2q"),
    ("ci", "si"),
    ("ce", "se"),
    ("cy", "sy"),
    ("tch", "2ch"),
    ("c", "k"),
    ("q", "k"),
    ("x", "k"),
    ("v", "f"),
    ("dg", "2g"),
    ("tio", "sio"),
    ("tia", "sia"),
    ("d", "t"),
    ("ph", "fh"),
    ("b", "p"),
    ("sh", "s2"),
    ("z", "s"),
    ("^[aeiou]", "A"),
    ("[aeiou]", "3"),
    ("j", "y"),
    ("^y3", "Y3"),
    ("^y", "A"),
    ("y", "3"),
    ("3gh3", "3kh3"),
    ("gh", "22"),
    ("g", "k"),
    ("s+", "S"),
    ("t+", "T"),
    ("p+", "P"),
    ("k+", "K"),
    ("f+", "F"),
    ("m+", "M"),
    ("n+", "N"),
    ("w3", "W3"),
    ("wh3", "Wh3"),
    ("w$", "3"),
    ("w", "2"),
    ("^h", "A"),
    ("h", "2"),
    ("r3", "R3"),
    ("r$", "3"),
    ("r", "2"),
    ("l3", "L3"),
    ("l$", "3"),
    ("l", "2"),
    ("2", ""),
    ("3$", "A"),
    ("3", ""),
]
_CAVERPHONE_COMPILED = [(re.compile(p), r) for p, r in _CAVERPHONE_STEPS]


def caverphone2(text: str) -> str:
    """Caverphone 2.0 code: 10 chars, '1'-padded."""
    txt = re.sub("[^a-z]", "", text.lower())
    for pat, rep in _CAVERPHONE_COMPILED:
        txt = pat.sub(rep, txt)
    return (txt + "1" * 10)[:10]


# ---------------------------------------------------------------------------
# Kölner Phonetik (ColognePhonetic) — Postel 1969, commons-codec semantics:
# umlauts fold (Ä→A, Ö→O, Ü→U, ß→S via uppercase SS), context-coded digits,
# adjacent duplicates collapse, '0' kept only word-initially.
# ---------------------------------------------------------------------------

def cologne_phonetic(text: str) -> str:
    word = [
        c
        for c in text.upper()
        .replace("Ä", "A").replace("Ö", "O").replace("Ü", "U").replace("ß", "SS")
        if "A" <= c <= "Z"
    ]
    n = len(word)
    out = []
    for i, c in enumerate(word):
        # sentinel "~" (not a letter) so end-of-word never matches a
        # context class ("" would be a substring of every class string)
        prev = word[i - 1] if i > 0 else "~"
        nxt = word[i + 1] if i + 1 < n else "~"
        if c in "AEIJOUY":
            code = "0"
        elif c == "H":
            code = ""
        elif c == "B":
            code = "1"
        elif c == "P":
            code = "3" if nxt == "H" else "1"
        elif c in "DT":
            code = "8" if nxt in "CSZ" else "2"
        elif c in "FVW":
            code = "3"
        elif c in "GKQ":
            code = "4"
        elif c == "X":
            code = "8" if prev in "CKQ" else "48"
        elif c == "S" or c == "Z":
            code = "8"
        elif c == "C":
            if i == 0:
                code = "4" if nxt in "AHKLOQRUX" else "8"
            elif prev in "SZ":
                code = "8"
            else:
                code = "4" if nxt in "AHKOQUX" else "8"
        elif c == "M" or c == "N":
            code = "6"
        elif c == "L":
            code = "5"
        elif c == "R":
            code = "7"
        else:
            code = ""
        out.append(code)
    joined = "".join(out)
    collapsed = re.sub(r"(.)\1+", r"\1", joined)
    return collapsed[:1] + collapsed[1:].replace("0", "")


# ---------------------------------------------------------------------------
# Metaphone — Philips 1990, commons-codec Metaphone.java behavior
# (FRONTV = EIY front vowels, VARSON = CSPTG silent-H predecessors,
# default max code length 4).
# ---------------------------------------------------------------------------

_FRONTV = "EIY"
_VARSON = "CSPTG"
_VOWELS = "AEIOU"


def metaphone(text: str, max_code_len: int = 4) -> str:
    txt = "".join(c for c in text.upper() if "A" <= c <= "Z")
    if not txt:
        return ""
    if len(txt) == 1:
        return txt

    # initial-letter transforms
    first, second = txt[0], txt[1]
    if first in "KGP" and second == "N":
        local = txt[1:]
    elif first == "A" and second == "E":
        local = txt[1:]
    elif first == "W" and second == "R":
        local = txt[1:]
    elif first == "W" and second == "H":
        local = "W" + txt[2:]
    elif first == "X":
        local = "S" + txt[1:]
    else:
        local = txt

    wdsz = len(local)
    code = []

    def last(n):
        return n == wdsz - 1

    def nxt(n, c):
        return n + 1 < wdsz and local[n + 1] == c

    def prev(n, c):
        return n > 0 and local[n - 1] == c

    def vowel(n):
        return 0 <= n < wdsz and local[n] in _VOWELS

    def region(n, s):
        return local.startswith(s, n)

    n = 0
    while len(code) < max_code_len and n < wdsz:
        symb = local[n]
        if symb != "C" and prev(n, symb):  # collapse duplicates except C
            n += 1
            continue
        if symb in _VOWELS:
            if n == 0:
                code.append(symb)
        elif symb == "B":
            if not (prev(n, "M") and last(n)):  # terminal MB: silent B
                code.append("B")
        elif symb == "C":
            if prev(n, "S") and not last(n) and local[n + 1] in _FRONTV:
                pass  # SCI/SCE/SCY: silent C
            elif region(n, "CIA"):
                code.append("X")
            elif not last(n) and local[n + 1] in _FRONTV:
                code.append("S")  # CI/CE/CY
            elif prev(n, "S") and nxt(n, "H"):
                code.append("K")  # SCH
            elif nxt(n, "H"):
                if n == 0 and wdsz >= 3 and not vowel(2):
                    code.append("K")  # CH + consonant
                else:
                    code.append("X")
            else:
                code.append("K")
        elif symb == "D":
            if n + 2 < wdsz and nxt(n, "G") and local[n + 2] in _FRONTV:
                code.append("J")  # DGE/DGI/DGY
                n += 2
            else:
                code.append("T")
        elif symb == "G":
            silent = (
                (n + 1 == wdsz - 1 and nxt(n, "H"))
                or (n + 1 < wdsz - 1 and nxt(n, "H") and not vowel(n + 2))
                or (n > 0 and (region(n, "GN") or region(n, "GNED")))
            )
            if not silent:
                hard = prev(n, "G")
                if not last(n) and local[n + 1] in _FRONTV and not hard:
                    code.append("J")
                else:
                    code.append("K")
        elif symb == "H":
            if not last(n) and not (n > 0 and local[n - 1] in _VARSON) \
                    and vowel(n + 1):
                code.append("H")
        elif symb in "FJLMNR":
            code.append(symb)
        elif symb == "K":
            if n == 0 or not prev(n, "C"):
                code.append("K")
        elif symb == "P":
            code.append("F" if nxt(n, "H") else "P")
        elif symb == "Q":
            code.append("K")
        elif symb == "S":
            if region(n, "SH") or region(n, "SIO") or region(n, "SIA"):
                code.append("X")
            else:
                code.append("S")
        elif symb == "T":
            if region(n, "TIA") or region(n, "TIO"):
                code.append("X")
            elif region(n, "TCH"):
                pass  # silent T in TCH
            elif region(n, "TH"):
                code.append("0")  # theta
            else:
                code.append("T")
        elif symb == "V":
            code.append("F")
        elif symb in "WY":
            if not last(n) and vowel(n + 1):
                code.append(symb)
        elif symb == "X":
            code.append("K")
            code.append("S")
        elif symb == "Z":
            code.append("S")
        n += 1
    return "".join(code)[:max_code_len]


# ---------------------------------------------------------------------------
# Double Metaphone — Philips 2000 (Dr. Dobb's), commons-codec
# DoubleMetaphone.java behavior: primary + alternate codes, default max
# code length 4, silent initial GN/KN/PN/WR/PS, Slavo-Germanic handling.
# ---------------------------------------------------------------------------

_DM_VOWELS = "AEIOUY"
_SILENT_START = ("GN", "KN", "PN", "WR", "PS")
_L_R_N_M_B_H_F_V_W_SPACE = ("L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER = (
    "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER")
_L_T_K_S_N_M_B_Z = ("L", "T", "K", "S", "N", "M", "B", "Z")


class _DMResult:
    """Primary/alternate buffers; string appends TRUNCATE to fit the max
    code length (DoubleMetaphoneResult.appendPrimary(String) semantics)."""

    def __init__(self, max_len):
        self.max_len = max_len
        self.primary = ""
        self.alternate = ""

    def append(self, p, a=None):
        a = p if a is None else a
        self.append_primary(p)
        self.append_alternate(a)

    def append_primary(self, p):
        room = self.max_len - len(self.primary)
        if room > 0:
            self.primary += p[:room]

    def append_alternate(self, a):
        room = self.max_len - len(self.alternate)
        if room > 0:
            self.alternate += a[:room]

    def complete(self):
        return (len(self.primary) >= self.max_len
                and len(self.alternate) >= self.max_len)


def double_metaphone(text: str, max_code_len: int = 4,
                     alternate: bool = False):
    """Double Metaphone of `text`; returns the primary code, or the
    alternate when alternate=True (commons-codec signature)."""
    value = " ".join(text.strip().upper().split()) if text else ""
    value = "".join(c for c in value if "A" <= c <= "Z" or c == " ")
    if not value:
        return ""
    slavo = ("W" in value or "K" in value or "CZ" in value
             or "WITZ" in value)
    length = len(value)

    def char_at(i):
        return value[i] if 0 <= i < length else ""

    def contains(start, ln, *crit):
        return 0 <= start and start + ln <= length and \
            value[start:start + ln] in crit

    def is_vowel(i):
        return 0 <= i < length and value[i] in _DM_VOWELS

    res = _DMResult(max_code_len)
    index = 1 if value[:2] in _SILENT_START else 0
    if value[0] == "X":  # initial X -> S (as in Xavier)
        res.append("S")
        index = 1

    while not res.complete() and index < length:
        ch = value[index]
        if ch in _DM_VOWELS:
            if index == 0:
                res.append("A")
            index += 1
        elif ch == "B":
            res.append("P")
            index += 2 if char_at(index + 1) == "B" else 1
        elif ch == "Ç":
            res.append("S")
            index += 1
        elif ch == "C":
            index = _dm_c(value, res, index, char_at, contains, length)
        elif ch == "D":
            if contains(index, 2, "DG"):
                if contains(index + 2, 1, "I", "E", "Y"):
                    res.append("J")  # edge
                    index += 3
                else:
                    res.append("TK")  # edgar
                    index += 2
            elif contains(index, 2, "DT", "DD"):
                res.append("T")
                index += 2
            else:
                res.append("T")
                index += 1
        elif ch == "F":
            res.append("F")
            index += 2 if char_at(index + 1) == "F" else 1
        elif ch == "G":
            index = _dm_g(value, res, index, char_at, contains, is_vowel,
                          slavo, length)
        elif ch == "H":
            # only keep if first & before vowel, or between two vowels
            if (index == 0 or is_vowel(index - 1)) and is_vowel(index + 1):
                res.append("H")
                index += 2
            else:
                index += 1
        elif ch == "J":
            index = _dm_j(value, res, index, char_at, contains, is_vowel,
                          slavo, length)
        elif ch == "K":
            res.append("K")
            index += 2 if char_at(index + 1) == "K" else 1
        elif ch == "L":
            if char_at(index + 1) == "L":
                if _dm_l0(value, index, contains, length):
                    res.append_primary("L")  # spanish e.g. cabrillo
                else:
                    res.append("L")
                index += 2
            else:
                res.append("L")
                index += 1
        elif ch == "M":
            conditional = (
                contains(index - 1, 3, "UMB")
                and (index + 1 == length - 1 or contains(index + 2, 2, "ER")))
            res.append("M")
            index += 2 if conditional or char_at(index + 1) == "M" else 1
        elif ch == "N":
            res.append("N")
            index += 2 if char_at(index + 1) == "N" else 1
        elif ch == "Ñ":
            res.append("N")
            index += 1
        elif ch == "P":
            if char_at(index + 1) == "H":
                res.append("F")
                index += 2
            else:
                res.append("P")
                index += 2 if contains(index + 1, 1, "P", "B") else 1
        elif ch == "Q":
            res.append("K")
            index += 2 if char_at(index + 1) == "Q" else 1
        elif ch == "R":
            # french e.g. rogier, exclude hochmeier
            if (index == length - 1 and not slavo
                    and contains(index - 2, 2, "IE")
                    and not contains(index - 4, 2, "ME", "MA")):
                res.append_alternate("R")
            else:
                res.append("R")
            index += 2 if char_at(index + 1) == "R" else 1
        elif ch == "S":
            index = _dm_s(value, res, index, char_at, contains, is_vowel,
                          slavo, length)
        elif ch == "T":
            index = _dm_t(value, res, index, char_at, contains, length)
        elif ch == "V":
            res.append("F")
            index += 2 if char_at(index + 1) == "V" else 1
        elif ch == "W":
            index = _dm_w(value, res, index, char_at, contains, is_vowel,
                          slavo, length)
        elif ch == "X":
            if not (index == length - 1
                    and (contains(index - 3, 3, "IAU", "EAU")
                         or contains(index - 2, 2, "AU", "OU"))):
                res.append("KS")  # french e.g. breaux
            index += 2 if contains(index + 1, 1, "C", "X") else 1
        elif ch == "Z":
            if char_at(index + 1) == "H":
                res.append("J")  # chinese pinyin e.g. zhao
                index += 2
            else:
                if (contains(index + 1, 2, "ZO", "ZI", "ZA")
                        or (slavo and index > 0
                            and char_at(index - 1) != "T")):
                    res.append("S", "TS")
                else:
                    res.append("S")
                index += 2 if char_at(index + 1) == "Z" else 1
        else:
            index += 1

    return res.alternate if alternate else res.primary


def _dm_l0(value, index, contains, length):
    """Spanish 'LL' -> L-only-in-primary condition."""
    if index == length - 3 and contains(index - 1, 4, "ILLO", "ILLA", "ALLE"):
        return True
    return (
        (contains(length - 2, 2, "AS", "OS")
         or contains(length - 1, 1, "A", "O"))
        and contains(index - 1, 4, "ALLE"))


def _dm_c(value, res, index, char_at, contains, length):
    def is_vowel(i):
        return 0 <= i < length and value[i] in _DM_VOWELS

    if _dm_c_germanic(value, index, contains, is_vowel):
        res.append("K")  # germanic 'mac caffrey', 'mc gregor'
        return index + 2
    if index == 0 and contains(index, 6, "CAESAR"):
        res.append("S")
        return index + 2
    if contains(index, 2, "CH"):
        return _dm_ch(value, res, index, char_at, contains, is_vowel, length)
    if contains(index, 2, "CZ") and not contains(index - 2, 4, "WICZ"):
        res.append("S", "X")  # e.g. 'czerny'
        return index + 2
    if contains(index + 1, 3, "CIA"):
        res.append("X")  # e.g. 'focaccia'
        return index + 3
    if contains(index, 2, "CC") and not (index == 1 and char_at(0) == "M"):
        # double C, but not McClellan
        if contains(index + 2, 1, "I", "E", "H") \
                and not contains(index + 2, 2, "HU"):
            if (index == 1 and char_at(index - 1) == "A") \
                    or contains(index - 1, 5, "UCCEE", "UCCES"):
                res.append("KS")  # 'bellocchio' but not 'bacchus'
            else:
                res.append("X")  # 'caccia'
            return index + 3
        res.append("K")  # Pierce's rule
        return index + 2
    if contains(index, 2, "CK", "CG", "CQ"):
        res.append("K")
        return index + 2
    if contains(index, 2, "CI", "CE", "CY"):
        if contains(index, 3, "CIO", "CIE", "CIA"):
            res.append("S", "X")  # italian vs english
        else:
            res.append("S")
        return index + 2
    res.append("K")
    if contains(index + 1, 2, " C", " Q", " G"):
        return index + 3  # 'mac caffrey', 'mac gregor'
    if contains(index + 1, 1, "C", "K", "Q") \
            and not contains(index + 1, 2, "CE", "CI"):
        return index + 2
    return index + 1


def _dm_c_germanic(value, index, contains, is_vowel):
    """'CH' germanic condition: various germanic."""
    return (index > 1 and not is_vowel(index - 2)
            and contains(index - 1, 3, "ACH")
            and not contains(index + 2, 1, "I")
            and (not contains(index + 2, 1, "E")
                 or contains(index - 2, 6, "BACHER", "MACHER")))


def _dm_ch(value, res, index, char_at, contains, is_vowel, length):
    if index > 0 and contains(index, 4, "CHAE"):
        res.append("K", "X")  # e.g. 'michael'
        return index + 2
    if _dm_ch0(value, index, contains, length):
        res.append("K")  # greek roots e.g. 'chemistry'
        return index + 2
    if _dm_ch1(value, index, contains, length):
        res.append("K")  # germanic, greek, or otherwise 'CH' for 'KH'
        return index + 2
    if index > 0:
        if contains(0, 2, "MC"):
            res.append("K")  # e.g. 'McHugh'
        else:
            res.append("X", "K")
    else:
        res.append("X")
    return index + 2


def _dm_ch0(value, index, contains, length):
    """Greek roots: chianti, chorus, chymera, etc. (initial only)."""
    if index != 0:
        return False
    return (contains(index + 1, 5, "HARAC", "HARIS")
            or contains(index + 1, 3, "HOR", "HYM", "HIA", "HEM")) \
        and not contains(0, 5, "CHORE")


def _dm_ch1(value, index, contains, length):
    """Germanic/Greek 'CH' -> K conditions."""
    return (
        (contains(0, 4, "VAN ", "VON ") or contains(0, 3, "SCH"))
        or contains(index - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
        or contains(index + 2, 1, "T", "S")
        or ((contains(index - 1, 1, "A", "O", "U", "E") or index == 0)
            and (contains(index + 2, 1, *_L_R_N_M_B_H_F_V_W_SPACE)
                 or index + 1 == length - 1)))


def _dm_g(value, res, index, char_at, contains, is_vowel, slavo, length):
    if char_at(index + 1) == "H":
        return _dm_gh(value, res, index, char_at, contains, is_vowel, length)
    if char_at(index + 1) == "N":
        if index == 1 and is_vowel(0) and not slavo:
            res.append_primary("KN")
            res.append_alternate("N")
        elif not contains(index + 2, 2, "EY") \
                and char_at(index + 1) != "Y" and not slavo:
            res.append_primary("N")
            res.append_alternate("KN")
        else:
            res.append("KN")
        return index + 2
    if contains(index + 1, 2, "LI") and not slavo:
        res.append_primary("KL")
        res.append_alternate("L")  # e.g. 'tagliaro'
        return index + 2
    if index == 0 and (char_at(index + 1) == "Y"
                       or contains(index + 1, 2,
                                   *_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER)):
        res.append("K", "J")  # -ges-, -gep-, -gel-, -gie- at beginning
        return index + 2
    if (contains(index + 1, 2, "ER") or char_at(index + 1) == "Y") \
            and not contains(0, 6, "DANGER", "RANGER", "MANGER") \
            and not contains(index - 1, 1, "E", "I") \
            and not contains(index - 1, 3, "RGY", "OGY"):
        res.append("K", "J")  # -ger-, -gy-
        return index + 2
    if contains(index + 1, 1, "E", "I", "Y") \
            or contains(index - 1, 4, "AGGI", "OGGI"):
        # italian e.g. 'biaggi'
        if contains(0, 4, "VAN ", "VON ") or contains(0, 3, "SCH") \
                or contains(index + 1, 2, "ET"):
            res.append("K")  # obvious germanic
        elif contains(index + 1, 3, "IER"):
            res.append("J")
        else:
            res.append("J", "K")
        return index + 2
    res.append("K")
    return index + 2 if char_at(index + 1) == "G" else index + 1


def _dm_gh(value, res, index, char_at, contains, is_vowel, length):
    if index > 0 and not is_vowel(index - 1):
        res.append("K")
        return index + 2
    if index == 0:
        if char_at(index + 2) == "I":
            res.append("J")  # e.g. 'ghislane'
        else:
            res.append("K")  # e.g. 'ghoul'
        return index + 2
    if (index > 1 and contains(index - 2, 1, "B", "H", "D")) \
            or (index > 2 and contains(index - 3, 1, "B", "H", "D")) \
            or (index > 3 and contains(index - 4, 1, "B", "H")):
        # Parker's rule (with some further refinements) e.g. 'hugh'
        return index + 2
    if index > 2 and char_at(index - 1) == "U" \
            and contains(index - 3, 1, "C", "G", "L", "R", "T"):
        res.append("F")  # e.g. 'laugh', 'McLaughlin', 'cough'
    elif index > 0 and char_at(index - 1) != "I":
        res.append("K")
    return index + 2


def _dm_j(value, res, index, char_at, contains, is_vowel, slavo, length):
    if contains(index, 4, "JOSE") or contains(0, 4, "SAN "):
        # obvious spanish, 'jose', 'san jacinto'
        if (index == 0 and char_at(index + 4) == " ") \
                or length == 4 or contains(0, 4, "SAN "):
            res.append("H")
        else:
            res.append("J", "H")
        return index + 1
    if index == 0 and not contains(index, 4, "JOSE"):
        res.append("J", "A")  # Yankelovich/Jankelowicz
    elif is_vowel(index - 1) and not slavo \
            and (char_at(index + 1) == "A" or char_at(index + 1) == "O"):
        res.append("J", "H")  # spanish pron. of e.g. 'bajador'
    elif index == length - 1:
        res.append_primary("J")
    elif not contains(index + 1, 1, *_L_T_K_S_N_M_B_Z) \
            and not contains(index - 1, 1, "S", "K", "L"):
        res.append("J")
    return index + 2 if char_at(index + 1) == "J" else index + 1


def _dm_s(value, res, index, char_at, contains, is_vowel, slavo, length):
    if contains(index - 1, 3, "ISL", "YSL"):
        return index + 1  # special cases 'island', 'isle', 'carlisle'
    if index == 0 and contains(index, 5, "SUGAR"):
        res.append("X", "S")  # special case 'sugar-'
        return index + 1
    if contains(index, 2, "SH"):
        if contains(index + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
            res.append("S")  # germanic
        else:
            res.append("X")
        return index + 2
    if contains(index, 3, "SIO", "SIA") or contains(index, 4, "SIAN"):
        if slavo:
            res.append("S")
        else:
            res.append("S", "X")
        return index + 3
    if (index == 0 and contains(index + 1, 1, "M", "N", "L", "W")) \
            or contains(index + 1, 1, "Z"):
        # german & anglicisations e.g. 'smith' match 'schmidt'
        res.append("S", "X")
        return index + 2 if contains(index + 1, 1, "Z") else index + 1
    if contains(index, 2, "SC"):
        return _dm_sc(value, res, index, char_at, contains, length)
    if index == length - 1 and contains(index - 2, 2, "AI", "OI"):
        res.append_alternate("S")  # french e.g. 'resnais', 'artois'
    else:
        res.append("S")
    return index + 2 if contains(index + 1, 1, "S", "Z") else index + 1


def _dm_sc(value, res, index, char_at, contains, length):
    if char_at(index + 2) == "H":
        if contains(index + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
            if contains(index + 3, 2, "ER", "EN"):
                res.append("X", "SK")  # 'schermerhorn', 'schenker'
            else:
                res.append("SK")  # dutch origin e.g. 'school', 'schooner'
        elif index == 0 and not (0 <= 3 < length
                                 and value[3] in _DM_VOWELS) \
                and char_at(3) != "W":
            res.append("X", "S")
        else:
            res.append("X")
    elif contains(index + 2, 1, "I", "E", "Y"):
        res.append("S")
    else:
        res.append("SK")
    return index + 3


def _dm_t(value, res, index, char_at, contains, length):
    if contains(index, 4, "TION") or contains(index, 3, "TIA", "TCH"):
        res.append("X")
        return index + 3
    if contains(index, 2, "TH") or contains(index, 3, "TTH"):
        if contains(index + 2, 2, "OM", "AM") \
                or contains(0, 4, "VAN ", "VON ") or contains(0, 3, "SCH"):
            res.append("T")  # special case 'thomas', 'thames' or germanic
        else:
            res.append("0", "T")
        return index + 2
    res.append("T")
    return index + 2 if contains(index + 1, 1, "T", "D") else index + 1


def _dm_w(value, res, index, char_at, contains, is_vowel, slavo, length):
    if contains(index, 2, "WR"):
        res.append("R")  # can also be in middle of word
        return index + 2
    if index == 0 and (is_vowel(index + 1) or contains(index, 2, "WH")):
        if is_vowel(index + 1):
            res.append("A", "F")  # Wasserman should match Vasserman
        else:
            res.append("A")  # need Uomo to match Womo
        return index + 1
    if (index == length - 1 and is_vowel(index - 1)) \
            or contains(index - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY") \
            or contains(0, 3, "SCH"):
        res.append_alternate("F")  # Arnow should match Arnoff
        return index + 1
    if contains(index, 4, "WICZ", "WITZ"):
        res.append("TS", "FX")  # polish e.g. 'filipowicz'
        return index + 4
    return index + 1


# ---------------------------------------------------------------------------
# PhoneticFilterFactory registry + filter surfaces
# ---------------------------------------------------------------------------

def phonetic_encoder(name: str):
    """The PhoneticFilterFactory.java:76-84 registry by encoder name
    (Soundex/RefinedSoundex are the codegen Columns in phonetic.py; their
    Python twins here serve the per-surface-form path)."""
    key = name.upper()
    if key == "CAVERPHONE":
        return caverphone2
    if key == "COLOGNEPHONETIC":
        return cologne_phonetic
    if key == "METAPHONE":
        return metaphone
    if key == "DOUBLEMETAPHONE":
        return double_metaphone
    raise ValueError(
        f"unknown encoder {name!r}; one of DoubleMetaphone, Metaphone, "
        "Caverphone, ColognePhonetic (Soundex/RefinedSoundex: phonetic.py)")


def phonetic_tokens(tokens, encoder_name: str, inject: bool = True):
    """PhoneticFilter token semantics over a token list: inject=True adds
    the code at the original's position, inject=False replaces (empty
    codes never emitted, the original survives replace-mode then)."""
    enc = phonetic_encoder(encoder_name)
    out = []
    for t in tokens:
        code = enc(t)
        if inject:
            out.append(t)
            if code and code != t:
                out.append(code)
        else:
            out.append(code if code else t)
    return out


def double_metaphone_tokens(tokens, max_code_len: int = 4,
                            inject: bool = False):
    """DoubleMetaphoneFilter.java semantics: emit primary, plus the
    alternate when it differs; inject keeps the original token first."""
    out = []
    for t in tokens:
        p = double_metaphone(t, max_code_len)
        a = double_metaphone(t, max_code_len, alternate=True)
        if inject:
            out.append(t)
        if p:
            out.append(p)
        if a and a != p:
            out.append(a)
    return out

"""ICUTokenizer: script-run dispatch + the in-tree RBBI syllable grammars.

Reference: lucene/analysis/icu/src/java/org/apache/lucene/analysis/icu/
segmentation/ICUTokenizer.java:103-221 (script-run iteration; segments
with ruleStatus == 0 are skipped) with DefaultICUTokenizerConfig
dispatching per UScript run: Khmer/Lao/Myanmar/Hebrew get the custom
grammars under lucene/analysis/icu/src/data/uax29/*.rbbi (the SOURCE
text of the compiled .brk files the tokenizer ships), everything else
the UAX#29 default — which is this repo's standard tokenizer.

The three no-space-script grammars are translated rule-for-rule from
those .rbbi sources (cited inline); RBBI's longest-match-wins semantics
are reproduced by matching every rule at the position and taking the
longest. Lao additionally reproduces LaoBreakIterator.java:115-135's
single-char pushback: when the greedy syllable match leaves the next
position unmatchable (ruleStatus 0) on a Lao letter, and the syllable
minus its last char is itself a complete rule match, the boundary backs
off one char (the "final consonant actually starts the next syllable"
case from the CRULP line-breaking paper the class cites).

Hebrew.rbbi is UAX#29 plus U+0027 added to Extend and U+0022 added to
MidLetter (apostrophes stick to words; gershayim-style "-joins), applied
here as a pre-pass that protects those quotes inside Hebrew-letter
context before the standard tokenizer runs.

Numeric runs inside these scripts fall through to the standard
tokenizer's UAX#29 numeric handling (the grammars' {100} rule).
"""

from __future__ import annotations

import re
import unicodedata

# --- Khmer (uax29/Khmer.rbbi:24-36) ---------------------------------------

_KH_BASE = "ក-ឳ"
_KH_SYL = re.compile(
    "[{b}]"                       # $KhmerBase
    "[៌៉៊]?"       # ($KhmerRobat | $KhmerShifter)?
    "(?:្[{b}]៌?)*"     # ($KhmerSub ($KhmerRobat)?)*
    "(?:[‌‍]?[឴-ៅ])?"  # (($KhmerZWC)? $KhmerVowel)?
    "[ំ-ៈ់៍-៑ៜ៝]?"  # ($KhmerSign)?
    "(?:្[{b}])?".format(b=_KH_BASE)  # ($KhmerSub)?
)

# --- Myanmar (uax29/Myanmar.rbbi:24-42) ------------------------------------
# $Cons = [[:Other_Letter:]&[:Myanmar:]] — Lo chars of the Myanmar blocks

_MY_CONS = "".join(
    f"{chr(cp)}" for rng in ((0x1000, 0x109F), (0xAA60, 0xAA7F))
    for cp in range(rng[0], rng[1] + 1)
    if unicodedata.category(chr(cp)) == "Lo"
)


def _mark_class(lo: int, hi: int) -> str:
    return "".join(
        chr(cp) for cp in range(lo, hi + 1)
        if unicodedata.category(chr(cp)) in ("Mn", "Mc", "Me")
    )


_MY_MARKS = _mark_class(0x1000, 0x109F) + _mark_class(0xAA60, 0xAA7F)
_MY_EF = f"[{re.escape(_MY_MARKS)}‌‍]"  # (Extend | Format)*
_MY_CONS_EX = f"[{re.escape(_MY_CONS)}]{_MY_EF}*"
_MY_ASAT_EX = (
    f"[{re.escape(_MY_CONS)}]်(?:္{_MY_CONS_EX})?{_MY_EF}*"
)
_MY_SYL = re.compile(
    f"{_MY_CONS_EX}(?:္{_MY_CONS_EX})?(?:{_MY_ASAT_EX})*"
)

# --- Lao (uax29/Lao.rbbi:24-77) --------------------------------------------
# the X classes, verbatim

_L = {
    "X0": "[ເ-ໄ]", "X1": "ຫ?",
    "X": "[ກ-ຮໜໝ]",
    "X2": "[ຼຣວລ]?",
    "X3": "[ຸູ]", "X5": "[່-໋]?",
    "X6": "[ວອຽ]", "X7": "[ະາຳ]",
    "X8": "[ກງຍດນມບວ]",
    "X9": "[ຈສຊພຟລ]",
}
_L_TAIL = "(?:{X9}໌)?ໆ?ຯ?".format(**_L)  # (X9 X10_3)? X10_2? X10_1?
_L_CORE = "{X1}{X}{X2}".format(**_L)  # ($X1)? $X ($X2)?

_LAO_RULES = [re.compile(p) for p in [
    # Rule1 (X0_1 = 0EC0): seven sub-rules
    "ເ" + _L_CORE + "{X5}{X8}?".format(**_L) + _L_TAIL,
    "ເ" + _L_CORE + "[ິີ]{X5}{X8}?".format(**_L) + _L_TAIL,
    "ເ" + _L_CORE + "[ຶື]{X5}ອ{X8}?".format(**_L) + _L_TAIL,
    "ເ" + _L_CORE + "າ?ະ",
    "ເ" + _L_CORE + "ົ{X5}າ".format(**_L) + _L_TAIL,
    "ເ" + _L_CORE + "ັ{X5}{X8}".format(**_L) + _L_TAIL,
    "ເ" + _L_CORE + "ັ?{X5}ຽ".format(**_L) + _L_TAIL,
    # Rule2 (0EC1)
    "ແ" + _L_CORE + "{X5}(?:{X6})?{X8}?".format(**_L) + _L_TAIL,
    "ແ" + _L_CORE + "ະ",
    "ແ" + _L_CORE + "ັ{X5}{X8}".format(**_L) + _L_TAIL,
    # Rule3 (0EC2)
    "ໂ" + _L_CORE + "{X5}{X8}?".format(**_L) + _L_TAIL,
    "ໂ" + _L_CORE + "ະ",
    "ໂ" + _L_CORE + "ັ{X5}[ຍວ]".format(**_L),
    # Rule4 (0EC4) / Rule5 (0EC3)
    "ໄ" + _L_CORE + "{X5}ວ?".format(**_L) + _L_TAIL,
    "ໃ" + _L_CORE + "{X5}ວ?".format(**_L) + _L_TAIL,
    # Rule6-14 (no leading X0)
    _L_CORE + "{X3}{X5}{X8}?".format(**_L) + _L_TAIL,
    _L_CORE + "[ິ-ື]{X5}{X8}?".format(**_L) + _L_TAIL,
    _L_CORE + "ໍ{X5}າ?".format(**_L) + _L_TAIL,
    _L_CORE + "ົ{X5}{X8}".format(**_L) + _L_TAIL,
    _L_CORE + "ົ{X5}ວະ".format(**_L),
    _L_CORE + "ັ{X5}ວ?{X8}".format(**_L) + _L_TAIL,
    _L_CORE + "{X5}{X6}{X8}".format(**_L) + _L_TAIL,
    _L_CORE + "{X5}ະ".format(**_L),
    _L_CORE + "{X5}າ{X8}?".format(**_L) + _L_TAIL,
    _L_CORE + "{X5}ຳ".format(**_L) + _L_TAIL,
]]

_LAO_LETTER = re.compile("[຀-໿]")


def _lao_match(text: str, i: int, limit: int | None = None) -> int:
    """Longest rule match at i (RBBI longest-match-wins); 0 if none."""
    end = len(text) if limit is None else limit
    best = 0
    for rule in _LAO_RULES:
        m = rule.match(text, i, end)
        if m and m.end() - i > best:
            best = m.end() - i
    return best


def segment_lao(run: str) -> list[tuple[int, int]]:
    """Lao syllables with LaoBreakIterator's pushback verification."""
    out: list[tuple[int, int]] = []
    i, n = 0, len(run)
    while i < n:
        length = _lao_match(run, i)
        if length == 0:
            i += 1  # ruleStatus 0: not a token (ICUTokenizer.java:210)
            continue
        j = i + length
        if (j < n and _lao_match(run, j) == 0
                and _LAO_LETTER.match(run[j])
                and length >= 2
                and _lao_match(run, i, j - 1) == length - 1):
            j -= 1  # verifyPushBack: shortened syllable is itself legal
        out.append((i, j))
        i = j
    return out


def _segment_greedy(run: str, rule: re.Pattern) -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    i, n = 0, len(run)
    while i < n:
        m = rule.match(run, i)
        if m and m.end() > i:
            out.append((i, m.end()))
            i = m.end()
        else:
            i += 1
    return out


def segment_khmer(run: str) -> list[tuple[int, int]]:
    return _segment_greedy(run, _KH_SYL)


def segment_myanmar(run: str) -> list[tuple[int, int]]:
    return _segment_greedy(run, _MY_SYL)


def segment_thai(run: str) -> list[tuple[int, int]]:
    """Thai runs via the dictionary break iterator (DefaultICUTokenizerConfig
    uses ICU's Thai dictionary BreakIterator; this repo's JDK-dictionary
    port in analysis/thai.py reproduces the reference's testThai token
    stream exactly). Digit/sign-only segments are left to the caller's
    numeric gap rule — the grammars' {100} — so ๑๒๓๔ emits as one numeric
    token like the reference's testThai expects."""
    from .thai import thai_breaker_segments

    out: list[tuple[int, int]] = []
    i = 0
    for seg in thai_breaker_segments(run):
        j = i + len(seg)
        if _THAI_LETTER_RE.search(seg):
            out.append((i, j))
        i = j
    return out


_THAI_LETTER_RE = re.compile("[ก-ฺเ-๎]")


# --- script-run dispatch ----------------------------------------------------

_SCRIPT_RANGES = (
    (0x1780, 0x17FF, "khmer"), (0x19E0, 0x19FF, "khmer"),  # + symbols block
    (0x0E01, 0x0E5B, "thai"),
    (0x0E80, 0x0EFF, "lao"),
    (0x1000, 0x109F, "myanmar"), (0xAA60, 0xAA7F, "myanmar"),
)


def _script_of(ch: str) -> str | None:
    cp = ord(ch)
    for lo, hi, name in _SCRIPT_RANGES:
        if lo <= cp <= hi:
            return name
    return None


_SEGMENTERS = {
    "khmer": segment_khmer,
    "lao": segment_lao,
    "myanmar": segment_myanmar,
    "thai": segment_thai,
}

# Hebrew.rbbi tailoring (uax29/Hebrew.rbbi:24-33): U+0027 added to
# Extend (apostrophe sticks to a word, incl. trailing geresh-style
# abbreviations), U+0022 added to MidLetter (gershayim-style " joins two
# letters, e.g. acronyms). Applied as a dedicated word pattern that wins
# over the standard token regex at Hebrew positions; quotes stay in the
# token text exactly like the RBBI segment would keep them.

_HEB_L = "\u05D0-\u05EA\u05F0-\u05F2"
_HEB_M = "\u0591-\u05C7"
_HEBREW_WORD = (
    f"[{_HEB_L}](?:[{_HEB_L}{_HEB_M}']|\"(?=[{_HEB_L}]))*"
)


def icu_tokenize(text: str | None) -> list[str]:
    """ICUTokenizer-equivalent token list: Khmer/Lao/Myanmar script runs
    go through their RBBI syllable grammars; Hebrew words keep their
    quote tailorings; everything else goes through the standard UAX#29
    tokenizer (DefaultICUTokenizerConfig dispatch). Output is lowercased
    to match the repo's standard chain."""
    from .analyzer import _PY_TOKEN_RE, _java_lower

    global _COMBINED_RE
    if _COMBINED_RE is None:
        _COMBINED_RE = re.compile(
            f"(?:{_HEBREW_WORD})|(?:{_PY_TOKEN_RE.pattern})")

    if not text:
        return []
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        script = _script_of(text[i])
        j = i + 1
        while j < n and _script_of(text[j]) == script:
            j += 1
        run = text[i:j]
        if script is None:
            for m in _COMBINED_RE.finditer(run):
                out.append(_java_lower(m.group(0)))
        else:
            # rule-matched syllables + the grammars' {100} numeric rule
            # (script digits are WB Numeric; orphan letters stay status-0)
            segs = _SEGMENTERS[script](run)
            pos = 0
            for s_, e_ in segs + [(len(run), len(run))]:
                for dm in _DIGITS_RE.finditer(run, pos, s_):
                    out.append(dm.group(0))
                if e_ > s_:
                    out.append(_java_lower(run[s_:e_]))
                pos = e_
        i = j
    return out


_COMBINED_RE = None
_DIGITS_RE = re.compile(r"\d+")

"""Thai analysis: dictionary word segmentation + Thai stop set.

Reference chain (ThaiAnalyzer.java:101-110, matchVersion >= 3.6):
StandardTokenizer -> StandardFilter -> LowerCase -> ThaiWordFilter ->
Stop(th/stopwords.txt).  ThaiWordFilter.java:44-60 re-segments every token
whose first char is in the THAI Unicode block via
java.text.BreakIterator.getWordInstance(new Locale("th")) — a
sun.text.DictionaryBasedBreakIterator.

This module reimplements that iterator from the JDK's own compiled data
(analysis/thaidata.py, extracted by tools/extract_thai_data.py +
tools/ThaiDictDump.java / ThaiRuleDump.java):

- the word rule DFA (RuleBasedBreakIterator.handleNext) finds rule-level
  segments — script transitions, digits, the paiyannoi/maiyamok special
  categories — and counts dictionary-flagged chars along the way;
- ranges that contain >= 2 dictionary chars are subdivided by
  divideUpDictionaryRange (DictionaryBasedBreakIterator), ported
  control-flow-exactly from the JDK bytecode, including its backtracking
  stacks, best-so-far recovery on unknown words, and the quirk that a
  non-dictionary char terminates division for the rest of the range.

Thai has no case or stemming, so the whole chain is: tokenize (Thai
SOUTHEAST_ASIAN runs split from other scripts, like the reference's
StandardTokenizer grammar), lowercase (non-Thai subtokens), breaker-split
Thai tokens, stop-filter.

Verification: tests/test_thai.py — TestThaiAnalyzer.java fixtures
byte-identical + 30k-line fuzz vs the live JDK breaker
(tools/thai_probe.py piping through tools/ThaiSegPipe.java), 0 diffs.
"""

from __future__ import annotations

import re

from .analyzer import MAX_TOKEN_LENGTH, _CJK_IDEO, _HIRA, _KATA, _PY_MARK, \
    _java_lower
from .thaidata import BMP_CATEGORY_RUNS, CATEGORY_FLAGS, END_STATES, \
    LOOKAHEAD_STATES, NUM_CATEGORIES, STATE_TABLE, STOP_TH, \
    SUPP_CATEGORY_RUNS, WORDS

_DONE = 0xFFFF  # CharacterIterator.DONE (a real U+FFFF char collides — JDK quirk kept)

# ---------------------------------------------------------------------------
# rule categories: BMP as a flat 65,536-entry table, astral via run search

_BMP_CAT = bytearray(0x10000)
for _a, _b, _c in BMP_CATEGORY_RUNS:
    for _cp in range(_a, _b + 1):
        _BMP_CAT[_cp] = _c & 0xFF


def _cat(cp: int) -> int:
    if cp < 0x10000:
        v = _BMP_CAT[cp]
        return v - 256 if v >= 128 else v  # stored as unsigned byte
    lo, hi = 0, len(SUPP_CATEGORY_RUNS) - 1
    while lo <= hi:
        mid = (lo + hi) // 2
        a, b, c = SUPP_CATEGORY_RUNS[mid]
        if cp < a:
            hi = mid - 1
        elif cp > b:
            lo = mid + 1
        else:
            return c
    return -1


# ---------------------------------------------------------------------------
# the thai_dict trie (BreakDictionary semantics): state 0 = root = error,
# -1 = end-of-word. A char outside the dictionary's alphabet maps to
# column 0, i.e. transitions to -1 iff the current state is accepting.

_TRIE_NEXT: list[dict[int, int]] | None = None
_TRIE_ACCEPT: list[bool] | None = None
_DICT_CHARS: frozenset[int] = frozenset()


def _build_trie() -> None:
    global _TRIE_NEXT, _TRIE_ACCEPT, _DICT_CHARS
    nxt: list[dict[int, int]] = [{}]
    acc: list[bool] = [False]
    chars: set[int] = set()
    for w in WORDS:
        s = 0
        for ch in w:
            cp = ord(ch)
            chars.add(cp)
            child = nxt[s].get(cp)
            if child is None:
                child = len(nxt)
                nxt[s][cp] = child
                nxt.append({})
                acc.append(False)
            s = child
        acc[s] = True
    _TRIE_NEXT, _TRIE_ACCEPT, _DICT_CHARS = nxt, acc, frozenset(chars)


def _ensure_trie() -> None:
    if _TRIE_NEXT is None:
        _build_trie()


# ---------------------------------------------------------------------------
# RuleBasedBreakIterator.handleNext (exact port of the JDK bytecode):
# returns (boundary, dictionary_char_count) scanning from `idx`.

def _rule_handle_next(text: str, idx: int) -> tuple[int, int]:
    n = len(text)
    if idx == n:
        return -1, 0
    result = idx + 1          # getNextIndex()
    lookahead_result = 0
    state = 1                 # START_STATE
    dict_count = 0
    i = idx
    c = ord(text[i]) if i < n else _DONE
    while c != _DONE and state != 0:  # STOP_STATE
        category = _cat(c)
        if category != -1:
            if CATEGORY_FLAGS[category]:
                dict_count += 1
            state = STATE_TABLE[state * NUM_CATEGORIES + category]
        if LOOKAHEAD_STATES[state]:
            if END_STATES[state]:
                result = lookahead_result
            else:
                lookahead_result = i + 1
        elif END_STATES[state]:
            result = i + 1
        i = i + 1 if i < n else n
        c = ord(text[i]) if i < n else _DONE
    if c == _DONE and lookahead_result == n:
        result = lookahead_result
    return result, dict_count


# ---------------------------------------------------------------------------
# DictionaryBasedBreakIterator.divideUpDictionaryRange (exact port of the
# JDK bytecode, including the stale-state resume and the aliasing of
# currentBreakPositions = bestBreakPositions on recovery).

def _get_next(text: str, n: int, i: int) -> tuple[int, int]:
    """RuleBasedBreakIterator.getNext() — (new_index, codepoint). The JDK
    quirk that matters: the index NEVER crosses the iterator end; stepping
    off the last char returns DONE with the index left in place, so
    getIndex() tops out at n-1 (not n) during forward scans."""
    if i == n or i + 1 >= n:
        return i, _DONE
    return i + 1, ord(text[i + 1])


def _divide_up(text: str, start_pos: int, end_pos: int) -> list[int]:
    _ensure_trie()
    nxt, acc, chars = _TRIE_NEXT, _TRIE_ACCEPT, _DICT_CHARS
    n = len(text)
    # skip leading non-dictionary-flagged chars
    i = start_pos
    c = ord(text[i]) if i < n else _DONE
    category = _cat(c)
    while category == -1 or not CATEGORY_FLAGS[category]:
        i, c = _get_next(text, n, i)
        category = _cat(c)

    current: list[int] = []    # currentBreakPositions
    possible: list[int] = []   # possibleBreakPositions
    wrong: list[int] = []      # wrongBreakPositions
    state = 0
    farthest = i               # farthestEndPoint
    best: list[int] | None = None
    while True:
        # if the current state is accepting, this is a possible break
        if acc[state]:
            possible.append(i)
        # getNextStateFromCharacter: column 0 (non-dictionary char) maps to
        # -1 iff accepting; otherwise trie transition or 0 (error)
        if c in chars:
            state = nxt[state].get(c, 0)
        else:
            state = -1 if acc[state] else 0
        if state == -1:
            current.append(i)
            break
        if state != 0 and i < end_pos:
            i, c = _get_next(text, n, i)
            continue
        # error, or ran off the end of the range mid-word
        if i > farthest:
            farthest = i
            best = list(current)
        while possible and possible[-1] in wrong:
            possible.pop()
        if not possible:
            if best is not None:
                current = best  # alias, as in the JDK
                if farthest >= end_pos:
                    break
                i = farthest + 1
            else:
                if (not current or current[-1] != i) and i != start_pos:
                    current.append(i)
                i, _ = _get_next(text, n, i)
                current.append(i)
        else:
            temp = possible.pop()
            while current and temp < current[-1]:
                wrong.append(current.pop())
            current.append(temp)
            i = current[-1]
        c = ord(text[i]) if i < n else _DONE  # getCurrent() after setIndex
        if i >= end_pos:
            break
        # NOTE: `state` intentionally NOT reset here — the JDK resumes the
        # loop with whatever state the error path left (0 after a failed
        # transition; the stale mid-word state after running off the end)
    if current:
        current.pop()
    current.append(end_pos)
    return [start_pos] + current


def thai_breaker_segments(text: str) -> list[str]:
    """All word-instance segments of `text` under the JDK's Thai breaker —
    what ThaiWordFilter.java:87-121 iterates over one token."""
    if not text:
        return []
    n = len(text)
    segs: list[str] = []
    idx = 0
    cached: list[int] | None = None
    pos_in_cache = 0
    while idx < n:
        if cached is None or pos_in_cache == len(cached) - 1:
            result, dict_count = _rule_handle_next(text, idx)
            if dict_count > 1 and result - idx > 1:
                cached = _divide_up(text, idx, result)
                pos_in_cache = 0
            else:
                cached = None
                if result <= idx:  # no forward progress (end of text)
                    break
                segs.append(text[idx:result])
                idx = result
                continue
        pos_in_cache += 1
        b = cached[pos_in_cache]
        if b <= idx:
            break
        segs.append(text[idx:b])
        idx = b
    return segs


# ---------------------------------------------------------------------------
# the analyzer chain

# Thai SOUTHEAST_ASIAN chars (Line_Break=Complex_Context, the class the
# reference's StandardTokenizer grammar segments as <SOUTHEAST_ASIAN> runs):
# letters+marks+paiyannoi U+0E01-0E3A, vowels/signs/maiyamok U+0E40-0E4E.
_THAI_SA = "ก-ฺเ-๎"
_TH_WORD_CHAR = rf"(?:(?![{_CJK_IDEO}{_HIRA}{_KATA}{_THAI_SA}])[^\W_])"
_TH_WORD_CONT = rf"(?:{_TH_WORD_CHAR}|(?![{_THAI_SA}])[{_PY_MARK}])"
_TH_TOKEN_RE = re.compile(
    rf"([{_THAI_SA}]+)"        # SOUTHEAST_ASIAN runs — split from other scripts
    rf"|([{_CJK_IDEO}])"
    rf"|([{_KATA}]+)"
    rf"|([{_HIRA}])"
    rf"|({_TH_WORD_CHAR}{_TH_WORD_CONT}*"
    rf"(?:['’.]{_TH_WORD_CHAR}{_TH_WORD_CONT}*"
    rf"|(?<=\d),(?=\d){_TH_WORD_CHAR}{_TH_WORD_CONT}*)*)"
)


def thai_token_stream(text: str | None) -> list[str]:
    """Pre-stop token array under the Thai chain: SOUTHEAST_ASIAN-aware
    tokenization, lowercase, Thai-initial tokens breaker-segmented."""
    if not text:
        return []
    out: list[str] = []
    for m in _TH_TOKEN_RE.finditer(text):
        tok = m.group(0)
        if len(tok) > MAX_TOKEN_LENGTH:
            continue
        tok = _java_lower(tok)
        # ThaiWordFilter.java:108: UnicodeBlock.of(charAt(0)) == THAI
        if tok and 0x0E00 <= ord(tok[0]) <= 0x0E7F:
            out.extend(thai_breaker_segments(tok))
        else:
            out.append(tok)
    return out


def thai_placeholder_tokens(text: str | None) -> list[str]:
    """Index-side form: one slot per post-segmentation token, "" where the
    stop filter drops it (positions stay countable)."""
    return ["" if t in STOP_TH else t for t in thai_token_stream(text)]


def thai_analyze(text: str | None) -> list[tuple[int, str]]:
    """Query/fidelity-side chain: [(pre-stop position, term)] post-stop."""
    return [(pos, t) for pos, t in enumerate(thai_placeholder_tokens(text))
            if t]

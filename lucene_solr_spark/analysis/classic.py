"""ClassicTokenizer + ClassicFilter — the pre-3.1 StandardAnalyzer
tokenizer with ACRONYM / COMPANY / EMAIL / HOST / NUM token types.

Re-derives ClassicTokenizerImpl.jflex:40-100 as Python regexes with JFlex
maximal-munch + rule-priority scanning, and ClassicFilter.java (strip
possessive 's from APOSTROPHE tokens, dots from ACRONYM tokens).
Verified against TestClassicAnalyzer.java expectations.
"""

from __future__ import annotations

import re

_CJ = (r"㄀-ㄯ぀-ゟ゠-ヿㇰ-ㇿ"
       r"㌀-㍿㐀-䶿一-鿿豈-﫿"
       r"･-ﾟ")
# LETTER = unicode letter minus CJ; THAI merged into ALPHANUM like the
# reference. Python re lacks \p{L}; [^\W\d_] is the letters-only class.
_LETTER = rf"(?:(?![{_CJ}])[^\W\d_])"
_THAI = r"[฀-๙]"
_ALNUM_CH = rf"(?:{_LETTER}|{_THAI}|[0-9])"
_ALPHANUM = rf"{_ALNUM_CH}+"
_ALPHA = rf"{_LETTER}+"
_P = r"[-_/.,]"
_HAS_DIGIT = rf"(?:{_LETTER}|[0-9])*[0-9](?:{_LETTER}|[0-9])*"

_RULES: list[tuple[str, re.Pattern]] = [
    ("<ALPHANUM>", re.compile(_ALPHANUM)),
    ("<APOSTROPHE>", re.compile(rf"{_ALPHA}(?:'{_ALPHA})+")),
    ("<ACRONYM>", re.compile(rf"{_LETTER}\.(?:{_LETTER}\.)+")),
    ("<COMPANY>", re.compile(rf"{_ALPHA}[&@]{_ALPHA}")),
    ("<EMAIL>", re.compile(
        rf"{_ALPHANUM}(?:[-._]{_ALPHANUM})*@{_ALPHANUM}"
        rf"(?:[-.]{_ALPHANUM})+")),
    ("<HOST>", re.compile(rf"{_ALPHANUM}(?:\.{_ALPHANUM})+")),
    ("<NUM>", re.compile(
        rf"(?:{_ALPHANUM}{_P}{_HAS_DIGIT}"
        rf"(?:{_P}{_ALPHANUM}{_P}{_HAS_DIGIT})+"
        rf"|{_HAS_DIGIT}{_P}{_ALPHANUM}"
        rf"(?:{_P}{_HAS_DIGIT}{_P}{_ALPHANUM})+"
        rf"|{_ALPHANUM}(?:{_P}{_HAS_DIGIT}{_P}{_ALPHANUM})+"
        rf"|{_HAS_DIGIT}(?:{_P}{_ALPHANUM}{_P}{_HAS_DIGIT})+"
        rf"|{_ALPHANUM}{_P}{_HAS_DIGIT}"
        rf"|{_HAS_DIGIT}{_P}{_ALPHANUM})")),
    ("<CJ>", re.compile(rf"[{_CJ}]")),
    ("<ACRONYM_DEP>", re.compile(rf"{_ALPHANUM}\.(?:{_ALPHANUM}\.)+")),
]


def classic_tokenize(text: str) -> list[tuple[str, str]]:
    """(token, type) per the classic grammar — longest match wins, rule
    order breaks ties (NUM alternatives are ordered longest-first because
    Python picks the first matching alternative)."""
    out: list[tuple[str, str]] = []
    i = 0
    n = len(text)
    while i < n:
        best = None
        best_len = 0
        for typ, rx in _RULES:
            m = rx.match(text, i)
            if m is not None and m.end() - i > best_len:
                best = (m.group(0), typ)
                best_len = m.end() - i
        if best is None:
            i += 1
            continue
        out.append(best)
        i += best_len
    return out


def classic_filter(tokens: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """ClassicFilter.java: strip possessive 's from APOSTROPHE tokens and
    all dots from ACRONYM tokens."""
    out: list[tuple[str, str]] = []
    for term, typ in tokens:
        if typ == "<APOSTROPHE>" and (term.endswith("'s")
                                      or term.endswith("'S")):
            term = term[:-2]
        elif typ == "<ACRONYM>":
            term = term.replace(".", "")
        out.append((term, typ))
    return out

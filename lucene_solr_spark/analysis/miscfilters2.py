"""Remaining miscellaneous token filters (analysis/miscellaneous parity).

Stream filters operate on (term, positionIncrement) lists like
worddelimiter.py; single-term filters are str → str.

- capitalization        CapitalizationFilter.java:57-160
- hyphenated_words      HyphenatedWordsFilter.java:63-120
- keep_word             KeepWordFilter.java (FilteringTokenFilter, 4.4
                        position-increment semantics)
- remove_duplicates     RemoveDuplicatesTokenFilter.java:49-74
- scandinavian_normalization  ScandinavianNormalizationFilter.java:49-115
- scandinavian_folding  ScandinavianFoldingFilter.java:56-117
- limit_token_count     LimitTokenCountFilter.java
- limit_token_position  LimitTokenPositionFilter.java
"""

from __future__ import annotations

from .analyzer import _java_lower


def _java_upper(c: str) -> str:
    u = c.upper()
    return u if len(u) == 1 else c


def capitalization(
    token: str,
    only_first_word: bool = True,
    keep: frozenset[str] = frozenset(),
    force_first_letter: bool = True,
    ok_prefix: tuple[str, ...] = (),
    min_word_length: int = 0,
    max_word_count: int = 2 ** 31 - 1,
    max_token_length: int = 2 ** 31 - 1,
) -> str:
    """CapitalizationFilter: capitalize word starts inside the token
    (words split on chars <= ' ' and '.'), factory defaults."""
    if len(token) >= max_token_length:
        return token
    buf = list(token)

    def process(off: int, length: int, word_count: int) -> None:
        if length < 1:
            return
        if only_first_word and word_count > 0:
            for i in range(length):
                buf[off + i] = _java_lower(buf[off + i])
            return
        if keep and "".join(buf[off: off + length]) in keep:
            if word_count == 0 and force_first_letter:
                buf[off] = _java_upper(buf[off])
            return
        if length < min_word_length:
            return
        for pre in ok_prefix:
            if length >= len(pre) and "".join(
                    buf[off: off + len(pre)]) == pre:
                return
        buf[off] = _java_upper(buf[off])
        for i in range(1, length):
            buf[off + i] = _java_lower(buf[off + i])

    word_count = 0
    last_start = 0
    i = 0
    while i < len(buf):
        c = buf[i]
        if c <= " " or c == ".":
            length = i - last_start
            if length > 0:
                process(last_start, length, word_count)
                word_count += 1
                last_start = i + 1
                i += 1
        i += 1
    if last_start < len(buf):
        process(last_start, len(buf) - last_start, word_count)
        word_count += 1
    if word_count > max_word_count:
        return token
    return "".join(buf)


def hyphenated_words(tokens: list[tuple[str, int]]) -> list[tuple[str, int]]:
    """HyphenatedWordsFilter: join a token ending in '-' with the next
    token; the joined token keeps the FIRST token's attributes (position
    increment). A trailing unpaired hyphenated token is emitted with its
    '-' restored."""
    out: list[tuple[str, int]] = []
    pending: list[str] = []
    pending_inc = 0
    for term, inc in tokens:
        if term.endswith("-"):
            if not pending:
                pending_inc = inc
            pending.append(term[:-1])
        elif not pending:
            out.append((term, inc))
        else:
            pending.append(term)
            out.append(("".join(pending), pending_inc))
            pending = []
    if pending:
        out.append(("".join(pending) + "-", pending_inc))
    return out


def keep_word(
    tokens: list[tuple[str, int]], words: frozenset[str]
) -> list[tuple[str, int]]:
    """KeepWordFilter with enablePositionIncrements=true (4.4 default):
    dropped tokens add their increment to the next survivor."""
    out: list[tuple[str, int]] = []
    acc = 0
    for term, inc in tokens:
        if term in words:
            out.append((term, inc + acc))
            acc = 0
        else:
            acc += inc
    return out


def remove_duplicates(tokens: list[tuple[str, int]]) -> list[tuple[str, int]]:
    """RemoveDuplicatesTokenFilter: drop a token whose term already
    occurred at the SAME position (posIncrement == 0)."""
    out: list[tuple[str, int]] = []
    at_pos: set[str] = set()
    for term, inc in tokens:
        if inc > 0:
            at_pos = set()
        if inc == 0 and term in at_pos:
            continue
        at_pos.add(term)
        out.append((term, inc))
    return out


def scandinavian_normalization(token: str) -> str:
    """ä→æ ö→ø plus ae/aa/ao/oe/oo digraph contraction."""
    buf = list(token)
    i = 0
    while i < len(buf):
        c = buf[i]
        if c == "ä":
            buf[i] = "æ"
        elif c == "Ä":
            buf[i] = "Æ"
        elif c == "ö":
            buf[i] = "ø"
        elif c == "Ö":
            buf[i] = "Ø"
        elif len(buf) - 1 > i:
            n = buf[i + 1]
            if c == "a" and n in ("a", "o", "A", "O"):
                del buf[i + 1]
                buf[i] = "å"
            elif c == "A" and n in ("a", "A", "o", "O"):
                del buf[i + 1]
                buf[i] = "Å"
            elif c == "a" and n in ("e", "E"):
                del buf[i + 1]
                buf[i] = "æ"
            elif c == "A" and n in ("e", "E"):
                del buf[i + 1]
                buf[i] = "Æ"
            elif c == "o" and n in ("e", "E", "o", "O"):
                del buf[i + 1]
                buf[i] = "ø"
            elif c == "O" and n in ("e", "E", "o", "O"):
                del buf[i + 1]
                buf[i] = "Ø"
        i += 1
    return "".join(buf)


def scandinavian_folding(token: str) -> str:
    """å/ä/æ→a ö/ø→o plus aa/ae/ao/oe/oo digraph removal."""
    buf = list(token)
    i = 0
    while i < len(buf):
        c = buf[i]
        if c in ("å", "ä", "æ"):
            buf[i] = "a"
        elif c in ("Å", "Ä", "Æ"):
            buf[i] = "A"
        elif c in ("ø", "ö"):
            buf[i] = "o"
        elif c in ("Ø", "Ö"):
            buf[i] = "O"
        elif len(buf) - 1 > i:
            n = buf[i + 1]
            if c in ("a", "A") and n in ("a", "A", "e", "E", "o", "O"):
                del buf[i + 1]
            elif c in ("o", "O") and n in ("e", "E", "o", "O"):
                del buf[i + 1]
        i += 1
    return "".join(buf)


def limit_token_count(
    tokens: list[tuple[str, int]], max_count: int
) -> list[tuple[str, int]]:
    return tokens[:max_count]


def limit_token_position(
    tokens: list[tuple[str, int]], max_position: int
) -> list[tuple[str, int]]:
    out: list[tuple[str, int]] = []
    pos = 0
    for term, inc in tokens:
        pos += inc
        if pos > max_position:
            break
        out.append((term, inc))
    return out

"""TeX/FOP hyphenation-grammar compound decomposition
(HyphenationCompoundWordTokenFilter + the compound/hyphenation engine).

Re-derives the reference's Liang-pattern hyphenator
(HyphenationTree.java:315-404) and the hyphenation-variant decompose
(HyphenationCompoundWordTokenFilter.java:169-235):

- Grammar files are the public TeX/FOP hyphenation XMLs
  (<classes>/<patterns>/<exceptions>) — `parse_hyphenation_xml` reads one;
  patterns split into letters + interletter digit values exactly like
  PatternParser.getPattern/getInterletterValues (dummy-letter sentinel, so
  a pattern of n letters carries n+1 values).
- hyphenate(): per-char class normalization (leading non-letters ignored,
  embedded non-letters reject the word, trailing ones shrink it), the
  exception stoplist short-circuit, then max-over-matching-patterns
  interletter values with '.' word sentinels; boundaries where the value
  is odd, clamped by remain/push char counts, plus the synthetic 0 and len
  endpoints. The reference walks a packed ternary tree; matching every
  pattern that prefixes word[i:] is the same function over the same data.
- hyphenation_compound(): subwords spanning >= 1 hyphenation interval,
  bounded by min/max subword size, optional dictionary check with the
  genitive-s retry (partLength-1), onlyLongestMatch per start point —
  reference test parity on the da_UTF8.xml grammar in
  tests/test_hyphenation.py.
"""

from __future__ import annotations

import re

from .compound import (
    DEFAULT_MAX_SUBWORD_SIZE,
    DEFAULT_MIN_SUBWORD_SIZE,
    DEFAULT_MIN_WORD_SIZE,
)

__all__ = ["HyphenationTree", "parse_hyphenation_xml", "hyphenation_compound"]


class HyphenationTree:
    """Liang hyphenation patterns + character classes + exceptions."""

    def __init__(self) -> None:
        self.classes: dict[str, str] = {}       # char -> normalized char
        self.patterns: dict[str, tuple[int, ...]] = {}
        self.max_pattern_len = 0
        self.stoplist: dict[str, list[object]] = {}

    # PatternConsumer callbacks -------------------------------------------
    def add_class(self, chargroup: str) -> None:
        if chargroup:
            equiv = chargroup[0]
            for ch in chargroup:
                self.classes[ch] = equiv

    def add_pattern(self, pattern: str, ivalue: str) -> None:
        self.patterns[pattern] = tuple(int(d) for d in ivalue)
        self.max_pattern_len = max(self.max_pattern_len, len(pattern))

    def add_exception(self, word: str, hyphenated: list[object]) -> None:
        self.stoplist[word] = hyphenated

    # ---------------------------------------------------------------------
    def hyphenate(self, word: str, remain: int = 1,
                  push: int = 1) -> list[int] | None:
        """Hyphenation points incl. the synthetic 0 and len endpoints
        (Hyphenation.getHyphenationPoints), or None."""
        # normalize through the class map (HyphenationTree.java:320-345)
        norm: list[str] = []
        ignore_at_beginning = 0
        end_of_letters = False
        for i, ch in enumerate(word):
            nc = self.classes.get(ch)
            if nc is None:
                if i == ignore_at_beginning:
                    ignore_at_beginning += 1
                else:
                    end_of_letters = True
            else:
                if end_of_letters:
                    return None
                norm.append(nc)
        n = len(norm)
        if n < remain + push:
            return None
        sw = "".join(norm)
        result: list[int] = []
        if sw in self.stoplist:
            j = 0
            for o in self.stoplist[sw]:
                if isinstance(o, str):
                    j += len(o)
                    if j >= remain and j < (n - push):
                        result.append(j + ignore_at_beginning)
        else:
            padded = "." + sw + "."
            il = [0] * (len(padded) + 1)
            maxlen = self.max_pattern_len
            for i in range(n + 1):
                limit = min(maxlen, len(padded) - i)
                for ln in range(1, limit + 1):
                    vals = self.patterns.get(padded[i:i + ln])
                    if vals is not None:
                        for k, v in enumerate(vals):
                            if v > il[i + k]:
                                il[i + k] = v
            for i in range(n):
                if (il[i + 1] & 1) == 1 and remain <= i <= (n - push):
                    result.append(i + ignore_at_beginning)
        if not result:
            return None
        # synthetic endpoints: res[0]=0, res[k+1]=len (normalized length)
        return [0] + result + [n]


def parse_hyphenation_xml(text: str) -> HyphenationTree:
    """Parse a TeX/FOP hyphenation grammar (the PatternParser surface we
    need: classes / patterns / exceptions with <hyp/> hyphens)."""
    import xml.etree.ElementTree as ET

    # the files carry a DOCTYPE for hyphenation.dtd; strip it (we resolve
    # no external entities, mirroring PatternParser.resolveEntity's
    # internal-DTD behavior)
    text = re.sub(r"<!DOCTYPE[^>]*>", "", text)
    root = ET.fromstring(text)
    tree = HyphenationTree()
    for el in root:
        tag = el.tag
        if tag == "classes":
            for group in (el.text or "").split():
                tree.add_class(group)
        elif tag == "patterns":
            body = "".join(el.itertext())
            for pat in body.split():
                letters = "".join(c for c in pat if not c.isdigit())
                # getInterletterValues with the dummy sentinel letter
                ivals = []
                w = pat + "a"
                i = 0
                while i < len(w):
                    if w[i].isdigit():
                        ivals.append(w[i])
                        i += 2
                    else:
                        ivals.append("0")
                        i += 1
                tree.add_pattern(letters, "".join(ivals))
        elif tag == "exceptions":
            # text segments split on <hyp/> children become the stoplist
            # entry: ["foo", hyphen, "bar"] — we keep strings only (the
            # algorithm counts string lengths; Hyphen objects contribute 0)
            parts: list[object] = []
            word_parts: list[str] = []

            def flush_word() -> None:
                if word_parts:
                    w = "".join(word_parts)
                    tree.add_exception(
                        w.replace("-", ""),
                        [p for seg in w.split("-")
                         for p in (seg, object()) if p != ""][:-1])
                    word_parts.clear()

            chunks = [(el.text or "")]
            for child in el:
                chunks.append(child.tail or "")
            for chunk in chunks:
                for tok in re.split(r"(\s+)", chunk):
                    if tok.strip():
                        word_parts.append(tok)
                    elif tok:
                        flush_word()
            flush_word()
    return tree


def hyphenation_compound(
    tokens: list[tuple[str, int]],
    hyphenator: HyphenationTree,
    dictionary: frozenset[str] | None = None,
    min_word_size: int = DEFAULT_MIN_WORD_SIZE,
    min_subword_size: int = DEFAULT_MIN_SUBWORD_SIZE,
    max_subword_size: int = DEFAULT_MAX_SUBWORD_SIZE,
    only_longest_match: bool = False,
) -> list[tuple[str, int]]:
    """HyphenationCompoundWordTokenFilter over (term, posInc) tokens: the
    original is always kept; subwords spanning hyphenation intervals are
    appended at posInc 0 in discovery order."""
    from .analyzer import _java_lower

    lower_dict = None
    if dictionary is not None:
        lower_dict = frozenset("".join(_java_lower(c) for c in w)
                               for w in dictionary)

    def in_dict(sub: str) -> bool:
        return "".join(_java_lower(c) for c in sub) in lower_dict

    out: list[tuple[str, int]] = []
    for term, inc in tokens:
        out.append((term, inc))
        if len(term) < min_word_size:
            continue
        hyp = hyphenator.hyphenate(term, 1, 1)
        if hyp is None:
            continue
        for i in range(len(hyp)):
            remaining = len(hyp) - i
            start = hyp[i]
            longest: str | None = None
            for j in range(1, remaining):
                part_len = hyp[i + j] - start
                if part_len > max_subword_size:
                    break
                if part_len < min_subword_size:
                    continue
                sub = term[start:start + part_len]
                if lower_dict is None or in_dict(sub):
                    if only_longest_match:
                        if longest is None or len(longest) < part_len:
                            longest = sub
                    else:
                        out.append((sub, 0))
                elif in_dict(term[start:start + part_len - 1]):
                    # genitive-s / binding-char retry, one char shorter
                    sub2 = term[start:start + part_len - 1]
                    if only_longest_match:
                        if longest is None or len(longest) < part_len - 1:
                            longest = sub2
                    else:
                        out.append((sub2, 0))
            if only_longest_match and longest is not None:
                out.append((longest, 0))
    return out

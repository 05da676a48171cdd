"""Alternative tokenizers: path hierarchy, pattern, and the core
character-class tokenizers.

- path_hierarchy / reverse_path_hierarchy —
  PathHierarchyTokenizer.java:36-160 / ReversePathHierarchyTokenizer.java
  (facet-style progressive path prefixes/suffixes, delimiter replacement,
  skip): verified against the reference's Test(Reverse)PathHierarchy
  expectations.
- pattern_tokenize — PatternTokenizer.java:71-118 (group >= 0 extracts the
  group per match; group < 0 splits on matches).
- pattern_replace_char — PatternReplaceCharFilter semantics at the
  whole-string level (regex replaceAll before tokenization).
- letter/whitespace/keyword/lowercase tokenizers —
  analysis/core CharTokenizers.
"""

from __future__ import annotations

import re


def path_hierarchy(
    path: str, delimiter: str = "/", replacement: str | None = None,
    skip: int = 0,
) -> list[tuple[str, int]]:
    """Progressive path prefixes: '/a/b/c' → /a, /a/b, /a/b/c
    (posInc 1,0,0...). `skip` drops that many leading segments."""
    rep = delimiter if replacement is None else replacement
    out: list[str] = []
    cur: list[str] = []
    skipped = 0
    started = False
    i = 0
    n = len(path)
    # walk char-wise mirroring the reference: the first char always opens
    # a segment; later delimiters close one
    while i < n:
        c = path[i]
        if not started:
            started = True
            skipped += 1
            if skipped > skip:
                cur.append(rep if c == delimiter else c)
        elif c == delimiter:
            skipped += 1
            if skipped > skip + 1:
                out.append("".join(cur))
            if skipped > skip:
                cur.append(rep)
        else:
            if skipped > skip:
                cur.append(c)
        i += 1
    if skipped > skip and cur:
        out.append("".join(cur))
    return [(t, 1 if k == 0 else 0) for k, t in enumerate(out)]


def reverse_path_hierarchy(
    path: str, delimiter: str = "/", replacement: str | None = None,
    skip: int = 0,
) -> list[tuple[str, int]]:
    """Progressive path suffixes: '/a/b/c' → /a/b/c, a/b/c, b/c, c.
    `skip` drops that many trailing segments."""
    rep = delimiter if replacement is None else replacement
    s = path.replace(delimiter, rep) if replacement is not None else path
    # drop the trailing `skip` segments: cut at the skip-th delimiter from
    # the end, where a delimiter at the very end doesn't open a segment
    if skip > 0:
        delims = [i for i, c in enumerate(s) if c == rep]
        if delims and delims[-1] == len(s) - 1:
            delims = delims[:-1]
        if len(delims) < skip:
            return []
        s = s[: delims[-skip] + 1]
    starts = [0] + [i + 1 for i, c in enumerate(s) if c == rep]
    out = [s[st:] for st in starts if st < len(s)]
    return [(t, 1 if k == 0 else 0) for k, t in enumerate(out)]


def pattern_tokenize(
    text: str, pattern: str, group: int = -1
) -> list[str]:
    rx = re.compile(pattern)
    out: list[str] = []
    if group >= 0:
        for m in rx.finditer(text):
            if m.start(group) != m.end(group):
                out.append(m.group(group))
        return out
    index = 0
    for m in rx.finditer(text):
        if m.start() - index > 0:
            out.append(text[index: m.start()])
        index = m.end()
    if len(text) - index > 0:
        out.append(text[index:])
    return out


def pattern_replace_char(text: str, pattern: str, replacement: str) -> str:
    return re.sub(pattern, replacement.replace("$", "\\"), text)


def whitespace_tokenize(text: str) -> list[str]:
    return text.split()


def letter_tokenize(text: str) -> list[str]:
    return [t for t in re.findall(r"[^\W\d_]+", text) if t]


def keyword_tokenize(text: str) -> list[str]:
    return [text] if text else []


def lowercase_tokenize(text: str) -> list[str]:
    from .analyzer import _java_lower

    return [_java_lower(t) for t in letter_tokenize(text)]

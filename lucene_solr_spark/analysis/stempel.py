"""Polish analysis: the stempel (egothor) statistical stemmer.

Reference chain (PolishAnalyzer.java createComponents, lucene/analysis/
stempel): StandardTokenizer -> StandardFilter -> LowerCase ->
Stop(pl/stopwords.txt) -> StempelFilter(stemmer_20000.tbl, minLength=3).

The stemmer is a patch-command trie: StempelStemmer.stem looks the word up
in a MultiTrie2 (8 reversed tries chained by NOOP-delimited command
sections) and applies the resulting egothor diff commands (-/R/D/I) to the
word (Diff.java apply). The compiled table ships as data
(analysis/stempel_data.py, extracted by tools/extract_stempel.py); the
lookup and patch logic here is reimplemented from the egothor sources:
Trie.getLastOnPath (Trie.java:274-295), MultiTrie2.getLastOnPath
(MultiTrie2.java:140-173, incl. the cannotFollow/skip/lengthPP section
arithmetic and the IndexOutOfBounds-returns-partial-result behavior), and
Diff.apply (Diff.java:177-219 with StringBuilder boundary semantics).

Verified vs the reference's own compiled StempelStemmer via
tools/stempel_oracle.py (30k-word fuzz + vocabulary goldens, 0 diffs) —
tests/test_stempel.py.
"""

from __future__ import annotations

from . import stempel_data
from .stempel_data import FORWARD, STOP_PL

__all__ = ["STOP_PL", "polish_stem", "stempel_stem"]

_EOM = "*"
_MIN_LENGTH = 3  # StempelFilter.DEFAULT_MIN_LENGTH


class _IOOBE(Exception):
    """Stand-in for Java's IndexOutOfBoundsException, which the egothor
    code uses for control flow (partial results are kept)."""


# per-trie cell dicts, built lazily: rows[i] = {char: (cmd, ref, skip)}
_ROWMAPS: list[tuple[bool, int, tuple[str, ...], list[dict]]] | None = None


def _ensure_rowmaps() -> list:
    global _ROWMAPS
    if _ROWMAPS is None:
        # stempel_data.TRIES is a lazy module attribute (marshal blob on
        # first access) so workers that never stem Polish skip the load
        _ROWMAPS = [
            (forward, root, cmds,
             [{ch: (cmd, ref, skip) for ch, cmd, ref, skip in cells}
              for cells in rows])
            for forward, root, cmds, rows in stempel_data.TRIES
        ]
    return _ROWMAPS


def _trie_last_on_path(trie, key: str) -> str | None:
    """Trie.getLastOnPath — longest command on the lookup path."""
    forward, root, cmds, rows = trie
    row = rows[root]
    last: str | None = None
    # StrEnum: forward reads left->right, reversed tries right->left
    seq = key if forward else key[::-1]
    n = len(key)
    for i in range(n - 1):
        cell = row.get(seq[i])
        if cell is None:
            return last
        if cell[0] >= 0:
            last = cmds[cell[0]]
        w = cell[1]
        if w >= 0:
            row = rows[w]
        else:
            return last
    cell = row.get(seq[n - 1])
    return cmds[cell[0]] if cell is not None and cell[0] >= 0 else last


def _length_pp(cmd: str) -> int:
    """MultiTrie2.lengthPP — chars consumed by one command section."""
    ln = 0
    i = 0
    while i < len(cmd):
        c = cmd[i]
        i += 1
        if c == "-" or c == "D":
            ln += ord(cmd[i]) - ord("a") + 1
        elif c == "R":
            ln += 1
        i += 1
    return ln


def _skip(s: str, count: int) -> str:
    # MultiTrie2.skip uses the OUTER MultiTrie's forward flag
    if count < 0 or count > len(s):
        raise _IOOBE
    return s[count:] if FORWARD else s[: len(s) - count]


def _cannot_follow(after: str, goes: str) -> bool:
    return after in "-D" and after == goes


def stempel_cmd(key: str) -> str:
    """MultiTrie2.getLastOnPath — concatenated patch command, possibly ""
    (an IndexOutOfBounds anywhere keeps the partial result, as in Java)."""
    tries = _ensure_rowmaps()
    if not key:
        return ""
    result: list[str] = []
    try:
        lastkey = key
        lastch = " "
        prev_r: str | None = None
        for trie in tries:
            r = _trie_last_on_path(trie, lastkey)
            if r is None or (len(r) == 1 and r[0] == _EOM):
                return "".join(result)
            if _cannot_follow(lastch, r[0]):
                return "".join(result)
            if len(r) < 2:
                raise _IOOBE  # r.charAt(r.length()-2)
            lastch = r[-2]
            if r[0] == "-":
                if prev_r is not None:
                    key = _skip(key, _length_pp(prev_r))
                key = _skip(key, _length_pp(r))
            prev_r = r
            result.append(r)
            if len(key) != 0:
                lastkey = key
    except _IOOBE:
        pass
    return "".join(result)


def diff_apply(dest: list[str], diff: str) -> None:
    """Diff.apply with StringBuilder boundary semantics — out-of-bounds
    aborts, keeping mutations made so far."""
    if not diff:
        return
    pos = len(dest) - 1
    if pos < 0:
        return
    try:
        for i in range(len(diff) // 2):
            cmd = diff[2 * i]
            param = diff[2 * i + 1]
            par_num = ord(param) - ord("a") + 1
            if cmd == "-":
                pos = pos - par_num + 1
            elif cmd == "R":
                if pos < 0 or pos >= len(dest):
                    raise _IOOBE  # setCharAt
                dest[pos] = param
            elif cmd == "D":
                o = pos
                pos -= par_num - 1
                if pos < 0 or pos > len(dest):
                    raise _IOOBE  # delete(start, end): start out of range
                del dest[pos:o + 1]
            elif cmd == "I":
                pos += 1
                if pos < 0 or pos > len(dest):
                    raise _IOOBE  # insert offset out of range
                dest.insert(pos, param)
            pos -= 1
    except _IOOBE:
        pass


def stempel_stem(word: str) -> str | None:
    """StempelStemmer.stem: patch-command lookup + diff application;
    None when the stem could not be generated."""
    cmd = stempel_cmd(word)
    buf = list(word)
    diff_apply(buf, cmd)
    return "".join(buf) if buf else None


def polish_stem(token: str) -> str:
    """StempelFilter semantics: words of length > 3 are stemmed; unknown
    words (and everything the patch erases) pass through unchanged."""
    if len(token) <= _MIN_LENGTH:
        return token
    out = stempel_stem(token)
    return out if out else token

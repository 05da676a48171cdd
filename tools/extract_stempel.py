"""Generate lucene_solr_spark/analysis/stempel_data.py from the reference's
Polish stemmer table.

The stempel module's stemmer IS its data: stemmer_20000.tbl is the egothor
MultiTrie2 the reference ships inside the jar (PolishAnalyzer.java
DEFAULT_STEMMER_FILE), trained on 20k Polish lemma pairs and distributed
under the egothor BSD-style license. Matching PolishAnalyzer requires the
identical table; the lookup/patch algorithm around it
(analysis/stempel.py) is reimplemented from the egothor sources.

Serialization format (Trie.java:85-99, MultiTrie.java:83-90, Row.java:78-87):
  readUTF method; if it contains 'M' -> MultiTrie2:
    bool forward, int BY, int ntries x Trie
  Trie: bool forward, int root, int ncmds x UTF cmd, int nrows x Row
  Row:  int ncells x { char ch, int cmd, int cnt, int ref, int skip }

Run from the repo root:  python tools/extract_stempel.py
"""

from __future__ import annotations

import pathlib
import struct

REF_PL = pathlib.Path(
    "/root/reference/lucene/analysis/stempel/src/resources/org/apache/"
    "lucene/analysis/pl")
OUT = pathlib.Path(__file__).resolve().parent.parent / \
    "lucene_solr_spark" / "analysis" / "stempel_data.py"
BIN = OUT.with_suffix(".bin")


class Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def _take(self, n: int) -> bytes:
        b = self.data[self.pos:self.pos + n]
        self.pos += n
        return b

    def bool_(self) -> bool:
        return self._take(1)[0] != 0

    def int_(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def char_(self) -> str:
        return chr(struct.unpack(">H", self._take(2))[0])

    def utf_(self) -> str:
        n = struct.unpack(">H", self._take(2))[0]
        # modified UTF-8; the stemmer cmds are plain BMP text
        return self._take(n).decode("utf-8")


def read_trie(r: Reader):
    forward = r.bool_()
    root = r.int_()
    cmds = [r.utf_() for _ in range(r.int_())]
    rows = []
    for _ in range(r.int_()):
        cells = []
        for _ in range(r.int_()):
            ch = r.char_()
            cmd = r.int_()
            _cnt = r.int_()
            ref = r.int_()
            skip = r.int_()
            cells.append((ch, cmd, ref, skip))
        rows.append(tuple(cells))
    return forward, root, tuple(cmds), tuple(rows)


def main() -> None:
    raw = (REF_PL / "stemmer_20000.tbl").read_bytes()
    r = Reader(raw)
    method = r.utf_()
    assert "M" in method.upper(), method
    forward = r.bool_()
    by = r.int_()
    ntries = r.int_()
    tries = [read_trie(r) for _ in range(ntries)]
    assert r.pos == len(raw), (r.pos, len(raw))

    stops = [ln.strip() for ln in
             (REF_PL / "stopwords.txt").read_text(encoding="utf-8")
             .split("\n") if ln.strip() and not ln.startswith("#")]

    ncells = sum(len(cells) for t in tries for cells in t[3])
    # The trie table goes into a marshal blob loaded lazily on first
    # Polish stem: as a 2.2 MB Python literal it cost ~2.9 s of parse time
    # in EVERY Python UDF worker that imported analysis.lang (the pl chain
    # is wired into the per-lang dispatch), i.e. a per-executor-worker
    # spawn tax on all builds; marshal.load of the same tuple is ~40 ms
    # and only paid by workers that actually stem Polish.
    import marshal

    with BIN.open("wb") as f:
        marshal.dump(tuple(tries), f)
    with OUT.open("w", encoding="utf-8") as f:
        f.write('"""Polish stempel data (GENERATED — tools/extract_stempel.py)\n')
        f.write("from the reference's stemmer_20000.tbl (egothor MultiTrie2,\n")
        f.write(f"method={method!r}, {ntries} tries, {ncells} cells) and\n")
        f.write("pl/stopwords.txt.\n\n")
        f.write("The trie table itself lives in stempel_data.bin (marshal,\n")
        f.write("same tuple shape) and is loaded lazily via module\n")
        f.write("__getattr__ on first TRIES access — keeping this module's\n")
        f.write("import cost negligible for the analysis.lang dispatch that\n")
        f.write("every UDF worker pays on spawn.\n")
        f.write('"""\n\n')
        f.write(f"FORWARD = {forward}\nBY = {by}\n\n")
        f.write(f"STOP_PL = frozenset({stops!r})\n\n")
        f.write(
            "\n"
            "def _load_tries():\n"
            "    import marshal\n"
            "    from importlib import resources\n"
            "\n"
            "    # importlib.resources works both from a directory and from\n"
            "    # a --py-files zip (zipimport implements ResourceReader)\n"
            "    ref = resources.files(__package__).joinpath('stempel_data.bin')\n"
            "    with ref.open('rb') as f:\n"
            "        return marshal.load(f)\n"
            "\n"
            "\n"
            "def __getattr__(name):\n"
            "    # PEP 562 lazy attribute: per-trie (forward, root, cmds, rows);\n"
            "    # each row is a tuple of (char, cmd_index, ref_row, skip) cells\n"
            "    if name == 'TRIES':\n"
            "        globals()['TRIES'] = tries = _load_tries()\n"
            "        return tries\n"
            "    raise AttributeError(name)\n"
        )
    print(f"wrote {OUT} + {BIN}: method={method} by={by} tries={ntries} "
          f"cells={ncells} stops={len(stops)}")


if __name__ == "__main__":
    main()

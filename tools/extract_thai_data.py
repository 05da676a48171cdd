"""Generate lucene_solr_spark/analysis/thaidata.py from the JDK's own Thai
segmentation data.

The reference's ThaiWordFilter (ThaiWordFilter.java:53) delegates entirely
to java.text.BreakIterator.getWordInstance(new Locale("th")) — the spec IS
the JDK's compiled data: the word-break rule DFA (WordBreakIteratorData_th)
and the Thai dictionary trie (thai_dict), both shipped inside java.base.
Matching the reference byte-for-byte REQUIRES the identical tables; the
algorithm around them (analysis/thai.py) is a from-bytecode reimplementation.

Inputs (produced once by the companion Java tools in this directory):
  /tmp/thai_words.txt  — ThaiDictDump.java   (31,992 accepted words)
  /tmp/thai_rules.txt  — ThaiRuleDump.java   (rule DFA tables + categories)

Run from the repo root:  python tools/extract_thai_data.py
"""

from __future__ import annotations

import pathlib

OUT = pathlib.Path(__file__).resolve().parent.parent / \
    "lucene_solr_spark" / "analysis" / "thaidata.py"


STOPWORDS = pathlib.Path(
    "/root/reference/lucene/analysis/common/src/resources/org/apache/"
    "lucene/analysis/th/stopwords.txt")


def main() -> None:
    words = [w for w in pathlib.Path("/tmp/thai_words.txt")
             .read_text(encoding="utf-8").split("\n") if w]
    stops = [ln.strip() for ln in
             STOPWORDS.read_text(encoding="utf-8").split("\n")
             if ln.strip() and not ln.startswith("#")]
    lines = pathlib.Path("/tmp/thai_rules.txt").read_text().split("\n")

    scalars: dict[str, str] = {}
    bmp: list[tuple[int, int, int]] = []
    supp: list[tuple[int, int, int]] = []
    mode = None
    for ln in lines:
        if not ln:
            continue
        if ln.startswith("bmpCategories"):
            mode = "bmp"
            continue
        if ln.startswith("suppCategories"):
            mode = "supp"
            continue
        if mode is None:
            k, _, v = ln.partition(" ")
            scalars[k] = v
        else:
            a, b, c = ln.split()
            (bmp if mode == "bmp" else supp).append(
                (int(a, 16), int(b, 16), int(c)))

    num_categories = int(scalars["numCategories"])
    flags = scalars["categoryFlags"]
    end_states = scalars["endStates"]
    lookahead = scalars["lookaheadStates"]
    state_table = [int(x) for x in scalars["stateTable"].split()]

    def runs_lit(runs: list[tuple[int, int, int]]) -> str:
        # (start, end, category) runs, packed as a compact literal
        parts = [f"({a},{b},{c})" for a, b, c in runs]
        body = ",".join(parts)
        return f"({body})"

    with OUT.open("w", encoding="utf-8") as f:
        f.write('"""Thai word-break data (GENERATED — tools/extract_thai_data.py)\n')
        f.write("from the JDK's WordBreakIteratorData_th rule DFA and thai_dict\n")
        f.write("trie, the exact data ThaiWordFilter.java:53 runs on.\n")
        f.write('"""\n\n')
        f.write(f"NUM_CATEGORIES = {num_categories}\n")
        f.write(f"CATEGORY_FLAGS = {tuple(ch == '1' for ch in flags)}\n")
        f.write(f"END_STATES = {tuple(ch == '1' for ch in end_states)}\n")
        f.write(f"LOOKAHEAD_STATES = {tuple(ch == '1' for ch in lookahead)}\n")
        f.write(f"STATE_TABLE = {tuple(state_table)}\n\n")
        f.write("# per-codepoint rule categories, (start, end, category) runs;\n")
        f.write("# -1 = IGNORE (Mn/Me/Cf chars invisible to the rule DFA)\n")
        f.write(f"BMP_CATEGORY_RUNS = {runs_lit(bmp)}\n\n")
        f.write(f"SUPP_CATEGORY_RUNS = {runs_lit(supp)}\n\n")
        f.write("# ThaiAnalyzer.DEFAULT_STOPWORD_FILE (th/stopwords.txt)\n")
        f.write(f"STOP_TH = frozenset({stops!r})\n\n")
        f.write("# the JDK Thai dictionary: every word accepted by thai_dict\n")
        f.write('WORDS = """\\\n')
        f.write("\n".join(words))
        f.write('""".split("\\n")\n')
    print(f"wrote {OUT}: {len(words)} words, {len(bmp)} bmp runs, "
          f"{len(supp)} supp runs, {len(state_table)} state cells")


if __name__ == "__main__":
    main()

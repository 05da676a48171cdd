"""Extract the Galician RSLP rule file into a Python data module.

The rules (lucene/analysis/common/src/resources/org/apache/lucene/analysis/
gl/galician.rslp) are SPEC DATA — the published RSLP-G rule set. This
parser replicates RSLPStemmerBase.parse (RSLPStemmerBase.java:246-345)
exactly: same regexes, same '#'-comment skipping, same list handling.

Run from the repo root:  python tools/extract_rslp.py
"""

from __future__ import annotations

import pathlib
import pprint
import re

RES = pathlib.Path(
    "/root/reference/lucene/analysis/common/src/resources/org/apache/"
    "lucene/analysis")
ANALYSIS = pathlib.Path(__file__).resolve().parent.parent / \
    "lucene_solr_spark" / "analysis"
FILES = {
    RES / "gl/galician.rslp": ANALYSIS / "galician_rules.py",
    RES / "pt/portuguese.rslp": ANALYSIS / "portuguese_rules.py",
}

HEADER = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*(0|1),\s*\{(.*)\},\s*$')
STRIP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+)\s*\}\s*(,|(\}\s*;))$')
REP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)"\}\s*(,|(\}\s*;))$')
EXC = re.compile(
    r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)",\s*\{(.*)\}\s*\}\s*(,|(\}\s*;))$')


def parse_list(s: str):
    if not s:
        return None
    return [w.strip()[1:-1] for w in s.split(",")]


def extract(SRC, OUT) -> None:
    lines = [ln.strip() for ln in SRC.read_text(encoding="utf-8").splitlines()]
    lines = [ln for ln in lines if ln and not ln.startswith("#")]
    steps = {}
    i = 0
    while i < len(lines):
        m = HEADER.match(lines[i])
        assert m, lines[i]
        name, minlen, typ = m.group(1), int(m.group(2)), int(m.group(3))
        conds = parse_list(m.group(4))
        i += 1
        rules = []
        while i < len(lines):
            ln = lines[i]
            i += 1
            if sm := STRIP.match(ln):
                rules.append((sm.group(1), int(sm.group(2)), "", None))
            elif rm := REP.match(ln):
                rules.append((rm.group(1), int(rm.group(2)), rm.group(3),
                              None))
            elif em := EXC.match(ln):
                rules.append((em.group(1), int(em.group(2)), em.group(3),
                              parse_list(em.group(4))))
            else:
                raise RuntimeError(ln)
            if ln.endswith(";"):
                break
        if minlen == 0:
            minlen = min(r[1] + len(r[0]) for r in rules)
        steps[name] = {"min": minlen, "type": typ, "conds": conds,
                       "rules": rules}
    body = pprint.pformat(steps, width=76, sort_dicts=False)
    OUT.write_text(
        f'"""{SRC.name} rule set (GENERATED — tools/extract_rslp.py)\n'
        "from the reference's resource, parsed with RSLPStemmerBase.parse\n"
        "semantics (RSLPStemmerBase.java:246-345).\n"
        '"""\n\nSTEPS = ' + body + "\n", encoding="utf-8")
    print(f"wrote {OUT}: steps {list(steps)}")


def main() -> None:
    for src_path, out_path in FILES.items():
        extract(src_path, out_path)


if __name__ == "__main__":
    main()

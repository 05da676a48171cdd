"""Extract the ASCIITLD list (the IANA root-zone snapshot the reference
ships, ASCIITLD.jflex-macro) into analysis/tld_data.py.

Run from the repo root:  python tools/extract_tlds.py
"""

from __future__ import annotations

import pathlib
import re

SRC = pathlib.Path(
    "/root/reference/lucene/analysis/common/src/java/org/apache/lucene/"
    "analysis/standard/ASCIITLD.jflex-macro")
OUT = pathlib.Path(__file__).resolve().parent.parent / \
    "lucene_solr_spark" / "analysis" / "tld_data.py"


def main() -> None:
    tlds = []
    for line in SRC.read_text().splitlines():
        line = line.strip()
        if line.startswith("|"):
            line = line[1:].strip()
        if not line.startswith("["):
            continue
        line = line.split("//")[0].strip()
        # [aA] → a; literal digits/hyphens (xn-- punycode forms) stay
        word = re.sub(r"\[(.)(.)\]", lambda m: m.group(1).lower(), line)
        if re.fullmatch(r"[a-z0-9-]+", word):
            tlds.append(word)
    OUT.write_text(
        '"""IANA TLD snapshot (GENERATED — tools/extract_tlds.py) from '
        "the\nreference's ASCIITLD.jflex-macro (root zone of "
        '2012-07-14).\n"""\n\nTLDS = ' + repr(sorted(set(tlds))) + "\n")
    print(f"wrote {OUT}: {len(set(tlds))} TLDs")


if __name__ == "__main__":
    main()

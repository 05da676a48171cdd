"""Extract the HTML named-entity table from the reference's
HTMLStripCharFilter.java static initializer (the `entities` String[] around
:30686-30762 — name/value alternating pairs, plus the six
upperCaseVariantsAccepted names at :30676-30681) into
`lucene_solr_spark/analysis/htmlentities.py`.

The table is a SPEC CONSTANT (same category as the ASCII-fold table): the
entity-name → codepoint mapping IS the public HTML 4 character-entity spec
the scanner implements; matching the reference's decode behavior requires
the identical map. The parsing here and everything that consumes the data
is original.

Run from the repo root:  python tools/extract_html_entities.py
"""

from __future__ import annotations

import pathlib
import re

SRC = pathlib.Path(
    "/root/reference/lucene/analysis/common/src/java/org/apache/lucene/analysis/charfilter/HTMLStripCharFilter.java"
)
OUT = pathlib.Path(__file__).resolve().parent.parent / "lucene_solr_spark" / "analysis" / "htmlentities.py"


def main() -> None:
    text = SRC.read_text(encoding="utf-8")
    m = re.search(r"String\[\] entities = \{(.*?)\};", text, re.S)
    assert m, "entities array not found"
    # tokens are Java string literals, alternating name, value
    lits = re.findall(r'"((?:\\.|[^"\\])*)"', m.group(1))
    assert len(lits) % 2 == 0
    pairs: dict[str, str] = {}
    for name, val in zip(lits[0::2], lits[1::2]):
        # decode Java string escapes in the value literal (\uXXXX, \", \\)
        decoded = re.sub(
            r"\\u([0-9a-fA-F]{4})", lambda g: chr(int(g.group(1), 16)), val
        )
        decoded = re.sub(r"\\(.)", r"\1", decoded)
        pairs[name] = decoded
    # upperCaseVariantsAccepted (HTMLStripCharFilter.java:30676-30681)
    for lower in re.findall(r'upperCaseVariantsAccepted\.put\("(\w+)"', text):
        pairs[lower.upper()] = pairs[lower]
    lines = [
        '"""HTML 4 named character entities (GENERATED — tools/extract_html_entities.py).',
        "",
        "Data source: HTMLStripCharFilter.java's entityValues table (:30683-30766),",
        "i.e. the public HTML 4.01 character-entity spec plus the six accepted",
        'upper-case variants (QUOT/COPY/GT/LT/REG/AMP)."""',
        "",
        "HTML_ENTITY_MAP: dict[str, str] = {",
    ]
    for name in sorted(pairs):
        cp = pairs[name]
        lines.append(f"    {name!r}: {cp!r},")
    lines.append("}")
    lines.append("")
    OUT.write_text("\n".join(lines), encoding="utf-8")
    print(f"wrote {OUT}: {len(pairs)} entries")


if __name__ == "__main__":
    main()

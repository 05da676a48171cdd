"""Exhaustive audit: `_java_lower` vs java.lang.Character.toLowerCase.

Compiles a one-class Java program with the toolchain in this container,
dumps the JVM's ENTIRE simple-lowercase table (all 0x110000 codepoints),
and diffs it against the Python implementation used by the fidelity
tokenizer (analysis/analyzer.py `_java_lower`).

Result on Java 17 (Unicode 13): **40 divergent codepoints, all of them
Unicode-version skew** — characters whose lowercase mappings were added in
Unicode 14+ (Vithkuqi block, Old Polish O, Middle Scots S, ...), which the
JVM maps to themselves and newer Python Unicode tables lower. There are
ZERO divergences of the full-vs-simple-mapping kind: taking the first
codepoint of Python's full lowercase equals Java's simple mapping for
every codepoint the JVM's Unicode version knows (the only full-mapping
expansion under lowercasing is U+0130 'İ' → 'i' + U+0307, whose first
codepoint IS the simple mapping; Final_Sigma is contextual and cannot
trigger on per-character mapping).

Usage: python tools/lowercase_audit.py   (requires javac/java on PATH)
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_solr_spark.analysis.analyzer import _java_lower  # noqa: E402

JAVA_SRC = """
public class LowerDump {
  public static void main(String[] a) {
    StringBuilder sb = new StringBuilder();
    for (int cp = 0; cp <= 0x10FFFF; cp++) {
      if (cp >= 0xD800 && cp <= 0xDFFF) continue;
      int lo = Character.toLowerCase(cp);
      if (lo != cp) sb.append(Integer.toHexString(cp)).append(':')
                      .append(Integer.toHexString(lo)).append('\\n');
    }
    System.out.print(sb);
  }
}
"""


def jvm_lower_table() -> dict[int, int]:
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "LowerDump.java")
        with open(src, "w") as f:
            f.write(JAVA_SRC)
        subprocess.run(["javac", src], check=True, cwd=d)
        out = subprocess.run(
            ["java", "LowerDump"], check=True, cwd=d, capture_output=True, text=True
        ).stdout
    table = {}
    for line in out.splitlines():
        a, b = line.split(":")
        table[int(a, 16)] = int(b, 16)
    return table


def main() -> int:
    java = jvm_lower_table()
    skew, real = [], []
    for cp in range(0x110000):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        py = ord(_java_lower(chr(cp))[0])
        jv = java.get(cp, cp)
        if py == jv:
            continue
        # version skew: the JVM has NO mapping (maps to itself) while the
        # newer Python Unicode table lowers — any other shape is a real
        # semantic divergence of the implementation
        (skew if jv == cp else real).append((cp, py, jv))
    print(f"version-skew divergences (JVM Unicode older): {len(skew)}")
    print(f"REAL simple-mapping divergences: {len(real)}")
    for cp, py, jv in real[:50]:
        print(f"  U+{cp:04X}: py->{py:#x} java->{jv:#x}")
    return 1 if real else 0


if __name__ == "__main__":
    raise SystemExit(main())

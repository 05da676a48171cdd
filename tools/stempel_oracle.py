"""Behavioral oracle for the Polish stempel stemmer: compile the
reference's own egothor + StempelStemmer sources into a stdin pipe and
fuzz-compare analysis/stempel.py against it (same pattern as
tools/stemmer_oracle.py — reference Java is read at RUN time, compiled
into /tmp, used only to produce expected outputs).

Usage:
  python tools/stempel_oracle.py --fuzz 30000
  python tools/stempel_oracle.py --goldens tests/goldens
"""

from __future__ import annotations

import argparse
import pathlib
import random
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
STEMPEL = pathlib.Path("/root/reference/lucene/analysis/stempel/src")
SCRATCH = pathlib.Path("/tmp/stempel_oracle")

MAIN = """
import java.io.*;
import java.nio.charset.StandardCharsets;
import org.apache.lucene.analysis.stempel.StempelStemmer;

public class StempelMain {
  public static void main(String[] args) throws Exception {
    StempelStemmer st = new StempelStemmer(new FileInputStream(args[0]));
    BufferedReader in = new BufferedReader(
        new InputStreamReader(System.in, StandardCharsets.UTF_8));
    PrintStream out = new PrintStream(System.out, false, "UTF-8");
    String line;
    while ((line = in.readLine()) != null) {
      StringBuilder sb = st.stem(line);
      out.println(sb == null ? "\\u0000" : sb.toString());
    }
    out.flush();
  }
}
"""


def build() -> pathlib.Path:
    SCRATCH.mkdir(parents=True, exist_ok=True)
    srcs = sorted(
        (STEMPEL / "java/org/egothor/stemmer").glob("*.java")
    ) + [STEMPEL / "java/org/apache/lucene/analysis/stempel/StempelStemmer.java"]
    main = SCRATCH / "StempelMain.java"
    main.write_text(MAIN, encoding="utf-8")
    out = SCRATCH / "classes"
    out.mkdir(exist_ok=True)
    marker = out / "StempelMain.class"
    if not marker.exists():
        cmd = ["javac", "-encoding", "UTF-8", "-d", str(out),
               str(main)] + [str(s) for s in srcs]
        subprocess.run(cmd, check=True)
    return out


def oracle_stems(words: list[str]) -> list[str]:
    out = build()
    tbl = STEMPEL / "resources/org/apache/lucene/analysis/pl/stemmer_20000.tbl"
    proc = subprocess.run(
        ["java", "-cp", str(out), "StempelMain", str(tbl)],
        input="\n".join(words) + "\n",
        capture_output=True, text=True, encoding="utf-8", check=True)
    res = proc.stdout.split("\n")[: len(words)]
    return [None if r == "\x00" else r for r in res]


PL_CHARS = "aąbcćdeęfghijklłmnńoóprsśtuwyzźż"


def fuzz_words(n: int, seed: int = 20260819) -> list[str]:
    rng = random.Random(seed)
    words = []
    suffixes = ["a", "i", "y", "e", "ego", "emu", "ym", "im", "ach", "ami",
                "om", "owie", "ów", "ach", "anie", "enie", "ać", "ować",
                "ka", "ki", "ek", "ko", "ia", "cja", "cji", "ność", "ości"]
    for _ in range(n):
        stem = "".join(rng.choice(PL_CHARS)
                       for _ in range(rng.randint(2, 9)))
        w = stem + rng.choice(suffixes) if rng.random() < 0.7 else stem
        words.append(w)
    return words


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fuzz", type=int, default=0)
    ap.add_argument("--goldens", type=str, default=None)
    args = ap.parse_args()

    sys.path.insert(0, str(REPO))
    from lucene_solr_spark.analysis.stempel import stempel_stem

    words = fuzz_words(args.fuzz or 3000)
    want = oracle_stems(words)
    bad = 0
    for w, exp in zip(words, want):
        got = stempel_stem(w)
        if got != exp:
            bad += 1
            if bad <= 15:
                print(f"DIFF {w!r}: jdk={exp!r} py={got!r}")
    print(f"fuzz: {len(words) - bad}/{len(words)} match ({bad} diffs)")
    if args.goldens and bad == 0:
        pairs = [(w, e if e is not None else "\x00")
                 for w, e in zip(words[:2000], want[:2000])]
        out = pathlib.Path(args.goldens) / "stempel_pl.tsv"
        out.write_text(
            "\n".join(f"{w}\t{e}" for w, e in pairs), encoding="utf-8")
        print(f"wrote {out}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

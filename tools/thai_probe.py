#!/usr/bin/env python3
"""Probe/fuzz harness for the Thai segmenter: pipes lines through the JDK
oracle (tools/ThaiSegPipe.java) and, optionally, compares against the Python
reimplementation in lucene_solr_spark/analysis/thai.py.

Usage:
  python3 tools/thai_probe.py probe < lines.txt     # show oracle segments
  python3 tools/thai_probe.py fuzz [n] [seed]       # random fuzz vs Python
"""
import subprocess
import sys
import os
import random

TOOLS = os.path.dirname(os.path.abspath(__file__))


def oracle_segments(lines: list[str]) -> list[list[str]]:
    proc = subprocess.run(
        ["java", "-Dstdout.encoding=UTF-8", "ThaiSegPipe"],
        input="\n".join(lines) + "\n",
        capture_output=True, text=True, encoding="utf-8", cwd=TOOLS,
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr)
    out = proc.stdout.split("\n")
    return [out[i].split("\x1f") if out[i] else [] for i in range(len(lines))]


def show(line: str, segs: list[str]) -> str:
    return f"{line!r}: " + " | ".join(repr(s) for s in segs)


def load_words() -> list[str]:
    with open("/tmp/thai_words.txt", encoding="utf-8") as f:
        return [w for w in f.read().split("\n") if w]


THAI_LETTERS = [chr(c) for c in range(0x0E01, 0x0E2F)] + [chr(0x0E2F)]
THAI_ALL = [chr(c) for c in list(range(0x0E01, 0x0E3B)) + list(range(0x0E40, 0x0E5C))]
LATIN = list("abcdefxyz")
DIGITS = list("0123456789")
THAI_DIGITS = [chr(c) for c in range(0x0E50, 0x0E5A)]


def gen_line(rng: random.Random, words: list[str]) -> str:
    parts = []
    n = rng.randint(1, 6)
    for _ in range(n):
        kind = rng.random()
        if kind < 0.55:
            parts.append(rng.choice(words))
        elif kind < 0.75:
            parts.append("".join(rng.choice(THAI_ALL) for _ in range(rng.randint(1, 7))))
        elif kind < 0.85:
            parts.append("".join(rng.choice(LATIN) for _ in range(rng.randint(1, 4))))
        elif kind < 0.92:
            parts.append("".join(rng.choice(DIGITS + THAI_DIGITS) for _ in range(rng.randint(1, 3))))
        else:
            parts.append(rng.choice(["ๆ", "ฯ", "'", ".", "ฯลฯ"]))
    return "".join(parts)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "probe"
    if mode == "probe":
        lines = [ln.rstrip("\n") for ln in sys.stdin if ln.strip()]
        for line, segs in zip(lines, oracle_segments(lines)):
            print(show(line, segs))
        return
    # fuzz
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    sys.path.insert(0, os.path.join(TOOLS, ".."))
    from lucene_solr_spark.analysis.thai import thai_breaker_segments

    words = load_words()
    rng = random.Random(seed)
    lines = [gen_line(rng, words) for _ in range(n)]
    oracle = oracle_segments(lines)
    bad = 0
    for line, osegs in zip(lines, oracle):
        mine = thai_breaker_segments(line)
        if mine != osegs:
            bad += 1
            if bad <= 15:
                print("LINE ", repr(line))
                print("  jdk ", " | ".join(repr(s) for s in osegs))
                print("  py  ", " | ".join(repr(s) for s in mine))
    print(f"{mode}: {n - bad}/{n} match ({bad} diffs)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

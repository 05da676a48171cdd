"""Behavioral oracle for the hunspell module: compile the reference's OWN
HunspellDictionary/HunspellStemmer (plus the real CharArrayMap/CharArraySet/
CharacterUtils they depend on) into a stdin pipe and fuzz-compare
analysis/hunspell.py against it on the reference's own test.aff/test.dic.

Same pattern as tools/stemmer_oracle.py: nothing is copied into the repo —
the Java sources are read from /root/reference at RUN time, compiled into a
/tmp scratch dir, and used only to produce expected outputs.

Usage: python tools/hunspell_oracle.py [--fuzz 30000]
"""

from __future__ import annotations

import argparse
import pathlib
import random
import shutil
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REF = pathlib.Path("/root/reference/lucene/analysis/common/src")
REF_JAVA = REF / "java"
FIXTURES = REF / "test/org/apache/lucene/analysis/hunspell"
SCRATCH = pathlib.Path("/tmp/hunspell_oracle")

VERSION_STUB = """package org.apache.lucene.util;
public enum Version { LUCENE_30, LUCENE_31, LUCENE_40, LUCENE_44, LUCENE_CURRENT;
  public boolean onOrAfter(Version v){ return compareTo(v) >= 0; } }
"""

MAIN = """import java.io.*;
import java.util.List;
import org.apache.lucene.analysis.hunspell.*;
import org.apache.lucene.util.Version;

public class HunspellOracleMain {
  public static void main(String[] args) throws Exception {
    boolean ignoreCase = Boolean.parseBoolean(args[2]);
    InputStream aff = new FileInputStream(args[0]);
    InputStream dic = new FileInputStream(args[1]);
    HunspellDictionary dict =
        new HunspellDictionary(aff, dic, Version.LUCENE_44, ignoreCase);
    aff.close(); dic.close();
    HunspellStemmer stemmer = new HunspellStemmer(dict);
    BufferedReader in = new BufferedReader(
        new InputStreamReader(System.in, "UTF-8"));
    PrintWriter out = new PrintWriter(
        new OutputStreamWriter(System.out, "UTF-8"));
    String word;
    while ((word = in.readLine()) != null) {
      StringBuilder sb = new StringBuilder();
      for (HunspellStemmer.Stem s : stemmer.stem(word)) {
        sb.append(s.getStemString()).append('|');
      }
      sb.append('#');
      for (HunspellStemmer.Stem s :
           stemmer.uniqueStems(word.toCharArray(), word.length())) {
        sb.append(s.getStemString()).append('|');
      }
      out.println(sb);
    }
    out.flush();
  }
}
"""


def build() -> pathlib.Path:
    if (SCRATCH / "HunspellOracleMain.class").exists():
        return SCRATCH
    shutil.rmtree(SCRATCH, ignore_errors=True)
    src = SCRATCH / "src"
    p = src / "org/apache/lucene/util/Version.java"
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(VERSION_STUB)
    for rel in [
        "org/apache/lucene/analysis/util/CharArrayMap.java",
        "org/apache/lucene/analysis/util/CharArraySet.java",
        "org/apache/lucene/analysis/util/CharacterUtils.java",
        "org/apache/lucene/analysis/hunspell/HunspellAffix.java",
        "org/apache/lucene/analysis/hunspell/HunspellWord.java",
        "org/apache/lucene/analysis/hunspell/HunspellDictionary.java",
        "org/apache/lucene/analysis/hunspell/HunspellStemmer.java",
    ]:
        dst = src / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(REF_JAVA / rel, dst)
    (src / "HunspellOracleMain.java").write_text(MAIN)
    javas = [str(q) for q in src.rglob("*.java")]
    subprocess.run(
        ["javac", "-encoding", "UTF-8", "-d", str(SCRATCH)] + javas,
        check=True, capture_output=True, text=True)
    return SCRATCH


def oracle_stems(words: list[str], ignore_case: bool) -> list[str]:
    build()
    r = subprocess.run(
        ["java", "-cp", str(SCRATCH), "HunspellOracleMain",
         str(FIXTURES / "test.aff"), str(FIXTURES / "test.dic"),
         "true" if ignore_case else "false"],
        input="".join(w + "\n" for w in words),
        capture_output=True, text=True, check=True)
    out = r.stdout.splitlines()
    assert len(out) == len(words), (len(out), len(words))
    return out


def gen_words(n: int, seed: int = 42) -> list[str]:
    """Weighted toward the fixture's stems/affixes so rules actually fire."""
    rng = random.Random(seed)
    frags = ["lucen", "lucene", "mahout", "olr", "ab", "apach", "foo",
             "moo", "s", "e", "d", "c", "b", "n", "t", "h", "o"]
    alpha = "abcdefhlmnorstuABcDEFLMOS"
    words = []
    for _ in range(n):
        mode = rng.random()
        if mode < 0.5:
            w = rng.choice(frags) + "".join(
                rng.choice("sdecbnth") for _ in range(rng.randint(0, 3)))
            if rng.random() < 0.3:
                w = rng.choice(["s", "S", ""]) + w
        else:
            w = "".join(rng.choice(alpha)
                        for _ in range(rng.randint(1, 10)))
        if rng.random() < 0.2:
            w = w.capitalize()
        if w:
            words.append(w)
    return words


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fuzz", type=int, default=30000)
    args = ap.parse_args()

    from lucene_solr_spark.analysis.hunspell import (
        HunspellDictionary, HunspellStemmer)

    aff = (FIXTURES / "test.aff").read_text()
    dic = (FIXTURES / "test.dic").read_text()
    words = gen_words(args.fuzz)

    total_diffs = 0
    for ignore_case in (True, False):
        mine = HunspellStemmer(
            HunspellDictionary(aff, dic, ignore_case=ignore_case))
        expected = oracle_stems(words, ignore_case)
        diffs = 0
        for w, exp in zip(words, expected):
            got = ("|".join(s.stem for s in mine.stem(w))
                   + ("|" if mine.stem(w) else "") + "#"
                   + "|".join(s.stem for s in mine.unique_stems(w))
                   + ("|" if mine.unique_stems(w) else ""))
            if got != exp:
                if diffs < 10:
                    print(f"DIFF ic={ignore_case} {w!r}: "
                          f"ours={got!r} ref={exp!r}")
                diffs += 1
        print(f"ignore_case={ignore_case}: {len(words)} words, "
              f"{diffs} diffs")
        total_diffs += diffs
    sys.exit(1 if total_diffs else 0)


if __name__ == "__main__":
    main()

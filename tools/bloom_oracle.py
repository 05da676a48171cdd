"""Compile the reference's MurmurHash2/FuzzySet as a behavioral oracle
for tests/test_bloom.py (same pattern as tools/stemmer_oracle.py).

Builds /tmp/bloomoracle with javac from the reference tree and a small
stdin/stdout harness with three modes:
  hash      — one input line per value, prints MurmurHash2.hash32
  sizes     — lines "<n> <saturation>", prints getNearestSetSize(n, s)
  contains  — header "<n> <saturation>", n values to add, then probes;
              prints 1 for MAYBE / 0 for NO per probe

Run from the repo root:  python tools/bloom_oracle.py
"""

from __future__ import annotations

import pathlib
import subprocess

REF = pathlib.Path("/root/reference/lucene")
OUT = pathlib.Path("/tmp/bloomoracle")

HARNESS = r'''
import org.apache.lucene.codecs.bloom.MurmurHash2;
import org.apache.lucene.codecs.bloom.FuzzySet;
import org.apache.lucene.util.BytesRef;
import java.io.*;
import java.nio.charset.StandardCharsets;

public class Oracle {
  public static void main(String[] args) throws Exception {
    String mode = args[0];
    BufferedReader in = new BufferedReader(new InputStreamReader(System.in, StandardCharsets.UTF_8));
    PrintWriter out = new PrintWriter(new OutputStreamWriter(System.out, StandardCharsets.UTF_8));
    if (mode.equals("hash")) {
      String line;
      while ((line = in.readLine()) != null) {
        byte[] b = line.getBytes(StandardCharsets.UTF_8);
        out.println(MurmurHash2.hash32(b, 0, b.length));
      }
    } else if (mode.equals("sizes")) {
      String line;
      while ((line = in.readLine()) != null) {
        String[] parts = line.split(" ");
        out.println(FuzzySet.getNearestSetSize(Integer.parseInt(parts[0]), Float.parseFloat(parts[1])));
      }
    } else if (mode.equals("contains")) {
      String[] hdr = in.readLine().split(" ");
      int n = Integer.parseInt(hdr[0]);
      FuzzySet set = FuzzySet.createSetBasedOnQuality(n, Float.parseFloat(hdr[1]));
      for (int i = 0; i < n; i++) {
        byte[] b = in.readLine().getBytes(StandardCharsets.UTF_8);
        set.addValue(new BytesRef(b));
      }
      String line;
      while ((line = in.readLine()) != null) {
        byte[] b = line.getBytes(StandardCharsets.UTF_8);
        out.println(set.contains(new BytesRef(b)) == FuzzySet.ContainsResult.MAYBE ? 1 : 0);
      }
    }
    out.flush();
  }
}
'''


def main() -> None:
    OUT.mkdir(exist_ok=True)
    (OUT / "Oracle.java").write_text(HARNESS)
    subprocess.run(
        ["javac", "-d", str(OUT), "-sourcepath",
         f"{REF}/codecs/src/java:{REF}/core/src/java",
         str(REF / "codecs/src/java/org/apache/lucene/codecs/bloom/MurmurHash2.java"),
         str(REF / "codecs/src/java/org/apache/lucene/codecs/bloom/FuzzySet.java")],
        check=True)
    subprocess.run(
        ["javac", "-cp", str(OUT), "-d", str(OUT), str(OUT / "Oracle.java")],
        check=True)
    smoke = subprocess.run(
        ["java", "-cp", str(OUT), "Oracle", "hash"],
        input=b"the\n", capture_output=True, check=True)
    assert smoke.stdout.strip() == b"-409777000", smoke.stdout
    print(f"oracle ready in {OUT}")


if __name__ == "__main__":
    main()

"""Compile the reference's JavaBinCodec as the byte-parity oracle for
tests/test_javabin.py (same pattern as tools/bloom_oracle.py).

Builds /tmp/jbin from the solrj tree; the only external dependency,
noggit's CharArr, is stubbed with the minimal growable-char-buffer
surface ByteUtils/JavaBinCodec actually call. Harness modes:
  golden    — marshal a fixed case list, one hex line each
  roundtrip — hex per stdin line → unmarshal → marshal → hex out

Run from the repo root:  python tools/javabin_oracle.py
"""

from __future__ import annotations

import pathlib
import subprocess

SOLRJ = pathlib.Path("/root/reference/solr/solrj/src/java")
LUCENE = pathlib.Path("/root/reference/lucene/core/src/java")
OUT = pathlib.Path("/tmp/jbin")

CHARARR = """
package org.noggit;
// Minimal oracle-harness stand-in for noggit's CharArr: only the
// methods JavaBinCodec/ByteUtils call (growable char buffer).
public class CharArr {
  protected char[] buf = new char[32];
  protected int start;
  protected int end;
  public void reset() { start = 0; end = 0; }
  public void reserve(int num) {
    if (end + num > buf.length) {
      char[] newbuf = new char[Math.max(buf.length << 1, end + num)];
      System.arraycopy(buf, 0, newbuf, 0, end);
      buf = newbuf;
    }
  }
  public char[] getArray() { return buf; }
  public int getEnd() { return end; }
  public void setEnd(int end) { this.end = end; }
  public int size() { return end - start; }
  @Override public String toString() { return new String(buf, start, size()); }
}
"""

HARNESS = r'''
import org.apache.solr.common.util.JavaBinCodec;
import org.apache.solr.common.util.NamedList;
import org.apache.solr.common.util.SimpleOrderedMap;
import org.apache.solr.common.SolrDocument;
import org.apache.solr.common.SolrDocumentList;
import java.io.*;
import java.util.*;

public class JBOracle {
  static String hex(byte[] b) {
    StringBuilder sb = new StringBuilder();
    for (byte x : b) sb.append(String.format("%02x", x));
    return sb.toString();
  }
  static byte[] unhex(String s) {
    byte[] out = new byte[s.length() / 2];
    for (int i = 0; i < out.length; i++)
      out[i] = (byte) Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16);
    return out;
  }
  static byte[] marshal(Object o) throws IOException {
    ByteArrayOutputStream bos = new ByteArrayOutputStream();
    new JavaBinCodec().marshal(o, bos);
    return bos.toByteArray();
  }
  public static void main(String[] args) throws Exception {
    String mode = args[0];
    if (mode.equals("golden")) {
      List<Object> cases = new ArrayList<>();
      cases.add(null);
      cases.add(Boolean.TRUE);
      cases.add(Boolean.FALSE);
      cases.add(0);
      cases.add(1);
      cases.add(14);
      cases.add(15);
      cases.add(127);
      cases.add(123456789);
      cases.add(-42);
      cases.add(0L);
      cases.add(15L);
      cases.add(1234567890123L);
      cases.add(-7L);
      cases.add(1.5f);
      cases.add(2.718281828);
      cases.add("hello");
      cases.add("żółć 漢字");
      cases.add("");
      cases.add(new Date(949374245000L));
      cases.add(new byte[]{1, 2, (byte) 0xfe});
      cases.add(Arrays.asList("a", 1, true));
      Map<String,Object> m = new LinkedHashMap<>();
      m.put("k1", "v1"); m.put("k2", 2);
      cases.add(m);
      NamedList<Object> nl = new NamedList<>();
      nl.add("dup", 1); nl.add("dup", 2); nl.add("other", "x");
      cases.add(nl);
      SimpleOrderedMap<Object> som = new SimpleOrderedMap<>();
      som.add("status", 0); som.add("QTime", 5);
      cases.add(som);
      SimpleOrderedMap<Object> rsp = new SimpleOrderedMap<>();
      rsp.add("responseHeader", som);
      SolrDocumentList sdl = new SolrDocumentList();
      sdl.setNumFound(57); sdl.setStart(0); sdl.setMaxScore(1.25f);
      SolrDocument d1 = new SolrDocument();
      d1.addField("id", "1"); d1.addField("score", 1.25f);
      SolrDocument d2 = new SolrDocument();
      d2.addField("id", "2"); d2.addField("score", 0.5f);
      sdl.add(d1); sdl.add(d2);
      rsp.add("response", sdl);
      cases.add(rsp);
      PrintWriter out = new PrintWriter(System.out);
      for (Object c : cases) out.println(hex(marshal(c)));
      out.flush();
    } else if (mode.equals("roundtrip")) {
      BufferedReader in = new BufferedReader(new InputStreamReader(System.in));
      PrintWriter out = new PrintWriter(System.out);
      String line;
      while ((line = in.readLine()) != null) {
        Object o = new JavaBinCodec().unmarshal(new ByteArrayInputStream(unhex(line)));
        out.println(hex(marshal(o)));
      }
      out.flush();
    }
  }
}
'''


def main() -> None:
    src = OUT / "src"
    (src / "org" / "noggit").mkdir(parents=True, exist_ok=True)
    (src / "org" / "noggit" / "CharArr.java").write_text(CHARARR)
    (src / "JBOracle.java").write_text(HARNESS)
    subprocess.run(
        ["javac", "-nowarn", "-d", str(OUT), "-sourcepath",
         f"{SOLRJ}:{LUCENE}:{src}",
         str(SOLRJ / "org/apache/solr/common/util/JavaBinCodec.java")],
        check=True)
    subprocess.run(
        ["javac", "-encoding", "UTF-8", "-nowarn", "-cp", str(OUT),
         "-d", str(OUT), str(src / "JBOracle.java")], check=True)
    smoke = subprocess.run(
        ["java", "-cp", str(OUT), "JBOracle", "golden"],
        capture_output=True, check=True)
    assert smoke.stdout.splitlines()[0] == b"0200", smoke.stdout[:40]
    print(f"oracle ready in {OUT}")


if __name__ == "__main__":
    main()

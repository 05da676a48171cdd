// Dump the JDK's compiled Thai word-break rule tables (offline extraction
// tool — run once; output becomes analysis/thaidata.py's rule section).
//
// The reference's ThaiWordFilter delegates to java.text.BreakIterator
// .getWordInstance(new Locale("th")), a sun.text.DictionaryBasedBreakIterator
// whose behavior = (a) a rule DFA (WordBreakIteratorData_th, binary resource)
// + (b) the thai_dict trie (dumped by ThaiDictDump.java). This dumps (a):
// per-char category map, forward state table, end/lookahead state flags, and
// the per-category dictionary flags, as plain text for the Python port.
//
// Run:
//   javac -encoding UTF-8 ThaiRuleDump.java
//   java --add-opens java.base/sun.text=ALL-UNNAMED ThaiRuleDump > rules.txt
import java.lang.reflect.Field;
import java.lang.reflect.Method;
import java.text.BreakIterator;
import java.util.Locale;

public class ThaiRuleDump {
  static Object get(Object o, Class<?> cls, String name) throws Exception {
    Field f = cls.getDeclaredField(name);
    f.setAccessible(true);
    return f.get(o);
  }

  public static void main(String[] args) throws Exception {
    BreakIterator bi = BreakIterator.getWordInstance(new Locale("th"));
    Object inner = bi;
    while (!inner.getClass().getName().equals("sun.text.DictionaryBasedBreakIterator")) {
      Object next = null;
      for (Field f : inner.getClass().getDeclaredFields()) {
        f.setAccessible(true);
        Object v = f.get(inner);
        if (v != null && v.getClass().getName().startsWith("sun.text.")) { next = v; break; }
      }
      if (next == null) throw new IllegalStateException("no sun.text delegate under " + inner.getClass());
      inner = next;
    }
    Class<?> dbbi = inner.getClass();
    Class<?> rbbi = dbbi.getSuperclass(); // sun.text.RuleBasedBreakIterator

    boolean[] categoryFlags = (boolean[]) get(inner, dbbi, "categoryFlags");
    short[] stateTable = (short[]) get(inner, rbbi, "stateTable");
    boolean[] endStates = (boolean[]) get(inner, rbbi, "endStates");
    boolean[] lookaheadStates = (boolean[]) get(inner, rbbi, "lookaheadStates");
    int numCategories = (Integer) get(inner, rbbi, "numCategories");

    System.out.println("numCategories " + numCategories);
    StringBuilder sb = new StringBuilder("categoryFlags ");
    for (boolean b : categoryFlags) sb.append(b ? '1' : '0');
    System.out.println(sb);
    sb = new StringBuilder("endStates ");
    for (boolean b : endStates) sb.append(b ? '1' : '0');
    System.out.println(sb);
    sb = new StringBuilder("lookaheadStates ");
    for (boolean b : lookaheadStates) sb.append(b ? '1' : '0');
    System.out.println(sb);
    sb = new StringBuilder("stateTable");
    for (short s : stateTable) sb.append(' ').append(s);
    System.out.println(sb);

    // per-char categories over the BMP via the protected lookupCategory —
    // run-length encoded as "start-end:category" lines
    Method lookup = rbbi.getDeclaredMethod("lookupCategory", int.class);
    lookup.setAccessible(true);
    int runStart = 0;
    int runCat = (Integer) lookup.invoke(inner, 0);
    System.out.println("bmpCategories");
    for (int c = 1; c <= 0x10000; c++) {
      int cat = c == 0x10000 ? Integer.MIN_VALUE : (Integer) lookup.invoke(inner, c);
      if (cat != runCat) {
        System.out.println(Integer.toHexString(runStart) + " " + Integer.toHexString(c - 1) + " " + runCat);
        runStart = c;
        runCat = cat;
      }
    }
    // supplementary planes (surrogate-pair codepoints)
    runStart = 0x10000;
    runCat = (Integer) lookup.invoke(inner, 0x10000);
    System.out.println("suppCategories");
    for (int c = 0x10001; c <= 0x110000; c++) {
      int cat = c == 0x110000 ? Integer.MIN_VALUE : (Integer) lookup.invoke(inner, c);
      if (cat != runCat) {
        System.out.println(Integer.toHexString(runStart) + " " + Integer.toHexString(c - 1) + " " + runCat);
        runStart = c;
        runCat = cat;
      }
    }
  }
}

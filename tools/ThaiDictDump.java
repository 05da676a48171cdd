// Enumerate the JDK Thai BreakIterator dictionary word list (offline
// extraction tool — run once; output becomes analysis/thaidata.py).
//
// The reference's ThaiWordFilter delegates segmentation entirely to
// java.text.BreakIterator.getWordInstance(new Locale("th"))
// (ThaiWordFilter.java:53), whose dictionary ships inside the JDK
// (sun/text/resources/ext/thai_dict). This tool walks that dictionary's
// state machine via reflection (needs --add-opens) and prints every
// accepted word, one per line — the word SET is the public spec the
// Python reimplementation must match.
//
// Run:
//   javac -encoding UTF-8 ThaiDictDump.java
//   java --add-opens java.base/sun.text=ALL-UNNAMED ThaiDictDump > words.txt
import java.lang.reflect.Field;
import java.lang.reflect.Method;
import java.text.BreakIterator;
import java.util.Locale;

public class ThaiDictDump {
  static Method getNextState;          // (int row, int col) -> short
  static Method getNextStateFromChar;  // (int row, int ch)  -> short
  static Object dict;
  static StringBuilder buf = new StringBuilder();

  public static void main(String[] args) throws Exception {
    BreakIterator bi = BreakIterator.getWordInstance(new Locale("th"));
    // unwrap: the returned instance delegates to a DictionaryBasedBreakIterator
    Object inner = bi;
    // sun.util.locale.provider wraps the sun.text iterator; find a field
    // holding a sun.text.DictionaryBasedBreakIterator
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
    Field df = inner.getClass().getDeclaredField("dictionary");
    df.setAccessible(true);
    dict = df.get(inner);
    for (Method m : dict.getClass().getDeclaredMethods()) {
      m.setAccessible(true);
      if (m.getName().equals("getNextState")) getNextState = m;
      if (m.getName().equals("getNextStateFromCharacter")) getNextStateFromChar = m;
    }
    // alphabet: probe the full BMP once from every state is too slow; the
    // dictionary is Thai-only, but verify that assumption by probing state 0
    for (int c = 32; c < 0x10000; c++) {
      if (c >= 0x0E00 && c <= 0x0E7F) continue;
      short s = (short) (int) (Short) getNextStateFromChar.invoke(dict, 0, c);
      if (s > 0) throw new IllegalStateException("non-Thai start char: " + c);
    }
    dfs(0, 0);
  }

  static void dfs(int state, int depth) throws Exception {
    if (depth > 48) throw new IllegalStateException("depth overflow (cycle?)");
    short end = (short) (int) (Short) getNextState.invoke(dict, state, 0);
    if (end == -1 && depth > 0) System.out.println(buf);
    for (int c = 0x0E00; c <= 0x0E7F; c++) {
      short next = (short) (int) (Short) getNextStateFromChar.invoke(dict, state, c);
      if (next > 0) {
        buf.append((char) c);
        dfs(next, depth + 1);
        buf.setLength(buf.length() - 1);
      } else if (next == -1 && depth > 0) {
        // transition straight to the end-of-word state on this char:
        // the char terminates a legal word (handled by the end check at
        // the next level via column 0; nothing to emit here)
      }
    }
  }
}

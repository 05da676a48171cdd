// Thai segmentation oracle pipe: reads UTF-8 lines on stdin, prints each
// line's java.text.BreakIterator word-instance segments joined by U+001F.
// This is exactly the breaker loop ThaiWordFilter.java:87-121 runs over a
// Thai-initial token (every [current,next) span becomes a token).
//
//   javac -encoding UTF-8 ThaiSegPipe.java
//   java -Dstdout.encoding=UTF-8 ThaiSegPipe < words.txt
import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.nio.charset.StandardCharsets;
import java.text.BreakIterator;
import java.util.Locale;

public class ThaiSegPipe {
  public static void main(String[] args) throws Exception {
    BreakIterator breaker = BreakIterator.getWordInstance(new Locale("th"));
    BufferedReader in = new BufferedReader(
        new InputStreamReader(System.in, StandardCharsets.UTF_8));
    StringBuilder out = new StringBuilder();
    String line;
    while ((line = in.readLine()) != null) {
      out.setLength(0);
      if (!line.isEmpty()) {
        breaker.setText(line);
        int start = breaker.first();
        for (int end = breaker.next(); end != BreakIterator.DONE;
             start = end, end = breaker.next()) {
          if (out.length() > 0) out.append('\u001F');
          out.append(line, start, end);
        }
      }
      System.out.println(out);
    }
  }
}

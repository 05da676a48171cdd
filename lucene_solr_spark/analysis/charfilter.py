"""HTMLStrip char filter — the pre-tokenizer HTML→text pass for web pages.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
charfilter/HTMLStripCharFilter.jflex (states SCRIPT/STYLE/COMMENT/CDATA;
SCRIPT_REPLACEMENT/STYLE_REPLACEMENT/BR_*_TAG_REPLACEMENT = '\\n' at
HTMLStripCharFilter.java:152-155; inline tags emit no characters; character
entities decode to their code points). The reference is a JFlex scanner
that also maintains offset-correction maps for highlighting; a batch
engine needs only the OUTPUT character stream (tokens carry index
positions, not raw-text offsets here), so this re-expression is a chain of
whole-stage-codegen `regexp_replace` expressions — no Python in the path,
and the identical chain is expressible in DuckDB SQL for oracle gating.

Semantics reproduced:
- `<!-- ... -->` comments removed (non-greedy, spanning newlines);
- `<script ...> ... </script>` and `<style ...> ... </style>` including
  their content collapse to one '\\n' (SCRIPT_REPLACEMENT);
- `<br>` / `</br>` variants become '\\n' (BR_*_TAG_REPLACEMENT);
- `<!DOCTYPE ...>`, `<![CDATA[` wrappers, and all remaining start/end tags
  emit NOTHING (`a<b>c` → `ac`, matching the scanner);
- character entities decode AFTER tag removal (a decoded `&lt;` is data,
  never re-parsed as markup — same as the scanner, which emits the decoded
  char into the output stream): named HTML-4 core set + numeric
  `&#decimal;` / `&#xhex;` for the ASCII/Latin-1 range, `&amp;` last so
  double-escapes survive one level like the reference's single pass.

Patterns are restricted to syntax valid and semantically identical in both
Java regex (Spark) and RE2 (DuckDB): no backreferences, no lookaround.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) chain — ORDER MATTERS (comments/script/style before
# generic tags; &amp; decoded last). Kept as data so the DuckDB oracle can
# replay the same chain via regexp_replace(..., 'gis'-style flags inline).
HTML_STRIP_CHAIN: list[tuple[str, str]] = [
    # comments (the scanner's COMMENT state; non-greedy across lines)
    (r"(?s)<!--.*?-->", ""),
    # script/style blocks collapse to one newline, content dropped
    (r"(?is)<script(\s[^>]*)?>.*?</script\s*>", "\n"),
    (r"(?is)<style(\s[^>]*)?>.*?</style\s*>", "\n"),
    # <br> family becomes a newline
    (r"(?i)</?br(\s[^>]*)?/?\s*>", "\n"),
    # doctype / processing instructions / CDATA wrappers
    (r"(?is)<!doctype[^>]*>", ""),
    (r"(?s)<\?.*?\?>", ""),
    (r"<!\[CDATA\[", ""),
    (r"\]\]>", ""),
    # remaining start/end tags emit nothing
    (r"(?s)</?[a-zA-Z][^>]*>", ""),
]

# HTML-4 core named entities (HTMLCharacterEntities.jflex's most-used rows;
# the full table is 252 names — the long tail is additive and follows the
# same pattern). nbsp decodes to a regular space: the scanner emits U+00A0,
# which the StandardTokenizer then treats as whitespace — a plain space
# tokenizes identically and keeps the chain byte-stable across collations.
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&copy;", "©"),
    ("&reg;", "®"),
    ("&mdash;", "—"),
    ("&ndash;", "–"),
    ("&hellip;", "…"),
    ("&amp;", "&"),  # MUST be last
]


def html_strip(col: Column | str) -> Column:
    """Strip HTML markup from a string column, returning the text the
    reference's HTMLStripCharFilter would hand to the tokenizer. Pure JVM
    expression chain (one whole-stage-codegen projection, no UDF)."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, rep in HTML_STRIP_CHAIN:
        out = F.regexp_replace(out, pat, rep)
    # numeric character references for the Latin-1 range, via a small
    # generated alternation (pure JVM; RE2-safe). Two-pass: decimal then hex.
    # &#38; (the ampersand itself) decodes LAST, after the named entities —
    # decoding it first would let '&#38;lt;' become '&lt;' and then '<'
    # (two levels), while the single-pass reference scanner decodes exactly
    # one level (same reason '&amp;' is last in HTML_ENTITIES).
    for ordinal in (60, 62, 34, 39, 160):  # < > " ' nbsp
        ch = " " if ordinal == 160 else chr(ordinal)
        out = F.regexp_replace(out, rf"&#0*{ordinal};", ch)
        out = F.regexp_replace(out, rf"&#[xX]0*{ordinal:x};", ch)
    for ent, ch in HTML_ENTITIES:
        out = F.regexp_replace(out, ent, ch)
    out = F.regexp_replace(out, r"&#0*38;", "&")
    out = F.regexp_replace(out, r"&#[xX]0*26;", "&")
    return out


def _entity_decode_batch():
    """Single-pass full-table entity decoder (round 4): the COMPLETE named
    map extracted from HTMLStripCharFilter.java:30683-30766 (253 names + 6
    upper-case variants, analysis/htmlentities.py) plus numeric character
    references over the FULL codepoint range `&#d+;` / `&#xh+;` — the two
    things the codegen chain cannot express (regexp_replace has no
    map-valued or computed replacement). One compiled alternation + dict
    lookup per match, Arrow-batched.

    Matches the scanner's single decode level: the regex consumes each
    reference exactly once and replacements are never re-scanned, so
    '&amp;lt;' → '&lt;' (not '<'), same as the JFlex pass."""
    import re as _re

    from .htmlentities import HTML_ENTITY_MAP

    names = "|".join(sorted(HTML_ENTITY_MAP, key=len, reverse=True))
    pat = _re.compile(rf"&(?:#(\d{{1,7}})|#[xX]([0-9a-fA-F]{{1,6}})|({names}));")

    def one(m: "_re.Match[str]") -> str:
        if m.group(3) is not None:
            return HTML_ENTITY_MAP[m.group(3)]
        cp = int(m.group(1), 10) if m.group(1) is not None else int(m.group(2), 16)
        if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
            return " " if cp == 160 else chr(cp)
        return m.group(0)  # invalid reference: emit the literal text

    def decode(s: str | None) -> str | None:
        return None if s is None else pat.sub(one, s)

    return decode


def html_strip_full(col: Column | str) -> Column:
    """Tag strip (JVM codegen chain, identical to `html_strip`) + FULL
    character-entity decode (Arrow UDF over the complete reference table and
    the unrestricted numeric range). Use for fidelity-critical ingestion;
    `html_strip` stays the zero-Python option for the common subset."""
    from pyspark.sql.types import StringType

    out = F.col(col) if isinstance(col, str) else col
    for pat, rep in HTML_STRIP_CHAIN:
        out = F.regexp_replace(out, pat, rep)
    decode = _entity_decode_batch()

    @F.pandas_udf(StringType())
    def _decode_udf(texts: pd.Series) -> pd.Series:
        return texts.map(decode)

    return _decode_udf(out)


def html_to_text(html: str | None) -> str | None:
    """Driver-side/one-string twin of `html_strip_full` (diagnostics, tests,
    and the byte-identical-text-per-url invariant checks)."""
    import re as _re

    if html is None:
        return None
    out = html
    for pat, rep in HTML_STRIP_CHAIN:
        out = _re.sub(pat, rep, out)
    return _entity_decode_batch()(out)


def html_strip_sql(expr: str) -> str:
    """The IDENTICAL chain as ANSI/DuckDB SQL over `expr` — the oracle side
    of the gate. DuckDB's regexp_replace is RE2 with a flags argument; the
    chain's inline `(?is)` prefixes are RE2-valid, so patterns are passed
    through verbatim with only the global flag added."""
    out = expr
    for pat, rep in HTML_STRIP_CHAIN:
        p = pat.replace("'", "''")
        r = rep.replace("\n", "' || chr(10) || '")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    for ordinal in (60, 62, 34, 39, 160):
        ch = " " if ordinal == 160 else chr(ordinal)
        ch_sql = "''''" if ch == "'" else f"'{ch}'"
        out = f"regexp_replace({out}, '&#0*{ordinal};', {ch_sql}, 'g')"
        out = f"regexp_replace({out}, '&#[xX]0*{ordinal:x};', {ch_sql}, 'g')"
    for ent, ch in HTML_ENTITIES:
        ch_sql = "''''" if ch == "'" else f"'{ch}'"
        out = f"regexp_replace({out}, '{ent}', {ch_sql}, 'g')"
    # ampersand numeric refs last — one decode level, like '&amp;' above
    out = f"regexp_replace({out}, '&#0*38;', '&', 'g')"
    out = f"regexp_replace({out}, '&#[xX]0*26;', '&', 'g')"
    return out

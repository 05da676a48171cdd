"""CJK analysis: width folding + bigram tokenization.

Reference chain (CJKAnalyzer.java:90-99, matchVersion >= 3.6):
StandardTokenizer → CJKWidthFilter → LowerCase → CJKBigramFilter →
Stop(cjk/stopwords.txt).

- CJKWidthFilter.java:36-76: fullwidth ASCII variants (U+FF01-FF5E) fold to
  Basic Latin, halfwidth Katakana variants (U+FF66-FF9D) fold to Katakana,
  with the halfwidth voiced (dakuten U+FF9E) / semi-voiced (handakuten
  U+FF9F) marks combined into the preceding kana where a composed form
  exists.
- CJKBigramFilter.java (default flags HAN|HIRAGANA|KATAKANA|HANGUL,
  outputUnigrams=false): runs of ADJACENT CJK characters — across the four
  script types — emit overlapping character bigrams (n chars → n-1 tokens);
  an UNPAIRED CJK character (no CJK neighbor) is emitted as a unigram;
  non-CJK tokens pass through unchanged. Adjacency is broken by whitespace
  / punctuation / intervening non-CJK tokens (reference goldens:
  TestCJKAnalyzer.java:45-131).

Divergence note: Hangul syllables are Unicode letters, which this engine's
UAX#29 regex groups into word runs (like Latin) rather than typed HANGUL
chars, so Korean text tokenizes as words instead of bigrams — documented,
affects ko only; zh/ja match the reference goldens.
"""

from __future__ import annotations

from .analyzer import MAX_TOKEN_LENGTH, _PY_TOKEN_RE, _java_lower
from .langdata import STOP_CJK

# fullwidth ASCII → halfwidth (CJKWidthFilter.java:43-48)
_WIDTH_MAP = {chr(0xFF01 + i): chr(0x21 + i) for i in range(0x5E)}
# halfwidth katakana → fullwidth (CJKWidthFilter KANA_NORM table, :52-62)
_HALF_KANA = "ｦｧｨｩｪｫｬｭｮｯｰｱｲｳｴｵｶｷｸｹｺｻｼｽｾｿﾀﾁﾂﾃﾄﾅﾆﾇﾈﾉﾊﾋﾌﾍﾎﾏﾐﾑﾒﾓﾔﾕﾖﾗﾘﾙﾚﾛﾜﾝ"
_FULL_KANA = "ヲァィゥェォャュョッーアイウエオカキクケコサシスセソタチツテトナニヌネノハヒフヘホマミムメモヤユヨラリルレロワン"
_WIDTH_MAP.update(dict(zip(_HALF_KANA, _FULL_KANA)))
# dakuten/handakuten combining (KANA_COMBINE_VOICED / _HALF_VOICED, :64-76)
_VOICED = dict(zip("カキクケコサシスセソタチツテトハヒフヘホウ",
                   "ガギグゲゴザジズゼゾダヂヅデドバビブベボヴ"))
_SEMI_VOICED = dict(zip("ハヒフヘホ", "パピプペポ"))


def cjk_width_fold(token: str) -> str:
    """CJKWidthFilter over one token."""
    out: list[str] = []
    for ch in token:
        if ch == "ﾞ" and out and out[-1] in _VOICED:  # halfwidth dakuten
            out[-1] = _VOICED[out[-1]]
        elif ch == "ﾟ" and out and out[-1] in _SEMI_VOICED:
            out[-1] = _SEMI_VOICED[out[-1]]
        else:
            out.append(_WIDTH_MAP.get(ch, ch))
    return "".join(out)


def _is_cjk_char(ch: str) -> bool:
    cp = ord(ch)
    return (
        0x4E00 <= cp <= 0x9FFF      # Han
        or 0x3400 <= cp <= 0x4DBF   # Han ext A
        or 0xF900 <= cp <= 0xFAFF   # Han compat
        or 0x3040 <= cp <= 0x309F   # Hiragana
        or 0x30A0 <= cp <= 0x30FF   # Katakana
    )


def cjk_token_stream(text: str | None) -> list[str]:
    """Pre-stop token array under the CJK chain: width-fold + lower, CJK
    character runs bigrammed (unpaired chars as unigrams), non-CJK tokens
    passed through. Order mirrors the reference's offset order."""
    if not text:
        return []
    out: list[str] = []
    buf: list[str] = []  # pending adjacent CJK chars
    prev_end = -1

    def flush() -> None:
        if not buf:
            return
        if len(buf) == 1:
            out.append(buf[0])
        else:
            out.extend(buf[i] + buf[i + 1] for i in range(len(buf) - 1))
        buf.clear()

    for m in _PY_TOKEN_RE.finditer(text):
        tok = _java_lower(cjk_width_fold(m.group(0)))
        if tok and all(_is_cjk_char(c) for c in tok):
            if buf and m.start() != prev_end:
                flush()  # gap in the text breaks adjacency
            buf.extend(tok)
        else:
            flush()
            out.append(tok)
        prev_end = m.end()
    flush()
    return out


def cjk_placeholder_tokens(text: str | None) -> list[str]:
    """Index-side form: the post-bigram token sequence with "" placeholders
    where the stop filter (which runs AFTER bigramming,
    CJKAnalyzer.java:98) drops a token."""
    return [
        "" if (t in STOP_CJK or len(t) > MAX_TOKEN_LENGTH) else t
        for t in cjk_token_stream(text)
    ]


def cjk_analyze(text: str | None) -> list[tuple[int, str]]:
    """Query/fidelity-side chain: [(position, term)] post-stop."""
    return [
        (i, t)
        for i, t in enumerate(cjk_token_stream(text or ""))
        if t and t not in STOP_CJK and len(t) <= MAX_TOKEN_LENGTH
    ]

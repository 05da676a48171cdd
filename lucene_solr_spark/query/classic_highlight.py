"""Classic Highlighter family (lucene/highlighter search/highlight) —
re-analyzed-text highlighting for fields without stored offsets.

Re-derives:
- Highlighter.getBestTextFragments (Highlighter.java:178-345): the token
  loop with TokenGroup offset-overlap grouping, gap text between groups,
  fragment splitting via the pluggable Fragmenter, a score-ordered
  fragment queue (ties -> lower fragment number first), and
  mergeContiguousFragments.
- TokenGroup (TokenGroup.java:48-85): match offsets only widen on
  positively-scored tokens; isDistinct() = startOffset >= group end.
- QueryTermScorer (QueryTermScorer.java:79-146): position-insensitive,
  fragment score sums each matched term's weight once per fragment.
- QueryScorer + WeightedSpanTerm (QueryScorer.java:147-172): position
  tracking via posIncs; position-sensitive terms only score inside one of
  their phrase spans (WeightedSpanTerm.checkPosition). Phrase spans follow
  WeightedSpanTermExtractor: slop=0 -> ordered adjacency, slop>0 ->
  unordered near with the NearSpansUnordered slop formula
  (span width - number of terms <= slop), span stored [minPos, maxPos].
- SimpleFragmenter (endOffset >= fragmentSize * fragNo), NullFragmenter,
  SimpleSpanFragmenter (SimpleSpanFragmenter.java:65-95: holds a fragment
  open while inside a phrase span, and never opens a tail fragment shorter
  than fragmentSize/2).
- SimpleHTMLFormatter / SimpleHTMLEncoder / DefaultEncoder.

Golden parity vs HighlighterTest.java cases in
tests/test_classic_highlight.py.
"""

from __future__ import annotations

from ..analysis.analyzer import ENGLISH_STOP_WORDS, MAX_TOKEN_LENGTH, \
    _PY_TOKEN_RE, _java_lower

__all__ = [
    "Token", "standard_offset_tokens", "QueryTermScorer", "QueryScorer",
    "SimpleFragmenter", "NullFragmenter", "SimpleSpanFragmenter",
    "SimpleHTMLFormatter", "simple_html_encode", "Highlighter",
]

DEFAULT_MAX_CHARS_TO_ANALYZE = 50 * 1024


class Token:
    __slots__ = ("term", "start", "end", "pos_inc")

    def __init__(self, term: str, start: int, end: int, pos_inc: int = 1):
        self.term = term
        self.start = start
        self.end = end
        self.pos_inc = pos_inc


def standard_offset_tokens(
    text: str,
    stop: frozenset[str] | None = ENGLISH_STOP_WORDS,
    lower: bool = True,
) -> list[Token]:
    """The engine's standard chain with char offsets: tokenize + lowercase
    + stop removal (holes become position increments), the reference's
    TokenSources re-analysis path."""
    out: list[Token] = []
    inc = 1
    for m in _PY_TOKEN_RE.finditer(text):
        tok = m.group(0)
        if len(tok) > MAX_TOKEN_LENGTH:
            continue
        if lower:
            tok = _java_lower(tok)
        if stop is not None and tok in stop:
            inc += 1
            continue
        out.append(Token(tok, m.start(), m.end(), inc))
        inc = 1
    return out


# ---------------------------------------------------------------------------
# scorers

class QueryTermScorer:
    """Position-insensitive: every occurrence of a query term scores its
    weight; a fragment's score counts each distinct term once."""

    def __init__(self, weighted_terms: dict[str, float]):
        self.terms = dict(weighted_terms)
        self._found: set[str] = set()
        self.total = 0.0

    def init(self, tokens: list[Token]) -> None:
        pass

    def start_fragment(self) -> None:
        self._found = set()
        self.total = 0.0

    def token_score(self, tok: Token) -> float:
        w = self.terms.get(tok.term)
        if w is None:
            return 0.0
        if tok.term not in self._found:
            self.total += w
            self._found.add(tok.term)
        return w

    def fragment_score(self) -> float:
        return self.total


class _WeightedSpanTerm:
    __slots__ = ("weight", "position_sensitive", "spans")

    def __init__(self, weight: float, position_sensitive: bool = False):
        self.weight = weight
        self.position_sensitive = position_sensitive
        self.spans: list[tuple[int, int]] = []

    def check_position(self, pos: int) -> bool:
        return any(a <= pos <= b for a, b in self.spans)


def _phrase_spans(terms: list[str], positions: dict[str, list[int]],
                  slop: int) -> list[tuple[int, int]]:
    """Spans where the phrase matches over analyzed positions: slop=0 ->
    ordered adjacency; slop>0 -> unordered near, width - n <= slop."""
    spans: list[tuple[int, int]] = []
    if any(t not in positions for t in terms):
        return spans
    if slop == 0:
        first = positions[terms[0]]
        sets = [set(positions[t]) for t in terms]
        for p in first:
            if all(p + i in sets[i] for i in range(1, len(terms))):
                spans.append((p, p + len(terms) - 1))
        return spans
    # unordered near: min-heap sweep over one pointer per term
    import heapq

    ptrs = {t: 0 for t in set(terms)}
    lists = {t: positions[t] for t in set(terms)}
    uniq = sorted(set(terms))
    heap = [(lists[t][0], t) for t in uniq]
    heapq.heapify(heap)
    cur = {t: lists[t][0] for t in uniq}
    n = len(terms)
    while True:
        lo = min(cur.values())
        hi = max(cur.values())
        if (hi + 1 - lo) - n <= slop:
            spans.append((lo, hi))
        # advance the minimum pointer
        t_min = min(cur, key=lambda t: cur[t])
        ptrs[t_min] += 1
        if ptrs[t_min] >= len(lists[t_min]):
            break
        cur[t_min] = lists[t_min][ptrs[t_min]]
    return spans


class QueryScorer:
    """Position-sensitive weighted-span scorer. `terms` maps term->weight
    for bag-of-words clauses; `phrases` is a list of
    (term_list, weight, slop) whose member terms only score inside a
    matching span."""

    def __init__(self, terms: dict[str, float] | None = None,
                 phrases: list[tuple[list[str], float, int]] | None = None):
        self._bag = dict(terms or {})
        self._phrases = list(phrases or [])
        self.span_terms: dict[str, _WeightedSpanTerm] = {}
        self._pos = -1
        self._found: set[str] = set()
        self.total = 0.0

    def init(self, tokens: list[Token]) -> None:
        self._pos = -1
        self.span_terms = {}
        for t, w in self._bag.items():
            self.span_terms[t] = _WeightedSpanTerm(w, False)
        if self._phrases:
            positions: dict[str, list[int]] = {}
            pos = -1
            for tok in tokens:
                pos += tok.pos_inc
                positions.setdefault(tok.term, []).append(pos)
            for terms, w, slop in self._phrases:
                spans = _phrase_spans(terms, positions, slop)
                for t in terms:
                    wst = self.span_terms.get(t)
                    if wst is None or not wst.position_sensitive:
                        # a non-positional clause for the same term wins
                        if wst is not None:
                            continue
                        wst = _WeightedSpanTerm(w, True)
                        self.span_terms[t] = wst
                    wst.spans.extend(spans)

    def start_fragment(self) -> None:
        self._found = set()
        self.total = 0.0

    def token_score(self, tok: Token) -> float:
        self._pos += tok.pos_inc
        wst = self.span_terms.get(tok.term)
        if wst is None:
            return 0.0
        if wst.position_sensitive and not wst.check_position(self._pos):
            return 0.0
        score = wst.weight
        if tok.term not in self._found:
            self.total += score
            self._found.add(tok.term)
        return score

    def fragment_score(self) -> float:
        return self.total


# ---------------------------------------------------------------------------
# fragmenters

class SimpleFragmenter:
    def __init__(self, fragment_size: int = 100):
        self.fragment_size = fragment_size
        self._n = 1

    def start(self, text: str, tokens: list[Token]) -> None:
        self._n = 1

    def is_new_fragment(self, tok: Token) -> bool:
        is_new = tok.end >= self.fragment_size * self._n
        if is_new:
            self._n += 1
        return is_new


class NullFragmenter:
    def start(self, text: str, tokens: list[Token]) -> None:
        pass

    def is_new_fragment(self, tok: Token) -> bool:
        return False


class SimpleSpanFragmenter:
    """Fragment sizing that refuses to split inside a phrase span and
    won't open a final fragment shorter than half the fragment size."""

    def __init__(self, query_scorer: QueryScorer, fragment_size: int = 100):
        self.scorer = query_scorer
        self.fragment_size = fragment_size
        self._n = 1
        self._pos = -1
        self._wait_for = -1
        self._text_size = 0

    def start(self, text: str, tokens: list[Token]) -> None:
        self._pos = -1
        self._n = 1
        self._wait_for = -1
        self._text_size = len(text)

    def is_new_fragment(self, tok: Token) -> bool:
        self._pos += tok.pos_inc
        if self._wait_for == self._pos:
            self._wait_for = -1
        elif self._wait_for != -1:
            return False
        wst = self.scorer.span_terms.get(tok.term)
        if wst is not None:
            for a, b in wst.spans:
                if a == self._pos:
                    self._wait_for = b + 1
                    break
        is_new = (tok.end >= self.fragment_size * self._n
                  and (self._text_size - tok.end) >= (self.fragment_size >> 1))
        if is_new:
            self._n += 1
        return is_new


# ---------------------------------------------------------------------------
# formatter / encoders

class SimpleHTMLFormatter:
    def __init__(self, pre: str = "<B>", post: str = "</B>"):
        self.pre = pre
        self.post = post

    def highlight_term(self, original: str, group_total: float) -> str:
        if group_total <= 0:
            return original
        return f"{self.pre}{original}{self.post}"


def simple_html_encode(text: str) -> str:
    """SimpleHTMLEncoder.htmlEncode."""
    out = []
    for ch in text:
        if ch == "\"":
            out.append("&quot;")
        elif ch == "&":
            out.append("&amp;")
        elif ch == "<":
            out.append("&lt;")
        elif ch == ">":
            out.append("&gt;")
        else:
            out.append(ch)
    return "".join(out)


# ---------------------------------------------------------------------------
# the highlighter

class _TextFragment:
    __slots__ = ("frag_num", "text_start", "text_end", "score")

    def __init__(self, text_start: int, frag_num: int):
        self.text_start = text_start
        self.text_end = text_start
        self.frag_num = frag_num
        self.score = 0.0

    def follows(self, other: "_TextFragment") -> bool:
        return self.text_start == other.text_end

    def merge(self, other: "_TextFragment") -> None:
        self.text_end = other.text_end
        self.score = max(self.score, other.score)


_MAX_TOKENS_PER_GROUP = 50


class Highlighter:
    def __init__(self, scorer, formatter: SimpleHTMLFormatter | None = None,
                 fragmenter=None, encoder=None,
                 max_doc_chars: int = DEFAULT_MAX_CHARS_TO_ANALYZE):
        self.scorer = scorer
        self.formatter = formatter or SimpleHTMLFormatter()
        self.fragmenter = fragmenter or SimpleFragmenter()
        self.encoder = encoder or (lambda s: s)
        self.max_doc_chars = max_doc_chars

    def get_best_text_fragments(
        self, tokens: list[Token], text: str,
        max_num_fragments: int = 5, merge_contiguous: bool = True,
    ) -> list[tuple[str, float]]:
        new_text: list[str] = []
        new_len = 0

        def append(s: str) -> None:
            nonlocal new_len
            new_text.append(s)
            new_len += len(s)

        doc_frags: list[_TextFragment] = []
        current = _TextFragment(0, 0)
        self.scorer.init(tokens)
        self.scorer.start_fragment()
        doc_frags.append(current)
        self.fragmenter.start(text, tokens)

        # TokenGroup state
        g_num = 0
        g_tot = 0.0
        g_start = g_end = 0            # group extent
        g_mstart = g_mend = 0          # match extent (positive scores only)
        last_end = 0

        def flush_group() -> None:
            nonlocal last_end, g_num, g_tot
            token_text = text[g_mstart:g_mend]
            marked = self.formatter.highlight_term(
                self.encoder(token_text), g_tot)
            if g_mstart > last_end:
                append(self.encoder(text[last_end:g_mstart]))
            append(marked)
            last_end = max(g_mend, last_end)
            g_num = 0
            g_tot = 0.0

        for tok in tokens:
            if tok.start >= self.max_doc_chars:
                break
            if tok.end > len(text) or tok.start > len(text):
                raise ValueError(
                    f"token {tok.term} exceeds text length {len(text)}")
            if g_num > 0 and tok.start >= g_end:  # isDistinct
                flush_group()
                if self.fragmenter.is_new_fragment(tok):
                    current.score = self.scorer.fragment_score()
                    current.text_end = new_len
                    current = _TextFragment(new_len, len(doc_frags))
                    self.scorer.start_fragment()
                    doc_frags.append(current)
            # addToken
            score = self.scorer.token_score(tok)
            if g_num < _MAX_TOKENS_PER_GROUP:
                if g_num == 0:
                    g_start, g_mstart = tok.start, tok.start
                    g_end, g_mend = tok.end, tok.end
                    g_tot += score
                else:
                    g_start = min(g_start, tok.start)
                    g_end = max(g_end, tok.end)
                    if score > 0:
                        if g_tot == 0:
                            g_mstart, g_mend = tok.start, tok.end
                        else:
                            g_mstart = min(g_mstart, tok.start)
                            g_mend = max(g_mend, tok.end)
                        g_tot += score
                g_num += 1

        current.score = self.scorer.fragment_score()
        if g_num > 0:
            flush_group()
        if last_end < len(text) and len(text) <= self.max_doc_chars:
            append(self.encoder(text[last_end:]))
        current.text_end = new_len

        rendered = "".join(new_text)

        # FragmentQueue: score asc, ties -> HIGHER fragNum first; popping
        # into the array back-to-front yields score desc, ties fragNum asc
        frags = sorted(
            doc_frags, key=lambda f: (-f.score, f.frag_num)
        )[:max_num_fragments]

        if merge_contiguous:
            arr: list[_TextFragment | None] = list(frags)
            merging = len(arr) > 1
            while merging:
                merging = False
                for i in range(len(arr)):
                    if arr[i] is None:
                        continue
                    for x in range(len(arr)):
                        if arr[x] is None or arr[i] is None:
                            continue
                        if arr[i] is arr[x]:
                            continue
                        frag1 = frag2 = None
                        n1 = n2 = 0
                        if arr[i].follows(arr[x]):
                            frag1, n1, frag2, n2 = arr[x], x, arr[i], i
                        elif arr[x].follows(arr[i]):
                            frag1, n1, frag2, n2 = arr[i], i, arr[x], x
                        if frag1 is not None:
                            best_n = n1 if frag1.score > frag2.score else n2
                            worst_n = n2 if best_n == n1 else n1
                            frag1.merge(frag2)
                            arr[worst_n] = None
                            arr[best_n] = frag1
                            merging = True
            frags = [f for f in arr if f is not None and f.score > 0]
        return [(rendered[f.text_start:f.text_end], f.score) for f in frags]

    def get_best_fragment(self, tokens: list[Token],
                          text: str) -> str | None:
        frags = self.get_best_text_fragments(tokens, text, 1, True)
        for s, score in frags:
            if score > 0:
                return s
        return None

    def get_best_fragments(self, tokens: list[Token], text: str,
                           max_num_fragments: int,
                           separator: str = "...") -> str:
        frags = self.get_best_text_fragments(
            tokens, text, max(1, max_num_fragments), True)
        return separator.join(s for s, score in frags if score > 0)

"""FastVectorHighlighter family (lucene/highlighter vectorhighlight) —
term-vector-driven highlighting: phrase-aware, multi-tag, boundary-scanned.

Re-derives, structure-for-structure where the structure IS the observable
contract (offset arithmetic, phrase-candidate search order, fragment
packing):

- FieldTermStack (FieldTermStack.java:60-120): per-doc stack of query-term
  occurrences sorted by position, each carrying (text, startOffset,
  endOffset, position, idf-weight) where weight = ln(numDocs/(df+1)) + 1.
- FieldQuery (FieldQuery.java:64-449): query flattening (prohibited clauses
  dropped, 1-term phrases demoted to terms), overlapping-phrase expansion
  ("a b"+"b c" -> "a b c", checkOverlap ex1-ex8), the QueryPhraseMap trie
  with terminal slop/boost/seqnum, searchPhrase longest-match fallback,
  and isValidTermOrPhrase's |gap-1| <= slop test per adjacent pair.
- FieldPhraseList (FieldPhraseList.java:59-117): the pop/push longest-
  phrase scan; WeightedPhraseInfo merges adjacent-position term offsets
  into one Toffs run and addIfNoOverlap folds offset-overlapping phrases.
- BaseFragListBuilder (BaseFragListBuilder.java:36-100): margin-centered
  fragment packing (MARGIN_DEFAULT 6, minFragCharSize 3*margin), the
  acceptPhrase multi-term/matchLength rule, SimpleFragListBuilder /
  WeightedFragListBuilder (distinct-term IDF*boost, sqrt-length norm —
  WeightedFieldFragList.java:42-66) / SingleFragListBuilder.
- SimpleBoundaryScanner (SimpleBoundaryScanner.java:38-90): maxScan 20,
  {.,!? \\t\\n} boundary set, scan-to-0 counts as a boundary.
- BaseFragmentsBuilder (BaseFragmentsBuilder.java:120-180): multivalued
  buffer assembly (separator char between values), boundary-adjusted
  fragment source, per-seqnum cycling pre/post tags (colored-tag support),
  encoder hook, discreteMultiValueHighlighting split;
  SimpleFragmentsBuilder (source order) and ScoreOrderFragmentsBuilder
  (boost desc, ties startOffset asc).
- FastVectorHighlighter facade (FastVectorHighlighter.java:40-120):
  phraseHighlight on by default (terms of a phrase only highlight inside
  the phrase), fieldMatch off by default.

Excluded (declared): BreakIteratorBoundaryScanner (JDK BreakIterator
dependency; SimpleBoundaryScanner is the reference default).

Golden parity vs SimpleFragListBuilderTest / FieldPhraseListTest /
WeightedFragListBuilderTest / FastVectorHighlighterTest cases in
tests/test_fvh.py.
"""

from __future__ import annotations

import math

from .classic_highlight import Token, standard_offset_tokens

__all__ = [
    "TermInfo", "FieldQuery", "FieldTermStack", "FieldPhraseList",
    "SimpleFragListBuilder", "WeightedFragListBuilder",
    "SingleFragListBuilder", "SimpleBoundaryScanner",
    "SimpleFragmentsBuilder", "ScoreOrderFragmentsBuilder",
    "FastVectorHighlighter", "term_infos_from_tokens",
]


class TermInfo:
    """FieldTermStack.TermInfo — one query-term occurrence."""

    __slots__ = ("text", "start", "end", "position", "weight")

    def __init__(self, text: str, start: int, end: int, position: int,
                 weight: float = 1.0):
        self.text = text
        self.start = start
        self.end = end
        self.position = position
        self.weight = weight

    def __repr__(self):
        return f"{self.text}({self.start},{self.end},{self.position})"


def term_infos_from_tokens(tokens: list[Token],
                           term_set: set[str],
                           df: dict[str, int] | None = None,
                           num_docs: int = 1) -> list[TermInfo]:
    """Build the FieldTermStack payload from offset tokens: keep tokens in
    the query's term set, assign absolute positions from posIncs, weight
    = ln(numDocs/(df+1)) + 1 (FieldTermStack.java:131 — the 3.x
    DefaultSimilarity idf)."""
    out: list[TermInfo] = []
    pos = -1
    for t in tokens:
        pos += t.pos_inc
        if t.term not in term_set:
            continue
        w = 1.0
        if df is not None:
            w = math.log(num_docs / float(df.get(t.term, 0) + 1)) + 1.0
        out.append(TermInfo(t.term, t.start, t.end, pos, w))
    return out


# ---------------------------------------------------------------------------
# FieldQuery: clause flattening + the QueryPhraseMap trie

class _QueryPhraseMap:
    __slots__ = ("terminal", "slop", "boost", "seqnum", "sub", "_fq")

    def __init__(self, fq: "FieldQuery"):
        self.terminal = False
        self.slop = 0
        self.boost = 1.0
        self.seqnum = 0
        self.sub: dict[str, _QueryPhraseMap] = {}
        self._fq = fq

    def _get_or_new(self, term: str) -> "_QueryPhraseMap":
        m = self.sub.get(term)
        if m is None:
            m = _QueryPhraseMap(self._fq)
            self.sub[term] = m
        return m

    def add_term(self, term: str, boost: float) -> None:
        self._get_or_new(term)._mark_terminal(0, boost)

    def add_phrase(self, terms: list[str], slop: int, boost: float) -> None:
        m = self
        for t in terms:
            m = m._get_or_new(t)
        m._mark_terminal(slop, boost)

    def _mark_terminal(self, slop: int, boost: float) -> None:
        self.terminal = True
        self.slop = slop
        self.boost = boost
        self.seqnum = self._fq._next_seqnum()

    def get_term_map(self, term: str) -> "_QueryPhraseMap | None":
        return self.sub.get(term)

    def search_phrase(self, candidate: list[TermInfo]) -> "_QueryPhraseMap | None":
        m = self
        for ti in candidate:
            m = m.sub.get(ti.text)
            if m is None:
                return None
        return m if m.is_valid_term_or_phrase(candidate) else None

    def is_valid_term_or_phrase(self, candidate: list[TermInfo]) -> bool:
        if not self.terminal:
            return False
        if len(candidate) == 1:
            return True
        pos = candidate[0].position
        for ti in candidate[1:]:
            if abs(ti.position - pos - 1) > self.slop:
                return False
            pos = ti.position
        return True


class FieldQuery:
    """Flattened query clauses -> QueryPhraseMap trie + term set.

    `clauses` items: ("term", text[, boost]) or
    ("phrase", [t1, t2, ...][, boost[, slop]]). Prohibited (MUST_NOT)
    clauses must already be dropped by the caller (FieldQuery.flatten
    skips them). 1-term phrases demote to terms, matching flatten()."""

    def __init__(self, clauses: list[tuple], phrase_highlight: bool = True):
        self.phrase_highlight = phrase_highlight
        self._seq = 0
        self.root = _QueryPhraseMap(self)
        self.term_set: set[str] = set()

        flat: list[tuple] = []
        seen: set[tuple] = set()
        for c in clauses:
            kind = c[0]
            if kind == "term":
                key = ("term", c[1])
                if key not in seen:
                    seen.add(key)
                    flat.append(("term", c[1], c[2] if len(c) > 2 else 1.0))
            elif kind == "phrase":
                terms = list(c[1])
                boost = c[2] if len(c) > 2 else 1.0
                slop = c[3] if len(c) > 3 else 0
                if len(terms) == 1:
                    key = ("term", terms[0])
                    if key not in seen:
                        seen.add(key)
                        flat.append(("term", terms[0], boost))
                elif len(terms) > 1:
                    key = ("phrase", tuple(terms), slop)
                    if key not in seen:
                        seen.add(key)
                        flat.append(("phrase", terms, boost, slop))
            else:
                raise ValueError(f"unknown clause kind {kind!r}")

        for c in flat:
            if c[0] == "term":
                self.term_set.add(c[1])
            else:
                self.term_set.update(c[1])

        for c in self._expand(flat):
            if c[0] == "term":
                self.root.add_term(c[1], c[2])
            else:
                _, terms, boost, slop = c
                self.root.add_phrase(terms, slop, boost)
                if not phrase_highlight:
                    for t in terms:
                        self.root.add_term(t, boost)

    def _next_seqnum(self) -> int:
        n = self._seq
        self._seq += 1
        return n

    @staticmethod
    def _expand(flat: list[tuple]) -> list[tuple]:
        """expand() — add merged phrases for overlapping phrase pairs of
        equal slop: {"a b","b c"} -> +"a b c" (FieldQuery.java:150-230)."""
        out: list[tuple] = []
        out_keys: set[tuple] = set()
        pending = list(flat)

        def emit(c: tuple) -> None:
            key = (("term", c[1]) if c[0] == "term"
                   else ("phrase", tuple(c[1]), c[3]))
            if key not in out_keys:
                out_keys.add(key)
                out.append(c)

        def check_overlap(src: list[str], dest: list[str], slop: int,
                          boost: float) -> None:
            for i in range(1, len(src)):
                overlap = True
                for j in range(i, len(src)):
                    if (j - i) < len(dest) and src[j] != dest[j - i]:
                        overlap = False
                        break
                if overlap and len(src) - i < len(dest):
                    merged = list(src) + dest[len(src) - i:]
                    emit(("phrase", merged, boost, slop))

        while pending:
            c = pending.pop(0)
            emit(c)
            if c[0] != "phrase":
                continue
            for c2 in pending:
                if c2[0] != "phrase" or c[3] != c2[3]:
                    continue
                check_overlap(c[1], c2[1], c[3], c[2])
                check_overlap(c2[1], c[1], c2[3], c2[2])
        return out

    def get_field_term_map(self, term: str) -> _QueryPhraseMap | None:
        return self.root.sub.get(term)

    def search_phrase(self, candidate: list[TermInfo]) -> _QueryPhraseMap | None:
        return self.root.search_phrase(candidate)


class FieldTermStack:
    """Position-sorted stack of query-term occurrences for one doc."""

    def __init__(self, term_infos: list[TermInfo]):
        self._list = sorted(term_infos, key=lambda ti: ti.position)

    def pop(self) -> TermInfo | None:
        return self._list.pop(0) if self._list else None

    def push(self, ti: TermInfo) -> None:
        self._list.insert(0, ti)

    def is_empty(self) -> bool:
        return not self._list


# ---------------------------------------------------------------------------
# FieldPhraseList

class Toffs:
    __slots__ = ("start", "end")

    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end

    def __repr__(self):
        return f"({self.start},{self.end})"


class WeightedPhraseInfo:
    """One matched term/phrase occurrence: merged offset runs + boost."""

    def __init__(self, terms: list[TermInfo], boost: float, seqnum: int = 0):
        self.boost = boost
        self.seqnum = seqnum
        self.terms_infos = list(terms)
        self.terms_offsets: list[Toffs] = []
        ti = terms[0]
        self.terms_offsets.append(Toffs(ti.start, ti.end))
        if len(terms) == 1:
            self.text = ti.text
            return
        parts = [ti.text]
        pos = ti.position
        for ti in terms[1:]:
            parts.append(ti.text)
            if ti.position - pos == 1:
                self.terms_offsets[-1].end = ti.end
            else:
                self.terms_offsets.append(Toffs(ti.start, ti.end))
            pos = ti.position
        self.text = "".join(parts)

    @property
    def start_offset(self) -> int:
        return self.terms_offsets[0].start

    @property
    def end_offset(self) -> int:
        return self.terms_offsets[-1].end

    def is_offset_overlap(self, other: "WeightedPhraseInfo") -> bool:
        so, eo = self.start_offset, self.end_offset
        oso, oeo = other.start_offset, other.end_offset
        return ((so <= oso < eo) or (so < oeo <= eo)
                or (oso <= so < oeo) or (oso < eo <= oeo))

    def __repr__(self):
        offs = "".join(repr(t) for t in self.terms_offsets)
        return f"{self.text}({_jfloat(self.boost)})({offs})"


def _jfloat(x: float) -> str:
    """Java Float.toString for the golden-string comparisons: integral
    floats render with one decimal."""
    f = float(f"{x:.9g}")
    if f == int(f) and abs(f) < 1e7:
        return f"{int(f)}.0"
    # shortest repr that round-trips at float32
    import struct
    for prec in range(1, 10):
        s = f"{f:.{prec}g}"
        if struct.unpack("f", struct.pack("f", float(s)))[0] == struct.unpack(
                "f", struct.pack("f", f))[0]:
            return s
    return repr(f)


class FieldPhraseList:
    """The longest-phrase scan over the term stack
    (FieldPhraseList.java:59-117)."""

    def __init__(self, stack: FieldTermStack, fq: FieldQuery,
                 phrase_limit: int = 2 ** 31 - 1):
        self.phrase_list: list[WeightedPhraseInfo] = []
        while not stack.is_empty() and len(self.phrase_list) < phrase_limit:
            candidate: list[TermInfo] = []
            ti = stack.pop()
            curr = fq.get_field_term_map(ti.text)
            if curr is None:
                continue
            candidate.append(ti)
            while True:
                ti = stack.pop()
                nxt = curr.get_term_map(ti.text) if ti is not None else None
                if ti is None or nxt is None:
                    if ti is not None:
                        stack.push(ti)
                    if curr.is_valid_term_or_phrase(candidate):
                        self._add_if_no_overlap(WeightedPhraseInfo(
                            candidate, curr.boost, curr.seqnum))
                    else:
                        while len(candidate) > 1:
                            stack.push(candidate.pop())
                            curr = fq.search_phrase(candidate)
                            if curr is not None:
                                self._add_if_no_overlap(WeightedPhraseInfo(
                                    candidate, curr.boost, curr.seqnum))
                                break
                    break
                else:
                    candidate.append(ti)
                    curr = nxt

    def _add_if_no_overlap(self, wpi: WeightedPhraseInfo) -> None:
        for exist in self.phrase_list:
            if exist.is_offset_overlap(wpi):
                exist.terms_infos.extend(wpi.terms_infos)
                return
        self.phrase_list.append(wpi)


# ---------------------------------------------------------------------------
# FragList builders

class SubInfo:
    __slots__ = ("text", "terms_offsets", "seqnum")

    def __init__(self, text: str, terms_offsets: list[Toffs], seqnum: int):
        self.text = text
        self.terms_offsets = terms_offsets
        self.seqnum = seqnum

    def __repr__(self):
        offs = "".join(repr(t) for t in self.terms_offsets)
        return f"{self.text}({offs})"


class WeightedFragInfo:
    __slots__ = ("start", "end", "sub_infos", "total_boost")

    def __init__(self, start: int, end: int, sub_infos: list[SubInfo],
                 total_boost: float):
        self.start = start
        self.end = end
        self.sub_infos = sub_infos
        self.total_boost = total_boost

    def __repr__(self):
        subs = "".join(repr(s) for s in self.sub_infos)
        return (f"subInfos=({subs})/{_jfloat(self.total_boost)}"
                f"({self.start},{self.end})")


MARGIN_DEFAULT = 6
MIN_FRAG_CHAR_SIZE_FACTOR = 3


class _BaseFragListBuilder:
    def __init__(self, margin: int = MARGIN_DEFAULT):
        if margin < 0:
            raise ValueError(f"margin({margin}) is too small")
        self.margin = margin
        self.min_frag_char_size = max(1, margin * MIN_FRAG_CHAR_SIZE_FACTOR)

    def _add(self, frag_infos: list[WeightedFragInfo], start: int, end: int,
             wpil: list[WeightedPhraseInfo]) -> None:
        raise NotImplementedError

    @staticmethod
    def _accept_phrase(info: WeightedPhraseInfo, match_length: int,
                       frag_char_size: int) -> bool:
        return len(info.terms_offsets) <= 1 or match_length <= frag_char_size

    def create_field_frag_list(self, fpl: FieldPhraseList,
                               frag_char_size: int) -> list[WeightedFragInfo]:
        if frag_char_size < self.min_frag_char_size:
            raise ValueError(
                f"fragCharSize({frag_char_size}) is too small. It must be "
                f"{self.min_frag_char_size} or higher.")
        frag_infos: list[WeightedFragInfo] = []
        queue = list(fpl.phrase_list)
        qi = 0
        start_offset = 0
        while qi < len(queue):
            phrase = queue[qi]
            if phrase.start_offset < start_offset:
                qi += 1
                continue
            wpil: list[WeightedPhraseInfo] = []
            cur_start = phrase.start_offset
            cur_end = phrase.end_offset
            span_start = max(cur_start - self.margin, start_offset)
            span_end = max(cur_end, span_start + frag_char_size)
            qi += 1
            if self._accept_phrase(phrase, cur_end - cur_start,
                                   frag_char_size):
                wpil.append(phrase)
            while qi < len(queue):
                phrase = queue[qi]
                if phrase.end_offset <= span_end:
                    cur_end = phrase.end_offset
                    qi += 1
                    if self._accept_phrase(phrase, cur_end - cur_start,
                                           frag_char_size):
                        wpil.append(phrase)
                else:
                    break
            if not wpil:
                continue
            match_len = cur_end - cur_start
            new_margin = max(0, (frag_char_size - match_len) // 2)
            span_start = cur_start - new_margin
            if span_start < start_offset:
                span_start = start_offset
            span_end = span_start + max(match_len, frag_char_size)
            start_offset = span_end
            self._add(frag_infos, span_start, span_end, wpil)
        return frag_infos


class SimpleFragListBuilder(_BaseFragListBuilder):
    """Fragment score = sum of phrase boosts (SimpleFieldFragList)."""

    def _add(self, frag_infos, start, end, wpil):
        total = 0.0
        subs = []
        for p in wpil:
            subs.append(SubInfo(p.text, p.terms_offsets, p.seqnum))
            total += p.boost
        frag_infos.append(WeightedFragInfo(start, end, subs, total))


class WeightedFragListBuilder(_BaseFragListBuilder):
    """Fragment score = sum of distinct-term idf*boost, bent by
    sqrt(length) (WeightedFieldFragList.java:42-66)."""

    def _add(self, frag_infos, start, end, wpil):
        total = 0.0
        subs = []
        distinct: set[str] = set()
        length = 0
        for p in wpil:
            subs.append(SubInfo(p.text, p.terms_offsets, p.seqnum))
            for ti in p.terms_infos:
                if ti.text not in distinct:
                    distinct.add(ti.text)
                    total += ti.weight * p.boost
                length += 1
        import numpy as np
        if length:
            total = float(np.float32(total) * np.float32(length) *
                          np.float32(1.0 / math.sqrt(length)))
        frag_infos.append(WeightedFragInfo(start, end, subs, total))


class SingleFragListBuilder:
    """One fragment spanning the whole field (SingleFragListBuilder.java:40):
    the whole-field highlighting mode."""

    def create_field_frag_list(self, fpl: FieldPhraseList,
                               frag_char_size: int) -> list[WeightedFragInfo]:
        wpil = list(fpl.phrase_list)
        if not wpil:
            return []
        subs = [SubInfo(p.text, p.terms_offsets, p.seqnum) for p in wpil]
        total = sum(p.boost for p in wpil)
        return [WeightedFragInfo(0, 2 ** 31 - 1, subs, total)]


# ---------------------------------------------------------------------------
# boundary scanner + fragments builders

class SimpleBoundaryScanner:
    DEFAULT_MAX_SCAN = 20
    DEFAULT_BOUNDARY_CHARS = frozenset({".", ",", "!", "?", " ", "\t", "\n"})

    def __init__(self, max_scan: int = DEFAULT_MAX_SCAN,
                 boundary_chars=DEFAULT_BOUNDARY_CHARS):
        self.max_scan = max_scan
        self.boundary_chars = set(boundary_chars)

    def find_start_offset(self, buffer: str, start: int) -> int:
        if start > len(buffer) or start < 1:
            return start
        offset = start
        for _ in range(self.max_scan):
            if offset <= 0:
                break
            if buffer[offset - 1] in self.boundary_chars:
                return offset
            offset -= 1
        if offset == 0:
            return 0
        return start

    def find_end_offset(self, buffer: str, start: int) -> int:
        if start > len(buffer) or start < 0:
            return start
        offset = start
        for _ in range(self.max_scan):
            if offset >= len(buffer):
                break
            if buffer[offset] in self.boundary_chars:
                return offset
            offset += 1
        return start


def _default_encoder(s: str) -> str:
    return s


class _BaseFragmentsBuilder:
    def __init__(self, pre_tags: list[str] | None = None,
                 post_tags: list[str] | None = None,
                 boundary_scanner: SimpleBoundaryScanner | None = None):
        self.pre_tags = pre_tags or ["<b>"]
        self.post_tags = post_tags or ["</b>"]
        self.boundary_scanner = boundary_scanner or SimpleBoundaryScanner()
        self.multi_valued_separator = " "
        self.discrete_multi_value_highlighting = False

    def _order(self, src: list[WeightedFragInfo]) -> list[WeightedFragInfo]:
        raise NotImplementedError

    def create_fragments(
        self, values: list[str], frag_infos: list[WeightedFragInfo],
        max_num_fragments: int, encoder=_default_encoder,
    ) -> list[str]:
        if max_num_fragments < 0:
            raise ValueError("maxNumFragments must be positive")
        if not values:
            return []
        if self.discrete_multi_value_highlighting and len(values) > 1:
            frag_infos = self._discrete_multi_value(frag_infos, values)
        frag_infos = self._order(list(frag_infos))
        out: list[str] = []
        buffer = ""
        next_value = [0]
        for fi in frag_infos[:max_num_fragments]:
            frag, buffer = self._make_fragment(buffer, next_value, values,
                                               fi, encoder)
            out.append(frag)
        return out

    def _make_fragment(self, buffer: str, index: list[int],
                       values: list[str], fi: WeightedFragInfo,
                       encoder) -> tuple[str, str]:
        parts: list[str] = []
        s = fi.start
        src, buffer, mso = self._fragment_source(buffer, index, values, s,
                                                 fi.end)
        src_i = 0
        for sub in fi.sub_infos:
            for to in sub.terms_offsets:
                parts.append(encoder(src[src_i:to.start - mso]))
                parts.append(self.pre_tags[sub.seqnum % len(self.pre_tags)])
                parts.append(encoder(src[to.start - mso:to.end - mso]))
                parts.append(self.post_tags[sub.seqnum % len(self.post_tags)])
                src_i = to.end - mso
        parts.append(encoder(src[src_i:]))
        return "".join(parts), buffer

    def _fragment_source(self, buffer: str, index: list[int],
                         values: list[str], start: int,
                         end: int) -> tuple[str, str, int]:
        while len(buffer) < end and index[0] < len(values):
            buffer += values[index[0]] + self.multi_valued_separator
            index[0] += 1
        # the trailing separator added to the last value doesn't count
        buffer_len = len(buffer) - 1 if buffer else 0
        eo = (buffer_len if buffer_len < end
              else self.boundary_scanner.find_end_offset(buffer, end))
        mso = self.boundary_scanner.find_start_offset(buffer, start)
        return buffer[mso:eo], buffer, mso

    def _discrete_multi_value(
        self, frag_infos: list[WeightedFragInfo], values: list[str],
    ) -> list[WeightedFragInfo]:
        """discreteMultiValueHighlighting: split fragments straddling a
        value boundary so each output fragment stays inside one value."""
        result: list[WeightedFragInfo] = []
        for fi in frag_infos:
            field_end = 0
            placed = False
            for v in values:
                if not v:
                    field_end += 1
                    continue
                field_start = field_end
                field_end += len(v) + 1
                if (fi.start >= field_start and fi.end >= field_start
                        and fi.start <= field_end and fi.end <= field_end):
                    result.append(fi)
                    placed = True
                    break
                if not fi.sub_infos:
                    placed = True
                    break
                first = fi.sub_infos[0].terms_offsets[0]
                if fi.start >= field_end or first.start >= field_end:
                    continue
                frag_start = field_start
                if field_start < fi.start < field_end:
                    frag_start = fi.start
                frag_end = field_end
                if field_start < fi.end < field_end:
                    frag_end = fi.end
                subs: list[SubInfo] = []
                new_fi = WeightedFragInfo(frag_start, frag_end, subs,
                                          fi.total_boost)
                remaining_subs = []
                for sub in fi.sub_infos:
                    inside = [t for t in sub.terms_offsets
                              if field_start <= t.start and t.end <= field_end]
                    outside = [t for t in sub.terms_offsets
                               if not (field_start <= t.start
                                       and t.end <= field_end)]
                    if inside:
                        subs.append(SubInfo(sub.text, inside, sub.seqnum))
                    sub.terms_offsets = outside
                    if outside:
                        remaining_subs.append(sub)
                fi.sub_infos = remaining_subs
                result.append(new_fi)
            if not placed:
                pass
        result.sort(key=lambda f: f.start)
        return result


class SimpleFragmentsBuilder(_BaseFragmentsBuilder):
    """Source (offset) order fragments."""

    def _order(self, src):
        return src


class ScoreOrderFragmentsBuilder(_BaseFragmentsBuilder):
    """Boost desc, ties startOffset asc (ScoreComparator)."""

    def _order(self, src):
        src.sort(key=lambda f: (-f.total_boost, f.start))
        return src


# ---------------------------------------------------------------------------
# facade

class FastVectorHighlighter:
    def __init__(self, phrase_highlight: bool = True,
                 frag_list_builder=None, fragments_builder=None):
        self.phrase_highlight = phrase_highlight
        self.frag_list_builder = frag_list_builder or SimpleFragListBuilder()
        self.fragments_builder = fragments_builder or SimpleFragmentsBuilder()

    def get_field_query(self, clauses: list[tuple]) -> FieldQuery:
        return FieldQuery(clauses, phrase_highlight=self.phrase_highlight)

    def get_best_fragments(
        self, field_query: FieldQuery, values: list[str] | str,
        frag_char_size: int, max_num_fragments: int = 1,
        tokens: list[Token] | None = None,
        df: dict[str, int] | None = None, num_docs: int = 1,
        encoder=_default_encoder, phrase_limit: int = 2 ** 31 - 1,
    ) -> list[str]:
        """End-to-end: analyze (or take) offset tokens over the
        concatenated values, build the phrase list, pack fragments,
        render. `values` is the stored field (list = multivalued)."""
        if isinstance(values, str):
            values = [values]
        if tokens is None:
            joined = self.fragments_builder.multi_valued_separator.join(values)
            tokens = standard_offset_tokens(joined, stop=None)
        infos = term_infos_from_tokens(tokens, field_query.term_set, df,
                                       num_docs)
        fpl = FieldPhraseList(FieldTermStack(infos), field_query,
                              phrase_limit)
        frag_infos = self.frag_list_builder.create_field_frag_list(
            fpl, frag_char_size)
        return self.fragments_builder.create_fragments(
            values, frag_infos, max_num_fragments, encoder)

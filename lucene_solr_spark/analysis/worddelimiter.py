"""WordDelimiterFilter — the workhorse Solr filter that splits tokens on
intra-word delimiters, case changes and letter/number transitions, with
optional part generation, catenation and original preservation.

Re-derives WordDelimiterFilter.java:71-370 + WordDelimiterIterator.java
state-machine-for-state-machine over (term, positionIncrement) streams:
the same accumulated-increment bookkeeping for dropped all-delimiter
tokens, the same part/concatenation interleaving order, the same
possessive-'s stripping and the same single-word fast path. Factory
defaults match WordDelimiterFilterFactory.java:65-91.
"""

from __future__ import annotations

import unicodedata

LOWER = 0x01
UPPER = 0x02
DIGIT = 0x04
SUBWORD_DELIM = 0x08
ALPHA = 0x03
ALPHANUM = 0x07

GENERATE_WORD_PARTS = 1
GENERATE_NUMBER_PARTS = 2
CATENATE_WORDS = 4
CATENATE_NUMBERS = 8
CATENATE_ALL = 16
PRESERVE_ORIGINAL = 32
SPLIT_ON_CASE_CHANGE = 64
SPLIT_ON_NUMERICS = 128
STEM_ENGLISH_POSSESSIVE = 256

DEFAULT_FLAGS = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
                 | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
                 | STEM_ENGLISH_POSSESSIVE)

_DONE = -1


def _char_type(ch: str) -> int:
    """WordDelimiterIterator.getType — the sub-256 table uses
    Character.isLower/isUpper/isDigit, above that the category switch."""
    cat = unicodedata.category(ch)
    if cat == "Lu":
        return UPPER
    if cat == "Ll":
        return LOWER
    if cat in ("Lt", "Lm", "Lo", "Mn", "Me", "Mc"):
        return ALPHA
    if cat in ("Nd", "Nl", "No"):
        return DIGIT
    if cat == "Cs":
        return ALPHANUM  # surrogate: prevent splitting
    return SUBWORD_DELIM


class _Iterator:
    """WordDelimiterIterator.java — subword scanner over one term."""

    def __init__(self, split_case: bool, split_num: bool, stem_poss: bool):
        self.split_case = split_case
        self.split_num = split_num
        self.stem_poss = stem_poss

    def set_text(self, text: str) -> None:
        self.text = text
        self.length = self.end_bounds = len(text)
        self.current = self.start_bounds = self.end = 0
        self.skip_possessive = False
        self.has_final_possessive = False
        while self.start_bounds < self.length and _char_type(
                text[self.start_bounds]) & SUBWORD_DELIM:
            self.start_bounds += 1
        while self.end_bounds > self.start_bounds and _char_type(
                text[self.end_bounds - 1]) & SUBWORD_DELIM:
            self.end_bounds -= 1
        if self._ends_with_possessive(self.end_bounds):
            self.has_final_possessive = True
        self.current = self.start_bounds

    def _ends_with_possessive(self, pos: int) -> bool:
        t = self.text
        return (self.stem_poss and pos > 2 and t[pos - 2] == "'"
                and t[pos - 1] in ("s", "S")
                and _char_type(t[pos - 3]) & ALPHA != 0
                and (pos == self.end_bounds
                     or _char_type(t[pos]) & SUBWORD_DELIM != 0))

    def _is_break(self, last: int, typ: int) -> bool:
        if typ & last:
            return False
        if not self.split_case and last & ALPHA and typ & ALPHA:
            return False
        if last & UPPER and typ & ALPHA:
            return False
        if not self.split_num and ((last & ALPHA and typ & DIGIT)
                                   or (last & DIGIT and typ & ALPHA)):
            return False
        return True

    def next(self) -> int:
        self.current = self.end
        if self.current == _DONE:
            return _DONE
        if self.skip_possessive:
            self.current += 2
            self.skip_possessive = False
        last = 0
        while self.current < self.end_bounds:
            last = _char_type(self.text[self.current])
            if not last & SUBWORD_DELIM:
                break
            self.current += 1
        if self.current >= self.end_bounds:
            self.end = _DONE
            return _DONE
        self.end = self.current + 1
        while self.end < self.end_bounds:
            typ = _char_type(self.text[self.end])
            if self._is_break(last, typ):
                break
            last = typ
            self.end += 1
        if self.end < self.end_bounds - 1 \
                and self._ends_with_possessive(self.end + 2):
            self.skip_possessive = True
        return self.end

    def type(self) -> int:
        if self.end == _DONE:
            return 0
        t = _char_type(self.text[self.current])
        return ALPHA if t in (LOWER, UPPER) else t

    def is_single_word(self) -> bool:
        if self.has_final_possessive:
            return (self.current == self.start_bounds
                    and self.end == self.end_bounds - 2)
        return (self.current == self.start_bounds
                and self.end == self.end_bounds)


def word_delimiter(
    tokens: list[tuple[str, int]],
    flags: int = DEFAULT_FLAGS,
    protected: frozenset[str] = frozenset(),
) -> list[tuple[str, int]]:
    """Run the filter over a (term, positionIncrement) stream."""

    def has(f: int) -> bool:
        return bool(flags & f)

    it = _Iterator(has(SPLIT_ON_CASE_CHANGE), has(SPLIT_ON_NUMERICS),
                   has(STEM_ENGLISH_POSSESSIVE))
    out: list[tuple[str, int]] = []
    accum = 0
    saved = ""
    has_saved = False
    has_output = False
    has_output_following = False
    last_concat_count = 0
    concat: list[str] = []
    concat_type = 0
    concat_all: list[str] = []

    def position(inject: bool) -> int:
        nonlocal accum, has_output, has_output_following
        pos_inc = accum
        if has_output:
            accum = 0
            return 0 if inject else max(1, pos_inc)
        has_output = True
        if not has_output_following:
            has_output_following = True
            return 0
        accum = 0
        return max(1, pos_inc)

    def should_generate(word_type: int) -> bool:
        return ((has(GENERATE_WORD_PARTS) and word_type & ALPHA != 0)
                or (has(GENERATE_NUMBER_PARTS) and word_type & DIGIT != 0))

    def flush_concat() -> bool:
        nonlocal last_concat_count, concat, concat_type
        last_concat_count = len(concat)
        if len(concat) != 1 or not should_generate(concat_type):
            out.append(("".join(concat), position(True)))
            concat = []
            concat_type = 0
            return True
        concat = []
        concat_type = 0
        return False

    src = iter(tokens)
    while True:
        if not has_saved:
            try:
                term, pos_inc = next(src)
            except StopIteration:
                return out
            accum += pos_inc
            it.set_text(term)
            it.next()
            if (it.current == 0 and it.end == len(term)) \
                    or term in protected:
                out.append((term, accum))
                accum = 0
                continue
            if it.end == _DONE and not has(PRESERVE_ORIGINAL):
                if pos_inc == 1:
                    accum -= 1
                continue
            saved = term
            has_saved = True
            has_output = False
            has_output_following = not has(PRESERVE_ORIGINAL)
            last_concat_count = 0
            if has(PRESERVE_ORIGINAL):
                out.append((term, accum))
                accum = 0
            continue

        if it.end == _DONE:
            if concat:
                if flush_concat():
                    continue
            if concat_all:
                if len(concat_all) > last_concat_count:
                    out.append(("".join(concat_all), position(True)))
                concat_all = []
            has_saved = False
            continue

        if it.is_single_word():
            out.append((saved[it.current: it.end], position(False)))
            it.next()
            continue

        word_type = it.type()

        if concat and (concat_type & word_type) == 0:
            flushed = flush_concat()
            has_output = False
            if flushed:
                continue

        if (has(CATENATE_WORDS) and word_type & ALPHA) \
                or (has(CATENATE_NUMBERS) and word_type & DIGIT):
            if not concat:
                concat_type = word_type
            concat.append(saved[it.current: it.end])

        if has(CATENATE_ALL):
            concat_all.append(saved[it.current: it.end])

        if should_generate(word_type):
            out.append((saved[it.current: it.end], position(False)))
            it.next()
            continue

        it.next()

"""WordBreakSpellChecker — splitting and combining corrections.

Reference: lucene/suggest/src/java/org/apache/lucene/search/spell/
WordBreakSpellChecker.java (used by solr/core/src/java/org/apache/solr/
spelling/WordBreakSolrSpellChecker.java):

- ``suggest_word_breaks`` (suggestWordBreaks, :93-132 +
  generateBreakUpSuggestions, :258-307): split a not-in-index term into
  2..maxChanges+1 dictionary words; every split point from
  minBreakWordLength to len−minBreakWordLength is probed left-first, the
  right remainder recursing while breaks remain; a candidate survives only
  if EVERY part's docFreq ≥ the effective minimum. Ranked fewest-breaks
  first, then max (or sum) part frequency, bounded by maxEvaluations.
- ``suggest_word_combinations`` (suggestWordCombinations, :162-255): join
  runs of up to maxChanges+1 adjacent query terms into one dictionary
  word; SUGGEST_WHEN_NOT_IN_INDEX requires at least one joined term to be
  missing from the index (minFreq == 0), SUGGEST_MORE_POPULAR requires the
  combined freq ≥ the most popular joined term. score = words joined − 1.

Spark shape: the recursion is a driver-side walk over O(len²) substrings
of ONE user-typed term — the docFreqs for ALL probe strings are fetched
in a single batched `lookup_terms` call (one pruned dictionary scan,
driver-cached), so the whole suggestion costs at most one Spark job
regardless of maxChanges. Nothing here touches postings.
"""

from __future__ import annotations

from dataclasses import dataclass

SUGGEST_WHEN_NOT_IN_INDEX = "not_in_index"
SUGGEST_MORE_POPULAR = "more_popular"
SUGGEST_ALWAYS = "always"


@dataclass(frozen=True)
class SuggestWord:
    string: str
    freq: int


@dataclass(frozen=True)
class CombineSuggestion:
    string: str
    freq: int
    orig_indexes: tuple  # which input terms were joined


def _freqs(searcher, strings: set[str]) -> dict[str, int]:
    """docFreq of every probe string in ONE batched dictionary lookup;
    absent terms count 0 (IndexReader.docFreq semantics)."""
    if not strings:
        return {}
    tinfo = searcher.lookup_terms(sorted(strings))
    out = {s: 0 for s in strings}
    for r in tinfo.itertuples(index=False):
        out[str(r.term)] = int(r.df)
    return out


def suggest_word_breaks(
    searcher,
    term: str,
    max_suggestions: int = 5,
    suggest_mode: str = SUGGEST_WHEN_NOT_IN_INDEX,
    sort_by_sum_freq: bool = False,
    min_suggestion_frequency: int = 1,
    min_break_word_length: int = 1,
    max_changes: int = 1,
    max_evaluations: int = 1000,
) -> list[list[SuggestWord]]:
    """suggestWordBreaks: [[SuggestWord,...], ...] best-first — fewest
    breaks, then highest max (default) or summed part frequency
    (BreakSuggestionSortMethod)."""
    if max_suggestions < 1:
        return []
    min_break = max(1, min_break_word_length)

    # every substring the recursion can probe, one dictionary round-trip
    probes = {term}
    n = len(term)
    for a in range(n):
        for b in range(a + min_break, n + 1):
            probes.add(term[a:b])
    freq = _freqs(searcher, probes)

    orig_freq = freq.get(term, 0)
    if orig_freq > 0 and suggest_mode == SUGGEST_WHEN_NOT_IN_INDEX:
        return []
    use_min_freq = min_suggestion_frequency
    if suggest_mode == SUGGEST_MORE_POPULAR:
        use_min_freq = orig_freq if orig_freq else 1

    results: list[list[SuggestWord]] = []
    evaluations = [0]

    def recurse(text: str, number_breaks: int, prefix: list[SuggestWord]):
        length = len(text)
        if length < min_break * 2:
            return
        for i in range(min_break, length - min_break + 1):
            left, right = text[:i], text[i:]
            lf = freq.get(left, 0)
            if lf >= use_min_freq:
                rf = freq.get(right, 0)
                if rf >= use_min_freq:
                    results.append(
                        prefix + [SuggestWord(left, lf), SuggestWord(right, rf)]
                    )
                if number_breaks + 1 <= max_changes:
                    recurse(right, number_breaks + 1, prefix + [SuggestWord(left, lf)])
            evaluations[0] += 1
            if evaluations[0] >= max_evaluations:
                break

    recurse(term, 1, [])
    key = (
        (lambda ws: (len(ws), -sum(w.freq for w in ws)))
        if sort_by_sum_freq
        else (lambda ws: (len(ws), -max(w.freq for w in ws)))
    )
    results.sort(key=key)
    return results[:max_suggestions]


def suggest_word_combinations(
    searcher,
    terms: list[str],
    max_suggestions: int = 5,
    suggest_mode: str = SUGGEST_WHEN_NOT_IN_INDEX,
    min_suggestion_frequency: int = 1,
    max_changes: int = 1,
    max_combine_word_length: int = 20,
    max_evaluations: int = 1000,
) -> list[CombineSuggestion]:
    """suggestWordCombinations: join adjacent input terms into dictionary
    words; best-first by (fewest joins, then frequency desc)."""
    if max_suggestions < 1 or len(terms) < 2:
        return []

    probes = set(terms)
    for i in range(len(terms) - 1):
        combined = terms[i]
        for j in range(i + 1, min(len(terms), i + max_changes + 1)):
            combined += terms[j]
            if len(combined) > max_combine_word_length:
                break
            probes.add(combined)
    freq = _freqs(searcher, probes)

    out: list[CombineSuggestion] = []
    evaluations = 0
    for i in range(len(terms) - 1):
        left = terms[i]
        if len(left) > max_combine_word_length:
            continue
        max_f = min_f = freq.get(left, 0)
        combined = left
        for j in range(i + 1, len(terms)):
            if j - i > max_changes:
                break
            combined += terms[j]
            if len(combined) > max_combine_word_length:
                break
            f_j = freq.get(terms[j], 0)
            max_f, min_f = max(max_f, f_j), min(min_f, f_j)
            cf = freq.get(combined, 0)
            ok = suggest_mode != SUGGEST_MORE_POPULAR or cf >= max_f
            ok = ok and (suggest_mode != SUGGEST_WHEN_NOT_IN_INDEX or min_f == 0)
            if ok and cf >= min_suggestion_frequency:
                out.append(
                    CombineSuggestion(combined, cf, tuple(range(i, j + 1)))
                )
            evaluations += 1
            if evaluations == max_evaluations:
                break
    out.sort(key=lambda s: (len(s.orig_indexes) - 1, -s.freq))
    return out[:max_suggestions]

"""Dictionary-based compound word decomposition
(DictionaryCompoundWordTokenFilter — the non-hyphenation variant of
analysis/compound; the hyphenation-grammar variant lives in
analysis/hyphenation.py).

Re-derives CompoundWordTokenFilterBase.java:76-130 +
DictionaryCompoundWordTokenFilter.decompose: the original token is always
kept; every dictionary subword of length [minSubwordSize, maxSubwordSize]
found at any offset is appended at the SAME position (posInc 0), in offset
order; onlyLongestMatch keeps only the longest per start offset.
"""

from __future__ import annotations

DEFAULT_MIN_WORD_SIZE = 5
DEFAULT_MIN_SUBWORD_SIZE = 2
DEFAULT_MAX_SUBWORD_SIZE = 15


def dictionary_compound(
    tokens: list[tuple[str, int]],
    dictionary: frozenset[str],
    min_word_size: int = DEFAULT_MIN_WORD_SIZE,
    min_subword_size: int = DEFAULT_MIN_SUBWORD_SIZE,
    max_subword_size: int = DEFAULT_MAX_SUBWORD_SIZE,
    only_longest_match: bool = False,
) -> list[tuple[str, int]]:
    from .analyzer import _java_lower

    # CharArraySet dictionaries are built ignoreCase=true in the factory
    lower_dict = frozenset("".join(_java_lower(c) for c in w)
                           for w in dictionary)
    out: list[tuple[str, int]] = []
    for term, inc in tokens:
        out.append((term, inc))
        if len(term) < min_word_size:
            continue
        n = len(term)
        for i in range(0, n - min_subword_size + 1):
            longest: str | None = None
            for j in range(min_subword_size, max_subword_size + 1):
                if i + j > n:
                    break
                sub = term[i: i + j]
                if "".join(_java_lower(c) for c in sub) in lower_dict:
                    if only_longest_match:
                        if longest is None or len(longest) < j:
                            longest = sub
                    else:
                        out.append((sub, 0))
            if only_longest_match and longest is not None:
                out.append((longest, 0))
    return out

"""ShingleFilter — word n-grams over a token stream.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
shingle/ShingleFilter.java (defaults min=max=2, separator " ",
outputUnigrams=true, filler token "_" for stop-consumed positions).

Spark mapping: a pure-codegen expression over an `array<string>` token
column — `transform(sequence(...), i -> array_join(slice(...)))` — so the
whole shingling stage stays inside whole-stage codegen (no UDF). The
shingle stream is what CommonGrams/MinHash-style pipelines consume;
`pipeline/dedup.py` already builds its own character shingles, this is
the word-level operator of the reference chain.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FILLER_TOKEN = "_"  # ShingleFilter.java:50
TOKEN_SEPARATOR = " "  # ShingleFilter.java:70


def shingles(
    tokens: Column,
    min_size: int = 2,
    max_size: int = 2,
    output_unigrams: bool = True,
    separator: str = TOKEN_SEPARATOR,
) -> Column:
    """token array → shingle array, reference emission order: for each
    starting position, the unigram (if kept) then each shingle size
    min..max that fits (ShingleFilter.incrementToken emits by position,
    then by size)."""
    if min_size < 2 or max_size < min_size:
        raise ValueError("need 2 <= min_size <= max_size")
    sizes = list(range(min_size, max_size + 1))
    per_pos = []
    if output_unigrams:
        per_pos.append(lambda i: F.array(F.element_at(tokens, i + 1)))
    for n in sizes:
        per_pos.append(
            lambda i, n=n: F.when(
                i + n <= F.size(tokens),
                F.array(F.array_join(F.slice(tokens, i + 1, n), separator)),
            ).otherwise(F.array().cast("array<string>"))
        )
    out = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - 1),
            lambda i: F.flatten(F.array(*[p(i) for p in per_pos])),
        )
    )
    # sequence(0, -1) would count DOWN; empty/null input → empty output
    return F.when(F.size(tokens) > 0, out).otherwise(
        F.array().cast("array<string>")
    )


def shingles_with_fillers(
    positioned: Column,
    min_size: int = 2,
    max_size: int = 2,
    output_unigrams: bool = True,
    separator: str = TOKEN_SEPARATOR,
) -> Column:
    """ShingleFilter AFTER a StopFilter: removed stopwords leave position
    gaps, which the reference fills with "_" (FILLER_TOKEN) inside
    shingles — "please divide" + stopped "the" → "divide _". Input is an
    array<struct<pos:int,term:string>> (the inverter's positioned tokens);
    the dense stream is reconstructed with fillers, then shingled.
    Unigrams never include fillers (the reference emits no filler-only
    tokens)."""
    first = F.element_at(positioned, 1)["pos"]
    last = F.element_at(positioned, F.size(positioned))["pos"]
    # dense array over [first..last]: term at its position, else filler
    as_map = F.map_from_entries(
        F.transform(positioned, lambda s: F.struct(s["pos"], s["term"]))
    )
    dense = F.transform(
        F.sequence(first, last),
        lambda p: F.coalesce(
            F.element_at(as_map, p), F.lit(FILLER_TOKEN)
        ),
    )
    sh = shingles(dense, min_size, max_size, output_unigrams, separator)
    # drop unigram fillers and all-filler shingles (isAllFiller,
    # ShingleFilter.java shingle assembly)
    filtered = F.filter(sh, lambda s: ~s.rlike("^[_ ]*$"))
    return F.when(F.size(positioned) > 0, filtered).otherwise(
        F.array().cast("array<string>")
    )


def common_grams(
    tokens: Column,
    common_words: set[str] | None = None,
    separator: str = "_",
) -> Column:
    """CommonGramsFilter (lucene/analysis/common/.../commongrams/
    CommonGramsFilter.java:53): pass every unigram through and ADD a
    bigram (posInc 0, type "gram") wherever either member of an adjacent
    pair is a common word — the phrase-speed trick that keeps stopwords
    queryable ("man of the year" → man, man_of, of, of_the, the, the_year,
    year). Emission order matches the stream: unigram at i, then the
    gram bridging i→i+1. Pure codegen."""
    if common_words is None:
        from .analyzer import ENGLISH_STOP_WORDS

        common_words = ENGLISH_STOP_WORDS
    words = sorted(common_words)

    def is_common(t: Column) -> Column:
        return t.isin(*words)

    def at(i):  # 1-based element_at
        return F.element_at(tokens, i + 1)

    def per_pos(i: Column) -> Column:
        uni = F.array(at(i))
        has_next = (i + 2) <= F.size(tokens)
        gram_applies = has_next & (is_common(at(i)) | is_common(at(i + 1)))
        gram = F.when(
            gram_applies,
            F.array(F.concat_ws(separator, at(i), at(i + 1))),
        ).otherwise(F.array().cast("array<string>"))
        return F.concat(uni, gram)

    out = F.flatten(F.transform(F.sequence(F.lit(0), F.size(tokens) - 1), per_pos))
    return F.when(F.size(tokens) > 0, out).otherwise(
        F.array().cast("array<string>")
    )

"""Character n-gram filters — substring-match / autocomplete index terms.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/ngram/
NGramTokenFilter.java (4.4 semantics: per start position, emit every gram
size minGram..maxGram that fits — position-major, size-minor order; all
grams of a token share its position) and EdgeNGramTokenFilter.java (FRONT
side: grams of sizes minGram..maxGram anchored at the token start; 4.4
dropped Side.BACK — reverse up-front for that behavior).

Spark mapping: pure-codegen array expressions over the analyzer's token
array (like shingle.py) — `transform`/`sequence`/`substr` — so gramming
stays inside whole-stage codegen with no Python in the path. Lengths are
codepoint counts (Spark `length`/`substr` are codepoint-based, matching
the 4.4 filters' supplementary-character handling).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _empty() -> Column:
    return F.array().cast("array<string>")


def char_ngrams(tokens: Column, min_gram: int = 1, max_gram: int = 2) -> Column:
    """token array → all character n-grams of each token
    (NGramTokenFilter.incrementToken, sizes reset per position): for
    "abc" with (1,2) → a, ab, b, bc, c. Tokens shorter than min_gram emit
    nothing."""
    if min_gram < 1 or max_gram < min_gram:
        raise ValueError("need 1 <= min_gram <= max_gram")
    sizes = list(range(min_gram, max_gram + 1))

    def tok_grams(tok: Column) -> Column:
        ln = F.length(tok)
        per_pos = F.transform(
            F.sequence(F.lit(1), ln),
            lambda p: F.flatten(
                F.array(
                    *[
                        F.when(
                            p + F.lit(n - 1) <= ln,
                            F.array(tok.substr(p, F.lit(n))),
                        ).otherwise(_empty())
                        for n in sizes
                    ]
                )
            ),
        )
        return F.when(ln > 0, F.flatten(per_pos)).otherwise(_empty())

    return F.flatten(F.transform(tokens, tok_grams))


def edge_ngrams(tokens: Column, min_gram: int = 1, max_gram: int = 1) -> Column:
    """token array → front-edge grams of each token
    (EdgeNGramTokenFilter, Side.FRONT, defaults 1/1): for "spark" with
    (1,3) → s, sp, spa. The index-time autocomplete operator — an edge-
    grammed field turns prefix search into exact term lookup."""
    if min_gram < 1 or max_gram < min_gram:
        raise ValueError("need 1 <= min_gram <= max_gram")
    sizes = list(range(min_gram, max_gram + 1))

    def tok_grams(tok: Column) -> Column:
        ln = F.length(tok)
        return F.flatten(
            F.array(
                *[
                    F.when(
                        F.lit(n) <= ln, F.array(tok.substr(F.lit(1), F.lit(n)))
                    ).otherwise(_empty())
                    for n in sizes
                ]
            )
        )

    return F.flatten(F.transform(tokens, tok_grams))

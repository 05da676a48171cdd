"""CollationField: locale-sensitive sort keys for sort and range queries.

Reference: solr/core/src/java/org/apache/solr/schema/CollationField.java:45-76
— a field whose indexed terms are a Collator's binary sort keys, so plain
byte-order term comparison realizes locale ordering; sort and range
queries then run on the key column unchanged.

Spark-first re-expression: `collation_key_col(col, locale, strength)`
produces a hex-encoded multi-level sort key STRING whose lexicographic
order equals the locale's collation order (the RuleBasedCollator key idea
with a compact tailoring table per locale, not ICU's full DUCET):

  level 1 (primary):   tailored base-letter order — the locale's alphabet
                       positions (Swedish z < å < ä < ö; German umlauts
                       sort with their base letter per DIN 5007-1; ß = ss)
  level 2 (secondary): accent/diacritic marks (é after e, ä after a in
                       German, …)
  level 3 (tertiary):  case (lower before upper, the Collator default)

Levels concatenate with 0x00 separators, exactly how RuleBasedCollator
keys compose, so truncating the strength drops the lower levels. Range
queries and ORDER BY then operate on the key column with ordinary string
comparison — parquet min/max pruning and Catalyst pushdown apply
unchanged, which is the point of keys-as-terms.

Supported locales: 'sv' (å ä ö after z), 'de' (DIN 5007-1 dictionary
sort), 'fr'/'en'/root (accents secondary). Unknown locales use the root
table. This is the COMMON tailoring subset, not full UCA; documented.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# root primary order: digits BEFORE letters (weights 20-29 < 'a' at 32),
# matching JDK/ICU RuleBasedCollator semantics, then a-z. Non-Latin
# characters get marker weight 200 — they sort AFTER the Latin alphabet as
# one block, ordered by codepoint within it (a documented simplification;
# full UCA would interleave scripts by DUCET weight).
_BASE = "abcdefghijklmnopqrstuvwxyz"
_ROOT_PRIMARY = {ch: i + 32 for i, ch in enumerate(_BASE)}
_ROOT_PRIMARY.update({d: 20 + i for i, d in enumerate("0123456789")})

# locale tailorings: extra letters with their PRIMARY slot, and per-char
# (base, secondary) overrides
_TAILORING: dict[str, dict] = {
    "root": {"primary": {}, "expansions": {}},
    "sv": {  # å ä ö are distinct letters AFTER z (Swedish alphabet)
        "primary": {"å": 100, "ä": 101, "ö": 102},
        "expansions": {},
    },
    "de": {  # DIN 5007-1: ä=a ö=o ü=u (secondary mark), ß = ss
        "primary": {},
        "expansions": {"ß": "ss"},
    },
    "fr": {"primary": {}, "expansions": {}},
    "en": {"primary": {}, "expansions": {}},
}


def _decompose(ch: str) -> tuple[str, int]:
    """(base char, secondary weight) via canonical decomposition."""
    d = unicodedata.normalize("NFD", ch)
    base = d[0]
    sec = 0
    for m in d[1:]:
        sec = sec * 64 + (unicodedata.combining(m) % 64 or 1)
    return base, sec


def collation_key(text: str | None, locale: str = "root",
                  strength: str = "tertiary") -> str | None:
    """Hex-encoded sort key; lexicographic order == collation order."""
    if text is None:
        return None
    t = _TAILORING.get(locale, _TAILORING["root"])
    prim: list[int] = []
    sec: list[int] = []
    ter: list[int] = []
    expanded = []
    for ch in text:
        expanded.extend(t["expansions"].get(ch.lower(), ch))
    for ch in expanded:
        low = ch.lower()
        if low in t["primary"]:
            p, s = t["primary"][low], 0
        else:
            base, s = _decompose(low)
            p = _ROOT_PRIMARY.get(base)
            if p is None:
                # non-Latin: marker byte (> every Latin weight) then the raw
                # codepoint bytes — block sorts after the alphabet, ordered
                # by codepoint within it
                prim.append(200)
                prim.extend(ord(base).to_bytes(3, "big"))
                sec.append(min(s, 255))
                ter.append(0 if ch.islower() or not ch.isalpha() else 1)
                continue
        prim.append(p)
        sec.append(min(s, 255))
        ter.append(0 if ch.islower() or not ch.isalpha() else 1)
    parts = [bytes(prim)]
    if strength in ("secondary", "tertiary", "identical"):
        parts.append(bytes(sec))
    if strength in ("tertiary", "identical"):
        parts.append(bytes(ter))
    if strength == "identical":
        parts.append(text.encode("utf-8"))
    return b"\x00".join(parts).hex()


def collation_key_col(col: Column | str, locale: str = "root",
                      strength: str = "tertiary") -> Column:
    """Arrow-batched key column (the CollationField analyzer analog)."""
    c = F.col(col) if isinstance(col, str) else col

    @F.pandas_udf(StringType())
    def _key(texts: pd.Series) -> pd.Series:
        return texts.map(lambda s: collation_key(s, locale, strength))

    return _key(c)


def collated_sort(df: DataFrame, col: str, locale: str = "root",
                  ascending: bool = True, strength: str = "tertiary") -> DataFrame:
    """Locale-sensitive ORDER BY via the key column."""
    key = collation_key_col(col, locale, strength).alias("__ckey")
    out = df.withColumn("__ckey", key).orderBy(
        F.col("__ckey").asc() if ascending else F.col("__ckey").desc()
    )
    return out.drop("__ckey")


def collated_range(df: DataFrame, col: str, lower: str | None, upper: str | None,
                   locale: str = "root", strength: str = "tertiary",
                   include_lower: bool = True, include_upper: bool = True) -> DataFrame:
    """Locale-sensitive range filter — key-space comparison, exactly the
    CollationField range-query trick (keys are the indexed terms)."""
    key = collation_key_col(col, locale, strength)
    cond = F.lit(True)
    if lower is not None:
        lo = collation_key(lower, locale, strength)
        cond = cond & (key >= lo if include_lower else key > lo)
    if upper is not None:
        hi = collation_key(upper, locale, strength)
        cond = cond & (key <= hi if include_upper else key < hi)
    return df.where(cond)

"""Phonetic token filters — Soundex and RefinedSoundex as pure codegen.

Solr's PhoneticFilterFactory (solr/core/src/java/org/apache/solr/analysis/
PhoneticFilterFactory.java:60-118) wraps commons-codec encoders; with
inject=true (the default) the encoded form is added at the same position as
the original token, with inject=false it replaces the token.

Two of the classic encoders re-derived here from the published algorithms
(American Soundex as specified by the US National Archives; Refined Soundex
as distributed with commons-codec), each as a chain of whole-stage-codegen
string expressions over the analyzer's array<string> token column — no
Python in the plan:

- American Soundex (HW rule): letter + 3 digits, consonants mapped through
  ``01230120022455012623010202``; same-code letters separated by H/W
  collapse to one digit, separated by a vowel they code twice. Equivalent
  formulation used below (verified against the canonical Archives examples
  Robert/R163, Ashcraft/A261, Tymczak/T522, Pfister/P236, Honeyman/H555):
  strip H/W after the first letter, map everything to digits, collapse
  adjacent identical digits, drop zeros after the first symbol, overwrite
  the first symbol with the first letter, right-pad with zeros to 4.
- Refined Soundex: first letter + the code of EVERY letter (vowels = 0)
  through ``01360240043788015936020505`` with adjacent identical codes
  collapsed; no length cap, no zero-stripping (commons-codec
  RefinedSoundex.java: "testing" -> T6036084, "quick" -> Q503).

Tokens containing no ASCII letter encode to the empty string (commons-codec
returns "" there); inject mode keeps the original and drops the empty code,
replace mode keeps the original token unchanged in that case (the reference
filter never emits an empty term).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_SOUNDEX_MAP = "01230120022455012623010202"
_REFINED_MAP = "01360240043788015936020505"
# longer than StandardTokenizer's 255-char token cap
_TAIL = 4096


def soundex_code(token: Column) -> Column:
    """American Soundex code (letter + 3 digits) of one token, '' if the
    token has no ASCII letters."""
    u = F.regexp_replace(F.upper(token), "[^A-Z]", "")
    first = F.substring(u, 1, 1)
    # HW rule: H/W are transparent for duplicate collapsing
    tail = F.regexp_replace(F.substring(u, 2, _TAIL), "[HW]", "")
    digits = F.translate(F.concat(first, tail), _ALPHA, _SOUNDEX_MAP)
    collapsed = F.regexp_replace(digits, r"(.)\1+", "$1")
    rest = F.regexp_replace(F.substring(collapsed, 2, _TAIL), "0", "")
    return F.when(F.length(u) == 0, F.lit("")).otherwise(
        F.rpad(F.concat(first, F.substring(rest, 1, 3)), 4, "0")
    )


def refined_soundex_code(token: Column) -> Column:
    """Refined Soundex code (unbounded length) of one token, '' for
    letterless tokens."""
    u = F.regexp_replace(F.upper(token), "[^A-Z]", "")
    digits = F.translate(u, _ALPHA, _REFINED_MAP)
    collapsed = F.regexp_replace(digits, r"(.)\1+", "$1")
    return F.when(F.length(u) == 0, F.lit("")).otherwise(
        F.concat(F.substring(u, 1, 1), collapsed)
    )


def _phonetic_filter(tokens: Column, code_fn, inject: bool) -> Column:
    if inject:
        # original followed by its code at the "same position" — position
        # attributes live only implicitly in array order here, and every
        # downstream consumer (inverter, spellcheck dictionaries) treats
        # equal-position duplicates as extra terms, which is exactly the
        # reference's posIncr=0 behaviour for scoring-free use cases.
        return F.flatten(
            F.transform(
                tokens,
                lambda t: F.filter(
                    F.array(t, code_fn(t)),
                    lambda x: F.length(x) > 0,
                ),
            )
        )
    return F.transform(
        tokens,
        lambda t: F.when(F.length(code_fn(t)) > 0, code_fn(t)).otherwise(t),
    )


def soundex_filter(tokens: Column, inject: bool = True) -> Column:
    """PhoneticFilter(encoder=Soundex). inject=True appends each token's
    code after the token; inject=False replaces the token with its code."""
    return _phonetic_filter(tokens, soundex_code, inject)


def refined_soundex_filter(tokens: Column, inject: bool = True) -> Column:
    """PhoneticFilter(encoder=RefinedSoundex)."""
    return _phonetic_filter(tokens, refined_soundex_code, inject)

"""CollationField (functions/collation.py): locale-sensitive sort/range.

Reference semantics: CollationField.java:45-76 — Collator sort keys as
terms; byte order == locale order."""

from __future__ import annotations

from lucene_solr_spark.functions.collation import collation_key


def order(words, locale, strength="tertiary"):
    return sorted(words, key=lambda w: collation_key(w, locale, strength))


def test_swedish_letters_after_z():
    # Swedish alphabet: ... x y z å ä ö
    assert order(["äpple", "zebra", "öga", "apelsin", "åka"], "sv") == [
        "apelsin", "zebra", "åka", "äpple", "öga"
    ]


def test_german_din_dictionary_sort():
    # DIN 5007-1: ä sorts WITH a (secondary), ß = ss
    got = order(["Zucker", "Äpfel", "Apfel", "Strasse", "Straße", "Arm"], "de")
    assert got.index("Apfel") < got.index("Äpfel") < got.index("Arm")
    # ß expands to ss: Straße ties Strasse at primary+secondary, case breaks
    assert abs(got.index("Strasse") - got.index("Straße")) == 1
    assert got[-1] == "Zucker"


def test_accents_secondary_not_primary():
    # é sorts right after e, NOT after z (the codepoint order bug)
    assert order(["f", "é", "e", "z"], "fr") == ["e", "é", "f", "z"]


def test_case_tertiary():
    assert order(["b", "A", "a", "B"], "en") == ["a", "A", "b", "B"]
    # primary strength: case ties completely
    k = lambda w: collation_key(w, "en", "primary")
    assert k("abc") == k("ABC") == k("äbç")


def test_non_latin_and_digits_keyable():
    # ß in the ROOT locale (no expansion) takes the codepoint path — must not
    # overflow the byte range; non-Latin block sorts after the alphabet,
    # ordered by codepoint within it
    words = ["straße", "strasse", "日本", "中国", "abc123", "έτος", "zzz"]
    got = order(words, "root")
    assert got.index("zzz") < got.index("中国") < got.index("日本")
    assert collation_key("été", "root") is not None
    assert collation_key(None, "root") is None
    assert collation_key("", "root") == collation_key("", "root")


def test_range_in_key_space(spark):
    from lucene_solr_spark.functions.collation import collated_range, collated_sort

    df = spark.createDataFrame(
        [("åka",), ("apelsin",), ("äpple",), ("zebra",), ("banan",)], "w string"
    )
    got = [r.w for r in collated_sort(df, "w", "sv").collect()]
    assert got == ["apelsin", "banan", "zebra", "åka", "äpple"]
    rng = {r.w for r in collated_range(df, "w", "zebra", None, locale="sv").collect()}
    assert rng == {"zebra", "åka", "äpple"}  # å/ä AFTER z in Swedish


def test_digits_sort_before_letters():
    # RuleBasedCollator orders digits before the alphabet
    assert order(["b2", "a", "1", "z", "10"], "root") == ["1", "10", "a", "b2", "z"]
    assert order(["item2", "item10", "itema"], "root") == ["item10", "item2", "itema"]

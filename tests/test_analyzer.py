"""Tokenizer golden tests, mirroring BaseTokenStreamTestCase's
assertTokenStreamContents (reference BaseTokenStreamTestCase.java:114-254):
exact token lists AND positions for fixed inputs."""

from lucene_solr_spark.analysis.analyzer import (
    ENGLISH_STOP_WORDS,
    standard_tokenize,
)


def toks(text):
    return [t for _, t in standard_tokenize(text)]


def pos(text):
    return [p for p, _ in standard_tokenize(text)]


def test_stop_list_is_lucene_33():
    # StopAnalyzer.java:51-57
    assert len(ENGLISH_STOP_WORDS) == 33
    assert "the" in ENGLISH_STOP_WORDS and "with" in ENGLISH_STOP_WORDS
    assert "i" not in ENGLISH_STOP_WORDS  # Lucene's list has no 'i'


def test_plain_english_with_stopwords():
    # stopwords removed but consume positions (StopFilter.java:124-125)
    assert standard_tokenize("The quick brown fox") == [
        (1, "quick"),
        (2, "brown"),
        (3, "fox"),
    ]


def test_punctuation_and_accents():
    assert standard_tokenize("Whaé? And then.") == [(0, "whaé")]


def test_numerics():
    assert toks("3.14") == ["3.14"]
    assert toks("1,000") == ["1,000"]  # UAX#29 MidNum comma joins digits
    assert toks("R2D2") == ["r2d2"]
    assert toks("foo,bar") == ["foo", "bar"]  # comma does not join letters


def test_apostrophes():
    assert toks("O'Brien's") == ["o'brien's"]
    assert toks("don’t") == ["don’t"]


def test_hyphenation_breaks():
    # UAX#29 breaks on hyphen; 'of'/'the' are stopwords consuming positions
    assert standard_tokenize("state-of-the-art") == [(0, "state"), (3, "art")]


def test_email_and_hostname():
    # StandardTokenizer (not UAX29URLEmailTokenizer) splits at '@' but keeps
    # the dotted hostname as one token (MidNumLet dot)
    assert toks("foo@bar.com") == ["foo", "bar.com"]
    assert toks("U.S.A.") == ["u.s.a"]


def test_cjk_one_token_per_ideograph():
    # StandardTokenizer.java:83 — IDEOGRAPHIC type, one per char
    assert toks("日本語") == ["日", "本", "語"]
    assert toks("abc日本") == ["abc", "日", "本"]


def test_katakana_run_joins():
    assert toks("コンピュータ") == ["コンピュータ"]


def test_turkish_dotted_capital_i():
    # Java Character.toLowerCase(U+0130) == 'i' (simple mapping);
    # Python str.lower would give 'i' + combining dot above
    assert toks("İstanbul") == ["istanbul"]


def test_max_token_length_255():
    long_tok = "a" * 256
    ok_tok = "b" * 255
    assert toks(f"{long_tok} hello") == ["hello"]
    assert toks(ok_tok) == [ok_tok]
    # dropped over-long token consumes no position
    assert standard_tokenize(f"{long_tok} hello")[0][0] == 0


def test_empty_and_whitespace():
    assert standard_tokenize("") == []
    assert standard_tokenize(None) == []
    assert standard_tokenize("   \t\n ") == []


def test_all_stopword_text_counts_zero_length():
    assert standard_tokenize("the of and to") == []


def test_fidelity_build_cjk(spark, tmp_path):
    """build_index(tokenizer='fidelity'): CJK text indexes per-ideograph
    (StandardTokenizer.java:83 semantics) and is searchable; the JVM path
    would keep 日本語 as one token. Also checks stats tokenizer recording."""
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher

    corpus = {
        "c0": "日本語 spark の merge テスト",
        "c1": "spark merge data",
        "c2": "日本 と 本 だけ",
    }
    pages = spark.createDataFrame(list(corpus.items()), "url string, text string")
    paths = build_index(
        spark, pages, str(tmp_path / "fid_idx"), tokenizer="fidelity"
    )
    s = Searcher(spark, paths)
    assert s.meta["tokenizer"] == "fidelity"
    # 日 as a single ideograph token exists only under fidelity tokenization
    terms = {r.term for r in s.terms.collect()}
    assert {"日", "本", "語"} <= terms
    assert "日本語" not in terms
    # searching an ideograph finds both docs containing it
    got = s.search(["本"], k=10).toPandas()
    assert set(got["doc_id"]) == {0, 2}
    # katakana run stays whole
    assert "テスト" in terms
    # latin terms work identically
    assert s.count(["spark"]) == 2


def test_simple_lowercase_matches_jvm_table():
    """`_java_lower` == java.lang.Character.toLowerCase, spot-checked on the
    codepoints where full and simple case mappings could diverge (the
    exhaustive 0x110000-codepoint audit lives in tools/lowercase_audit.py:
    0 semantic divergences vs Java 17)."""
    from lucene_solr_spark.analysis.analyzer import _java_lower

    cases = {
        "İ": "i",       # İ: full mapping expands to i + U+0307; simple is 'i'
        "Σ": "σ",  # Σ → σ always (Final_Sigma is contextual, never per-char)
        "Ǆ": "ǆ",  # Ǆ → ǆ (digraph: simple maps capital to small, not title)
        "ẞ": "ß",  # ẞ → ß
        "A": "a",
        "А": "а",  # Cyrillic А → а
    }
    for src, want in cases.items():
        assert _java_lower(src) == want, (hex(ord(src)), _java_lower(src))

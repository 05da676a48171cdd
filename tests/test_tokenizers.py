"""Alternative tokenizers vs Test(Reverse)PathHierarchyTokenizer /
TestPatternTokenizer expectations."""

from __future__ import annotations

from lucene_solr_spark.analysis.tokenizers import (
    keyword_tokenize,
    letter_tokenize,
    lowercase_tokenize,
    path_hierarchy,
    pattern_replace_char,
    pattern_tokenize,
    reverse_path_hierarchy,
    whitespace_tokenize,
)


def terms(r):
    return [t for t, _ in r]


def test_path_hierarchy():
    # TestPathHierarchyTokenizer.java:35-128
    assert terms(path_hierarchy("/a/b/c")) == ["/a", "/a/b", "/a/b/c"]
    assert terms(path_hierarchy("/a/b/c/")) == [
        "/a", "/a/b", "/a/b/c", "/a/b/c/"]
    assert terms(path_hierarchy("a/b/c")) == ["a", "a/b", "a/b/c"]
    assert terms(path_hierarchy("/")) == ["/"]
    assert terms(path_hierarchy("//")) == ["/", "//"]
    assert terms(path_hierarchy("c:\\a\\b\\c", "\\")) == [
        "c:", "c:\\a", "c:\\a\\b", "c:\\a\\b\\c"]
    assert terms(path_hierarchy("c:\\a\\b\\c", "\\", "/")) == [
        "c:", "c:/a", "c:/a/b", "c:/a/b/c"]
    # skip (:138-172)
    assert terms(path_hierarchy("/a/b/c", skip=1)) == ["/b", "/b/c"]
    assert terms(path_hierarchy("/a/b/c/", skip=1)) == [
        "/b", "/b/c", "/b/c/"]
    assert terms(path_hierarchy("a/b/c", skip=1)) == ["/b", "/b/c"]
    # position increments: first 1, rest 0
    assert [i for _, i in path_hierarchy("/a/b/c")] == [1, 0, 0]


def test_reverse_path_hierarchy():
    # TestReversePathHierarchyTokenizer.java:35-123
    assert terms(reverse_path_hierarchy("/a/b/c")) == [
        "/a/b/c", "a/b/c", "b/c", "c"]
    assert terms(reverse_path_hierarchy("/a/b/c/")) == [
        "/a/b/c/", "a/b/c/", "b/c/", "c/"]
    assert terms(reverse_path_hierarchy("a/b/c")) == ["a/b/c", "b/c", "c"]
    assert terms(reverse_path_hierarchy("/")) == ["/"]
    assert terms(reverse_path_hierarchy("//")) == ["//", "/"]
    assert terms(reverse_path_hierarchy("/a/b/c", skip=1)) == [
        "/a/b/", "a/b/", "b/"]
    assert terms(reverse_path_hierarchy("/a/b/c/", skip=1)) == [
        "/a/b/", "a/b/", "b/"]
    assert terms(reverse_path_hierarchy("a/b/c", skip=1)) == ["a/b/", "b/"]
    assert terms(reverse_path_hierarchy("/", skip=1)) == []


def test_pattern_tokenizer():
    # TestPatternTokenizer.java: split vs group extraction
    # TestPatternTokenizer.java:45-52
    assert pattern_tokenize("aaa--bbb--ccc", "--") == ["aaa", "bbb", "ccc"]
    assert pattern_tokenize("aaa   bbb \t\tccc  ", r"\s+") == [
        "aaa", "bbb", "ccc"]
    assert pattern_tokenize("boo:and:foo", "o") == ["b", ":and:f"]
    assert pattern_tokenize("boo:and:foo", ":", group=0) == [":", ":"]
    assert pattern_tokenize("aaa 'bbb' 'ccc'", "'([^']+)'", group=0) == [
        "'bbb'", "'ccc'"]
    assert pattern_tokenize("aaa 'bbb' 'ccc'", "'([^']+)'", group=1) == [
        "bbb", "ccc"]


def test_pattern_replace_and_core():
    assert pattern_replace_char("a-b-c", "-", " ") == "a b c"
    assert whitespace_tokenize("foo  bar") == ["foo", "bar"]
    assert letter_tokenize("foo123bar!baz") == ["foo", "bar", "baz"]
    assert keyword_tokenize("as-is TOKEN") == ["as-is TOKEN"]
    assert lowercase_tokenize("FooBar Baz99") == ["foobar", "baz"]


def test_uax29_url_email():
    """The reference's own fixture pairs: every URL and e-mail token
    byte-identical (TestUAX29URLEmailTokenizer.testURLs/testEmails)."""
    from lucene_solr_spark.analysis.urlemail import uax29_url_email_tokenize

    base = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
            "lucene/analysis/core")
    for text_f, want_f, typ in [
            ("random.text.with.urls.txt",
             "urls.from.random.text.with.urls.txt", "<URL>"),
            ("random.text.with.email.addresses.txt",
             "email.addresses.from.random.text.with.email.addresses.txt",
             "<EMAIL>")]:
        text = open(f"{base}/{text_f}", encoding="utf-8").read()
        want = [ln.strip() for ln in open(f"{base}/{want_f}",
                                          encoding="utf-8") if ln.strip()]
        got = [t for t, ty in uax29_url_email_tokenize(text) if ty == typ]
        assert got == want


def test_uax29_url_email_basics():
    from lucene_solr_spark.analysis.urlemail import uax29_url_email_tokenize

    out = uax29_url_email_tokenize(
        "visit https://example.com/a?b=c or mail foo.bar@example.com now")
    assert ("https://example.com/a?b=c", "<URL>") in out
    assert ("foo.bar@example.com", "<EMAIL>") in out
    assert ("visit", "<ALPHANUM>") in out
    # mailto: prefix stays a word, the address is the EMAIL token
    out2 = uax29_url_email_tokenize("mailto:foo@example.com")
    assert out2[0] == ("mailto", "<ALPHANUM>")
    assert out2[1] == ("foo@example.com", "<EMAIL>")


def test_classic_analyzer():
    """TestClassicAnalyzer.java:72-189 cases through the classic chain
    (tokenizer → ClassicFilter → lowercase → classic stop set)."""
    from lucene_solr_spark.analysis.analyzer import (
        ENGLISH_STOP_WORDS,
        _java_lower,
    )
    from lucene_solr_spark.analysis.classic import (
        classic_filter,
        classic_tokenize,
    )

    def analyze(text):
        out = []
        for t, _ in classic_filter(classic_tokenize(text)):
            low = "".join(_java_lower(c) for c in t)
            if low not in ENGLISH_STOP_WORDS:
                out.append(low)
        return out

    cases = [
        ("B2B", ["b2b"]), ("2B", ["2b"]),
        ("word_having_underscore", ["word", "having", "underscore"]),
        ("some-dashed-phrase", ["some", "dashed", "phrase"]),
        ("dogs,chase,cats", ["dogs", "chase", "cats"]),
        ("ac/dc", ["ac", "dc"]),
        ("O'Reilly", ["o'reilly"]), ("you're", ["you're"]),
        ("she's", ["she"]), ("Jim's", ["jim"]), ("don't", ["don't"]),
        ("O'Reilly's", ["o'reilly"]),
        ("s-class", ["s", "class"]), ("t-com", ["t", "com"]),
        ("a-class", ["class"]),
        ("AT&T", ["at&t"]), ("Excite@Home", ["excite@home"]),
        ("test@example.com", ["test@example.com"]),
        ("first.lastname@example.com", ["first.lastname@example.com"]),
        ("first_lastname@example.com", ["first_lastname@example.com"]),
        ("21.35", ["21.35"]), ("R2D2 C3PO", ["r2d2", "c3po"]),
        ("216.239.63.104", ["216.239.63.104"]),
        ("1-2-3", ["1-2-3"]), ("a1-b2-c3", ["a1-b2-c3"]),
        ("a1-b-c3", ["a1-b-c3"]),
        ("David has 5000 bones", ["david", "has", "5000", "bones"]),
        ("C embedded developers wanted",
         ["c", "embedded", "developers", "wanted"]),
        ("foo bar FOO BAR", ["foo", "bar", "foo", "bar"]),
        ('"QUOTED" word', ["quoted", "word"]),
        ("U.S.A.", ["usa"]), ("C++", ["c"]), ("C#", ["c"]),
        ("안녕하세요 한글입니다", ["안녕하세요", "한글입니다"]),
        ("www.nutch.org", ["www.nutch.org"]),
    ]
    for text, want in cases:
        assert analyze(text) == want, text

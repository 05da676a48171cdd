"""Classic QueryParser subset: parse semantics + end-to-end execution
against the boolean/brute-force oracles."""

import numpy as np
import pytest

from lucene_solr_spark.query.parser import (
    MUST,
    MUST_NOT,
    SHOULD,
    Clause,
    QueryParseError,
    parse,
)


def occurs(clauses):
    return [(c.occur, c.kind, c.terms, c.boost) for c in clauses]


def test_bag_of_words_default_or():
    assert occurs(parse("spark fast merge")) == [
        (SHOULD, "term", ["spark"], 1.0),
        (SHOULD, "term", ["fast"], 1.0),
        (SHOULD, "term", ["merge"], 1.0),
    ]


def test_plus_minus():
    assert occurs(parse("+spark -slow fast")) == [
        (MUST, "term", ["spark"], 1.0),
        (MUST_NOT, "term", ["slow"], 1.0),
        (SHOULD, "term", ["fast"], 1.0),
    ]


def test_and_promotes_both():
    got = occurs(parse("spark AND merge fast"))
    assert got[0] == (MUST, "term", ["spark"], 1.0)
    assert got[1] == (MUST, "term", ["merge"], 1.0)
    assert got[2] == (SHOULD, "term", ["fast"], 1.0)


def test_not_keyword():
    assert occurs(parse("spark NOT slow")) == [
        (SHOULD, "term", ["spark"], 1.0),
        (MUST_NOT, "term", ["slow"], 1.0),
    ]


def test_phrase_and_boost():
    got = occurs(parse('"fast merge"^2 spark^1.5'))
    assert got == [
        (SHOULD, "phrase", ["fast", "merge"], 2.0),
        (SHOULD, "term", ["spark"], 1.5),
    ]


def test_analysis_inside_parser():
    # stopwords vanish; mixed case lowered; field alias accepted
    assert occurs(parse("the Spark text:Merge")) == [
        (SHOULD, "term", ["spark"], 1.0),
        (SHOULD, "term", ["merge"], 1.0),
    ]
    with pytest.raises(QueryParseError):
        parse("title:foo")


def test_stopword_phrase_positions():
    # "state of the art": stopwords dropped but positions preserved at
    # execution time (phrase terms list is post-stop)
    got = parse('"state of the art"')
    assert got[0].terms == ["state", "art"]


# --- execution ---------------------------------------------------------------
@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    from tests.test_index_e2e import make_corpus
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher

    corpus = make_corpus(n=150, seed=3)
    pages = spark.createDataFrame(
        [(u, t) for u, t in corpus.items()], "url string, text string"
    )
    out = str(tmp_path_factory.mktemp("pidx"))
    paths = build_index(spark, pages, out)
    urls = sorted(corpus)
    return Searcher(spark, paths), {i: corpus[u] for i, u in enumerate(urls)}


def test_query_equals_boolean_search(index):
    s, _ = index
    a = s.query("spark dog bird", k=10).toPandas()
    b = s.search(["spark", "dog", "bird"], k=10).toPandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    np.testing.assert_array_equal(a["score"].values, b["score"].values)


def test_query_must_not_matches_boolean(index):
    s, _ = index
    a = s.query("+fast -cat", k=1000).toPandas()
    b = s.boolean_search(must=["fast"], must_not=["cat"], k=1000).toPandas()
    assert set(a["doc_id"]) == set(b["doc_id"])


def test_query_and_conjunction(index):
    s, texts = index
    from lucene_solr_spark.analysis.analyzer import standard_tokenize

    got = s.query("fast AND dog", k=1000).toPandas()
    expect = {
        d
        for d, t in texts.items()
        if {"fast", "dog"} <= {tok for _, tok in standard_tokenize(t)}
    }
    assert set(got["doc_id"]) == expect


def test_query_mixed_phrase_term(index):
    s, texts = index
    from lucene_solr_spark.analysis.analyzer import standard_tokenize

    got = s.query('+"fast dog" bird', k=1000).toPandas()
    expect = set()
    for d, t in texts.items():
        pos = {}
        for p, tok in standard_tokenize(t):
            pos.setdefault(tok, set()).add(p)
        if any(p + 1 in pos.get("dog", ()) for p in pos.get("fast", ())):
            expect.add(d)
    assert set(got["doc_id"]) == expect
    # phrase-matching docs containing 'bird' must outscore same docs without
    # it only via additive scoring — sanity: scores positive, sorted desc
    assert (got["score"] > 0).all()


def test_query_boost_scales_score(index):
    s, _ = index
    plain = s.query("spark", k=5).toPandas()
    boosted = s.query("spark^2", k=5).toPandas()
    assert plain["doc_id"].tolist() == boosted["doc_id"].tolist()
    np.testing.assert_allclose(
        boosted["score"].values, plain["score"].values * 2.0, rtol=1e-6
    )


def test_query_unknown_must_term_empty(index):
    s, _ = index
    assert s.query("+zzzznotaword spark", k=10).count() == 0
    assert s.query("zzzznotaword spark", k=10).count() > 0


# --- round 2: parens / ranges / wildcard / fuzzy syntax ----------------------
def test_parens_group():
    got = parse("(spark merge) AND fast")
    assert got[0].kind == "group" and got[1].kind == "term"
    assert [c.terms for c in got[0].children] == [["spark"], ["merge"]]
    # AND promotes the group and the term
    assert got[0].occur == MUST and got[1].occur == MUST


def test_nested_group_with_boost_and_prohibit():
    got = parse('-(slow "bad merge") fast^2')
    assert got[0].kind == "group" and got[0].occur == MUST_NOT
    kinds = [c.kind for c in got[0].children]
    assert kinds == ["term", "phrase"]
    assert got[1] == Clause(SHOULD, "term", ["fast"], 2.0)


def test_group_boost_suffix():
    got = parse("(spark merge)^3 dog")
    assert got[0].kind == "group" and got[0].boost == 3.0


def test_range_syntax():
    (c,) = parse("[merge TO spark]")
    assert c.kind == "range" and c.terms == ["merge", "spark"]
    assert c.include_lower and c.include_upper
    (c2,) = parse("{merge TO spark}")
    assert not c2.include_lower and not c2.include_upper


def test_wildcard_prefix_fuzzy_syntax():
    got = parse("spar* te?m merge~1 fuzzy~")
    assert [(c.kind, c.terms[0]) for c in got] == [
        ("prefix", "spar"),
        ("wildcard", "te?m"),
        ("fuzzy", "merge"),
        ("fuzzy", "fuzzy"),
    ]
    assert got[2].max_edits == 1 and got[3].max_edits == 2


def test_unbalanced_parens_raise():
    with pytest.raises(QueryParseError):
        parse("(spark merge")


def test_field_prefix_still_checked():
    with pytest.raises(QueryParseError):
        parse("title:spark")
    assert parse("text:spark")[0].terms == ["spark"]


def test_query_group_conjunction_e2e(index):
    s, texts = index
    from lucene_solr_spark.analysis.analyzer import standard_tokenize

    got = s.query("(cat bird) AND fast", k=1000).toPandas()
    expect = set()
    for d, t in texts.items():
        toks = {tok for _, tok in standard_tokenize(t)}
        if "fast" in toks and ({"cat", "bird"} & toks):
            expect.add(d)
    assert set(got["doc_id"]) == expect


def test_query_range_constant_score_e2e(index):
    s, texts = index
    from lucene_solr_spark.analysis.analyzer import standard_tokenize

    got = s.query("[dog TO fast]", k=1000).toPandas()
    expect = {
        d
        for d, t in texts.items()
        if any("dog" <= tok < "fast" or tok == "fast" for _, tok in standard_tokenize(t))
    }
    assert set(got["doc_id"]) == expect
    # constant-score rewrite: every match scores exactly 1.0f
    assert set(got["score"]) == {1.0}


def test_query_prefix_and_wildcard_e2e(index):
    s, texts = index
    from lucene_solr_spark.analysis.analyzer import standard_tokenize

    got = s.query("s*", k=1000).toPandas()
    expect = {
        d
        for d, t in texts.items()
        if any(tok.startswith("s") for _, tok in standard_tokenize(t))
    }
    assert set(got["doc_id"]) == expect

    got2 = s.query("d?g", k=1000).toPandas()
    expect2 = {
        d
        for d, t in texts.items()
        if any(len(tok) == 3 and tok[0] == "d" and tok[2] == "g"
               for _, tok in standard_tokenize(t))
    }
    assert set(got2["doc_id"]) == expect2


def test_query_fuzzy_e2e(index):
    s, texts = index
    from lucene_solr_spark.analysis.analyzer import standard_tokenize

    got = s.query("spak~1", k=1000).toPandas()
    expect = {
        d
        for d, t in texts.items()
        if "spark" in {tok for _, tok in standard_tokenize(t)}
    }
    # 'spak'~1 matches 'spark' (1 insertion); scores are BM25 (scoring rewrite)
    assert set(got["doc_id"]) >= expect
    assert (got["score"] > 0).all()

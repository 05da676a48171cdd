"""End-to-end: build index → search → rank-identical to brute-force oracle
(the TestBoolean2-style cross-check: engine vs alternative scorer)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.index.docids import assign_dense_ids
from lucene_solr_spark.query.bm25 import brute_force_topk
from lucene_solr_spark.query.executor import Searcher

VOCAB = ["fast", "slow", "cat", "dog", "bird", "spark", "index", "query", "the", "of"]


def make_corpus(n=120, seed=7):
    rng = np.random.RandomState(seed)
    out = {}
    for i in range(n):
        words = rng.choice(VOCAB, size=rng.randint(3, 40), p=None)
        out[f"https://site{i % 9}.example/p/{i:04d}"] = " ".join(words)
    return out


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    corpus = make_corpus()
    rows = [(u, t, 1000) for u, t in corpus.items()]
    pages = spark.createDataFrame(rows, "url string, text string, warc_ts long")
    out = str(tmp_path_factory.mktemp("idx"))
    paths = build_index(spark, pages, out, ts_col="warc_ts", num_segments=2)
    searcher = Searcher(spark, paths)
    # oracle keyed by engine docID = rank of url in sorted order
    urls = sorted(corpus)
    texts_by_docid = {i: corpus[u] for i, u in enumerate(urls)}
    return searcher, texts_by_docid


def test_docid_assignment_is_sort_rank(spark, index):
    searcher, _ = index
    docs = searcher.docs.orderBy("doc_id").toPandas()
    assert docs["doc_id"].tolist() == list(range(len(docs)))
    assert docs["url"].tolist() == sorted(docs["url"])


def test_stats_match_oracle(index):
    searcher, texts = index
    from lucene_solr_spark.analysis.analyzer import standard_tokenize

    total = sum(len(standard_tokenize(t)) for t in texts.values())
    assert searcher.stats.max_doc == len(texts)
    assert searcher.stats.sum_total_term_freq == total


@pytest.mark.parametrize("terms", [["fast"], ["fast", "dog"], ["spark", "bird", "cat"]])
def test_topk_rank_identical_to_bruteforce(index, terms):
    searcher, texts = index
    got = searcher.search(terms, k=10).toPandas()
    expected = brute_force_topk(texts, terms, k=10)
    assert got["doc_id"].tolist() == [d for d, _ in expected]
    np.testing.assert_allclose(
        got["score"].values, [s for _, s in expected], rtol=1e-5
    )


def test_conjunction(index):
    searcher, texts = index
    from lucene_solr_spark.analysis.analyzer import standard_tokenize

    got = searcher.boolean_search(must=["fast", "dog"], k=1000).toPandas()
    expect = {
        d
        for d, t in texts.items()
        if {"fast", "dog"} <= {tok for _, tok in standard_tokenize(t)}
    }
    assert set(got["doc_id"]) == expect


def test_must_not(index):
    searcher, texts = index
    from lucene_solr_spark.analysis.analyzer import standard_tokenize

    got = searcher.boolean_search(must=["fast"], must_not=["cat"], k=1000).toPandas()
    toks = {d: {tok for _, tok in standard_tokenize(t)} for d, t in texts.items()}
    expect = {d for d, s in toks.items() if "fast" in s and "cat" not in s}
    assert set(got["doc_id"]) == expect


def test_min_should_match(index):
    searcher, texts = index
    from lucene_solr_spark.analysis.analyzer import standard_tokenize

    got = searcher.boolean_search(
        should=["fast", "dog", "bird"], min_should_match=2, k=1000
    ).toPandas()
    toks = {d: {tok for _, tok in standard_tokenize(t)} for d, t in texts.items()}
    expect = {d for d, s in toks.items() if len(s & {"fast", "dog", "bird"}) >= 2}
    assert set(got["doc_id"]) == expect


def test_phrase(index):
    searcher, texts = index
    from lucene_solr_spark.analysis.analyzer import standard_tokenize

    got = searcher.phrase_search(["fast", "dog"], k=1000).toPandas()
    expect = set()
    for d, t in texts.items():
        pos = dict()
        for p, tok in standard_tokenize(t):
            pos.setdefault(tok, set()).add(p)
        if any(p + 1 in pos.get("dog", ()) for p in pos.get("fast", ())):
            expect.add(d)
    assert set(got["doc_id"]) == expect


def test_unknown_and_stopword_queries(index):
    searcher, _ = index
    assert searcher.search(["zzzznotaword"], k=10).count() == 0
    assert searcher.search("the of", k=10).count() == 0
    assert searcher.count(["fast"]) > 0


def test_dedup_keeps_latest(spark, tmp_path):
    pages = spark.createDataFrame(
        [
            ("u1", "old text cat", 1),
            ("u1", "new text dog", 2),
            ("u2", "bird", 1),
        ],
        "url string, text string, warc_ts long",
    )
    paths = build_index(spark, pages, str(tmp_path / "idx2"), ts_col="warc_ts")
    s = Searcher(spark, paths)
    assert s.stats.max_doc == 2
    assert s.count(["dog"]) == 1
    assert s.count(["cat"]) == 0


def test_dense_ids_deterministic_across_parallelism(spark):
    data = [(f"k{i:05d}",) for i in range(777)]
    df = spark.createDataFrame(data, "url string")
    a = assign_dense_ids(df, "url", num_partitions=2).orderBy("url").toPandas()
    b = assign_dense_ids(df, "url", num_partitions=16).orderBy("url").toPandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist() == list(range(777))


def test_fetch_docs_stored_fields(spark, index):
    searcher, texts = index
    hits = searcher.search(["fast"], k=5)
    source = searcher.docs.select("url").withColumn(
        "site", F.regexp_extract("url", r"https://(site\d+)", 1)
    )
    fetched = searcher.fetch_docs(hits, source).toPandas()
    assert len(fetched) == hits.count()
    assert set(fetched.columns) >= {"doc_id", "score", "url", "site"}
    assert fetched["url"].str.startswith("https://").all()


def test_facet_field_over_matches(spark, index):
    searcher, texts = index
    from lucene_solr_spark.analysis.analyzer import standard_tokenize

    source = searcher.docs.select("url").withColumn(
        "site", F.regexp_extract("url", r"https://(site\d+)", 1)
    )
    got = searcher.facet_field(["fast"], source, "site", limit=100).toPandas()
    # oracle: count matching docs per site
    urls = sorted({u for u in searcher.docs.toPandas()["url"]})
    expect: dict[str, int] = {}
    for i, u in enumerate(urls):
        if "fast" in {t for _, t in standard_tokenize(texts[i])}:
            site = u.split("//")[1].split(".")[0]
            expect[site] = expect.get(site, 0) + 1
    got_map = dict(zip(got["site"], got["facet_count"]))
    assert got_map == expect
    # ordering: count desc, value asc
    pairs = list(zip(-got["facet_count"], got["site"]))
    assert pairs == sorted(pairs)


def test_multiterm_rewrites(spark, index):
    searcher, texts = index
    from lucene_solr_spark.analysis.analyzer import standard_tokenize

    vocab_in_docs = {t for txt in texts.values() for _, t in standard_tokenize(txt)}

    # prefix: all docs containing a term starting with 'b' (bird)
    got = searcher.prefix_search("b", k=1000).toPandas()
    expect = {
        d for d, txt in texts.items()
        if any(t.startswith("b") for _, t in standard_tokenize(txt))
    }
    assert set(got["doc_id"]) == expect

    # wildcard ?at → cat
    got_w = searcher.wildcard_search("?at", k=1000).toPandas()
    expect_w = {
        d for d, txt in texts.items()
        if "cat" in {t for _, t in standard_tokenize(txt)}
    }
    assert set(got_w["doc_id"]) == expect_w

    # fuzzy 'spork' ≤1 → spark? lev(spark, spork)=1
    got_f = searcher.fuzzy_search("spork", max_edits=1, k=1000).toPandas()
    expect_f = {
        d for d, txt in texts.items()
        if "spark" in {t for _, t in standard_tokenize(txt)}
    }
    assert set(got_f["doc_id"]) == expect_f

    # range [cat, dog) → cat only (vocab: bird, cat, dog, fast, index...)
    in_range = {t for t in vocab_in_docs if "cat" <= t < "dog"}
    got_r = searcher.range_search("cat", "dog", k=1000).toPandas()
    expect_r = {
        d for d, txt in texts.items()
        if in_range & {t for _, t in standard_tokenize(txt)}
    }
    assert set(got_r["doc_id"]) == expect_r

    # no match → empty
    assert searcher.prefix_search("zzz", k=10).count() == 0

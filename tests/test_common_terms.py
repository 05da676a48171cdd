"""CommonTermsQuery (lucene/queries/.../CommonTermsQuery.java): engine vs a
numpy oracle that reproduces the reference's rewrite rules — df-based
high/low classification, ReqOptSum mixed query, all-high conjunction
rewrite, low-freq minimumNumberShouldMatch."""

from __future__ import annotations

import math

import numpy as np
import pytest

from lucene_solr_spark.analysis.analyzer import standard_tokenize
from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.index.norms import encode_norm
from lucene_solr_spark.query.bm25 import BM25Stats, bm25_score
from lucene_solr_spark.query.executor import Searcher

# 'web' df=10/12 and 'page' df=8/12 are the common terms at mtf=0.5
# (cutoff df > ceil(0.5*12) = 6); the rest are low-frequency.
CORPUS = {
    f"u{i:02d}": txt
    for i, txt in enumerate(
        [
            "web page crawler index fast",
            "web page ranking spark",
            "web page spark merge",
            "web page merge crawler",
            "web page index shard",
            "web page shard spark web",
            "web page fast fast web web",
            "web page ranking merge",
            "web crawler token",
            "web token shard",
            "page spark ranking ranking",
            "token merge index",
        ]
    )
}


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    pages = spark.createDataFrame(list(CORPUS.items()), "url string, text string")
    paths = build_index(
        spark, pages, str(tmp_path_factory.mktemp("ct_idx") / "idx"), num_segments=2
    )
    return Searcher(spark, paths)


def _doc_of(searcher):
    m = searcher.docs.select("doc_id", "url").toPandas()
    return dict(zip(m["url"], m["doc_id"]))


def _oracle(
    query_terms,
    max_term_frequency=0.5,
    low_freq_occur="should",
    high_freq_occur="should",
    min_should_match=0.0,
    k=10,
):
    """CommonTermsQuery.buildQuery re-derived in numpy over CORPUS, keyed by
    url; scores float32 like ReqOptSumScorer (per-subquery double sums cast
    to float32, then float32 add)."""
    urls = sorted(CORPUS)
    token_lists = [[t for _, t in standard_tokenize(CORPUS[u])] for u in urls]
    doc_len = np.array([len(t) for t in token_lists], dtype=np.int64)
    stats = BM25Stats(max_doc=len(urls), sum_total_term_freq=int(doc_len.sum()))
    norm_bytes = encode_norm(doc_len)

    uniq = list(dict.fromkeys(query_terms))
    df_of = {}
    tf_of = {}
    for t in uniq:
        tf = np.array([toks.count(t) for toks in token_lists], dtype=np.int64)
        if tf.sum() > 0:
            tf_of[t] = tf
            df_of[t] = int((tf > 0).sum())
    cut = math.ceil(float(np.float32(max_term_frequency) * np.float32(stats.max_doc)))
    high = [
        t
        for t in uniq
        if t in df_of
        and (
            (max_term_frequency >= 1.0 and df_of[t] > max_term_frequency)
            or df_of[t] > cut
        )
    ]
    low = [t for t in uniq if t not in high]
    low_present = [t for t in low if t in df_of]

    def side(terms):
        total = np.zeros(len(urls), dtype=np.float64)
        n = np.zeros(len(urls), dtype=np.int64)
        for t in terms:
            if t not in df_of:
                continue
            c = bm25_score(tf_of[t], df_of[t], norm_bytes, stats)
            c = np.where(tf_of[t] > 0, c.astype(np.float64), 0.0)
            total += c
            n += (tf_of[t] > 0).astype(np.int64)
        return total.astype(np.float32), n

    if min_should_match >= 1.0 or min_should_match == 0.0:
        mm = int(min_should_match)
    else:
        mm = int(math.floor(min_should_match * len(low) + 0.5))

    if not low:
        hs, hn = side(high)
        match = hn == len(high)
        score = hs
    elif not high:
        ls, ln = side(low)
        if low_freq_occur == "must":
            match = ln == len(low) if len(low_present) == len(low) else ln < 0
        else:
            match = ln >= max(1, mm)
        score = ls
    else:
        if low_freq_occur == "must" and len(low_present) < len(low):
            return []
        ls, ln = side(low_present)
        hs, hn = side(high)
        if low_freq_occur == "must":
            match = ln == len(low_present)
        else:
            match = ln >= max(1, mm)
        opt = np.where(hn == len(high), hs, np.float32(0.0)) if high_freq_occur == "must" else hs
        score = (ls + opt).astype(np.float32)

    hits = [(urls[i], float(score[i])) for i in np.nonzero(match)[0]]
    hits.sort(key=lambda x: (-x[1], x[0]))
    return hits[:k]


def _got(searcher, hits):
    doc_of = _doc_of(searcher)
    url_of = {v: k for k, v in doc_of.items()}
    return [(url_of[r.doc_id], r.score) for r in hits.collect()]


def _check(searcher, terms, **kw):
    got = _got(searcher, searcher.common_terms_search(terms, **kw))
    want = _oracle(terms, **kw)
    assert [u for u, _ in got] == [u for u, _ in want]
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in want], rtol=2e-6
    )


def test_mixed_should_should(searcher):
    # common 'web','page' top up docs matched by low 'crawler','spark'
    _check(searcher, ["web", "page", "crawler", "spark"], max_term_frequency=0.5)


def test_common_terms_never_drive_matching(searcher):
    got = _got(searcher, searcher.common_terms_search(
        ["web", "page", "crawler"], max_term_frequency=0.5, k=20))
    # u05/u06/u07 etc. contain web+page but no low term -> must NOT match
    toks = {u: [t for _, t in standard_tokenize(x)] for u, x in CORPUS.items()}
    assert all("crawler" in toks[u] for u, _ in got)


def test_low_freq_must(searcher):
    _check(searcher, ["web", "crawler", "token"],
           max_term_frequency=0.5, low_freq_occur="must")


def test_high_freq_must(searcher):
    # high side contributes only where BOTH web and page appear
    _check(searcher, ["web", "page", "token"],
           max_term_frequency=0.5, high_freq_occur="must")


def test_all_high_rewrites_to_conjunction(searcher):
    got = _got(searcher, searcher.common_terms_search(
        ["web", "page"], max_term_frequency=0.5, k=20))
    want = _oracle(["web", "page"], max_term_frequency=0.5, k=20)
    assert [u for u, _ in got] == [u for u, _ in want]
    toks = {u: [t for _, t in standard_tokenize(x)] for u, x in CORPUS.items()}
    assert all("web" in toks[u] and "page" in toks[u] for u, _ in got)


def test_missing_low_term_must_is_empty(searcher):
    hits = searcher.common_terms_search(
        ["web", "page", "zzznope"], max_term_frequency=0.5, low_freq_occur="must"
    )
    assert hits.count() == 0


def test_missing_low_term_should_still_matches(searcher):
    _check(searcher, ["web", "page", "crawler", "zzznope"], max_term_frequency=0.5)


def test_min_should_match_fraction(searcher):
    # 3 low clauses, mm=0.5 -> round(1.5)=2 required low matches
    _check(searcher, ["web", "crawler", "spark", "merge"],
           max_term_frequency=0.5, min_should_match=0.5)


def test_absolute_threshold(searcher):
    # mtf=6 absolute: high iff df > 6
    _check(searcher, ["web", "page", "merge"], max_term_frequency=6.0)


def test_single_term_rewrites_to_term_query(searcher):
    got = _got(searcher, searcher.common_terms_search(["crawler"], max_term_frequency=0.5))
    want = _got(searcher, searcher.search(["crawler"]))
    assert got == want

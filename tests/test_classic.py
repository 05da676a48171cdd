"""DefaultSimilarity (classic TF-IDF) — engine vs float32 numpy oracle.

The reference's unconfigured-core default scorer (DefaultSimilarity.java);
score- and rank-identity checked end-to-end through build_index + Searcher
against brute_force_topk_classic over the raw texts.
"""

import numpy as np
import pytest

from lucene_solr_spark.query.classic import (
    brute_force_topk_classic,
    classic_idf,
    classic_term_values,
)
from tests.test_index_e2e import make_corpus


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher

    corpus = make_corpus(n=140, seed=21)
    rows = [(u, t, 1000) for u, t in corpus.items()]
    pages = spark.createDataFrame(rows, "url string, text string, warc_ts long")
    out = str(tmp_path_factory.mktemp("classic_idx"))
    paths = build_index(spark, pages, out, num_segments=2, positions=False)
    searcher = Searcher(spark, paths)
    texts = {
        r.doc_id: corpus[r.url]
        for r in searcher.docs.select("doc_id", "url").collect()
    }
    return searcher, texts


def test_idf_formula():
    # ln(100/(4+1)) + 1, float32
    assert classic_idf(4, 100) == np.float32(np.log(100 / 5.0) + 1.0)


def test_values_include_absent_terms():
    v1 = classic_term_values(["a"], {"a": 3}, 100)
    v2 = classic_term_values(["a", "zzz"], {"a": 3}, 100)
    # absent term contributes idf=ln(n)+1 to queryNorm → 'a' value shrinks
    assert v2["a"] < v1["a"]
    assert v2["zzz"] > 0


@pytest.mark.parametrize(
    "terms",
    [["fast"], ["fast", "dog"], ["fast", "dog", "cat"], ["spark", "zzznope"]],
)
def test_classic_topk_matches_oracle(index, terms):
    searcher, texts = index
    got = searcher.search_classic(terms, k=10).toPandas()
    want = brute_force_topk_classic(texts, terms, k=10)
    assert list(got["doc_id"]) == [d for d, _ in want]
    assert [np.float32(s) for s in got["score"]] == [
        np.float32(s) for _, s in want
    ]


def test_classic_and_bm25_rank_differently_sometimes(index):
    # sanity: it is a genuinely different scorer over the same index
    searcher, _ = index
    c = searcher.search_classic(["fast", "dog"], k=10).toPandas()
    b = searcher.search(["fast", "dog"], k=10).toPandas()
    assert not np.allclose(c["score"].to_numpy(), b["score"].to_numpy())

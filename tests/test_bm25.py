"""BM25 golden-value tests, mirroring TestSimilarityBase.correctnessTestCore
(reference TestSimilarityBase.java:185-201): exact float32 scores for
hand-computed statistics, plus invariants."""

import numpy as np

from lucene_solr_spark.query.bm25 import (
    BM25Stats,
    bm25_idf,
    bm25_score,
    brute_force_topk,
)
from lucene_solr_spark.index.norms import encode_norm


def test_idf_formula():
    # idf = ln(1 + (N - df + 0.5)/(df + 0.5)), N=maxDoc (BM25Similarity.java:64-67)
    assert bm25_idf(2, 3) == np.float32(np.log(1.6))
    assert bm25_idf(1, 1) == np.float32(np.log(1 + 0.5 / 1.5))


def test_hand_computed_scores():
    # corpus: doc0="fast cat"(len 2), doc1="fast fast dog"(len 3), doc2="slow dog"(len 2)
    # N=3, sumttf=7, avgdl=7/3; quantized lens: 2→2.56, 3→4.0
    stats = BM25Stats(max_doc=3, sum_total_term_freq=7)
    norms = encode_norm(np.array([2, 3, 2]))
    tf = np.array([1, 2, 0])
    scores = bm25_score(tf, df=2, norm_bytes=norms, stats=stats)
    # hand-derived (float32): weight = ln(1.6)*2.2 = 1.0340080
    # doc0: 1.0340080*1/(1+1.2*(0.25+0.75*2.56/2.3333333)) = 0.452039
    # doc1: 1.0340080*2/(2+1.2*(0.25+0.75*4.0 /2.3333333)) = 0.538144
    assert abs(float(scores[0]) - 0.452039) < 1e-5
    assert abs(float(scores[1]) - 0.538144) < 1e-5


def test_brute_force_topk_rank_and_tiebreak():
    texts = {
        0: "fast cat",
        1: "fast fast dog",
        2: "slow dog",
        3: "fast cat",  # identical to doc0 → identical score → docID asc tie-break
    }
    top = brute_force_topk(texts, ["fast"], k=10)
    ids = [d for d, _ in top]
    assert ids[0] == 1  # tf=2 wins
    assert ids.index(0) < ids.index(3)  # tie broken by docID asc
    assert 2 not in ids  # non-matching doc excluded


def test_multi_term_sums():
    texts = {0: "fast cat", 1: "fast dog", 2: "slow dog"}
    single_f = dict(brute_force_topk(texts, ["fast"], k=10))
    single_d = dict(brute_force_topk(texts, ["dog"], k=10))
    both = dict(brute_force_topk(texts, ["fast", "dog"], k=10))
    assert abs(both[1] - np.float32(np.float32(single_f[1]) + np.float32(single_d[1]))) < 1e-7
    assert set(both) == {0, 1, 2}


def test_stopword_only_query_matches_nothing():
    texts = {0: "the fast cat"}
    # 'the' never enters the index (stop-filtered at index time); a query for
    # it yields df=0 → no matches
    assert brute_force_topk(texts, ["the"], k=10) == []


def test_scores_finite_and_positive():
    rng = np.random.RandomState(42)
    texts = {
        i: " ".join(rng.choice(["fast", "slow", "cat", "dog", "bird"], size=rng.randint(1, 50)))
        for i in range(200)
    }
    top = brute_force_topk(texts, ["fast", "bird"], k=50)
    assert all(np.isfinite(s) and s > 0 for _, s in top)
    scores = [s for _, s in top]
    assert scores == sorted(scores, reverse=True)

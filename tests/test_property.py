"""Property-based tests (hypothesis) for the pure kernels — the analog of
the reference's randomized LuceneTestCase strategy (checkRandomData,
BasePostingsFormatTestCase random round-trips, SmallFloat exhaustive checks).
No SparkSession needed: these cover the numpy/python kernels the Spark jobs
call into."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_spark.analysis.analyzer import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    standard_tokenize,
)
from lucene_solr_spark.index.merge import SegmentInfo, plan_merges
from lucene_solr_spark.index.norms import (
    byte315_to_float,
    decode_norm_doclen,
    encode_norm,
    float_to_byte315,
)
from lucene_solr_spark.query.bm25 import BM25Stats, bm25_score, brute_force_topk


# --- byte315 norms ----------------------------------------------------------
def test_byte315_roundtrip_idempotent_exhaustive():
    """decode(encode(decode(b))) == decode(b) for all 256 bytes — the codec
    must be a projection (SmallFloat.java:78-98)."""
    bs = np.arange(256)
    f = byte315_to_float(bs)
    again = float_to_byte315(f)
    np.testing.assert_array_equal(again, bs)


@given(st.integers(min_value=1, max_value=10**9))
@settings(max_examples=300)
def test_encode_norm_monotone_and_bounded(n):
    b = int(encode_norm(np.array([n]))[0])
    assert 0 <= b <= 255
    # longer docs never get a LARGER byte (1/sqrt decreasing)
    b2 = int(encode_norm(np.array([n + 1]))[0])
    assert b2 <= b
    # byte315 TRUNCATES 1/sqrt(len) down to 2 explicit mantissa bits →
    # decoded length is biased UP by at most (1 + 1/4)^2 = 56.25% and never
    # (beyond float fuzz) below the true length
    dec = float(decode_norm_doclen(np.array([b]))[0])
    assert n * 0.999 <= dec <= n * 1.5625 * 1.001


# --- posting delta round-trip ----------------------------------------------
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500, unique=True
    )
)
@settings(max_examples=200)
def test_delta_roundtrip(doc_ids):
    docs = np.array(sorted(doc_ids), dtype=np.int64)
    gaps = np.empty_like(docs)
    gaps[0] = 0
    gaps[1:] = np.diff(docs)  # what _pack_group stores
    back = docs[0] + np.cumsum(gaps)  # what the query kernel reconstructs
    np.testing.assert_array_equal(back, docs)


# --- tokenizer invariants ---------------------------------------------------
@given(st.text(max_size=300))
@settings(max_examples=300)
def test_tokenizer_invariants(text):
    out = standard_tokenize(text)
    positions = [p for p, _ in out]
    toks = [t for _, t in out]
    assert positions == sorted(positions)  # strictly ordered
    assert len(set(positions)) == len(positions)
    for t in toks:
        assert t, "no empty tokens"
        assert t not in ENGLISH_STOP_WORDS
        assert len(t) <= MAX_TOKEN_LENGTH
        assert t == t.lower() or not t.isascii()  # ascii fully lowercased


@given(st.text(max_size=200))
@settings(max_examples=200)
def test_tokenizer_deterministic_and_concat_stable(text):
    a = standard_tokenize(text)
    assert a == standard_tokenize(text)
    # tokenizing "x y" where x,y have no boundary-joinable chars keeps tokens
    both = standard_tokenize(text + " zzqq")
    assert [t for _, t in both][-1:] == ["zzqq"] or text.endswith(
        tuple("'’.")
    ) or not text  # a trailing joiner may merge — allowed by UAX#29 MidLet rules


# --- BM25 kernel properties --------------------------------------------------
@given(
    st.integers(min_value=1, max_value=1000),  # tf
    st.integers(min_value=1, max_value=10**6),  # df
    st.integers(min_value=0, max_value=255),
)
@settings(max_examples=300)
def test_bm25_score_finite_positive_monotone_tf(tf, df, nb):
    stats = BM25Stats(max_doc=10**6, sum_total_term_freq=25 * 10**6)
    df = min(df, stats.max_doc)
    s1 = float(bm25_score(np.array([tf]), df, np.array([nb]), stats)[0])
    s2 = float(bm25_score(np.array([tf + 1]), df, np.array([nb]), stats)[0])
    assert np.isfinite(s1) and s1 >= 0
    assert s2 >= s1  # monotone in tf (BM25 saturation is monotone)


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_brute_force_topk_ordering_invariant(data):
    vocab = ["aa", "bb", "cc", "dd", "the"]
    n = data.draw(st.integers(min_value=1, max_value=25))
    texts = {
        i: " ".join(
            data.draw(
                st.lists(st.sampled_from(vocab), min_size=0, max_size=30)
            )
        )
        for i in range(n)
    }
    res = brute_force_topk(texts, ["aa", "bb"], k=10)
    scores = [s for _, s in res]
    assert scores == sorted(scores, reverse=True)
    # tie-break: equal scores ordered by docID asc
    for (d1, s1), (d2, s2) in zip(res, res[1:]):
        if s1 == s2:
            assert d1 < d2


# --- merge planning properties ----------------------------------------------
@given(
    st.lists(
        st.integers(min_value=0, max_value=10**10), min_size=0, max_size=40
    )
)
@settings(max_examples=200)
def test_plan_merges_well_formed(sizes):
    segs = [SegmentInfo(i, s) for i, s in enumerate(sizes)]
    plans = plan_merges(segs)
    seen = set()
    for p in plans:
        assert 2 <= len(p.seg_ids) <= 10
        assert p.merged_bytes <= 5 << 30
        for sid in p.seg_ids:
            assert sid not in seen  # disjoint merges
            seen.add(sid)


def test_sloppy_freq_2slot_vectorized_equals_pq_loop():
    """The vectorized 2-slot sloppyFreq must be value-identical to the
    PQ leap-frog (SloppyPhraseScorer semantics) on arbitrary inputs."""
    import numpy as np

    from lucene_solr_spark.query.executor import Searcher

    rng = np.random.default_rng(7)
    for trial in range(500):
        na, nb = rng.integers(1, 12, size=2)
        lo, hi = -3, 40  # offset-adjusted positions can be negative
        a = np.sort(rng.choice(np.arange(lo, hi), size=na, replace=False))
        b = np.sort(rng.choice(np.arange(lo, hi), size=nb, replace=False))
        slop = int(rng.integers(1, 8))
        want = Searcher._sloppy_freq([a.astype(np.int64), b.astype(np.int64)], slop)
        got = Searcher._sloppy_freq_2(a.astype(np.int64), b.astype(np.int64), slop)
        assert abs(want - got) < 1e-12, (a.tolist(), b.tolist(), slop, want, got)


def test_sloppy_freq_kslot_vectorized_equals_pq_loop():
    """The vectorized k-slot sloppyFreq (round 4) must be value-identical
    to the PQ leap-frog on tie-free inputs, and must return None (caller
    falls back to the loop) whenever two lists share an adjusted position."""
    import numpy as np

    from lucene_solr_spark.query.executor import Searcher

    rng = np.random.default_rng(11)
    vec_checked = tie_checked = 0
    for trial in range(800):
        k = int(rng.integers(3, 6))
        npos = int(rng.integers(k, 36))
        allpos = rng.choice(np.arange(-3, 120), size=npos, replace=False)
        cuts = np.sort(rng.choice(np.arange(1, npos), size=k - 1, replace=False)) if npos > k else np.arange(1, k)
        arrs = [np.sort(a.astype(np.int64)) for a in np.split(allpos, cuts) if len(a)]
        if len(arrs) < 3:
            continue
        slop = int(rng.integers(0, 20))
        want = Searcher._sloppy_freq(arrs, slop)
        got = Searcher._sloppy_freq_k(arrs, slop)
        assert got is not None  # distinct positions → vectorized path
        assert abs(want - got) < 1e-12, ([a.tolist() for a in arrs], slop, want, got)
        vec_checked += 1
        # force a cross-list tie → must decline so the exact loop runs
        tied = [a.copy() for a in arrs]
        tied[1][0] = tied[0][0]
        tied[1].sort()
        if len(np.unique(tied[1])) == len(tied[1]):
            assert Searcher._sloppy_freq_k(tied, slop) is None
            tie_checked += 1
    assert vec_checked > 300 and tie_checked > 300


def test_sloppy_phrase_3slot_e2e(spark, tmp_path):
    """3- and 4-slot sloppy phrases through the REAL index + kernels
    (vectorized path + tie fallback) vs a brute-force window oracle."""
    import itertools

    import numpy as np

    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher

    texts = {
        # repeated terms at phrase-compatible distances → adjusted-position
        # ties exercise the PQ fallback inside the kernel
        "u1": "alpha beta gamma delta alpha beta gamma",
        "u2": "alpha x beta y gamma z delta",
        "u3": "gamma beta alpha delta gamma beta alpha",
        "u4": "alpha alpha beta beta gamma gamma delta",
        "u5": "x y z alpha q beta w gamma",
        "u6": "beta gamma delta",
    }
    pages = spark.createDataFrame(
        [(u, t) for u, t in texts.items()], "url string, text string"
    )
    paths = build_index(spark, pages, str(tmp_path / "sloppy3"))
    s = Searcher(spark, paths)

    def oracle_freq(tokens, phrase, slop):
        arrs = []
        for si, term in enumerate(phrase):
            pos = np.array([i - si for i, t in enumerate(tokens) if t == term], dtype=np.int64)
            if len(pos) == 0:
                return 0.0
            arrs.append(pos)
        return Searcher._sloppy_freq(arrs, slop)

    urls = sorted(texts)
    for phrase in (["alpha", "beta", "gamma"], ["alpha", "beta", "gamma", "delta"]):
        for slop in (0, 1, 2, 4):
            got = {
                int(r.doc_id) for r in s.phrase_search(phrase, k=100, slop=slop).collect()
            }
            want = {
                i for i, u in enumerate(urls)
                if oracle_freq(texts[u].split(), phrase, slop) > 0
            }
            assert got == want, (phrase, slop, got, want)

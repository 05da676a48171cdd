"""eDisMax across fields: engine vs per-field brute-force oracle
(DisjunctionMaxQuery.java:299 tie-break combine; per-field stats)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import standard_tokenize
from lucene_solr_spark.index.norms import encode_norm
from lucene_solr_spark.query.bm25 import BM25Stats, bm25_score
from lucene_solr_spark.query.dismax import DisMaxSearcher, build_multi_field_index

CORPUS = {
    "u00": "spark merge window agg fast merge",
    "u01": "merge spark",
    "u02": "window stream state store",
    "u03": "spark spark spark merge window",
    "u04": "agg fast stream",
    "u05": "spark window",
}
TITLE_LEN = 12  # first 12 chars as the second field


def field_texts():
    urls = sorted(CORPUS)
    text = {i: CORPUS[u] for i, u in enumerate(urls)}
    title = {i: t[:TITLE_LEN] for i, t in text.items()}
    return text, title


def brute_dismax(fields: dict[str, tuple[dict, float]], terms, tie, k=10):
    """fields: name -> (texts_by_docid, qf_boost)."""
    doc_ids = sorted(next(iter(fields.values()))[0])
    per_field_scores = {}
    for name, (texts, boost) in fields.items():
        toks = {d: [t for _, t in standard_tokenize(texts[d])] for d in doc_ids}
        dls = np.array([len(toks[d]) for d in doc_ids], dtype=np.int64)
        stats = BM25Stats(max_doc=len(doc_ids), sum_total_term_freq=int(dls.sum()))
        nbs = encode_norm(dls)
        b32 = np.float32(boost)
        out = {}
        for term in terms:
            tf = np.array([toks[d].count(term) for d in doc_ids], dtype=np.int64)
            df = int((tf > 0).sum())
            if df == 0:
                continue
            s = bm25_score(tf, df, nbs, stats)
            s = np.where(tf > 0, (s * b32).astype(np.float32), np.float32(0))
            out[term] = s
        per_field_scores[name] = out

    total = np.zeros(len(doc_ids), dtype=np.float64)
    matched = np.zeros(len(doc_ids), dtype=bool)
    tie32 = np.float32(tie)
    for term in terms:
        cols = [
            per_field_scores[f][term]
            for f in fields
            if term in per_field_scores[f]
        ]
        if not cols:
            continue
        m = np.stack(cols)  # (n_fields, n_docs) float32
        mx = m.max(axis=0).astype(np.float64)
        sm = m.astype(np.float64).sum(axis=0)
        ts = (mx + float(tie32) * (sm - mx)).astype(np.float32)
        hit = (m > 0).any(axis=0)
        total += np.where(hit, ts.astype(np.float64), 0.0)
        matched |= hit
    total32 = total.astype(np.float32)
    idx = np.nonzero(matched)[0]
    order = sorted(idx, key=lambda i: (-float(total32[i]), int(doc_ids[i])))
    return [(int(doc_ids[i]), float(total32[i])) for i in order[:k]]


@pytest.fixture(scope="module")
def mf_index(spark, tmp_path_factory):
    pages = spark.createDataFrame(list(CORPUS.items()), "url string, text string")
    out = str(tmp_path_factory.mktemp("mf_idx"))
    build_multi_field_index(
        spark,
        pages,
        out,
        field_exprs={
            "text": F.col("text"),
            "title": F.substring("text", 1, TITLE_LEN),
        },
    )
    return DisMaxSearcher(spark, out)


def test_fields_discovered(mf_index):
    assert mf_index.fields == ["text", "title"]


@pytest.mark.parametrize("tie", [0.0, 0.3])
def test_dismax_rank_and_scores(mf_index, tie):
    text, title = field_texts()
    terms = ["spark", "merge"]
    qf = {"text": 1.0, "title": 4.0}
    got = mf_index.dismax_search(terms, qf=qf, tie=tie, k=10).toPandas()
    exp = brute_dismax(
        {"text": (text, 1.0), "title": (title, 4.0)}, terms, tie
    )
    assert got["doc_id"].tolist() == [d for d, _ in exp]
    np.testing.assert_allclose(
        got["score"].values, [x for _, x in exp], rtol=2e-6
    )


def test_dismax_mm(mf_index):
    # mm=2 keeps only docs covering both terms in some field
    got = mf_index.dismax_search(
        ["spark", "stream"], qf={"text": 1.0, "title": 1.0}, mm=2, k=10
    ).toPandas()
    text, _ = field_texts()
    exp_docs = {
        d
        for d, t in text.items()
        if "spark" in t.split() and "stream" in t.split()
    }
    assert set(got["doc_id"]) == exp_docs


def test_dismax_pf_phrase_boost(mf_index):
    base = mf_index.dismax_search(
        ["merge", "spark"], qf={"text": 1.0}, k=10
    ).toPandas()
    boosted = mf_index.dismax_search(
        ["merge", "spark"], qf={"text": 1.0}, pf={"text": 5.0}, k=10
    ).toPandas()
    # doc 1 = "merge spark" (exact phrase) must gain score
    b = dict(zip(base["doc_id"], base["score"]))
    p = dict(zip(boosted["doc_id"], boosted["score"]))
    assert p[1] > b[1]
    # non-phrase docs keep their base score
    no_phrase = [d for d in b if d != 1 and d in p]
    for d in no_phrase:
        if "merge spark" not in field_texts()[0][d]:
            assert p[d] == pytest.approx(b[d], rel=1e-6)


def test_dismax_bq_bf_additive(mf_index, spark):
    """bq/bf (DisMaxQParser.java:136-148): additive boosts on top of the
    main dismax score; the match set is unchanged."""
    terms, tie = ["spark", "merge"], 0.3
    qf = {"text": 1.0, "title": 3.0}
    base = {
        r.doc_id: r.score for r in mf_index.dismax_search(terms, qf=qf, tie=tie, k=100).collect()
    }
    fast = {
        r.doc_id: r.score
        for r in mf_index.searchers["text"].search(["fast"], k=100).collect()
    }
    bf = spark.createDataFrame(
        [(d, 0.01 * d) for d in range(len(CORPUS))], "doc_id long, bf double"
    )
    got = {
        r.doc_id: r.score
        for r in mf_index.dismax_search(
            terms, qf=qf, tie=tie, k=100, bq=[("text", ["fast"], 0.5)], bf=bf
        ).collect()
    }
    assert set(got) == set(base)  # boosts never change the match set
    for d, s in got.items():
        expected = base[d] + 0.5 * fast.get(d, 0.0) + 0.01 * d
        assert abs(s - expected) < 1e-5, (d, s, expected)


def test_fielded_classic_query(mf_index):
    """field:term addresses any field of the multi-field index
    (QueryParserBase.java:494-790 field-generic parse)."""
    texts, titles = field_texts()

    def tok(s):
        return [t for _, t in standard_tokenize(s)]

    got = {r.doc_id for r in mf_index.query("title:spark", k=100).collect()}
    assert got == {d for d, t in titles.items() if "spark" in tok(t)}

    got = {r.doc_id for r in mf_index.query("title:spark AND text:window", k=100).collect()}
    expect = {
        d
        for d in texts
        if "spark" in tok(titles[d]) and "window" in tok(texts[d])
    }
    assert got == expect

    # default field is text; prohibit on a fielded clause
    got = {r.doc_id for r in mf_index.query("window -title:spark", k=100).collect()}
    expect = {
        d
        for d in texts
        if "window" in tok(texts[d]) and "spark" not in tok(titles[d])
    }
    assert got == expect

    # fielded prefix (MultiTermQuery rewrite against that field's dictionary)
    got = {r.doc_id for r in mf_index.query("title:stre*", k=100).collect()}
    expect = {
        d for d in texts if any(t.startswith("stre") for t in tok(titles[d]))
    }
    assert got == expect


def test_dismax_pf2_bigram_boost(mf_index):
    """pf2 (ExtendedDismaxQParser addShingledPhraseQueries): every
    consecutive bigram of the user terms is an extra SHOULD phrase clause."""
    q = ["spark", "merge", "window"]
    base = mf_index.dismax_search(q, qf={"text": 1.0}, k=10).toPandas()
    b2 = mf_index.dismax_search(q, qf={"text": 1.0}, pf2={"text": 4.0}, k=10).toPandas()
    b = dict(zip(base["doc_id"], base["score"]))
    p = dict(zip(b2["doc_id"], b2["score"]))
    # doc 0 "spark merge window agg fast merge": both bigrams present
    # doc 3 "spark spark spark merge window": "spark merge" + "merge window"
    # doc 1 "merge spark": NEITHER query bigram ("spark merge" reversed)
    assert p[0] > b[0] and p[3] > b[3]
    assert p[1] == pytest.approx(b[1], rel=1e-6)
    # whole-phrase pf: docs 0 and 3 contain the contiguous trigram
    # "spark merge window"; doc 5 "spark window" does not
    b3 = mf_index.dismax_search(q, qf={"text": 1.0}, pf={"text": 4.0}, k=10).toPandas()
    f = dict(zip(b3["doc_id"], b3["score"]))
    assert f[0] > b[0] and f[3] > b[3]
    assert f[5] == pytest.approx(b[5], rel=1e-6)
    # pf3 on a 3-term query == pf (single trigram shingle)
    b3b = mf_index.dismax_search(q, qf={"text": 1.0}, pf3={"text": 4.0}, k=10).toPandas()
    f3 = dict(zip(b3b["doc_id"], b3b["score"]))
    for d in f:
        assert f3[d] == pytest.approx(f[d], rel=1e-6)


def test_dismax_ps_slop(mf_index):
    """ps: whole-phrase slop. 'spark window' is exact in doc 5, and within
    slop 2 of doc 0's 'spark merge window'."""
    q = ["spark", "window"]
    exact = mf_index.dismax_search(q, qf={"text": 1.0}, pf={"text": 4.0}, k=10).toPandas()
    slop = mf_index.dismax_search(
        q, qf={"text": 1.0}, pf={"text": 4.0}, ps=2, k=10
    ).toPandas()
    e = dict(zip(exact["doc_id"], exact["score"]))
    s = dict(zip(slop["doc_id"], slop["score"]))
    # doc 0 gains only under slop (one intervening term)
    base = dict(zip(
        mf_index.dismax_search(q, qf={"text": 1.0}, k=10).toPandas()["doc_id"],
        mf_index.dismax_search(q, qf={"text": 1.0}, k=10).toPandas()["score"],
    ))
    assert e[0] == pytest.approx(base[0], rel=1e-6)
    assert s[0] > base[0]
    # the exact-phrase doc 5 gains in both
    assert e[5] > base[5] and s[5] > base[5]

"""Round-2 fixes: parser hyphen handling, NRT seg-id collision with bulk
segments, lineage-aware readers (merge crash safety), capped multi-term
rewrites, fq filtering, deletes, sloppy/multi phrase."""

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.build import IndexPaths, build_index
from lucene_solr_spark.index.deletes import delete_by_key, delete_by_term, purge_deletes
from lucene_solr_spark.query.bm25 import brute_force_topk
from lucene_solr_spark.query.executor import Searcher
from lucene_solr_spark.query.parser import MUST, MUST_NOT, SHOULD, parse
from lucene_solr_spark.streaming.nrt import append_segment


# --- parser ------------------------------------------------------------------
def test_hyphen_inside_word_is_not_prohibit():
    # a multi-token analysis wraps in ONE group clause (newFieldQuery
    # returns a BooleanQuery), so AND/+ see the split as a single neighbour
    clauses = parse("state-of-the-art")
    assert len(clauses) == 1 and clauses[0].occur == SHOULD
    assert clauses[0].kind == "group"
    terms = [c.terms[0] for c in clauses[0].children]
    assert terms == ["state", "art"]  # of/the are stopwords


def test_and_with_multi_token_word_promotes_left_operand():
    clauses = parse("x AND foo-bar")
    assert [(c.occur, c.kind) for c in clauses] == [
        (MUST, "term"),
        (MUST, "group"),
    ]
    assert [c.terms[0] for c in clauses[1].children] == ["foo", "bar"]


def test_leading_minus_still_prohibits():
    clauses = parse("fast -merge")
    assert [(c.occur, c.terms[0]) for c in clauses] == [
        (SHOULD, "fast"),
        (MUST_NOT, "merge"),
    ]


def test_plus_mid_word_flows_into_term():
    clauses = parse("c+ +fast")
    occurs = {(c.occur, c.terms[0]) for c in clauses}
    assert (MUST, "fast") in occurs
    assert all(o != MUST_NOT for o, _ in occurs)


# --- shared tiny index -------------------------------------------------------
CORPUS = {
    "u00": "spark merge fast dog cat",
    "u01": "fast spark spark merge",
    "u02": "dog bird cat walk run",
    "u03": "fast stone merge spark dog",
    "u04": "merge slow fast fast",
    "u05": "bird song spark merge fast dance",
    "u06": "fast merge dance",
}


@pytest.fixture()
def idx(spark, tmp_path):
    pages = spark.createDataFrame(list(CORPUS.items()), "url string, text string")
    paths = build_index(spark, pages, str(tmp_path / "idx"), num_segments=2)
    return paths


def texts_by_docid():
    return {i: CORPUS[u] for i, u in enumerate(sorted(CORPUS))}


# --- NRT vs bulk segment ids -------------------------------------------------
def test_nrt_append_into_bulk_index_does_not_collide(spark, idx):
    # bulk build produced seg_ids 0 and 1; a streaming batch_id=0 must NOT be
    # treated as a replay of bulk segment 0
    batch = spark.createDataFrame(
        [("u90", "zebra spark quantum")], "url string, text string"
    )
    seg = append_segment(spark, batch, idx, batch_id=0)
    assert seg >= 2, "streaming batch collided with a bulk segment id"
    s = Searcher(spark, idx)
    assert s.stats.max_doc == len(CORPUS) + 1
    assert s.search(["zebra"], k=5).count() == 1
    # replaying the same batch_id is a no-op returning the same segment
    seg2 = append_segment(spark, batch, idx, batch_id=0)
    assert seg2 == seg
    assert Searcher(spark, idx).stats.max_doc == len(CORPUS) + 1


# --- lineage-aware reader (merge crash) --------------------------------------
def test_searcher_ignores_superseded_dirs(spark, idx):
    from lucene_solr_spark.index.merge import merge_segments

    s = Searcher(spark, idx)
    before = s.search(["spark", "merge"], k=10).toPandas()

    # simulate a crash: merge appends lineage + writes the new dir but the
    # source dirs survive (we restore them after the merge removed them)
    backup = {}
    for seg in (0, 1):
        d = os.path.join(idx.postings, f"seg_id={seg}")
        backup[seg] = os.path.join(idx.root, f"bak_seg{seg}")
        shutil.copytree(d, backup[seg])
    merge_segments(spark, idx, [0, 1])
    for seg, bak in backup.items():
        os.rename(bak, os.path.join(idx.postings, f"seg_id={seg}"))

    s2 = Searcher(spark, idx)
    after = s2.search(["spark", "merge"], k=10).toPandas()
    assert after["doc_id"].tolist() == before["doc_id"].tolist()
    np.testing.assert_allclose(after["score"].values, before["score"].values)


# --- fq / FilteredQuery ------------------------------------------------------
def test_filtered_query_restricts_results_not_stats(spark, idx):
    s = Searcher(spark, idx)
    full = s.search(["spark"], k=10).toPandas()
    keep = spark.createDataFrame([(0,), (3,)], "doc_id long")
    filt = s.search(["spark"], k=10, filter_docs=keep).toPandas()
    assert set(filt["doc_id"]) <= {0, 3}
    # scores of surviving docs unchanged (stats stay corpus-global)
    merged = filt.merge(full, on="doc_id", suffixes=("_f", ""))
    np.testing.assert_allclose(merged["score_f"].values, merged["score"].values)


def test_filter_cache_roundtrip(spark, idx):
    s = Searcher(spark, idx)
    docset = s.put_filter("even", s.docs.where(F.col("doc_id") % 2 == 0))
    hit = s.get_filter("even")
    assert hit is docset
    out = s.search(["fast"], k=10, filter_docs=hit).toPandas()
    assert all(d % 2 == 0 for d in out["doc_id"])


# --- deletes -----------------------------------------------------------------
def test_delete_by_key_hides_doc_and_purge_reclaims(spark, idx):
    s = Searcher(spark, idx)
    base = s.search(["spark"], k=10).toPandas()
    assert 0 in set(base["doc_id"])

    n = delete_by_key(spark, idx, ["u00"])  # doc_id 0
    assert n == 1
    s.reopen()
    vis = s.search(["spark"], k=10).toPandas()
    assert 0 not in set(vis["doc_id"])
    # stats unchanged pre-purge (Lucene: df/maxDoc include deleted docs)
    assert s.stats.max_doc == len(CORPUS)
    assert s.count(["spark"]) == len([t for t in CORPUS.values() if "spark" in t]) - 1

    purge_deletes(spark, idx)
    s.reopen()
    assert s.stats.max_doc == len(CORPUS) - 1
    # post-purge scores equal a fresh build over the surviving corpus
    texts = {i: t for i, t in texts_by_docid().items() if i != 0}
    got = s.search(["spark", "merge"], k=10).toPandas()
    exp = brute_force_topk(texts, ["spark", "merge"], k=10)
    assert got["doc_id"].tolist() == [d for d, _ in exp]
    np.testing.assert_allclose(
        got["score"].values, [x for _, x in exp], rtol=1e-6
    )


def test_delete_by_term_then_wand_agrees(spark, idx):
    delete_by_term(spark, idx, "bird")  # docs 2 and 5
    s = Searcher(spark, idx)
    exhaustive = s.search(["spark", "merge"], k=10).toPandas()
    assert set(exhaustive["doc_id"]).isdisjoint({2, 5})
    wand = s.search_wand(["spark", "merge"], k=10).toPandas()
    assert wand["doc_id"].tolist() == exhaustive["doc_id"].tolist()
    np.testing.assert_allclose(wand["score"].values, exhaustive["score"].values)


# --- sloppy phrase -----------------------------------------------------------
def test_sloppy_freq_goldens():
    f = Searcher._sloppy_freq
    # adjacent pair → matchLength 0 → 1/(0+1)
    assert f([np.array([0]), np.array([0])], 1) == 1.0
    # one intervening word → matchLength 1 → 1/2
    assert f([np.array([0]), np.array([1])], 1) == 0.5
    # reversed adjacent pair → matchLength 2 (needs slop ≥ 2) → 1/3
    assert f([np.array([1]), np.array([-1])], 2) == pytest.approx(1 / 3)
    assert f([np.array([1]), np.array([-1])], 1) == 0.0
    # two exact occurrences ("fast merge fast merge")
    assert f([np.array([0, 2]), np.array([0, 2])], 0) == 2.0


def test_sloppy_phrase_search(spark, idx):
    s = Searcher(spark, idx)
    exact = s.phrase_search(["fast", "merge"], k=10).toPandas()

    # matchLength per (fast,merge) occurrence pair = spread of the
    # offset-adjusted positions; a doc matches at slop s iff min ≤ s
    def min_ml(text):
        toks = text.split()
        pf = [i for i, t in enumerate(toks) if t == "fast"]
        pm = [i for i, t in enumerate(toks) if t == "merge"]
        if not pf or not pm:
            return None
        return min(abs((m - 1) - f) for f in pf for m in pm)

    texts = texts_by_docid()
    exact_docs = sorted(d for d, t in texts.items() if min_ml(t) == 0)
    assert sorted(exact["doc_id"]) == exact_docs

    slop2 = s.phrase_search(["fast", "merge"], k=10, slop=2).toPandas()
    slop2_docs = sorted(
        d for d, t in texts.items() if min_ml(t) is not None and min_ml(t) <= 2
    )
    assert sorted(slop2["doc_id"]) == slop2_docs
    # sloppier matching can only widen the doc set and raise freq
    assert set(exact["doc_id"]) <= set(slop2["doc_id"])


def test_multi_phrase_search(spark, idx):
    s = Searcher(spark, idx)
    # slot 2 alternatives: "spark (merge|stone)" — u03 has "stone merge", no;
    # "fast (stone|spark)": u01 "fast spark", u03 "fast stone"
    out = s.multi_phrase_search([["fast"], ["stone", "spark"]], k=10).toPandas()
    assert sorted(out["doc_id"]) == [1, 3]
    # unknown alternatives are dropped; a fully-unknown slot matches nothing
    assert s.multi_phrase_search([["fast"], ["zzz"]], k=10).count() == 0


# --- rewrite caps ------------------------------------------------------------
def test_prefix_rewrite_cap(spark, idx):
    s = Searcher(spark, idx)
    capped = s._rewrite_terms(F.col("term").like("s%"), max_expansions=2)
    assert len(capped) == 2
    # highest-df terms win (TopTermsRewrite)
    dfs = {r.term: r.df for r in s.terms.collect()}
    s_terms = sorted(
        (t for t in dfs if t.startswith("s")), key=lambda t: (-dfs[t], t)
    )
    assert capped == s_terms[:2]


def test_match_all_and_fuzzy(spark, idx):
    s = Searcher(spark, idx)
    assert s.count(["spark"]) == 4
    fz = s.fuzzy_search("spalk", max_edits=1, k=10).toPandas()
    assert len(fz) == 4  # matches 'spark' postings


def test_update_documents_replaces_live_version(spark, idx):
    from lucene_solr_spark.streaming.nrt import update_documents

    s = Searcher(spark, idx)
    before = s.search(["spark"], k=100).toPandas()
    assert 0 in set(before["doc_id"])  # u00 contains spark

    newer = spark.createDataFrame(
        [("u00", "updated text zebra only")], "url string, text string"
    )
    seg = update_documents(spark, newer, idx)
    assert seg >= 2
    s.reopen()
    after = s.search(["spark"], k=100).toPandas()
    assert 0 not in set(after["doc_id"])  # old version invisible
    z = s.search(["zebra"], k=10).toPandas()
    assert len(z) == 1  # new version searchable
    # the new doc got a fresh docID beyond the original corpus
    assert int(z["doc_id"].iloc[0]) >= len(CORPUS)


def test_dismax_qf_string_parse():
    from lucene_solr_spark.query.dismax import DisMaxSearcher

    assert DisMaxSearcher.parse_qf("text^1 title^3.5 body") == {
        "text": 1.0,
        "title": 3.5,
        "body": 1.0,
    }


def test_delete_then_compact_reclaims_inline(spark, idx):
    """Merge applies tombstones in the same pass (TermsConsumer.java:86-171):
    after delete -> compact, the merged postings no longer contain the
    deleted doc, purge skips the postings rewrite (digest marker), and the
    final index equals a fresh build of the survivors."""
    from lucene_solr_spark.index.merge import merge_segments

    delete_by_key(spark, idx, ["u00"])  # doc_id 0
    new_seg = merge_segments(spark, idx, [0, 1])

    seg_dir = os.path.join(idx.postings, f"seg_id={new_seg}")
    assert os.path.exists(os.path.join(seg_dir, "_deletes_applied.json"))
    # the merged segment physically excludes doc 0 BEFORE any purge
    decoded = spark.read.parquet(seg_dir).select("first_doc", "doc_gaps").toPandas()
    all_docs = set()
    for r in decoded.itertuples(index=False):
        all_docs.update((r.first_doc + np.cumsum(np.asarray(r.doc_gaps))).tolist())
    assert 0 not in all_docs and len(all_docs) == len(CORPUS) - 1

    # purge now skips the postings rewrite (same tombstone digest) and only
    # fixes docs/terms/stats; results equal a fresh build of the survivors
    import time as _t

    t0 = _t.time()
    reclaimed = purge_deletes(spark, idx)
    assert reclaimed == 1
    s = Searcher(spark, idx)
    assert s.stats.max_doc == len(CORPUS) - 1
    texts = {i: t for i, t in texts_by_docid().items() if i != 0}
    got = s.search(["spark", "merge"], k=10).toPandas()
    exp = brute_force_topk(texts, ["spark", "merge"], k=10)
    assert got["doc_id"].tolist() == [d for d, _ in exp]
    np.testing.assert_allclose(got["score"].values, [x for _, x in exp], rtol=1e-6)

"""Diagnostics surface: explain (debugQuery), Luke overview, field analysis.

explain must reproduce search()'s float32 scores exactly — it is the same
scoring math presented as an Explanation tree (IndexSearcher.explain,
BM25Similarity.java:244-278)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import field_analysis
from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.query.components import luke_overview
from lucene_solr_spark.query.executor import Searcher

VOCAB = ["fast", "slow", "cat", "dog", "bird", "spark", "index", "query", "the", "of"]


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    rng = np.random.RandomState(11)
    rows = []
    for i in range(150):
        words = rng.choice(VOCAB, size=rng.randint(3, 60))
        rows.append((f"https://d.example/{i:04d}", " ".join(words), 1000))
    pages = spark.createDataFrame(rows, "url string, text string, warc_ts long")
    out = str(tmp_path_factory.mktemp("dbgidx"))
    paths = build_index(spark, pages, out, ts_col="warc_ts", num_segments=2)
    return Searcher(spark, paths)


def test_explain_matches_search_scores(searcher):
    for query in (["spark"], ["spark", "index"], ["cat", "dog", "bird"]):
        hits = searcher.search(query, k=5).collect()
        assert hits
        for h in hits:
            ex = searcher.explain(query, h.doc_id)
            assert ex["match"] is True
            assert np.float32(ex["value"]) == np.float32(h.score), (
                query,
                h.doc_id,
                ex["value"],
                h.score,
            )
            # per-clause values are the scorer's float32 contributions;
            # each clause exposes idf and tfNorm whose product is the value
            for d in ex["details"]:
                idf = d["details"][0]["value"]
                tfn = d["details"][1]["value"]
                assert np.isclose(idf * tfn, d["value"], rtol=1e-6)


def test_explain_non_matching_doc(searcher):
    # a doc that has none of the query terms: match=False, value=0
    all_docs = set(
        r.doc_id for r in searcher.match_docs(["spark"]).collect()
    )
    missing = next(i for i in range(searcher.stats.max_doc) if i not in all_docs)
    ex = searcher.explain(["spark"], missing)
    assert ex["match"] is False and ex["value"] == 0.0 and ex["details"] == []


def test_explain_unknown_term(searcher):
    ex = searcher.explain(["zzzznotaterm"], 0)
    assert ex["match"] is False and ex["value"] == 0.0


def test_luke_overview(searcher):
    info = luke_overview(searcher, top_n=5)
    assert info["max_doc"] == searcher.stats.max_doc == info["num_docs"]
    assert info["num_terms"] == searcher.terms.count()
    top = info["top_terms"].collect()
    assert len(top) == 5
    dfs = [r.df for r in top]
    assert dfs == sorted(dfs, reverse=True)
    # vocabulary is stop-filtered: 'the'/'of' never indexed
    assert all(r.term not in ("the", "of") for r in top)


def test_field_analysis_stages():
    stages = field_analysis("The QUICK brown fox's jumping", tokenizer="english")
    by_name = {s["stage"]: [t[1] for t in s["tokens"]] for s in stages}
    assert by_name["tokenizer (UAX#29)"] == ["The", "QUICK", "brown", "fox's", "jumping"]
    assert by_name["LowerCaseFilter"] == ["the", "quick", "brown", "fox's", "jumping"]
    assert by_name["EnglishPossessiveFilter"][3] == "fox"
    assert by_name["StopFilter"] == ["quick", "brown", "fox", "jumping"]
    assert by_name["PorterStemFilter"] == ["quick", "brown", "fox", "jump"]
    # positions are pre-stop indices (StopFilter consumes positions)
    stop_stage = next(s for s in stages if s["stage"] == "StopFilter")
    assert [t[0] for t in stop_stage["tokens"]] == [1, 2, 3, 4]


def test_field_analysis_folding():
    stages = field_analysis("Déjà vu", tokenizer="folding")
    by_name = {s["stage"]: [t[1] for t in s["tokens"]] for s in stages}
    assert by_name["ASCIIFoldingFilter"] == ["Deja", "vu"]
    assert by_name["StopFilter"] == ["deja", "vu"]

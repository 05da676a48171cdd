"""End-to-end corpus curation: each stage drops exactly the planted rows,
and the survivors index + search correctly."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.pipeline.curate import curate_corpus

PAGES = [
    # 6 good english docs (distinct content, stopword-bearing)
    ("u00", "the quick brown fox jumps over the lazy dog in the morning light"),
    ("u01", "a merge policy picks the segments that are worth compacting today"),
    ("u02", "spark executes the shuffle by hashing keys into many partitions"),
    ("u03", "the postings of a term are stored as deltas with skip offsets"),
    ("u04", "these embeddings live in a vector table and support cosine search"),
    ("u05", "it is the norms byte that makes the scoring length aware at last"),
    # exact duplicate of u00 → exact-dedup drop
    ("u90", "the quick brown fox jumps over the lazy dog in the morning light"),
    # near-duplicate of u01 (one word changed) → near-dup drop
    ("u91", "a merge policy picks the segments that are worth compacting tonight"),
    # non-english (no stopwords) → lang drop
    ("u92", "zxqv bnmr kpltt wrtyy qzzkj vvnnm xxyyz aabbc ddeef gghhi"),
    # too short (but stopword-bearing, so it survives lang) → quality drop
    ("u93", "the tiny cat"),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, text string")


def test_curate_stages_drop_planted_rows(spark, pages):
    curated, rep = curate_corpus(pages, min_tokens=5)
    keys = {r["url"] for r in curated.select("url").collect()}
    assert rep.n_input == 10
    assert rep.n_after_lang == 9          # u92 dropped
    assert rep.n_after_quality == 8       # u93 dropped
    assert rep.n_after_exact == 7         # u90 dropped (u00 survives: min key)
    assert rep.n_after_neardup == 6       # u91 dropped (u01 survives)
    assert keys == {"u00", "u01", "u02", "u03", "u04", "u05"}
    # schema passes through untouched
    assert curated.columns == pages.columns


def test_curated_corpus_indexes_and_searches(spark, pages, tmp_path):
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import Searcher

    curated, _ = curate_corpus(pages, min_tokens=5)
    s = Searcher(spark, build_index(spark, curated, str(tmp_path / "cidx")))
    assert s.stats.max_doc == 6
    hits = s.search(["fox"], k=5).toPandas()
    assert len(hits) == 1  # the duplicate u90 is gone; only u00 matches

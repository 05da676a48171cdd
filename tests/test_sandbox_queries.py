"""lucene/sandbox queries: FuzzyLikeThisQuery and DuplicateFilter."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.query.components import duplicate_filter
from lucene_solr_spark.query.fuzzylikethis import fuzzy_like_this


@pytest.fixture(scope="module")
def flt_index(spark, tmp_path_factory):  # noqa: F811
    from lucene_solr_spark.index.build import build_index

    rows = [
        ("u1", "jonathon smythe works on search systems"),
        ("u2", "jonathan smith writes about search engines"),
        ("u3", "johnathon smyth studies ranking and smith"),
        ("u4", "jonny smith rides bicycles every weekend"),
        ("u5", "jonney smyth likes bicycles and ranking"),
        ("u6", "bicycles bicycles bicycles bicycles ride"),
    ]
    pages = spark.createDataFrame(rows, "url string, text string")
    out = str(tmp_path_factory.mktemp("flt_idx"))
    idx = build_index(spark, pages, out)
    from lucene_solr_spark.query.executor import Searcher

    return Searcher(spark, idx), idx


def _urls(spark, idx, hits):
    if not hits:
        return set()
    return {
        r["url"]
        for r in spark.read.parquet(idx.docs)
        .where(f"doc_id in ({','.join(str(h['doc_id']) for h in hits)})")
        .collect()
    }


def test_flt_matches_fuzzy_variants(spark, flt_index):
    """TestFuzzyLikeThisQuery.testClosestEditDistanceMatchComesFirst shape:
    'smith' fuzzifies onto smythe/smith/smyth variants — every doc with a
    close variant matches; exact-variant docs outrank farther ones."""
    s, idx = flt_index
    rows = fuzzy_like_this(s, "smith", min_similarity=0.4, k=10).collect()
    urls = _urls(spark, idx, rows)
    # all smith/smyth/smythe docs match; the bicycles-only doc does not
    assert {"u1", "u2", "u3", "u4", "u5"} <= urls
    assert "u6" not in urls


def test_flt_multi_term_coord(spark, flt_index):
    """Two source terms (smith + bicycles): docs matching variants of
    BOTH groups get the full coord and outrank the tf-heavy single-group
    doc u6 (coord halves its sum)."""
    s, idx = flt_index
    rows = fuzzy_like_this(s, "smith bicycles", min_similarity=0.5, k=10).collect()
    assert rows
    top_urls = _urls(spark, idx, rows[:1])
    # u4 'jonny smith ... bicycles' / u5 'smyth ... bicycles' match both
    assert top_urls <= {"u4", "u5"}
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_flt_ignore_tf(spark, flt_index):
    """ignoreTF=true scores docs by Σ variant boosts only — u6's tf=4 on
    'bicycles' must not outrank coord-equal docs beyond the constant."""
    s, idx = flt_index
    rows = fuzzy_like_this(s, "bicycles", min_similarity=0.5, ignore_tf=True, k=10).collect()
    assert len(rows) >= 3  # u4, u5, u6 all contain 'bicycles'
    # every match scores the same constant (Σ boosts × queryNorm): u6's
    # tf=4 must buy nothing
    assert len({round(r["score"], 6) for r in rows}) == 1


def test_flt_no_match(spark, flt_index):
    s, _ = flt_index
    assert fuzzy_like_this(s, "zzzzqqqq", min_similarity=0.8, k=5).count() == 0


def test_flt_source_absent_uses_avg_variant_df(spark, flt_index):
    """'smyth' is in the index; 'smithe' is not — FuzzyLikeThisQuery.java:
    238-241 falls back to the average variant df. The query must still
    rank and match the variant docs."""
    s, idx = flt_index
    rows = fuzzy_like_this(s, "smithe", min_similarity=0.5, k=10).collect()
    assert rows
    assert _urls(spark, idx, rows) & {"u1", "u2", "u3", "u4", "u5"}


# --- DuplicateFilter --------------------------------------------------------


def test_duplicate_filter_modes(spark):
    rows = [
        (0, "a"), (1, "a"), (2, "b"), (3, None), (4, "b"), (5, "c"),
    ]
    fd = spark.createDataFrame(rows, "doc_id long, dupkey string")
    all_docs = fd.select("doc_id")

    last = {r["doc_id"] for r in duplicate_filter(fd, "dupkey").collect()}
    assert last == {1, 4, 5}  # KM_USE_LAST_OCCURRENCE, field-less excluded

    first = {
        r["doc_id"]
        for r in duplicate_filter(fd, "dupkey", keep_mode="first").collect()
    }
    assert first == {0, 2, 5}

    fast = {
        r["doc_id"]
        for r in duplicate_filter(
            fd, "dupkey", processing_mode="fast", all_docs=all_docs
        ).collect()
    }
    # fast mode keeps the field-less doc 3 (documented imprecision)
    assert fast == {1, 3, 4, 5}

    with pytest.raises(ValueError):
        duplicate_filter(fd, "dupkey", processing_mode="fast")

"""Index splitter tests (PKIndexSplitter / MultiPassIndexSplitter)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def split_src(spark, tmp_path_factory):  # noqa: F811
    from lucene_solr_spark.index.build import build_index

    rows = [
        (f"u{i:02d}", f"shared token plus word{i} appears here") for i in range(10)
    ]
    pages = spark.createDataFrame(rows, "url string, text string")
    out = str(tmp_path_factory.mktemp("split_src"))
    return build_index(spark, pages, out)


def test_pk_split(spark, split_src, tmp_path):
    from lucene_solr_spark.index.split import pk_split_index
    from lucene_solr_spark.query.executor import Searcher

    docs = spark.read.parquet(split_src.docs)
    # TermRangeFilter(null, mid) analog: keys below u05 → first index
    first = docs.where(F.col("url") < "u05").select("doc_id")
    a, b = pk_split_index(
        spark, split_src, str(tmp_path / "a"), str(tmp_path / "b"), first
    )
    urls_a = {r["url"] for r in spark.read.parquet(a.docs).collect()}
    urls_b = {r["url"] for r in spark.read.parquet(b.docs).collect()}
    assert urls_a == {f"u{i:02d}" for i in range(5)}
    assert urls_b == {f"u{i:02d}" for i in range(5, 10)}

    # df refreshed: 'shared' had df=10; each side now has df=5
    for idx in (a, b):
        t = spark.read.parquet(idx.terms).where("term = 'shared'").collect()
        assert len(t) == 1 and int(t[0]["df"]) == 5
        s = Searcher(spark, idx)
        assert s.search("shared", k=20).count() == 5
    # side-specific terms only on their side
    assert spark.read.parquet(a.terms).where("term = 'word7'").count() == 0
    assert spark.read.parquet(b.terms).where("term = 'word7'").count() == 1
    # source index untouched
    assert spark.read.parquet(split_src.docs).count() == 10


def test_multi_pass_round_robin(spark, split_src, tmp_path):
    from lucene_solr_spark.index.split import multi_pass_split

    outs = multi_pass_split(
        spark, split_src,
        [str(tmp_path / f"rr{i}") for i in range(3)],
    )
    sizes = [spark.read.parquet(p.docs).count() for p in outs]
    assert sorted(sizes, reverse=True) == [4, 3, 3]
    # round-robin: doc rank i → part i % 3
    urls0 = {r["url"] for r in spark.read.parquet(outs[0].docs).collect()}
    assert urls0 == {"u00", "u03", "u06", "u09"}
    # disjoint cover
    all_urls = set()
    for p in outs:
        part_urls = {r["url"] for r in spark.read.parquet(p.docs).collect()}
        assert not (all_urls & part_urls)
        all_urls |= part_urls
    assert len(all_urls) == 10


def test_multi_pass_seq(spark, split_src, tmp_path):
    from lucene_solr_spark.index.split import multi_pass_split

    outs = multi_pass_split(
        spark, split_src,
        [str(tmp_path / f"sq{i}") for i in range(2)], seq=True,
    )
    urls0 = {r["url"] for r in spark.read.parquet(outs[0].docs).collect()}
    assert urls0 == {f"u{i:02d}" for i in range(5)}


def test_multi_pass_too_few_docs(spark, split_src, tmp_path):
    from lucene_solr_spark.index.split import multi_pass_split

    with pytest.raises(ValueError, match="Not enough documents"):
        multi_pass_split(
            spark, split_src, [str(tmp_path / f"x{i}") for i in range(11)]
        )

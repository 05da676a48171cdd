"""Registry-tail ValueSources (ValueSourceParser.java:95-444): literal,
field, true/false, numdocs, top, vector, sqedist, dist, hsin, geohash,
ghhsin, strdist jw/ngram, currency."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions import valuesources as vs


@pytest.fixture(scope="module")
def geo_df(spark):
    rows = [
        # name, lat1, lon1, lat2, lon2
        ("same", 37.7749, -122.4194, 37.7749, -122.4194),
        ("sf_nyc", 37.7749, -122.4194, 40.7128, -74.0060),
        ("equator", 0.0, 0.0, 0.0, 1.0),
    ]
    return spark.createDataFrame(
        rows, "name string, lat1 double, lon1 double, lat2 double, lon2 double"
    )


def test_literal_field_bools_top(spark):
    df = spark.range(3).select(
        vs.literal("x").alias("lit"),
        vs.field("id").alias("f"),
        vs.true_().alias("t"),
        vs.false_().alias("fa"),
        vs.top(F.col("id")).alias("tp"),
    )
    r = df.collect()
    assert [x.lit for x in r] == ["x"] * 3
    assert [x.f for x in r] == [0, 1, 2] == [x.tp for x in r]
    assert all(x.t and not x.fa for x in r)


def test_vector_sqedist_dist(spark):
    df = spark.createDataFrame([(1.0, 2.0, 4.0, 6.0)], "a double, b double, c double, d double")
    a = [F.col("a"), F.col("b")]
    b = [F.col("c"), F.col("d")]
    row = df.select(
        vs.vector(*a).alias("vec"),
        vs.sqedist(a, b).alias("sq"),
        vs.dist(2, a, b).alias("l2"),
        vs.dist(1, a, b).alias("l1"),
        vs.dist(0, a, b).alias("l0"),
        vs.dist(float("inf"), a, b).alias("linf"),
    ).head()
    assert row.vec == [1.0, 2.0]
    assert row.sq == pytest.approx(9 + 16)
    assert row.l2 == pytest.approx(5.0)
    assert row.l1 == pytest.approx(7.0)
    assert row.l0 == pytest.approx(2.0)
    assert row.linf == pytest.approx(4.0)


def test_hsin_matches_haversine(geo_df):
    r = 6371.0087714
    rows = geo_df.select(
        "name",
        vs.hsin(r, F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d"),
    ).collect()
    by = {x.name: x.d for x in rows}
    assert by["same"] == pytest.approx(0.0, abs=1e-9)
    # 1 degree of longitude at the equator ≈ 111.195 km
    assert by["equator"] == pytest.approx(2 * r * math.asin(math.sin(math.radians(0.5))), rel=1e-9)
    assert by["sf_nyc"] == pytest.approx(4129.0, rel=0.01)  # known ≈4,130 km


def test_geohash_known_values(spark):
    # canonical test vector: geohash of (57.64911, 10.40744) = u4pruydqqvj
    df = spark.createDataFrame([(57.64911, 10.40744)], "lat double, lon double")
    got = df.select(vs.geohash_encode(F.col("lat"), F.col("lon"), precision=11).alias("g")).head().g
    assert got == "u4pruydqqvj"
    short = df.select(vs.geohash_encode(F.col("lat"), F.col("lon"), precision=5).alias("g")).head().g
    assert short == "u4pru"


def test_ghhsin_round_trip(spark):
    r = 6371.0087714
    df = spark.createDataFrame(
        [(37.7749, -122.4194, 40.7128, -74.0060)],
        "lat1 double, lon1 double, lat2 double, lon2 double",
    )
    gh = df.select(
        vs.geohash_encode(F.col("lat1"), F.col("lon1")).alias("g1"),
        vs.geohash_encode(F.col("lat2"), F.col("lon2")).alias("g2"),
    )
    d = gh.select(vs.ghhsin(r, F.col("g1"), F.col("g2")).alias("d")).head().d
    assert d == pytest.approx(4129.0, rel=0.01)


def test_strdist_jaro_winkler_known(spark):
    df = spark.createDataFrame(
        [("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("abc", "abc"), ("", "x")],
        "a string, b string",
    )
    got = [r.d for r in df.select(vs.strdist_jaro_winkler(F.col("a"), F.col("b")).alias("d")).collect()]
    assert got[0] == pytest.approx(0.9611, abs=1e-4)  # textbook JW values
    assert got[1] == pytest.approx(0.8133, abs=1e-4)
    assert got[2] == 1.0
    assert got[3] == 0.0


def test_strdist_ngram_contract(spark):
    df = spark.createDataFrame([("abcd", "abcd"), ("abcd", "wxyz"), ("abcd", "abce")], "a string, b string")
    got = [r.d for r in df.select(vs.strdist_ngram(F.col("a"), F.col("b")).alias("d")).collect()]
    assert got[0] == 1.0
    assert got[1] == 0.0
    assert 0.0 < got[2] < 1.0


def test_currency_convert(spark):
    rates = {"USD": 1.0, "EUR": 0.9, "GBP": 0.8}
    df = spark.createDataFrame(
        [(90.0, "EUR"), (100.0, "USD"), (40.0, "GBP"), (5.0, "JPY")],
        "amount double, cur string",
    )
    got = [
        r.v
        for r in df.select(
            vs.currency_convert(F.col("amount"), F.col("cur"), "USD", rates).alias("v")
        ).collect()
    ]
    assert got[0] == pytest.approx(100.0)  # 90 EUR → 100 USD
    assert got[1] == pytest.approx(100.0)
    assert got[2] == pytest.approx(50.0)
    assert got[3] is None  # unknown code → null, not a wrong number


def test_numdocs_live_count(spark, tmp_path):
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.index.deletes import delete_by_key
    from lucene_solr_spark.query.executor import Searcher

    rows = [(f"u{i}", f"alpha doc number {i}") for i in range(8)]
    pages = spark.createDataFrame(rows, "url string, text string")
    paths = build_index(spark, pages, str(tmp_path / "idx"), num_segments=1)
    s = Searcher(spark, paths)
    assert vs.index_numdocs(s) == 8
    delete_by_key(spark, paths, ["u3"], key_col="url")
    assert vs.index_numdocs(Searcher(spark, paths)) == 7

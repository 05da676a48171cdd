"""LatLonType spatial surface: geofilt / bbox / geodist sort vs a numpy
haversine oracle, including dateline-crossing and near-pole boxes
(LatLonType.java:147-240, DistanceUtils.calcBoxByDistFromPtDEG)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.query import spatial as SP

R = SP.EARTH_MEAN_RADIUS_KM

# (name, lat, lon) — includes dateline + near-pole points
POINTS = [
    ("paris", 48.8566, 2.3522),
    ("london", 51.5074, -0.1278),
    ("berlin", 52.52, 13.405),
    ("madrid", 40.4168, -3.7038),
    ("fiji_east", -17.7, 179.9),
    ("fiji_west", -17.8, -179.95),
    ("samoa", -13.76, -172.1),
    ("svalbard", 78.22, 15.65),
    ("north", 89.5, 42.0),
    ("south_of_eq", -0.5, 0.0),
]


def hav(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1) / 2
    dlon = math.radians(lon2 - lon1) / 2
    a = math.sin(dlat) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dlon) ** 2
    return 2 * R * math.asin(math.sqrt(a))


@pytest.fixture(scope="module")
def pts(spark):
    return spark.createDataFrame(POINTS, "name string, lat double, lon double")


@pytest.mark.parametrize(
    "pt,d",
    [
        ((48.85, 2.35), 400.0),      # Paris, 400 km: London in, Berlin out
        ((-17.75, 179.99), 50.0),    # dateline: both Fiji points, not Samoa
        ((89.9, 0.0), 200.0),        # near-pole box: lon unbounded
        ((0.0, 0.0), 100.0),
    ],
)
def test_geofilt_matches_oracle(pts, pt, d):
    got = sorted(
        r["name"] for r in SP.geofilt(pts, "lat", "lon", pt[0], pt[1], d).collect()
    )
    exp = sorted(n for n, la, lo in POINTS if hav(pt[0], pt[1], la, lo) <= d)
    assert got == exp


def test_bbox_superset_of_geofilt(pts):
    pt, d = (48.85, 2.35), 400.0
    box = {r["name"] for r in SP.bbox_filter(pts, "lat", "lon", *pt, d).collect()}
    exact = {r["name"] for r in SP.geofilt(pts, "lat", "lon", *pt, d).collect()}
    assert exact <= box


def test_box_geometry_dateline_and_pole():
    # dateline crossing eastward: two lon ranges
    _, _, lon_ranges = SP._box_deg(-17.75, 179.99, 50.0)
    assert len(lon_ranges) == 2
    # pole-touching box: full lon range
    lat_min, lat_max, lon_ranges = SP._box_deg(89.9, 0.0, 200.0)
    assert lon_ranges == [(-180.0, 180.0)] and lat_max == 90.0
    # box never misses a point the distance includes (containment property)
    rng = np.random.default_rng(7)
    for _ in range(200):
        plat = float(rng.uniform(-85, 85))
        plon = float(rng.uniform(-180, 180))
        d = float(rng.uniform(1, 2000))
        lat_min, lat_max, lrs = SP._box_deg(plat, plon, d)
        qlat = float(rng.uniform(-90, 90))
        qlon = float(rng.uniform(-180, 180))
        if hav(plat, plon, qlat, qlon) <= d:
            assert lat_min - 1e-9 <= qlat <= lat_max + 1e-9
            assert any(lo - 1e-9 <= qlon <= hi + 1e-9 for lo, hi in lrs)


def test_geodist_topk(pts):
    got = SP.geodist_topk(
        pts, "lat", "lon", 48.8566, 2.3522, k=3, key_cols=("name",)
    ).collect()
    exp = sorted(
        ((hav(48.8566, 2.3522, la, lo), n) for n, la, lo in POINTS)
    )[:3]
    assert [r["name"] for r in got] == [n for _, n in exp]
    for r, (ed, _) in zip(got, exp):
        assert r["dist_km"] == pytest.approx(ed, rel=1e-9)


def test_geofilt_pushdown_plan(pts, spark, tmp_path):
    """The bbox half of geofilt must reach the parquet scan as
    PushedFilters (the trie/prefix-tree pruning analog)."""
    p = str(tmp_path / "pts")
    pts.write.parquet(p)
    df = spark.read.parquet(p)
    plan = SP.geofilt(df, "lat", "lon", 48.85, 2.35, 400.0)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(lat" in plan

"""Recursive prefix tree strategy (query/spatial_prefix.py) vs brute force.

Semantics from RecursivePrefixTreeStrategy.java:40-90 / QuadPrefixTree.java:
cell covering + exact refine must equal the brute-force exact predicate on
every point — the strategy is a pruning plan, never a different answer."""

from __future__ import annotations

import math
import random

import pytest

from lucene_solr_spark.query.spatial_prefix import (
    Circle,
    Polygon,
    Rect,
    _haversine_km,
    _pip,
    cover,
    quad_cell,
)


def test_quad_cell_roundtrip():
    from lucene_solr_spark.query.spatial_prefix import _cell_rect

    rng = random.Random(3)
    for _ in range(200):
        lat = rng.uniform(-89, 89)
        lon = rng.uniform(-179, 179)
        cell = quad_cell(lat, lon, 10)
        lo, hi, llo, lhi = _cell_rect(cell)
        assert lo <= lat <= hi and llo <= lon <= lhi
        # ancestor cells are prefixes
        assert cell.startswith(quad_cell(lat, lon, 4))


def test_cover_is_exact_partition():
    """Every point inside the shape lies under a full or boundary cell;
    every point under a full cell IS inside the shape."""
    rng = random.Random(7)
    shapes = [
        Circle(48.85, 2.35, 500.0),
        Rect(10.0, 20.0, -30.0, -10.0),
        Polygon(((0.0, 0.0), (0.0, 30.0), (20.0, 30.0), (25.0, 10.0), (10.0, -5.0))),
    ]
    for shape in shapes:
        full, boundary = cover(shape, detail_level=7)
        assert full or boundary
        for _ in range(2000):
            lat = rng.uniform(-60, 60)
            lon = rng.uniform(-60, 60)
            if isinstance(shape, Circle):
                inside = _haversine_km(shape.lat, shape.lon, lat, lon) <= shape.d_km
            elif isinstance(shape, Rect):
                inside = (shape.lat_min <= lat <= shape.lat_max
                          and shape.lon_min <= lon <= shape.lon_max)
            else:
                inside = _pip(lat, lon, shape.vertices)
            cell = quad_cell(lat, lon, 12)
            in_full = any(cell.startswith(c) for c in full)
            in_boundary = any(cell.startswith(c) for c in boundary)
            if inside:
                assert in_full or in_boundary, (shape, lat, lon)
            if in_full:
                assert inside, ("full cell leaked an outside point", shape, lat, lon)


@pytest.fixture(scope="module")
def points(spark):
    from pyspark.sql import functions as F

    from lucene_solr_spark.query.spatial_prefix import quad_cell_col

    rng = random.Random(11)
    rows = [
        (i, rng.uniform(-60.0, 60.0), rng.uniform(-60.0, 60.0)) for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lat double, lon double")
    return df.withColumn("cell", quad_cell_col(F.col("lat"), F.col("lon"), 12)), rows


@pytest.mark.parametrize(
    "shape",
    [
        Circle(20.0, 10.0, 1500.0),
        Rect(-10.0, 15.0, 5.0, 40.0),
        Polygon(((0.0, 0.0), (0.0, 30.0), (20.0, 30.0), (25.0, 10.0), (10.0, -5.0))),
    ],
)
def test_prefix_tree_search_equals_bruteforce(points, shape):
    from lucene_solr_spark.query.spatial_prefix import prefix_tree_search

    df, rows = points
    got = {r.doc_id for r in prefix_tree_search(df, shape, detail_level=7,
                                                cell_col="cell").collect()}
    want = set()
    for i, lat, lon in rows:
        if isinstance(shape, Circle):
            inside = _haversine_km(shape.lat, shape.lon, lat, lon) <= shape.d_km
        elif isinstance(shape, Rect):
            inside = (shape.lat_min <= lat <= shape.lat_max
                      and shape.lon_min <= lon <= shape.lon_max)
        else:
            inside = _pip(lat, lon, shape.vertices)
        if inside:
            want.add(i)
    assert got == want


def test_cover_prunes(points):
    """The covering must actually prune: the candidate cell set covers far
    less than the world for a small shape."""
    full, boundary = cover(Circle(48.0, 2.0, 200.0), detail_level=8)
    # a 200 km circle at level-8 cells (~0.7° ≈ 78 km): bounded cell count
    assert 0 < len(full) + len(boundary) < 600

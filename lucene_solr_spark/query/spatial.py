"""Spatial filtering and distance sort — Solr's LatLonType surface.

Reference semantics (re-expressed, not ported):

- `{!geofilt pt=<lat>,<lon> sfield=<f> d=<km>}`: exact great-circle
  distance filter. LatLonType.createSpatialQuery
  (solr/core/src/java/org/apache/solr/schema/LatLonType.java:147-240)
  computes a bounding box from the distance (DistanceUtils
  .calcBoxByDistFromPtDEG) as a cheap range PREFILTER, then verifies the
  haversine distance only for box survivors (`spatial.calcDist = true`).
- `{!bbox}`: the box alone, no distance verify (`options.bbox`,
  LatLonType.java:185-216) — matches box corners beyond d by design.
- `sort=geodist() asc` / `fl=dist`: HaversineConstFunction over the
  lat/lon columns (solr/core/src/java/org/apache/solr/search/function/
  distance/HaversineConstFunction.java).

Spark-first shape: the box is plain `BETWEEN` predicates on numeric
columns — parquet min/max row-group pruning and Catalyst pushdown engage
(the trie/prefix-tree pruning analog) — and only survivors evaluate the
trig. Dateline crossing becomes an OR of two lon ranges; a box reaching a
pole unbounds longitude, both exactly as LatLonType.java:160-183 builds
its range queries. Distance sort is a TakeOrderedAndProject, not a global
sort.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.valuesources import geodist

# spatial4j SpatialContext.GEO mean earth radius (DistanceUtils
# .EARTH_MEAN_RADIUS_KM); same constant the geodist ValueSource uses
EARTH_MEAN_RADIUS_KM = 6371.0087714


def _box_deg(pt_lat: float, pt_lon: float, d_km: float):
    """DistanceUtils.calcBoxByDistFromPtDEG: lat span is the angular
    distance; lon span is asin(sin(dist)/cos(lat)) — wider than the naive
    dist/cos(lat) near the poles; a box touching a pole covers all
    longitudes. Returns (lat_min, lat_max, lon_ranges) where lon_ranges is
    a list of (lo, hi) — two entries when the box crosses the dateline."""
    dist_rad = d_km / EARTH_MEAN_RADIUS_KM
    lat = math.radians(pt_lat)
    lat_min = pt_lat - math.degrees(dist_rad)
    lat_max = pt_lat + math.degrees(dist_rad)
    if lat_max >= 90.0 or lat_min <= -90.0:
        # box reaches a pole: longitude unbounded (calcBoxByDistFromPt
        # "touches a pole" branch)
        return max(lat_min, -90.0), min(lat_max, 90.0), [(-180.0, 180.0)]
    sin_ratio = math.sin(dist_rad) / math.cos(lat)
    if abs(sin_ratio) >= 1.0:
        return lat_min, lat_max, [(-180.0, 180.0)]
    dlon = math.degrees(math.asin(sin_ratio))
    lon_min, lon_max = pt_lon - dlon, pt_lon + dlon
    if lon_min < -180.0:
        # crosses the dateline westward: [-180, lon_max] OR [wrapped, 180]
        return lat_min, lat_max, [(-180.0, lon_max), (lon_min + 360.0, 180.0)]
    if lon_max > 180.0:
        return lat_min, lat_max, [(lon_min, 180.0), (-180.0, lon_max - 360.0)]
    return lat_min, lat_max, [(lon_min, lon_max)]


def bbox_cond(
    lat_col: Column, lon_col: Column, pt_lat: float, pt_lon: float, d_km: float
) -> Column:
    """The {!bbox} predicate: pure comparisons, so Catalyst pushes it into
    the scan (PushedFilters) and parquet prunes row groups on lat/lon
    min-max — no trig for non-candidates."""
    lat_min, lat_max, lon_ranges = _box_deg(pt_lat, pt_lon, d_km)
    cond = lat_col.between(lat_min, lat_max)
    lon_cond = None
    for lo, hi in lon_ranges:
        piece = lon_col.between(lo, hi)
        lon_cond = piece if lon_cond is None else (lon_cond | piece)
    return cond & lon_cond


def geofilt_cond(
    lat_col: Column, lon_col: Column, pt_lat: float, pt_lon: float, d_km: float
) -> Column:
    """The {!geofilt} predicate: bbox prefilter AND exact haversine ≤ d
    (SpatialDistanceQuery verifies distance for box survivors,
    LatLonType.java:236 calcDist)."""
    exact = geodist(lat_col, lon_col, F.lit(pt_lat), F.lit(pt_lon)) <= F.lit(
        float(d_km)
    )
    return bbox_cond(lat_col, lon_col, pt_lat, pt_lon, d_km) & exact


def geofilt(
    source: DataFrame,
    lat_col: str,
    lon_col: str,
    pt_lat: float,
    pt_lon: float,
    d_km: float,
) -> DataFrame:
    """Rows within d_km of the point ({!geofilt})."""
    return source.where(
        geofilt_cond(F.col(lat_col), F.col(lon_col), pt_lat, pt_lon, d_km)
    )


def bbox_filter(
    source: DataFrame,
    lat_col: str,
    lon_col: str,
    pt_lat: float,
    pt_lon: float,
    d_km: float,
) -> DataFrame:
    """Rows inside the distance-derived box ({!bbox}) — intentionally a
    superset of geofilt (corners beyond d match)."""
    return source.where(
        bbox_cond(F.col(lat_col), F.col(lon_col), pt_lat, pt_lon, d_km)
    )


def geodist_topk(
    source: DataFrame,
    lat_col: str,
    lon_col: str,
    pt_lat: float,
    pt_lon: float,
    k: int = 10,
    within_km: float | None = None,
    key_cols: tuple[str, ...] = ("url",),
) -> DataFrame:
    """sort=geodist() asc, rows=k — nearest-k with the distance returned
    (fl=dist). Optional within_km applies the geofilt first so the sort
    input is already pruned. The plan is a TakeOrderedAndProject (the
    distributed bounded PQ), never a global sort."""
    df = source
    if within_km is not None:
        df = geofilt(df, lat_col, lon_col, pt_lat, pt_lon, within_km)
    dist = geodist(F.col(lat_col), F.col(lon_col), F.lit(pt_lat), F.lit(pt_lon))
    out = df.select(*key_cols, F.col(lat_col), F.col(lon_col), dist.alias("dist_km"))
    order = [F.col("dist_km").asc()] + [F.col(c).asc() for c in key_cols]
    return out.orderBy(*order).limit(k)

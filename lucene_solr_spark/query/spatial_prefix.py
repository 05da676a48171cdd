"""Recursive prefix tree spatial strategy — shapes beyond point-radius.

Reference: lucene/spatial/src/java/org/apache/lucene/spatial/prefix/
RecursivePrefixTreeStrategy.java:40-90 over a QuadPrefixTree
(lucene/spatial/src/java/org/apache/lucene/spatial/prefix/tree/
QuadPrefixTree.java:47-230): the world rect splits into quadrants A B C D
per level; a point indexes its cell token; an intersects(shape) query
recursively descends the tree — cells disjoint from the shape prune, cells
fully inside match all their descendants by PREFIX, boundary cells split
until the detail level.

Spark-first re-expression:

- **Cell token = the level-L quad key string**; every ancestor cell is a
  string PREFIX of it, so one `cell` column indexes all levels at once
  (the reference indexes one term per level; a prefix predicate over the
  max-level token is the same lattice). The token is computed by L
  unrolled rounds of pure Column arithmetic — whole-stage codegen, no UDF.
- **Query covering runs on the driver** over the QUERY shape only
  (RecursivePrefixTreeStrategy.java's recursion is per-query work, never
  per-doc): full cells → prefix predicates that need no verification,
  boundary cells at the detail level → prefix predicates + exact refine.
- **Exact refine is GENERATED Column arithmetic**: haversine for circles;
  for polygons, the even-odd ray cast unrolled per edge (Σ of CASE terms —
  a fixed query polygon is a literal, so the whole test stays in codegen
  and the identical SQL runs on the DuckDB oracle side).
- Scale: candidates reach the refine only via cell-prefix pushdown
  (`cell LIKE 'ABAD%'` → parquet row-group pruning on a sorted cell
  column), the per-query cell set is bounded by the covering recursion
  (≤ ~4·4^boundary_levels), and nothing is driver-side but the covering.

Geometry notes (documented): polygon containment uses the planar even-odd
rule on (lat, lon) — the convention for region polygons away from the
poles/dateline; circle full-cell classification uses corner distances,
valid for cells ≤ 90° extent (always true at level ≥ 2), and is
conservative (a misclassified full cell would only fall back to boundary
refinement, never produce a wrong match, because `strict` full-cell
classification requires all corners + the cell center inside)."""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .spatial import EARTH_MEAN_RADIUS_KM

_QUADS = "ABCD"  # QuadPrefixTree cell letters (QuadPrefixTree.java:205-230)

WORLD = (-90.0, 90.0, -180.0, 180.0)  # lat_min, lat_max, lon_min, lon_max


# --- cell tokens ---------------------------------------------------------
def quad_cell_col(lat: Column, lon: Column, levels: int) -> Column:
    """Level-`levels` quad key for a point, as LINEAR-size Column
    arithmetic (pure codegen): the level-k quadrant is bit (levels-k) of
    the point's integer grid coordinates — equivalent to midpoint halving
    but without the exponentially nesting bound expressions.
    Quadrant letters: A=NW B=NE C=SW D=SE."""
    two_l = 1 << levels
    y = F.least(
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(two_l))),
        F.lit(two_l - 1),
    ).cast("long")
    x = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(two_l))),
        F.lit(two_l - 1),
    ).cast("long")
    letters = F.array(F.lit("C"), F.lit("D"), F.lit("A"), F.lit("B"))
    parts = []
    for k in range(1, levels + 1):
        shift = levels - k
        yb = F.shiftright(y, shift) % 2
        xb = F.shiftright(x, shift) % 2
        parts.append(F.element_at(letters, (yb * 2 + xb + 1).cast("int")))
    return F.concat(*parts)


def quad_cell(lat: float, lon: float, levels: int) -> str:
    """Driver-side twin of quad_cell_col."""
    out = []
    lat_lo, lat_hi, lon_lo, lon_hi = WORLD
    for _ in range(levels):
        lat_mid = (lat_lo + lat_hi) / 2.0
        lon_mid = (lon_lo + lon_hi) / 2.0
        north, east = lat >= lat_mid, lon >= lon_mid
        out.append(_QUADS[(0 if north else 2) + (1 if east else 0)])
        lat_lo, lat_hi = (lat_mid, lat_hi) if north else (lat_lo, lat_mid)
        lon_lo, lon_hi = (lon_mid, lon_hi) if east else (lon_lo, lon_mid)
    return "".join(out)


def _cell_rect(cell: str) -> tuple[float, float, float, float]:
    lat_lo, lat_hi, lon_lo, lon_hi = WORLD
    for ch in cell:
        lat_mid = (lat_lo + lat_hi) / 2.0
        lon_mid = (lon_lo + lon_hi) / 2.0
        north = ch in "AB"
        east = ch in "BD"
        lat_lo, lat_hi = (lat_mid, lat_hi) if north else (lat_lo, lat_mid)
        lon_lo, lon_hi = (lon_mid, lon_hi) if east else (lon_lo, lon_mid)
    return lat_lo, lat_hi, lon_lo, lon_hi


# --- shapes --------------------------------------------------------------
@dataclass(frozen=True)
class Circle:
    lat: float
    lon: float
    d_km: float


@dataclass(frozen=True)
class Polygon:
    """Vertices as (lat, lon), implicitly closed; planar even-odd rule."""
    vertices: tuple


@dataclass(frozen=True)
class Rect:
    lat_min: float
    lat_max: float
    lon_min: float
    lon_max: float


def _haversine_km(lat1, lon1, lat2, lon2) -> float:
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = p2 - p1
    dl = math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * EARTH_MEAN_RADIUS_KM * math.asin(min(1.0, math.sqrt(a)))


def _pip(lat: float, lon: float, verts) -> bool:
    """Planar even-odd ray cast ((lat, lon) as y, x)."""
    inside = False
    n = len(verts)
    for i in range(n):
        y1, x1 = verts[i]
        y2, x2 = verts[(i + 1) % n]
        if (y1 > lat) != (y2 > lat):
            x_cross = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
            if lon < x_cross:
                inside = not inside
    return inside


def _rect_relation(shape, rect) -> str:
    """'disjoint' | 'within' (rect fully inside shape) | 'intersects'.
    Conservative: anything uncertain reports 'intersects' (boundary)."""
    lat_lo, lat_hi, lon_lo, lon_hi = rect
    corners = [(lat_lo, lon_lo), (lat_lo, lon_hi), (lat_hi, lon_lo), (lat_hi, lon_hi)]
    center = ((lat_lo + lat_hi) / 2.0, (lon_lo + lon_hi) / 2.0)
    if isinstance(shape, Rect):
        if (lat_hi < shape.lat_min or lat_lo > shape.lat_max
                or lon_hi < shape.lon_min or lon_lo > shape.lon_max):
            return "disjoint"
        if (lat_lo >= shape.lat_min and lat_hi <= shape.lat_max
                and lon_lo >= shape.lon_min and lon_hi <= shape.lon_max):
            return "within"
        return "intersects"
    if isinstance(shape, Circle):
        ds = [_haversine_km(shape.lat, shape.lon, la, lo) for la, lo in corners]
        if max(ds) <= shape.d_km:
            return "within"
        # disjoint when the rect's closest point exceeds d: clamp center
        cl_lat = min(max(shape.lat, lat_lo), lat_hi)
        cl_lon = min(max(shape.lon, lon_lo), lon_hi)
        if _haversine_km(shape.lat, shape.lon, cl_lat, cl_lon) > shape.d_km:
            return "disjoint"
        return "intersects"
    if isinstance(shape, Polygon):
        ins = [_pip(la, lo, shape.vertices) for la, lo in corners]
        ins.append(_pip(center[0], center[1], shape.vertices))
        # an edge crossing the rect can flip containment without moving a
        # corner — check whether any polygon vertex lies inside the rect
        v_in_rect = any(
            lat_lo <= vy <= lat_hi and lon_lo <= vx <= lon_hi
            for vy, vx in shape.vertices
        )
        # edges may also cross the rect without a vertex inside it; detect
        # via segment-rect overlap of bounding intervals (conservative)
        edge_touch = False
        n = len(shape.vertices)
        for i in range(n):
            y1, x1 = shape.vertices[i]
            y2, x2 = shape.vertices[(i + 1) % n]
            if (max(y1, y2) >= lat_lo and min(y1, y2) <= lat_hi
                    and max(x1, x2) >= lon_lo and min(x1, x2) <= lon_hi):
                edge_touch = True
                break
        if all(ins) and not v_in_rect and not edge_touch:
            return "within"
        if not any(ins) and not v_in_rect and not edge_touch:
            return "disjoint"
        return "intersects"
    raise TypeError(type(shape))


def cover(shape, detail_level: int) -> tuple[list[str], list[str]]:
    """RecursivePrefixTreeStrategy descent: (full_cells, boundary_cells).
    Full cells match all descendants with no verification; boundary cells
    (at detail_level) need the exact refine."""
    full: list[str] = []
    boundary: list[str] = []

    def descend(cell: str) -> None:
        rel = _rect_relation(shape, _cell_rect(cell))
        if rel == "disjoint":
            return
        if rel == "within":
            full.append(cell)
            return
        if len(cell) >= detail_level:
            boundary.append(cell)
            return
        for q in _QUADS:
            descend(cell + q)

    for q in _QUADS:
        descend(q)
    return full, boundary


# --- refine predicates (generated Column arithmetic) ----------------------
def circle_refine_col(lat: Column, lon: Column, c: Circle) -> Column:
    from ..functions.valuesources import geodist

    return geodist(lat, lon, F.lit(c.lat), F.lit(c.lon)) <= F.lit(c.d_km)


def polygon_refine_col(lat: Column, lon: Column, p: Polygon) -> Column:
    """Even-odd ray cast unrolled per edge — pure codegen; the identical
    expression is emitted as SQL by polygon_refine_sql for the oracle."""
    crossings = F.lit(0)
    n = len(p.vertices)
    for i in range(n):
        y1, x1 = p.vertices[i]
        y2, x2 = p.vertices[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edge never crosses a horizontal ray
        cond = (
            ((F.lit(y1) > lat) != (F.lit(y2) > lat))
            & (lon < (F.lit(x2 - x1) * (lat - F.lit(y1)) / F.lit(y2 - y1) + F.lit(x1)))
        )
        crossings = crossings + F.when(cond, 1).otherwise(0)
    return crossings % 2 == 1


def polygon_refine_sql(lat: str, lon: str, p: Polygon) -> str:
    """The identical ray cast as ANSI SQL (DuckDB oracle side)."""
    terms = []
    n = len(p.vertices)
    for i in range(n):
        y1, x1 = p.vertices[i]
        y2, x2 = p.vertices[(i + 1) % n]
        if y1 == y2:
            continue
        terms.append(
            f"(CASE WHEN (({y1} > {lat}) <> ({y2} > {lat})) AND "
            f"({lon} < ({x2 - x1}) * ({lat} - {y1}) / ({y2 - y1}) + {x1}) "
            f"THEN 1 ELSE 0 END)"
        )
    return f"(({' + '.join(terms)}) % 2 = 1)"


def prefix_tree_search(
    points: DataFrame,
    shape,
    detail_level: int = 8,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_col: str | None = None,
    index_levels: int = 12,
) -> DataFrame:
    """Docs whose point intersects `shape` — candidates by cell-prefix
    pushdown, boundary candidates verified by the generated exact
    predicate. With `cell_col` the precomputed token column is used
    (the indexed strategy); otherwise tokens compute on the fly (still
    codegen, no pushdown)."""
    full, boundary = cover(shape, detail_level)
    if not full and not boundary:
        return points.limit(0)
    cell = (
        F.col(cell_col)
        if cell_col
        else quad_cell_col(F.col(lat_col), F.col(lon_col), index_levels)
    )
    lat, lon = F.col(lat_col), F.col(lon_col)
    if isinstance(shape, Circle):
        refine = circle_refine_col(lat, lon, shape)
    elif isinstance(shape, Polygon):
        refine = polygon_refine_col(lat, lon, shape)
    else:
        refine = (
            (lat >= shape.lat_min) & (lat <= shape.lat_max)
            & (lon >= shape.lon_min) & (lon <= shape.lon_max)
        )
    def _any_prefix(cells: list[str]) -> Column:
        """Small covers: a balanced OR tree over startswith predicates —
        log-depth keeps whole-stage codegen and parquet StartsWith
        pushdown. Large covers (deep detail levels produce hundreds of
        boundary cells): group by prefix length and use ONE hash-set
        `substr(cell,1,L).isin(...)` per length — a handful of compact
        InSet expressions instead of a multi-MB codegen'd OR chain (the
        42 MiB task-binary fix)."""
        if not cells:
            return F.lit(False)
        if len(cells) > 64:
            by_len: dict[int, list[str]] = {}
            for c in cells:
                by_len.setdefault(len(c), []).append(c)
            pred = None
            for length, group in sorted(by_len.items()):
                p = F.substring(cell, 1, length).isin(group)
                pred = p if pred is None else (pred | p)
            return pred
        nodes = [cell.startswith(c) for c in cells]
        while len(nodes) > 1:
            nodes = [
                nodes[i] | nodes[i + 1] if i + 1 < len(nodes) else nodes[i]
                for i in range(0, len(nodes), 2)
            ]
        return nodes[0]

    return points.where(_any_prefix(full) | (_any_prefix(boundary) & refine))

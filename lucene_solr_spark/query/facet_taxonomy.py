"""The lucene/facet module — taxonomy faceting, drill-down/sideways,
sorted-set and range facets, associations, sampling — as DataFrame plans.

Reference (lucene/facet/src/java/org/apache/lucene/facet/...):
- taxonomy/CategoryPath.java, directory/DirectoryTaxonomyWriter.java —
  category paths get ordinals in first-insertion order, parents added
  recursively BEFORE the child (addCategory), root at ordinal 0.
- params/CategoryListParams.java:44-95 (OrdinalPolicy): which ordinals a
  document encodes — NO_PARENTS (leaves only, accumulator rolls up),
  ALL_PARENTS, ALL_BUT_DIMENSION (default, the dimension ordinal is
  never encoded so a dimension's own count reads 0).
- search/CountingFacetsAggregator.java + IntRollupFacetsAggregator.java:40
  — counting, with recursive child-sum rollup under NO_PARENTS (including
  its documented over-count when one doc holds two categories sharing a
  parent — replicated here by summing every descendant's direct count).
- search/TopKFacetResultsHandler.java / the FacetResultNode heap — top-k
  children of the request path ordered by value desc, ties by HIGHER
  ordinal first (verified against TestDemoFacets: Author ties render
  Frank, Susan, Bob = reverse insertion order).
- search/DrillDownQuery.java:40-170 — groups of categories OR'ed within a
  group, groups AND'ed, all over the base query.
- search/DrillSideways.java:80-200 — for each drill-down dimension that
  has a facet request, counts are computed with that dimension's own
  filter removed (base AND all OTHER dims); dims without a facet request
  are moved into the base query (moveDrillDownOnlyClauses).
- sortedset/SortedSetDocValuesAccumulator.java:190-310 — flat dim/label
  facets without a taxonomy; ties by LOWER ordinal first = label bytes
  ascending (SSDV ordinals are term-sorted); the dimension's own value is
  the sum of its label counts under NO_PARENTS and 0 under
  ALL_BUT_DIMENSION.
- range/LongRange.java:34-57 (exclusive bounds normalized by ±1),
  range/RangeAccumulator.java — one result node per requested range IN
  REQUEST ORDER, zero-count ranges included.
- associations/... SumIntAssociationFacetsAggregator — per-category sum
  of the association payload, no rollup (rollupValues is a no-op).
- sampling/Sampler.java + TakmiSampleFixer.java — count on a document
  sample, then fix the returned top-k labels by exact recount.

Spark-first shape: the taxonomy is a small DataFrame (ordinal, path,
parent, depth) built once from the corpus's category column — the direct
analog of the side taxonomy index, bounded by the number of distinct
categories, not documents. The per-document ordinal table (doc_id, ord)
is the big, distributed side — the category-list docvalues — and every
aggregation below is a semi-join with the match DocSet plus one hash
groupBy, i.e. a partial+final map-side-combined count at any scale.
Requests and result pages are driver-side (top-k per request, k small).

Scope note: requests evaluate at FacetRequest's DEFAULT depth=1
(immediate children of the request path — what CountFacetRequest does
unless setDepth is called); the deeper PER_NODE_IN_TREE /
GLOBAL_FLAT result modes are expressible by issuing follow-up requests
per child path, which is also how the driver-side result tree would be
assembled here.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# FacetIndexingParams.DEFAULT_FACET_DELIM_CHAR (U+F749 in 4.4); the
# public string form in tests uses '/' (CategoryPath(String, char)).
DEFAULT_DELIM = "/"

NO_PARENTS = "NO_PARENTS"
ALL_PARENTS = "ALL_PARENTS"
ALL_BUT_DIMENSION = "ALL_BUT_DIMENSION"  # CategoryListParams default


def _paths_col(cat_col: str, delim: str):
    """categories column: array<string> of delimited paths -> array of
    component arrays."""
    return F.transform(F.col(cat_col), lambda p: F.split(p, F.lit(delim), -1))


class FacetIndex:
    """The taxonomy side-index plus the per-document ordinal list.

    taxo:     (ord long, path array<string>, parent long, depth int,
               dim string, label string)   — cached, taxonomy-sized
    doc_ords: (doc_id long, ord long)      — distributed, policy-encoded
    leaf_ords:(doc_id long, ord long)      — leaves only (drives rollup +
               drill-down under NO_PARENTS)
    """

    def __init__(self, taxo: DataFrame, doc_ords: DataFrame,
                 leaf_ords: DataFrame, policy: str, delim: str,
                 per_dim: dict | None = None):
        self.taxo = taxo
        self.doc_ords = doc_ords
        self.leaf_ords = leaf_ords
        self.policy = policy
        self.delim = delim
        # {dimension: policy} overrides (PerDimensionOrdinalPolicy); the
        # None key is the default
        self.per_dim = dict(per_dim or {})
        self.per_dim.setdefault(None, policy)

    def policy_for(self, dim: str) -> str:
        """CategoryListParams.getOrdinalPolicy(dimension)."""
        return self.per_dim.get(dim, self.per_dim[None])

    def save(self, out_dir: str) -> "FacetIndex":
        """Persist the taxonomy index + the per-document ordinal lists —
        the DirectoryTaxonomyWriter commit + category-list docvalues. A
        loaded index answers every count from a parquet scan of the
        ordinal table instead of re-exploding the corpus per request
        (the whole point of encoding ordinals at index time)."""
        import json
        import os

        spark = self.taxo.sparkSession
        self.taxo.write.mode("overwrite").parquet(
            os.path.join(out_dir, "taxonomy"))
        self.doc_ords.write.mode("overwrite").parquet(
            os.path.join(out_dir, "doc_ords"))
        self.leaf_ords.write.mode("overwrite").parquet(
            os.path.join(out_dir, "leaf_ords"))
        with open(os.path.join(out_dir, "facet_meta.json"), "w") as f:
            json.dump({"policy": self.policy, "delim": self.delim,
                       "per_dim": {k if k is not None else "": v
                                   for k, v in self.per_dim.items()}}, f)
        return load_facet_index(spark, out_dir)

    # -- lookups (driver-side, request-sized) -----------------------------
    def ordinal(self, path: str) -> int | None:
        comps = path.split(self.delim)
        row = self.taxo.filter(F.col("path") == F.array(*[F.lit(c) for c in comps])).select("ord").collect()
        return row[0][0] if row else None


def build_facet_index(docs: DataFrame, cat_col: str = "categories",
                      doc_col: str = "doc_id",
                      policy: str | dict = ALL_BUT_DIMENSION,
                      delim: str = DEFAULT_DELIM) -> FacetIndex:
    """DirectoryTaxonomyWriter + FacetFields.addFields over a corpus.

    Ordinals replicate the writer's insertion order deterministically:
    addCategory adds parents before children while documents stream in
    doc order, so a category's ordinal rank is its first occurrence key
    (first doc_id, position of the path within the doc, prefix depth).
    The taxonomy is ranked by one global sort over DISTINCT categories —
    a shuffle bounded by taxonomy cardinality (≈10^6 at web scale), never
    by document count; the (doc_id, ord) list stays fully distributed.

    policy may be a dict {dimension: policy} with an optional None key
    as the default — PerDimensionOrdinalPolicy.java:30-47, which is how
    the reference mixes e.g. a NO_PARENTS flat dimension with
    ALL_PARENTS hierarchies in one index.
    """
    per_dim: dict[str | None, str] = (
        dict(policy) if isinstance(policy, dict)
        else {None: policy})
    per_dim.setdefault(None, ALL_BUT_DIMENSION)
    for p in per_dim.values():
        if p not in (NO_PARENTS, ALL_PARENTS, ALL_BUT_DIMENSION):
            raise ValueError(p)
    policy = per_dim[None]  # index-level default recorded on FacetIndex

    cats = (
        docs.select(F.col(doc_col).alias("doc_id"),
                    F.posexplode(_paths_col(cat_col, delim))
                    .alias("path_idx", "full_path"))
    )
    # all prefixes: depth d in 1..len(path)  (the recursive addCategory)
    prefixes = cats.select(
        "doc_id", "path_idx",
        F.posexplode(
            F.transform(F.sequence(F.lit(1), F.size("full_path")),
                        lambda d: F.slice("full_path", F.lit(1), d))
        ).alias("d0", "path"),
        F.size("full_path").alias("leaf_depth"),
    ).select(
        "doc_id", "path_idx", "path",
        (F.col("d0") + 1).alias("depth"),
        (F.col("d0") + 1 == F.col("leaf_depth")).alias("is_leaf"),
    )

    first_seen = prefixes.groupBy("path").agg(
        F.min(F.struct("doc_id", "path_idx", "depth")).alias("first_key"),
        F.size(F.first("path")).alias("depth"),
    )
    taxo = (
        first_seen
        .withColumn("ord", F.row_number().over(
            Window.orderBy("first_key")).cast("long"))
        .select(
            "ord", "path", "depth",
            F.col("path")[0].alias("dim"),
            F.element_at("path", -1).alias("label"),
        )
    )
    # parent ordinal: join on the depth-1 prefix (root = 0, the
    # DirectoryTaxonomyWriter root ordinal)
    parent = taxo.select(F.col("ord").alias("parent"),
                         F.col("path").alias("ppath"))
    taxo = (
        taxo.withColumn("ppath", F.slice("path", 1, F.size("path") - 1))
        .join(parent, "ppath", "left")
        .drop("ppath")
        .withColumn("parent", F.coalesce("parent", F.lit(0)).cast("long"))
        .cache()
    )

    # the taxonomy is the small dimension side — broadcast, exactly as
    # the reference keeps the whole taxonomy in RAM per searcher
    with_ord = prefixes.join(
        F.broadcast(taxo.select("ord", "path")), "path")
    leaf_ords = with_ord.filter("is_leaf").select("doc_id", "ord").distinct()

    def encoded(p: str):
        # which prefixes a document ENCODES under this policy
        if p == NO_PARENTS:
            return F.col("is_leaf")
        if p == ALL_PARENTS:
            return F.lit(True)
        return F.col("depth") >= 2  # ALL_BUT_DIMENSION

    cond = encoded(per_dim[None])
    for dim, p in per_dim.items():
        if dim is not None:
            cond = F.when(F.col("path")[0] == dim, encoded(p)).otherwise(cond)
    doc_ords = with_ord.filter(cond).select("doc_id", "ord").distinct()
    return FacetIndex(taxo, doc_ords, leaf_ords, policy, delim, per_dim)


def load_facet_index(spark, out_dir: str) -> FacetIndex:
    """Open a saved facet index (TaxonomyReader + docvalues open)."""
    import json
    import os

    with open(os.path.join(out_dir, "facet_meta.json")) as f:
        meta = json.load(f)
    per_dim = {(k if k else None): v
               for k, v in meta.get("per_dim", {}).items()}
    return FacetIndex(
        spark.read.parquet(os.path.join(out_dir, "taxonomy")).cache(),
        spark.read.parquet(os.path.join(out_dir, "doc_ords")),
        spark.read.parquet(os.path.join(out_dir, "leaf_ords")),
        meta["policy"], meta["delim"], per_dim)


def _direct_counts(index: FacetIndex, matches: DataFrame | None) -> DataFrame:
    """counts[ord] over the match DocSet (FacetsCollector +
    CountingFacetsAggregator): one semi-join + one groupBy — Spark runs it
    as a map-side partial count into a final hash aggregate."""
    ords = index.doc_ords
    if matches is not None:
        ords = ords.join(matches.select("doc_id"), "doc_id", "semi")
    return ords.groupBy("ord").agg(F.count("*").cast("long").alias("value"))


def _rollup(index: FacetIndex, counts: DataFrame) -> DataFrame:
    """IntRollupFacetsAggregator.rollupValues under NO_PARENTS: every
    ancestor receives the sum of its descendants' direct counts — child
    recursion linearized through the prefix closure, reproducing the
    reference's documented over-count when one document carries sibling
    categories (each leaf contributes to the shared parent separately)."""
    taxo_counts = counts.join(
        F.broadcast(index.taxo.select("ord", "path")), "ord")
    contrib = taxo_counts.select(
        "value",
        F.explode(
            F.transform(F.sequence(F.lit(1), F.size("path")),
                        lambda d: F.slice("path", F.lit(1), d))
        ).alias("path"),
    )
    rolled = contrib.groupBy("path").agg(F.sum("value").alias("value"))
    return rolled.join(F.broadcast(index.taxo.select("ord", "path")),
                       "path").select("ord", "value")


def count_facets(index: FacetIndex, matches: DataFrame | None,
                 requests: Sequence[tuple[str, int]],
                 complements: bool | None = None,
                 all_docs: DataFrame | None = None) -> dict[str, list]:
    """CountFacetRequest(path, numResults) for each request — the result is
    {request_path: [(root_value), (child_label, count), ...]} with children
    ordered by count desc, ordinal desc (the FacetResultNode heap order),
    zero-count children dropped.

    complements: StandardFacetsAccumulator's complement counting — when
    the match set covers more than the default 0.6 complementThreshold of
    the corpus, count the NON-matching docs and subtract from the cached
    all-docs totals (two small aggregations instead of one huge one).
    Pass True/False to force, None for the threshold heuristic (requires
    all_docs for the corpus DocSet).
    """
    if complements and all_docs is None:
        raise ValueError("complement counting requires all_docs")
    use_complements = bool(complements)
    if complements is None and all_docs is not None and matches is not None:
        n_all = all_docs.count()
        use_complements = n_all > 0 and matches.count() / n_all > 0.6

    if use_complements and matches is not None:
        totals = _direct_counts(index, None)
        non_matches = all_docs.select("doc_id").join(
            matches.select("doc_id"), "doc_id", "anti")
        neg = _direct_counts(index, non_matches)
        counts = (
            totals.join(neg.withColumnRenamed("value", "neg"), "ord", "left")
            .select("ord", (F.col("value") - F.coalesce("neg", F.lit(0)))
                    .cast("long").alias("value"))
            .filter(F.col("value") > 0)
        )
    else:
        counts = _direct_counts(index, matches)

    # rollup applies PER REQUEST DIMENSION (the accumulator consults the
    # dimension's OrdinalPolicy — FacetsAccumulator.requiresRollup)
    needs_rollup = any(
        index.policy_for(p.split(index.delim)[0]) == NO_PARENTS
        for p, _ in requests)
    annotated = counts.join(F.broadcast(index.taxo), "ord").cache()
    rolled_annotated = None
    if needs_rollup:
        rolled_annotated = _rollup(index, counts).join(
            F.broadcast(index.taxo), "ord").cache()

    out: dict[str, list] = {}
    for path_str, k in requests:
        comps = path_str.split(index.delim)
        table = (rolled_annotated
                 if index.policy_for(comps[0]) == NO_PARENTS
                 else annotated)
        root = table.filter(
            F.col("path") == F.array(*[F.lit(c) for c in comps])
        ).select("value").collect()
        root_value = root[0][0] if root else 0
        children = (
            table
            .filter((F.col("depth") == len(comps) + 1)
                    & (F.slice("path", 1, len(comps))
                       == F.array(*[F.lit(c) for c in comps])))
            .orderBy(F.desc("value"), F.desc("ord"))
            .select("label", "value")
            .limit(k)
            .collect()
        )
        out[path_str] = [("__root__", root_value)] + [
            (r["label"], r["value"]) for r in children]
    annotated.unpersist()
    if rolled_annotated is not None:
        rolled_annotated.unpersist()
    return out


def to_simple_string(path_str: str, result: list) -> str:
    """FacetTestUtils.toSimpleString — 'Dim (rootValue)\\n  child (n)\\n...'"""
    lines = [f"{path_str} ({result[0][1]})"]
    for label, value in result[1:]:
        lines.append(f"  {label} ({value})")
    return "\n".join(lines) + "\n"


def drill_down(index: FacetIndex, groups: Sequence[Sequence[str]],
               base_matches: DataFrame | None = None) -> DataFrame:
    """DrillDownQuery: categories within a group are OR'ed, groups are
    AND'ed, all over the base query (DrillDownQuery.java:40-46). A path
    matches documents that ENCODED its ordinal — so drilling down on
    'Publish Date/2010' reaches docs categorized 2010/10/15 because
    parents are encoded (or, under NO_PARENTS, via the descendant
    closure, which the reference reaches through the drill-down term
    written for every path component). Unknown paths match nothing.

    Each group is one semi-join against a broadcast-sized ordinal list;
    the groups chain into consecutive semi-joins — no shuffle beyond the
    DocSet hash joins.
    """
    out = base_matches.select("doc_id") if base_matches is not None else None
    for group in groups:
        cond = None
        for path_str in group:
            comps = path_str.split(index.delim)
            arr = F.array(*[F.lit(c) for c in comps])
            this = (F.slice("path", 1, len(comps)) == arr)
            cond = this if cond is None else (cond | this)
        # descendant closure: any taxonomy node under one of the group's
        # paths (covers NO_PARENTS where only leaves are encoded; under
        # ALL_* policies the exact ordinal is already in doc_ords)
        group_ords = index.taxo.filter(cond).select("ord")
        docs_in = (index.leaf_ords.union(index.doc_ords)
                   .join(F.broadcast(group_ords), "ord", "semi")
                   .select("doc_id").distinct())
        out = docs_in if out is None else out.join(docs_in, "doc_id", "semi")
    return out


def drill_sideways(index: FacetIndex, base_matches: DataFrame | None,
                   groups: Sequence[Sequence[str]],
                   requests: Sequence[tuple[str, int]]) -> tuple[DataFrame, dict]:
    """DrillSideways.search: returns (hits DocSet, facet results) where a
    request on a drilled-down dimension is counted with that dimension's
    own clause removed (base AND all the other groups), and requests on
    other dimensions count against the full drill-down
    (DrillSideways.java:148-200). Drill-down groups whose dimension has
    no facet request fold into the base query
    (moveDrillDownOnlyClauses, DrillSideways.java:80-127)."""
    facet_dims = {p.split(index.delim)[0] for p, _ in requests}
    group_dims = [g[0].split(index.delim)[0] for g in groups]

    # moveDrillDownOnlyClauses: groups with no matching request join the base
    facet_groups = [(d, g) for d, g in zip(group_dims, groups) if d in facet_dims]
    base_groups = [g for d, g in zip(group_dims, groups) if d not in facet_dims]
    if base_groups:
        base_matches = drill_down(index, base_groups, base_matches)

    hits = drill_down(index, [g for _, g in facet_groups], base_matches)
    out: dict[str, list] = {}
    for path_str, k in requests:
        dim = path_str.split(index.delim)[0]
        if dim in [d for d, _ in facet_groups]:
            others = [g for d, g in facet_groups if d != dim]
            near_miss = drill_down(index, others, base_matches)
            res = count_facets(index, near_miss, [(path_str, k)])
        else:
            res = count_facets(index, hits, [(path_str, k)])
        out[path_str] = res[path_str]
    return hits, out


def sorted_set_facets(docs: DataFrame, matches: DataFrame | None,
                      requests: Sequence[tuple[str, int]],
                      cat_col: str = "categories",
                      doc_col: str = "doc_id",
                      policy: str = ALL_BUT_DIMENSION,
                      delim: str = DEFAULT_DELIM) -> dict[str, list]:
    """SortedSetDocValuesAccumulator — flat dim/label facets without a
    taxonomy. Only depth-2 paths are legal (the accumulator rejects
    anything else); ties order by label ASCENDING (SSDV ordinals are
    term-sorted, and the heap prefers the lower ordinal —
    SortedSetDocValuesAccumulator.java:193-199). The dimension's own
    value is the sum of its label counts under NO_PARENTS and 0 under
    ALL_BUT_DIMENSION (java:227-303)."""
    pairs = (
        docs.select(F.col(doc_col).alias("doc_id"),
                    F.explode(_paths_col(cat_col, delim)).alias("path"))
        .filter(F.size("path") == 2)
        .select("doc_id", F.col("path")[0].alias("dim"),
                F.col("path")[1].alias("label"))
        .distinct()
    )
    if matches is not None:
        pairs = pairs.join(matches.select("doc_id"), "doc_id", "semi")
    counts = pairs.groupBy("dim", "label").agg(
        F.count("*").cast("long").alias("value")).cache()
    out: dict[str, list] = {}
    for dim, k in requests:
        rows = (counts.filter(F.col("dim") == dim)
                .orderBy(F.desc("value"), F.asc("label"))
                .limit(k).collect())
        dim_total = (counts.filter(F.col("dim") == dim)
                     .agg(F.coalesce(F.sum("value"), F.lit(0))).collect()[0][0]
                     if policy == NO_PARENTS else 0)
        out[dim] = [("__root__", dim_total)] + [
            (r["label"], r["value"]) for r in rows]
    counts.unpersist()
    return out


class LongRange:
    """range/LongRange.java:34-57 — label + [min, max] with exclusive
    bounds normalized into inclusive ones by ±1."""

    def __init__(self, label: str, min_: int, min_inclusive: bool,
                 max_: int, max_inclusive: bool):
        self.label = label
        if not min_inclusive and min_ != (1 << 63) - 1:
            min_ += 1
        if not max_inclusive and max_ != -(1 << 63):
            max_ -= 1
        self.min_incl = min_
        self.max_incl = max_


def range_facets(docs: DataFrame, field: str,
                 ranges: Sequence[LongRange],
                 matches: DataFrame | None = None,
                 doc_col: str = "doc_id") -> list:
    """RangeAccumulator — one result node per requested range IN REQUEST
    ORDER, zero counts included, root value 0 (TestRangeAccumulator
    golden). All ranges count in ONE scan: each range is a conditional
    sum over the same numeric column, so Spark evaluates the whole
    request as a single map-side aggregate row."""
    vals = docs.select(F.col(doc_col).alias("doc_id"), F.col(field).alias("v"))
    if matches is not None:
        vals = vals.join(matches.select("doc_id"), "doc_id", "semi")
    aggs = [
        F.sum(((F.col("v") >= r.min_incl) & (F.col("v") <= r.max_incl))
              .cast("long")).alias(f"r{i}")
        for i, r in enumerate(ranges)
    ]
    row = vals.agg(*aggs).collect()[0]
    return [("__root__", 0)] + [
        (r.label, int(row[f"r{i}"] or 0)) for i, r in enumerate(ranges)]


def sum_score_facets(index: FacetIndex, scored_matches: DataFrame,
                     requests: Sequence[tuple[str, int]]) -> dict[str, list]:
    """SumScoreFacetRequest / ScoringAggregator — per-category sum of the
    match scores instead of a doc count; float values, same heap order."""
    joined = index.doc_ords.join(
        scored_matches.select("doc_id", "score"), "doc_id")
    sums = joined.groupBy("ord").agg(F.sum("score").alias("value"))
    annotated = sums.join(F.broadcast(index.taxo), "ord").cache()
    out: dict[str, list] = {}
    for path_str, k in requests:
        comps = path_str.split(index.delim)
        root = annotated.filter(
            F.col("path") == F.array(*[F.lit(c) for c in comps])
        ).select("value").collect()
        children = (
            annotated
            .filter((F.col("depth") == len(comps) + 1)
                    & (F.slice("path", 1, len(comps))
                       == F.array(*[F.lit(c) for c in comps])))
            .orderBy(F.desc("value"), F.desc("ord"))
            .select("label", "value").limit(k).collect()
        )
        out[path_str] = [("__root__", root[0][0] if root else 0.0)] + [
            (r["label"], float(r["value"])) for r in children]
    annotated.unpersist()
    return out


def association_facets(docs: DataFrame, matches: DataFrame | None,
                       requests: Sequence[tuple[str, int]],
                       assoc_col: str = "assocs",
                       doc_col: str = "doc_id",
                       delim: str = DEFAULT_DELIM,
                       float_values: bool = False) -> dict[str, list]:
    """associations/SumIntAssociationFacetsAggregator (and the float
    variant): assoc_col is array<struct<path:string, value>>; the
    aggregator sums the association payload per exact category — no
    parent rollup (rollupValues is a no-op in both aggregators)."""
    pairs = (
        docs.select(F.col(doc_col).alias("doc_id"),
                    F.explode(F.col(assoc_col)).alias("a"))
        .select("doc_id",
                F.split(F.col("a.path"), delim, -1).alias("path"),
                F.col("a.value").alias("value"))
    )
    if matches is not None:
        pairs = pairs.join(matches.select("doc_id"), "doc_id", "semi")
    sums = pairs.groupBy("path").agg(F.sum("value").alias("value"))
    out: dict[str, list] = {}
    for path_str, k in requests:
        comps = path_str.split(delim)
        children = (
            sums
            .filter((F.size("path") == len(comps) + 1)
                    & (F.slice("path", 1, len(comps))
                       == F.array(*[F.lit(c) for c in comps])))
            .select(F.element_at("path", -1).alias("label"), "value")
            .orderBy(F.desc("value"), F.asc("label"))
            .limit(k).collect()
        )
        cast = float if float_values else int
        out[path_str] = [("__root__", 0)] + [
            (r["label"], cast(r["value"])) for r in children]
    return out


def sample_facets(index: FacetIndex, matches: DataFrame,
                  requests: Sequence[tuple[str, int]],
                  sample_ratio: float = 0.01,
                  sampling_threshold: int = 75000,
                  seed: int = 42) -> dict[str, list]:
    """sampling/Sampler + TakmiSampleFixer: count over a document sample,
    take the top-k per request on the sampled (scaled) counts, then FIX
    those k labels by exact recount (TakmiSampleFixer re-intersects each
    result category with the full DocSet). Below samplingThreshold no
    sampling happens (SamplingParams.DEFAULT_SAMPLING_THRESHOLD).

    The sample is a deterministic hash of doc_id (xxhash64 mod), not
    Bernoulli rand(), so repeated runs and resumed jobs see the same
    sample — the Sampler analog of its fixed-seed random."""
    n = matches.count()
    if n < sampling_threshold:
        return count_facets(index, matches, requests)

    sample = matches.filter(
        (F.abs(F.xxhash64("doc_id", F.lit(seed))) % 1_000_000)
        < int(sample_ratio * 1_000_000))
    sampled = count_facets(index, sample, requests)

    # exact fix of the top-k labels per request (one filtered recount for
    # ALL requests' survivors together)
    fixed: dict[str, list] = {}
    for path_str, k in requests:
        labels = [lab for lab, _ in sampled[path_str][1:]]
        comps = path_str.split(index.delim)
        keep = index.taxo.filter(
            (F.col("depth") == len(comps) + 1)
            & (F.slice("path", 1, len(comps))
               == F.array(*[F.lit(c) for c in comps]))
            & F.col("label").isin(labels)).select("ord", "label")
        counts = (
            index.doc_ords.join(matches.select("doc_id"), "doc_id", "semi")
            .join(F.broadcast(keep), "ord")
            .groupBy("label").agg(F.count("*").cast("long").alias("value"))
        )
        exact = {r["label"]: r["value"] for r in counts.collect()}
        rows = sorted(((lab, exact.get(lab, 0)) for lab in labels),
                      key=lambda t: (-t[1], t[0]))
        fixed[path_str] = [sampled[path_str][0]] + rows
    return fixed

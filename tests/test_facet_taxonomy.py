"""lucene/facet module parity: taxonomy counting, drill-down/sideways,
sorted-set, range, rollup, associations, sampling.

Goldens ported from the reference's facet tests:
- TestDemoFacets.test (facet/search/TestDemoFacets.java:70-146)
- TestDemoFacets.testAllParents (java:176-210)
- TestDrillSideways.testBasic (facet/search/TestDrillSideways.java:95-240)
- TestSortedSetDocValuesFacets.testBasic (facet/sortedset/...java:60-150)
- TestRangeAccumulator.test (facet/range/TestRangeAccumulator.java:70-95)
"""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.query.facet_taxonomy import (
    ALL_BUT_DIMENSION,
    ALL_PARENTS,
    NO_PARENTS,
    LongRange,
    association_facets,
    build_facet_index,
    count_facets,
    drill_down,
    drill_sideways,
    range_facets,
    sample_facets,
    sorted_set_facets,
    sum_score_facets,
    to_simple_string,
)


def _demo_docs(spark):
    # TestDemoFacets add() order — doc_id is the insertion order
    rows = [
        (0, ["Author/Bob", "Publish Date/2010/10/15"]),
        (1, ["Author/Lisa", "Publish Date/2010/10/20"]),
        (2, ["Author/Lisa", "Publish Date/2012/1/1"]),
        (3, ["Author/Susan", "Publish Date/2012/1/7"]),
        (4, ["Author/Frank", "Publish Date/1999/5/5"]),
    ]
    return spark.createDataFrame(rows, "doc_id long, categories array<string>")


@pytest.fixture(scope="module")
def demo_index(spark):
    return build_facet_index(_demo_docs(spark))


class TestDemoFacets:
    def test_match_all_counts(self, demo_index):
        res = count_facets(demo_index, None,
                           [("Publish Date", 10), ("Author", 10)])
        # TestDemoFacets.java:115-118 — exact strings incl. tie order
        # (2012 before 2010 at count 2: higher ordinal wins ties)
        assert to_simple_string("Publish Date", res["Publish Date"]) == \
            "Publish Date (0)\n  2012 (2)\n  2010 (2)\n  1999 (1)\n"
        assert to_simple_string("Author", res["Author"]) == \
            "Author (0)\n  Lisa (2)\n  Frank (1)\n  Susan (1)\n  Bob (1)\n"

    def test_drilldown_2010(self, demo_index):
        # java:120-128 — drill down on Publish Date/2010, count Author
        hits = drill_down(demo_index, [["Publish Date/2010"]])
        res = count_facets(demo_index, hits, [("Author", 10)])
        assert to_simple_string("Author", res["Author"]) == \
            "Author (0)\n  Lisa (1)\n  Bob (1)\n"

    def test_taxonomy_stats(self, demo_index):
        # java:131-140 PrintTaxonomyStats: /Author 4 immediate children,
        # 5 total; /Publish Date 3 immediate children, 12 total
        taxo = demo_index.taxo
        assert taxo.filter(
            (F.col("dim") == "Author") & (F.col("depth") == 2)).count() == 4
        assert taxo.filter(F.col("dim") == "Author").count() == 5
        assert taxo.filter(
            (F.col("dim") == "Publish Date") & (F.col("depth") == 2)).count() == 3
        assert taxo.filter(F.col("dim") == "Publish Date").count() == 12

    def test_all_parents_dimension_count(self, spark):
        # TestDemoFacets.testAllParents: under ALL_PARENTS the dimension
        # ordinal is encoded, so its own count is real
        docs = spark.createDataFrame(
            [(0, ["a/path"])], "doc_id long, categories array<string>")
        idx = build_facet_index(docs, policy=ALL_PARENTS)
        res = count_facets(idx, None, [("a", 10)])
        assert to_simple_string("a", res["a"]) == "a (1)\n  path (1)\n"


class TestDrillSideways:
    def test_or_of_two_dims(self, spark, demo_index):
        # TestDrillSideways.java:118-131 — (Lisa OR Bob) AND 2010
        hits, res = drill_sideways(
            demo_index, None,
            [["Author/Lisa", "Author/Bob"], ["Publish Date/2010"]],
            [("Publish Date", 10), ("Author", 10)])
        assert hits.count() == 2
        assert to_simple_string("Publish Date", res["Publish Date"]) == \
            "Publish Date (0)\n  2010 (2)\n  2012 (1)\n"
        assert to_simple_string("Author", res["Author"]) == \
            "Author (0)\n  Lisa (1)\n  Bob (1)\n"

    def test_invalid_field(self, demo_index):
        # java:133-145 — drilling down on an unknown dim: 0 hits, empty facets
        hits, res = drill_sideways(
            demo_index, None, [["Foobar/Baz"]],
            [("Publish Date", 10), ("Foobar", 10)])
        assert hits.count() == 0
        assert to_simple_string("Publish Date", res["Publish Date"]) == \
            "Publish Date (0)\n"
        assert to_simple_string("Foobar", res["Foobar"]) == "Foobar (0)\n"

    def test_valid_or_invalid_term(self, demo_index):
        # java:147-167 — Lisa OR Tom
        hits, res = drill_sideways(
            demo_index, None, [["Author/Lisa", "Author/Tom"]],
            [("Publish Date", 10), ("Author", 10)])
        assert hits.count() == 2
        assert to_simple_string("Publish Date", res["Publish Date"]) == \
            "Publish Date (0)\n  2012 (1)\n  2010 (1)\n"
        assert to_simple_string("Author", res["Author"]) == \
            "Author (0)\n  Lisa (2)\n  Frank (1)\n  Susan (1)\n  Bob (1)\n"

    def test_simple_drilldown_equals_sideways_on_single_dim(self, demo_index):
        # java:108-116 — one drilled dim: sideways == un-drilled counts
        hits, res = drill_sideways(
            demo_index, None, [["Author/Lisa"]], [("Author", 10)])
        assert hits.count() == 2
        assert to_simple_string("Author", res["Author"]) == \
            "Author (0)\n  Lisa (2)\n  Frank (1)\n  Susan (1)\n  Bob (1)\n"

    def test_drilldown_only_dim_moves_to_base(self, demo_index):
        # moveDrillDownOnlyClauses: drill on Author (no request for it),
        # request Publish Date — Author clause folds into the base query,
        # so Publish Date counts only over Lisa's docs
        hits, res = drill_sideways(
            demo_index, None, [["Author/Lisa"]], [("Publish Date", 10)])
        assert hits.count() == 2
        assert to_simple_string("Publish Date", res["Publish Date"]) == \
            "Publish Date (0)\n  2012 (1)\n  2010 (1)\n"


class TestSortedSet:
    def _docs(self, spark):
        # TestSortedSetDocValuesFacets.testBasic: doc0 {a/foo,a/bar,a/zoo,
        # b/baz}, doc1 {a/foo}  (the b+delim dim dropped: our dims are
        # plain strings, the delim-collision guard is a Java encoding
        # detail)
        return spark.createDataFrame(
            [(0, ["a/foo", "a/bar", "a/zoo", "b/baz"]), (1, ["a/foo"])],
            "doc_id long, categories array<string>")

    def test_counts_all_but_dimension(self, spark):
        res = sorted_set_facets(self._docs(spark), None,
                                [("a", 10), ("b", 10)])
        # ties at count 1 order by label ASC (bar before zoo) — the
        # opposite of the taxonomy heap's ordinal-desc rule
        assert to_simple_string("a", res["a"]) == \
            "a (0)\n  foo (2)\n  bar (1)\n  zoo (1)\n"
        assert to_simple_string("b", res["b"]) == "b (0)\n  baz (1)\n"

    def test_counts_no_parents_dim_total(self, spark):
        res = sorted_set_facets(self._docs(spark), None,
                                [("a", 10), ("b", 10)], policy=NO_PARENTS)
        assert to_simple_string("a", res["a"]) == \
            "a (4)\n  foo (2)\n  bar (1)\n  zoo (1)\n"
        assert to_simple_string("b", res["b"]) == "b (1)\n  baz (1)\n"

    def test_drilldown_on_flat_dims(self, spark):
        docs = self._docs(spark)
        idx = build_facet_index(docs)
        # a/foo AND b/baz -> doc0 only; bare dim a -> both docs
        assert drill_down(idx, [["a/foo"], ["b/baz"]]).count() == 1
        assert drill_down(idx, [["a"]]).count() == 2


class TestRangeFacets:
    def test_long_ranges_golden(self, spark):
        # TestRangeAccumulator.test: field value = i for i in 0..99
        docs = spark.createDataFrame(
            [(i, i) for i in range(100)], "doc_id long, field long")
        res = range_facets(docs, "field", [
            LongRange("less than 10", 0, True, 10, False),
            LongRange("less than or equal to 10", 0, True, 10, True),
            LongRange("over 90", 90, False, 100, False),
            LongRange("90 or above", 90, True, 100, False),
            LongRange("over 1000", 1000, False, (1 << 63) - 1, False),
        ])
        assert to_simple_string("field", res) == (
            "field (0)\n  less than 10 (10)\n  less than or equal to 10 (11)\n"
            "  over 90 (9)\n  90 or above (10)\n  over 1000 (0)\n")


class TestRollup:
    def test_no_parents_rollup_and_overcount(self, spark):
        # CategoryListParams.OrdinalPolicy NO_PARENTS javadoc: a doc
        # holding A/B/C and A/B/D over-counts the shared parent — the
        # rollup literally sums children, and we replicate that
        docs = spark.createDataFrame(
            [(0, ["A/B/C", "A/B/D"])], "doc_id long, categories array<string>")
        idx = build_facet_index(docs, policy=NO_PARENTS)
        res = count_facets(idx, None, [("A", 10), ("A/B", 10)])
        assert res["A"] == [("__root__", 2), ("B", 2)]
        assert res["A/B"][0] == ("__root__", 2)
        # children of A/B: C and D with their own (leaf) counts; tie at
        # 1 -> higher ordinal (D) first
        assert res["A/B"][1:] == [("D", 1), ("C", 1)]

    def test_no_parents_matches_all_parents_when_disjoint(self, spark):
        # "During faceted search, this policy behaves exactly like
        # ALL_PARENTS" (when docs don't share a mutual parent)
        rows = [(i, [f"Dim/x{i % 3}/y{i % 7}"]) for i in range(40)]
        docs = spark.createDataFrame(
            rows, "doc_id long, categories array<string>")
        a = count_facets(build_facet_index(docs, policy=NO_PARENTS),
                         None, [("Dim", 10), ("Dim/x1", 10)])
        b = count_facets(build_facet_index(docs, policy=ALL_PARENTS),
                         None, [("Dim", 10), ("Dim/x1", 10)])
        assert a == b


class TestAggregators:
    def test_sum_score(self, spark):
        docs = spark.createDataFrame(
            [(0, ["d/a"]), (1, ["d/a"]), (2, ["d/b"])],
            "doc_id long, categories array<string>")
        idx = build_facet_index(docs)
        scored = spark.createDataFrame(
            [(0, 1.5), (1, 2.0), (2, 10.0)], "doc_id long, score double")
        res = sum_score_facets(idx, scored, [("d", 10)])
        assert res["d"][1:] == [("b", 10.0), ("a", 3.5)]

    def test_int_associations(self, spark):
        # SumIntAssociationFacetsAggregator: sum payloads per category
        docs = spark.createDataFrame(
            [(0, [("tags/lucene", 3), ("genre/computing", 2)]),
             (1, [("tags/lucene", 1), ("tags/solr", 4)])],
            "doc_id long, assocs array<struct<path:string, value:int>>")
        res = association_facets(docs, None, [("tags", 10), ("genre", 10)])
        assert res["tags"][1:] == [("lucene", 4), ("solr", 4)]
        assert res["genre"][1:] == [("computing", 2)]

    def test_complements_equal_direct(self, spark):
        docs = _demo_docs(spark)
        idx = build_facet_index(docs)
        matches = docs.filter("doc_id < 4").select("doc_id")
        direct = count_facets(idx, matches, [("Author", 10)])
        compl = count_facets(idx, matches, [("Author", 10)],
                             complements=True, all_docs=docs)
        assert direct == compl


class TestSampling:
    def test_below_threshold_is_exact(self, spark, demo_index):
        exact = count_facets(demo_index, _demo_docs(spark), [("Author", 10)])
        sampled = sample_facets(demo_index, _demo_docs(spark),
                                [("Author", 10)])
        assert exact == sampled

    def test_fixer_recounts_exactly(self, spark):
        # force sampling (threshold 0); the fixer must restore exact
        # counts for every returned label
        rows = [(i, [f"d/v{i % 5}"]) for i in range(500)]
        docs = spark.createDataFrame(
            rows, "doc_id long, categories array<string>")
        idx = build_facet_index(docs)
        res = sample_facets(idx, docs.select("doc_id"), [("d", 3)],
                            sample_ratio=0.2, sampling_threshold=0)
        exact = count_facets(idx, docs.select("doc_id"), [("d", 10)])
        exact_map = dict(exact["d"][1:])
        for label, value in res["d"][1:]:
            assert value == exact_map[label]


class TestPersistence:
    def test_save_load_round_trip(self, spark, tmp_path, demo_index):
        from lucene_solr_spark.query.facet_taxonomy import load_facet_index

        saved = demo_index.save(str(tmp_path / "facets"))
        res = count_facets(saved, None, [("Publish Date", 10), ("Author", 10)])
        assert to_simple_string("Publish Date", res["Publish Date"]) == \
            "Publish Date (0)\n  2012 (2)\n  2010 (2)\n  1999 (1)\n"
        loaded = load_facet_index(spark, str(tmp_path / "facets"))
        assert loaded.policy == demo_index.policy
        hits = drill_down(loaded, [["Publish Date/2010"]])
        res2 = count_facets(loaded, hits, [("Author", 10)])
        assert to_simple_string("Author", res2["Author"]) == \
            "Author (0)\n  Lisa (1)\n  Bob (1)\n"


class TestPerDimensionPolicy:
    def test_mixed_policies(self, spark):
        # PerDimensionOrdinalPolicy: 'flat' uses NO_PARENTS (dim total =
        # rollup over leaves), 'tree' keeps the ALL_BUT_DIMENSION
        # default (dim count 0), 'full' uses ALL_PARENTS (real dim count)
        docs = spark.createDataFrame(
            [(0, ["flat/a", "tree/x/y", "full/p"]),
             (1, ["flat/a", "flat/b", "tree/x/z"]),
             (2, ["full/q"])],
            "doc_id long, categories array<string>")
        idx = build_facet_index(docs, policy={
            "flat": NO_PARENTS, "full": ALL_PARENTS})
        assert idx.policy_for("flat") == NO_PARENTS
        assert idx.policy_for("tree") == ALL_BUT_DIMENSION
        assert idx.policy_for("full") == ALL_PARENTS
        res = count_facets(idx, None,
                           [("flat", 10), ("tree", 10), ("full", 10)])
        # flat: rollup over leaves -> a=2, b=1, dim total 3
        assert res["flat"] == [("__root__", 3), ("a", 2), ("b", 1)]
        # tree: dimension count reads 0 under ALL_BUT_DIMENSION
        assert res["tree"][0] == ("__root__", 0)
        assert res["tree"][1:] == [("x", 2)]
        # full: dimension ordinal encoded -> real count
        assert res["full"] == [("__root__", 2), ("q", 1), ("p", 1)]

    def test_per_dim_survives_save_load(self, spark, tmp_path):
        from lucene_solr_spark.query.facet_taxonomy import load_facet_index

        docs = spark.createDataFrame(
            [(0, ["flat/a"])], "doc_id long, categories array<string>")
        idx = build_facet_index(docs, policy={"flat": NO_PARENTS})
        idx.save(str(tmp_path / "f"))
        loaded = load_facet_index(spark, str(tmp_path / "f"))
        assert loaded.policy_for("flat") == NO_PARENTS
        assert loaded.policy_for("other") == ALL_BUT_DIMENSION

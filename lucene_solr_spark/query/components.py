"""Search components: the Solr aggregation/sort/paging surface as engine
APIs over a Searcher + source corpus.

Each function is the engine-level counterpart of a SearchComponent or
collector the reference runs inside SolrIndexSearcher — they take the
engine's match DocSet (or the whole corpus) and produce the component
result as a DataFrame. All are pure Catalyst plans (groupBy/window/agg) —
the shapes Spark executes as partial+final hash aggregates or
TakeOrderedAndProject, which is exactly the distributed version of the
reference's collectors.

- sort_topk / search_after   TopFieldCollector + IndexSearcher.searchAfter
                             (TopFieldCollector.java; IndexSearcher.java:242-258)
- windowed_search            queryResultWindowSize rounding + queryResultCache
                             (SolrIndexSearcher.java:1243-1352)
- grouping_top_docs          Grouping.java two-pass → one window
- stats_component            StatsValuesFactory.java:82-181
- facet_query/range/date/pivot  SimpleFacets.java:277,888-1078; PivotFacetHelper
- distinct_counts            AbstractDistinctValuesCollector
- docset algebra             DocSet.intersection/union/andNot
- match_all                  MatchAllDocsQuery
- more_like_this / suggest / spellcheck   MoreLikeThis.java, AnalyzingSuggester,
                             DirectSpellChecker.java:532 — these three read the
                             REAL term dictionary / analyzer, not raw SQL
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..analysis.analyzer import standard_tokenize


def realtime_get(spark, paths, keys, key_col: str = "url") -> DataFrame:
    """RealTimeGet (/get) — fetch the CURRENT version of documents by unique
    key, independent of any open Searcher's point-in-time snapshot
    (RealTimeGetComponent.java:65-241). Solr answers /get from the update
    log before a soft-commit makes docs searchable; here every micro-batch
    commits atomically through lineage, so the real-time view is obtained by
    resolving lineage FRESH on each call — an already-open Searcher keeps
    its reopen-time snapshot, exactly the view /get exists to bypass.

    Latest-wins per key: `update_documents` tombstones prior versions at
    append time; if a key transiently carries several live rows the highest
    doc_id (newest segment) is returned — the tlog-order rule. Keys may be a
    list or a DataFrame of `key_col`; the key frame broadcasts into the
    semi-join (top-k-sized by definition), so this is one pruned scan of
    the docs table at any corpus size."""
    from .executor import Searcher

    searcher = Searcher(spark, paths)  # fresh lineage resolution = /get view
    kdf = (
        keys
        if isinstance(keys, DataFrame)
        else spark.createDataFrame([(k,) for k in keys], f"{key_col} string")
    )
    live = searcher._drop_deleted(
        searcher.docs.join(
            F.broadcast(kdf.select(key_col).distinct()), key_col, "left_semi"
        )
    )
    rest = [c for c in live.columns if c != key_col]
    return (
        live.groupBy(key_col)
        .agg(F.max_by(F.struct(*rest), F.col("doc_id")).alias("d"))
        .select(key_col, "d.*")
    )


# --- sort / paging -----------------------------------------------------------
def sort_topk(
    source: DataFrame,
    sort_cols: Sequence[tuple[str, bool]],
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """TopFieldCollector: top-k by arbitrary sort fields with the docID-asc
    final tie-break (TopFieldCollector.java; HitQueue.java:76-81)."""
    order = [
        (F.col(c).desc() if not asc else F.col(c).asc()) for c, asc in sort_cols
    ] + [F.col(id_col).asc()]
    return source.orderBy(*order).limit(k)


def search_after(
    source: DataFrame,
    sort_col: str,
    cursor: tuple,
    k: int,
    asc: bool = False,
    id_col: str = "doc_id",
) -> DataFrame:
    """searchAfter deep paging: resume strictly after the (sort_value, id)
    cursor (IndexSearcher.java:242-258) — no offset re-scan."""
    cv, cid = cursor
    col = F.col(sort_col)
    if asc:
        cond = (col > cv) | ((col == cv) & (F.col(id_col) > cid))
        order = [col.asc(), F.col(id_col).asc()]
    else:
        cond = (col < cv) | ((col == cv) & (F.col(id_col) > cid))
        order = [col.desc(), F.col(id_col).asc()]
    return source.where(cond).orderBy(*order).limit(k)


class QueryResultCache:
    """queryResultCache + queryResultWindowSize (SolrIndexSearcher.java:
    1243-1352): fetch rows rounded UP to the window size, cache the superset
    (collected — supersets are top-k sized), slice requested pages from it."""

    def __init__(self, window_size: int = 50, max_entries: int = 512):
        self.window_size = window_size
        self.max_entries = max_entries
        self._cache: dict = {}

    def windowed(self, key, start: int, rows: int, fetch):
        """fetch(n) -> ordered pandas DataFrame of the top n."""
        need = start + rows
        rounded = ((need + self.window_size - 1) // self.window_size) * self.window_size
        cached = self._cache.get(key)
        if cached is None or len(cached) < min(rounded, need):
            cached = fetch(rounded)
            if len(self._cache) >= self.max_entries:
                self._cache.pop(next(iter(self._cache)))  # FIFO evict
            self._cache[key] = cached
        return cached.iloc[start : start + rows]


# --- grouping / stats / facets ----------------------------------------------
def restrict_to_matches(
    source: DataFrame, matches: DataFrame | None, id_col: str = "doc_id"
) -> DataFrame:
    """Restrict a component's input to the query's match DocSet — Solr runs
    every SearchComponent over the q+fq result set (SimpleFacets.java:
    336-448, Grouping.java, StatsValuesFactory.java:82-181), not the whole
    corpus. Plain semi-join: AQE broadcasts small match sets; at 10^12 docs
    a huge DocSet stays a shuffled semi-join, never a driver structure."""
    if matches is None:
        return source
    return source.join(
        matches.select(F.col(matches.columns[0]).alias(id_col)), id_col, "left_semi"
    )


def grouping_top_docs(
    source: DataFrame,
    group_col: str,
    sort_col: str,
    top_n: int,
    asc: bool = False,
    id_col: str = "doc_id",
    matches: DataFrame | None = None,
) -> DataFrame:
    """group.field: top-n docs per group by sort value (Grouping.java's
    two-pass collectors → one partitioned window; the shuffle partitions by
    group exactly like pass 1's per-group competition)."""
    source = restrict_to_matches(source, matches, id_col)
    order = [F.col(sort_col).asc() if asc else F.col(sort_col).desc(), F.col(id_col).asc()]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        source.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_n)
        .select(group_col, id_col, sort_col, F.col("rn").cast("long").alias("rn"))
    )


def grouping_by_function(
    source: DataFrame,
    func_col: Column,
    sort_col: str,
    top_n: int,
    asc: bool = False,
    id_col: str = "doc_id",
    matches: DataFrame | None = None,
) -> DataFrame:
    """group.func (Grouping.java's CommandFunc — grouping keyed by a
    ValueSource's per-doc value instead of a stored field): materialize the
    function value as the group key, then the same one-window plan as
    group.field. Compose with qparser.parse_function for string exprs."""
    keyed = source.withColumn("group_value", func_col)
    return grouping_top_docs(
        keyed, "group_value", sort_col, top_n, asc=asc, id_col=id_col,
        matches=matches,
    )


def stats_component(
    source: DataFrame, field: str, facet_cols: Sequence[str] = (),
    scale: int | None = None,
    matches: DataFrame | None = None, id_col: str = "doc_id",
) -> DataFrame:
    """StatsComponent: count/missing/min/max/sum/mean/stddev, optionally per
    facet group (StatsValuesFactory.java:82-181). Sums go through DECIMAL so
    the result is order-independent (reproducible at any parallelism).

    `scale` = decimal digits kept by the exact sums; inferred from the
    column type when None (decimal → its own scale, integer → 0, floating →
    6) so arbitrary numeric fields aren't silently rounded to 2 places."""
    import re as _re

    source = restrict_to_matches(source, matches, id_col)

    if scale is None:
        dt = dict(source.dtypes).get(field, "")
        m = _re.fullmatch(r"decimal\(\d+,\s*(\d+)\)", dt)
        if m:
            scale = int(m.group(1))
        elif dt in ("tinyint", "smallint", "int", "bigint"):
            scale = 0
        else:
            scale = 6
    x = F.col(field)
    dec = x.cast(f"decimal({min(38, 20 + scale)},{scale})")
    dec2 = x.cast(f"decimal({min(38, 18 + 2 * scale)},{min(18, 2 * scale)})")
    aggs = [
        F.count(x).alias("cnt"),
        F.sum(F.when(x.isNull(), 1).otherwise(0)).cast("long").alias("missing"),
        F.min(x).alias("min_v"),
        F.max(x).alias("max_v"),
        F.sum(dec).cast("double").alias("sum_v"),
        (F.sum(dec).cast("double") / F.count(x)).alias("mean_v"),
        F.sqrt(
            (
                F.sum(dec2 * dec2).cast("double")
                - F.sum(dec).cast("double") * F.sum(dec).cast("double") / F.count(x)
            )
            / (F.count(x) - 1)
        ).alias("stddev_v"),
    ]
    if facet_cols:
        return source.groupBy(*facet_cols).agg(*aggs).orderBy(*facet_cols)
    return source.agg(*aggs)


def facet_query(
    source: DataFrame, queries: dict[str, Column],
    matches: DataFrame | None = None, id_col: str = "doc_id",
) -> DataFrame:
    """facet.query: one count per arbitrary predicate (SimpleFacets.java:277)
    — all predicates in ONE scan via conditional aggregation."""
    source = restrict_to_matches(source, matches, id_col)
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
        for name, cond in queries.items()
    ]
    return source.agg(*aggs)


def facet_range(
    source: DataFrame, field: str, gap: float, mincount: int = 0,
    matches: DataFrame | None = None, id_col: str = "doc_id",
) -> DataFrame:
    """facet.range with gap (SimpleFacets.java:888-1078)."""
    source = restrict_to_matches(source, matches, id_col)
    bucket = (F.floor(F.col(field) / F.lit(gap)) * F.lit(gap)).cast("double")
    out = (
        source.groupBy(bucket.alias("bucket_lo"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= mincount)
        .orderBy("bucket_lo")
    )
    return out


def facet_date(
    source: DataFrame, ts_col: str, unit: str = "hour",
    matches: DataFrame | None = None, id_col: str = "doc_id",
) -> DataFrame:
    """facet.date via DateMathParser-style rounding → date_trunc buckets."""
    source = restrict_to_matches(source, matches, id_col)
    return (
        source.groupBy(F.date_trunc(unit, F.col(ts_col)).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bucket")
    )


def facet_pivot(
    source: DataFrame, cols: Sequence[str],
    matches: DataFrame | None = None, id_col: str = "doc_id",
) -> DataFrame:
    """pivot facets: hierarchical counts (PivotFacetHelper)."""
    source = restrict_to_matches(source, matches, id_col)
    return (
        source.groupBy(*cols).agg(F.count(F.lit(1)).alias("cnt")).orderBy(*cols)
    )


def distinct_counts(
    source: DataFrame, cols: Sequence[str],
    matches: DataFrame | None = None, id_col: str = "doc_id",
) -> DataFrame:
    """stats calcdistinct / AbstractDistinctValuesCollector."""
    source = restrict_to_matches(source, matches, id_col)
    return source.agg(
        *[F.count_distinct(F.col(c)).alias(f"distinct_{c}") for c in cols]
    )


# --- DocSet algebra (DocSet.java / BitDocSet / SortedIntDocSet) --------------
def docset_union(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.select("doc_id").union(b.select("doc_id")).distinct()


def docset_intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.select("doc_id").join(b.select("doc_id"), "doc_id", "left_semi")


def docset_and_not(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.select("doc_id").join(b.select("doc_id"), "doc_id", "left_anti")


def docset_xor(a: DataFrame, b: DataFrame) -> DataFrame:
    """Symmetric difference (ChainedFilter XOR op) = union minus intersect."""
    return docset_and_not(docset_union(a, b), docset_intersect(a, b))


def boolean_filter(
    should: Sequence[DataFrame] = (),
    must: Sequence[DataFrame] = (),
    must_not: Sequence[DataFrame] = (),
    universe: DataFrame | None = None,
) -> DataFrame:
    """BooleanFilter (lucene/queries/src/java/org/apache/lucene/queries/
    BooleanFilter.java:52-100): non-scoring boolean algebra over cached
    filter DocSets — union of SHOULD sets, MUST intersection, MUST_NOT
    subtraction. A MUST_NOT-only filter starts from ALL docs (`universe`,
    e.g. searcher.docs — the reference flips a full bitset)."""
    from functools import reduce as _reduce

    res = _reduce(docset_union, should) if should else None
    for f in must:
        res = f.select("doc_id") if res is None else docset_intersect(res, f)
    if res is None:
        if not must_not:
            raise ValueError("BooleanFilter needs at least one clause")
        if universe is None:
            raise ValueError("MUST_NOT-only BooleanFilter needs `universe`")
        res = universe.select("doc_id")
    # reference order is SHOULD → MUST_NOT → MUST; ANDNOT distributes over
    # AND, so subtracting once at the end is set-identical and cheaper
    for f in must_not:
        res = docset_and_not(res, f)
    return res.distinct()


def chained_filter(
    filters: Sequence[DataFrame],
    ops: Sequence[str] | str = "or",
    universe: DataFrame | None = None,
) -> DataFrame:
    """ChainedFilter (lucene/queries/src/java/org/apache/lucene/queries/
    ChainedFilter.java:130-250): fold filters left-to-right with a per-step
    op in {or, and, andnot, xor}. Initial-result rule (initialResult,
    :130-149): a leading AND starts from the first filter's set, a leading
    ANDNOT from its complement (needs `universe`), OR/XOR start empty."""
    if isinstance(ops, str):
        ops = [ops] * len(filters)
    if len(ops) != len(filters):
        raise ValueError("Invalid number of elements in logic array")
    ops = [o.lower() for o in ops]
    idx = 0
    if ops[0] == "and":
        res = filters[0].select("doc_id")
        idx = 1
    elif ops[0] == "andnot":
        if universe is None:
            raise ValueError("leading ANDNOT needs `universe`")
        res = docset_and_not(universe.select("doc_id"), filters[0])
        idx = 1
    else:
        res = None  # OR/XOR against the empty set = the set itself
    table = {
        "or": docset_union,
        "and": docset_intersect,
        "andnot": docset_and_not,
        "xor": docset_xor,
    }
    for f, op in zip(list(filters)[idx:], list(ops)[idx:]):
        if op not in table:
            raise ValueError(f"unknown op '{op}'")
        res = f.select("doc_id").distinct() if res is None else table[op](res, f)
    return res


def terms_filter(
    searcher, source: DataFrame, field: str, values: Sequence, key_col: str = "url"
) -> DataFrame:
    """TermsFilter (lucene/queries/src/java/org/apache/lucene/queries/
    TermsFilter.java): docs whose `field` holds ANY of `values` — the
    classic cacheable IN-list filter. Catalyst `isin` pushes down to the
    source scan; result is a DocSet for filter_docs / put_filter."""
    return searcher.filter_docs_from_source(
        source, F.col(field).isin(list(values)), key_col=key_col
    )


def match_all(searcher) -> DataFrame:
    """MatchAllDocsQuery: every live doc at constant score 1
    (MatchAllDocsQuery.java)."""
    docs = searcher.docs.select("doc_id", F.lit(1.0).cast("float").alias("score"))
    return searcher._drop_deleted(docs)


# --- joins (§2.6) -------------------------------------------------------------
def solr_join(
    from_source: DataFrame,
    from_col: str,
    to_source: DataFrame,
    to_col: str,
    from_predicate: Column,
) -> DataFrame:
    """Solr `{!join from=f to=t}` (JoinUtil.java:93, JoinQParserPlugin):
    two-pass semi-join — collect the `from` field's values over docs
    matching the inner query, return docs whose `to` field holds any of
    them. Spark: filter → project → LEFT SEMI JOIN (broadcast when the key
    set is small, by AQE)."""
    keys = (
        from_source.where(from_predicate)
        .select(F.col(from_col).alias(to_col))
        .distinct()
    )
    return to_source.join(keys, to_col, "left_semi")


def solr_join_scored(
    from_source: DataFrame,
    from_col: str,
    to_source: DataFrame,
    to_col: str,
    from_predicate: Column,
    score_col: Column | str,
    score_mode: str = "avg",
    to_key: str | None = None,
) -> DataFrame:
    """JoinUtil.createJoinQuery with ScoreMode Total/Max/Avg
    (JoinUtil.java:64-91, TermsWithScoreCollector.java:119-173,
    TermsIncludingScoreQuery.java): from-side scores aggregate PER UNIQUE
    JOIN VALUE — sum for Total, max for Max, sum/count for Avg — and every
    to-side doc holding that join value inherits the value's score. Spark:
    filter → groupBy(join value) agg → equi-join (broadcast by AQE when the
    key set is small); adds a `join_score` column to the matching to rows.

    `to_key`: when the to side is multi-valued (several rows per document,
    e.g. an exploded array field), pass the document key; a doc matching
    several join values keeps the score of the FIRST term in sort order —
    the reference's in-order scorer maps only the first encountered join
    value's score (JoinUtil.java:43-47, SVInOrderScorer), which in term-dict
    order is deterministically the smallest join value."""
    try:
        agg = {"total": F.sum, "max": F.max, "avg": F.avg}[score_mode]
    except KeyError:
        raise ValueError(f"Score mode {score_mode} isn't supported.") from None
    score_col = F.col(score_col) if isinstance(score_col, str) else score_col
    per_value = (
        from_source.where(from_predicate)
        .groupBy(F.col(from_col).alias(to_col))
        .agg(agg(score_col).cast("float").alias("join_score"))
    )
    joined = to_source.join(per_value, to_col)
    if to_key is not None:
        w = Window.partitionBy(to_key).orderBy(F.col(to_col).asc())
        joined = (
            joined.withColumn("_jv_rn", F.row_number().over(w))
            .where(F.col("_jv_rn") == 1)
            .drop("_jv_rn")
        )
    return joined


def block_join_parent(
    children: DataFrame,
    child_predicate: Column,
    parent_key: str,
    score_col: str,
    score_mode: str = "max",
) -> DataFrame:
    """ToParentBlockJoinQuery (ToParentBlockJoinQuery.java:483): child
    matches roll up to the parent with ScoreMode none/avg/max/total plus a
    matching-children count. The doc-block contiguity trick is unnecessary —
    the parent key IS the block identity in a relational layout."""
    aggs = [F.count(F.lit(1)).alias("n_matching_children")]
    mode = {
        "max": F.max,
        "avg": F.avg,
        "total": F.sum,
        "none": None,
    }[score_mode]
    if mode is not None:
        aggs.insert(0, mode(F.col(score_col)).alias("parent_score"))
    return children.where(child_predicate).groupBy(parent_key).agg(*aggs)


def block_join_children(
    children: DataFrame,
    parents: DataFrame,
    parent_predicate: Column,
    parent_key: str,
    score_col: str | None = None,
) -> DataFrame:
    """ToChildBlockJoinQuery (lucene/join/src/java/org/apache/lucene/search/
    join/ToChildBlockJoinQuery.java:49-120): the inverse block join — run a
    query against PARENTS and return every CHILD of a matching parent. With
    `score_col` (doScores=true) each child inherits its parent's score
    (`parentScore` in ToChildBlockJoinScorer); without it the join is a
    non-scoring semi-join. Broadcast-friendly: the matched-parent side is
    the small one."""
    matched = parents.where(parent_predicate)
    if score_col is None:
        return children.join(
            matched.select(parent_key), parent_key, "left_semi"
        )
    return children.join(
        matched.select(parent_key, F.col(score_col).alias("parent_score")),
        parent_key,
    )


def random_sort_value(
    doc_id: Column, field_name: str, version: int
) -> Column:
    """RandomSortField (solr/core/src/java/org/apache/solr/schema/
    RandomSortField.java:65-110): a repeatable pseudo-random per-doc sort
    key — Thomas Wang's hash32shift over (seed + docID) where seed =
    fieldName.hashCode() + docBase + indexVersion, result >>> 1 so it is
    non-negative. Changing `field_name` (dynamic-field trick) or `version`
    (index update) reshuffles the order; same inputs give the same order on
    every node at any parallelism. Pure codegen int arithmetic (32-bit ops
    emulated on longs with masking)."""
    # Java String.hashCode for the seed component
    h = 0
    for ch in field_name:
        h = (h * 31 + ord(ch)) & 0xFFFFFFFF
    if h >= 1 << 31:
        h -= 1 << 32
    seed = (h + version) & 0xFFFFFFFF  # docBase = 0: one logical segment

    m = F.lit(0xFFFFFFFF).cast("long")
    k = (F.lit(seed).cast("long") + doc_id.cast("long")).bitwiseAND(m)
    # key = ~key + (key << 15)
    k = (k.bitwiseXOR(m) + F.shiftleft(k, 15).bitwiseAND(m)).bitwiseAND(m)
    # key ^= key >>> 12  (values stay unsigned-32 in a long, so >> == >>>)
    k = k.bitwiseXOR(F.shiftright(k, 12))
    # key += key << 2
    k = (k + F.shiftleft(k, 2).bitwiseAND(m)).bitwiseAND(m)
    # key ^= key >>> 4
    k = k.bitwiseXOR(F.shiftright(k, 4))
    # key *= 2057
    k = (k * F.lit(2057).cast("long")).bitwiseAND(m)
    # key ^= key >>> 16; return key >>> 1
    k = k.bitwiseXOR(F.shiftright(k, 16))
    return F.shiftright(k, 1).cast("int")


# --- §2.14 relevance features over the real index -----------------------------
def more_like_this(
    searcher,
    text: str,
    max_query_terms: int = 5,
    k: int = 10,
    min_doc_freq: int = 1,
    min_term_freq: int = 1,
) -> tuple[DataFrame, list[str]]:
    """MoreLikeThis (MoreLikeThis.java createQueue): re-analyze the seed
    text (retrieveTerms(Reader) path), rank its terms by tf·idf with
    DefaultSimilarity idf = 1 + ln(N/(df+1)), take the top
    maxQueryTerms, run them as a SHOULD disjunction. Returns (hits,
    interesting_terms)."""
    toks = [t for _, t in standard_tokenize(text)]
    if not toks:
        return searcher._empty(), []
    import pandas as pd

    tf = pd.Series(toks).value_counts()
    tinfo = searcher.lookup_terms(list(tf.index))
    n = float(searcher.stats.max_doc)
    scores = []
    for r in tinfo.itertuples():
        if int(r.df) < min_doc_freq:
            continue
        if int(tf[r.term]) < min_term_freq:
            # MoreLikeThis.java:152 DEFAULT_MIN_TERM_FREQ gate
            continue
        idf = 1.0 + np.log(n / (int(r.df) + 1.0))
        scores.append((float(tf[r.term]) * idf, str(r.term)))
    scores.sort(key=lambda p: (-p[0], p[1]))
    top_terms = [t for _, t in scores[:max_query_terms]]
    return searcher.boolean_search(should=top_terms, k=k), top_terms


def suggest(searcher, prefix: str, n: int = 10) -> DataFrame:
    """AnalyzingSuggester analog: completion of `prefix` from the REAL term
    dictionary, weight-ordered (weight = total term frequency)."""
    lit = prefix.replace("%", r"\%").replace("_", r"\_")
    return (
        searcher.terms.where(F.col("term").like(lit + "%"))
        .select("term", F.col("ttf").cast("long").alias("weight"))
        .orderBy(F.col("weight").desc(), F.col("term").asc())
        .limit(n)
    )


def infix_gram_frame(
    suggestions: DataFrame,
    min_prefix_chars: int = 4,
    text_col: str = "suggestion",
) -> DataFrame:
    """The AnalyzingInfixSuggester 'textgrams' field analog
    (AnalyzingInfixSuggester.java:204-208): (gram, suggestion) pairs — edge
    n-grams of length 1..min_prefix_chars of EVERY analyzed token. Persist
    this bucketed/partitioned by `gram` and short typed fragments become a
    pruned equi-join instead of a corpus scan (exactly why the reference
    indexes leading grams: PrefixQuery only beyond minPrefixChars)."""
    from ..analysis.analyzer import token_array
    from ..analysis.ngram import edge_ngrams

    grams = F.array_distinct(
        edge_ngrams(token_array(F.col(text_col)), 1, min_prefix_chars)
    )
    return suggestions.select(text_col, F.explode(grams).alias("gram"))


def infix_suggest(
    suggestions: DataFrame,
    key: str,
    n: int = 5,
    all_terms_required: bool = True,
    text_col: str = "suggestion",
    weight_col: str = "weight",
    gram_frame: DataFrame | None = None,
    min_prefix_chars: int = 4,
) -> DataFrame:
    """AnalyzingInfixSuggester.lookup (lucene/suggest/src/java/org/apache/
    lucene/search/suggest/analyzing/AnalyzingInfixSuggester.java:320-400):
    analyze the typed key; every token but the last must appear as a FULL
    token of the suggestion (MUST when all_terms_required, else the clauses
    are SHOULD and ≥1 must match), and the LAST token matches as a token
    PREFIX — unless the key ends in discarded chars (trailing whitespace),
    which the reference treats as "token finished" and requires exactly.
    Results rank by weight desc (relevance score ignored, :399), text asc.

    Plan: analyzer token array + array predicates over the suggestions
    frame → one TakeOrderedAndProject. With `gram_frame`
    (infix_gram_frame output, the 'textgrams' index analog) and
    all_terms_required, the last token first prunes candidates via a gram
    equi-join — the scale path for short fragments."""
    from functools import reduce

    from ..analysis.analyzer import standard_tokenize, token_array

    trailing = key != key.rstrip()
    toks = [t for _, t in standard_tokenize(key)]
    if not toks:
        return suggestions.select(text_col, weight_col).limit(0)
    full, last = (toks, None) if trailing else (toks[:-1], toks[-1])

    toks_col = token_array(F.col(text_col))
    conds = [F.array_contains(toks_col, t) for t in full]
    if last is not None:
        conds.append(F.exists(toks_col, lambda x: x.startswith(last)))
    combine = (lambda a, b: a & b) if all_terms_required else (lambda a, b: a | b)
    pred = reduce(combine, conds)

    cand = suggestions
    if gram_frame is not None and last is not None and all_terms_required:
        g = last[: min(len(last), min_prefix_chars)]
        keys = gram_frame.where(F.col("gram") == g).select(text_col)
        cand = cand.join(keys, text_col, "left_semi")
    return (
        cand.where(pred)
        .select(text_col, weight_col)
        .orderBy(F.col(weight_col).desc(), F.col(text_col).asc())
        .limit(n)
    )


def fuzzy_suggest(
    searcher,
    prefix: str,
    n: int = 10,
    max_edits: int = 1,
    non_fuzzy_prefix: int = 1,
    min_fuzzy_length: int = 3,
) -> DataFrame:
    """FuzzySuggester analog (lucene/suggest/.../analyzing/
    FuzzySuggester.java; solr FuzzyLookupFactory): completions whose HEAD
    (the first len(prefix) chars) is within `max_edits` of the typed
    prefix — reference defaults maxEdits=1, nonFuzzyPrefix=1 (the first
    character must match exactly), minFuzzyLength=3 (shorter inputs match
    exactly, :80-91). Ranked weight (ttf) desc like `suggest`.

    Plan: the exact `non_fuzzy_prefix` head is a LIKE pushdown on the
    dictionary scan; the edit distance runs JVM-side (levenshtein on the
    head substring) over the pruned rows only."""
    if len(prefix) < min_fuzzy_length:
        return suggest(searcher, prefix, n)
    head = prefix[:non_fuzzy_prefix]
    lit = head.replace("%", r"\%").replace("_", r"\_")
    plen = len(prefix)
    # terms shorter than prefix-maxEdits can't complete the prefix
    cand = searcher.terms.where(
        F.col("term").like(lit + "%")
        & (F.length("term") >= plen - max_edits)
    )
    dist = F.levenshtein(
        F.substring(F.col("term"), 1, plen + max_edits), F.lit(prefix)
    )
    # allow the head window to run long by up to max_edits (deletions in
    # the candidate's head count against the budget, Levenshtein-style)
    dist_exact = F.levenshtein(F.substring(F.col("term"), 1, plen), F.lit(prefix))
    best = F.least(dist, dist_exact)
    return (
        cand.where(best <= max_edits)
        .select(
            "term",
            F.col("ttf").cast("long").alias("weight"),
            best.cast("long").alias("dist"),
        )
        .orderBy(F.col("weight").desc(), F.col("term").asc())
        .limit(n)
    )


def spellcheck(searcher, word: str, max_edits: int = 2, n: int = 10) -> DataFrame:
    """DirectSpellChecker (DirectSpellChecker.java:532): dictionary terms
    within `max_edits`, ranked distance asc then df desc (more frequent
    corrections first). Length-band prefilter pushes to the scan."""
    band = (F.length("term") >= len(word) - max_edits) & (
        F.length("term") <= len(word) + max_edits
    )
    dist = F.levenshtein(F.col("term"), F.lit(word))
    return (
        searcher.terms.where(band & (dist <= max_edits))
        .select(
            "term",
            F.col("df").cast("long").alias("df"),
            dist.cast("long").alias("dist"),
        )
        .orderBy(F.col("dist").asc(), F.col("df").desc(), F.col("term").asc())
        .limit(n)
    )

def terms_component(
    searcher,
    prefix: str | None = None,
    lower: str | None = None,
    upper: str | None = None,
    lower_incl: bool = True,
    upper_incl: bool = False,
    mincount: int = 1,
    maxcount: int | None = None,
    limit: int = 10,
    sort: str = "count",
) -> DataFrame:
    """TermsComponent (/terms handler, TermsComponent.java:84-235): enumerate
    the term dictionary with terms.prefix / terms.lower / terms.upper bounds,
    terms.mincount/maxcount df filters, terms.limit, and terms.sort=count
    (df desc) or index (term asc). Reads ONLY the (term, df) columns of the
    dictionary — a pruned scan + TakeOrderedAndProject, no postings touched,
    so the plan is dictionary-sized at any corpus scale (the reference walks
    the TermsEnum the same way)."""
    t = searcher.terms.select("term", F.col("df").cast("long").alias("df"))
    if prefix is not None:
        lit = prefix.replace("%", r"\%").replace("_", r"\_")
        t = t.where(F.col("term").like(lit + "%"))
    if lower is not None:
        t = t.where(F.col("term") >= lower if lower_incl else F.col("term") > lower)
    if upper is not None:
        t = t.where(F.col("term") <= upper if upper_incl else F.col("term") < upper)
    t = t.where(F.col("df") >= mincount)
    if maxcount is not None:
        t = t.where(F.col("df") <= maxcount)
    order = (
        [F.col("df").desc(), F.col("term").asc()]
        if sort == "count"
        else [F.col("term").asc()]
    )
    return t.orderBy(*order).limit(limit)


def term_vectors(
    searcher,
    hits: DataFrame,
    source: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """TermVectorComponent (TermVectorComponent.java:120-318): per-document
    term vectors (term, tf, positions) for the result docs. The reference
    reads vectors STORED at index time; re-analyzing the stored text with
    the index's own chain yields the identical vector (same analyzer, same
    stop/length rules — the equivalence the reference's docs/tests rely on
    when vectors are absent and TermVectorComponent falls back to
    re-analysis). hits is top-k-sized, so it broadcasts into the source
    join and the inversion kernel runs over k rows, not the corpus."""
    from ..index.build import invert_tokens

    docs = searcher.fetch_docs(hits.select("doc_id"), key_col=key_col).join(
        source.select(key_col, text_col), key_col
    )
    tok = searcher.meta.get("tokenizer", "jvm")
    vec = invert_tokens(
        docs.select("doc_id", text_col), text_col, positions=True, tokenizer=tok
    )
    return vec.join(
        F.broadcast(docs.select("doc_id", key_col)), "doc_id"
    ).select(key_col, "term", "tf", "positions")


def elevate_query(
    searcher,
    terms: list[str],
    elevate_keys: list[str],
    k: int = 10,
    exclude_keys: list[str] | None = None,
    key_col: str = "url",
    mark: bool = True,
) -> DataFrame:
    """QueryElevationComponent (QueryElevationComponent.java:87-150):
    editorially pin documents to the top of a query's results in the
    configured order (elevated docs are included even when they do not
    match the query — the component ORs their id query into the main
    query), and drop excluded ids. Returns (doc_id, score, elevated)
    with elevated docs first in elevate-list order, organic hits after,
    `k` rows total."""
    exclude_keys = exclude_keys or []
    keymap = searcher.docs.select("doc_id", key_col)
    organic = searcher.boolean_search(should=terms, k=k + len(elevate_keys))
    organic = organic.join(keymap, "doc_id")
    drop = [str(x) for x in (list(elevate_keys) + list(exclude_keys))]
    spark = searcher.spark
    import pandas as pd

    order = pd.DataFrame(
        {key_col: [str(x) for x in elevate_keys],
         "elev_rank": range(len(elevate_keys))}
    )
    # an elevate id absent from the corpus pins nothing — the page must
    # fill with organic hits, so budget on RESOLVED pins (elevate lists
    # are tiny editorial configs; this count is a broadcast-join of
    # len(elevate_keys) rows)
    n_pinned = (
        F.broadcast(spark.createDataFrame(order)).join(keymap, key_col).count()
        if elevate_keys
        else 0
    )
    organic = (
        organic.where(~F.col(key_col).isin(drop))
        .select("doc_id", "score", F.lit(False).alias("elevated"))
        .limit(max(0, k - n_pinned))
    )
    pinned = (
        F.broadcast(spark.createDataFrame(order))
        .join(keymap, key_col)
        .select(
            "doc_id",
            F.lit(float("inf")).cast("float").alias("score"),
            F.lit(True).alias("elevated"),
            F.col("elev_rank"),
        )
    )
    organic = organic.withColumn("elev_rank", F.lit(2**31).cast("long"))
    # union order is NOT execution order in Spark — the pinned-first rule
    # must be an explicit sort (elevated first in elevate-list order, then
    # organic by score desc / doc asc)
    out = (
        pinned.unionByName(organic)
        .orderBy(
            F.col("elevated").desc(),
            F.col("elev_rank").asc(),
            F.col("score").desc(),
            F.col("doc_id").asc(),
        )
        .limit(k)
    )
    cols = ["doc_id", "score"] + (["elevated"] if mark else [])
    return out.select(*cols)


def grouping_by_query(
    searcher,
    named_queries: dict[str, list[str]],
    k_per_group: int = 5,
) -> DataFrame:
    """group.query (Grouping.java command=query; the QueryCommand variant
    of grouping): for each named query, the top-k docs matching THAT
    query — rows (group, doc_id, score, rank). Each group is an
    independent top-k (TakeOrderedAndProject), unioned."""
    parts = []
    for name in sorted(named_queries):
        hits = searcher.boolean_search(should=named_queries[name], k=k_per_group)
        w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        parts.append(
            hits.withColumn("rank", F.row_number().over(w)).select(
                F.lit(name).alias("group"), "doc_id", "score", "rank"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def spellcheck_collate(
    searcher,
    query_terms: list[str],
    max_collations: int = 1,
    max_edits: int = 2,
) -> list[tuple[str, int]]:
    """SpellCheckCollator.collate (SpellCheckCollator.java:51-151):
    substitute the best correction for each unknown query term, re-run
    the corrected query, and return collations WITH their verified hit
    counts (only collations that produce hits are returned). Corrections
    come from the DirectSpellChecker analog over the real dictionary;
    known terms (df > 0) are left alone."""
    tinfo = searcher.lookup_terms(query_terms)
    known = set(tinfo["term"])
    suggestions: dict[str, list[str]] = {}
    for t in query_terms:
        if t in known:
            continue
        alts = [r["term"] for r in spellcheck(searcher, t, max_edits=max_edits, n=max_collations).collect()]
        if not alts:
            return []  # an unknown term with no correction: no collation
        suggestions[t] = alts
    if not suggestions:
        return []  # nothing misspelled — the reference emits no collation
    out: list[tuple[str, int]] = []
    for i in range(max_collations):
        corrected = [
            suggestions[t][min(i, len(suggestions[t]) - 1)] if t in suggestions else t
            for t in query_terms
        ]
        hits = searcher.count(corrected)
        if hits > 0:
            out.append((" ".join(corrected), hits))
    # dedupe while preserving order (ties in suggestion lists can repeat)
    seen, uniq = set(), []
    for c, h in out:
        if c not in seen:
            seen.add(c)
            uniq.append((c, h))
    return uniq


def luke_overview(searcher, top_n: int = 10) -> dict:
    """LukeRequestHandler index overview (solr/core/src/java/org/apache/
    solr/handler/admin/LukeRequestHandler.java:104-210): corpus-level
    counts plus the highest-df terms (the /admin/luke "top terms" panel).

    top_terms is a DataFrame (dictionary scan -> TakeOrderedAndProject on
    df desc), so the only driver-side values are the scalar counts the
    handler itself reports."""
    num_deleted = 0
    if searcher._deletes is not None:
        num_deleted = searcher._deletes.count()
    return {
        "max_doc": searcher.stats.max_doc,
        "num_docs": searcher.stats.max_doc - num_deleted,
        "num_deleted": num_deleted,
        "num_terms": searcher.terms.count(),
        "sum_total_term_freq": searcher.stats.sum_total_term_freq,
        "top_terms": (
            searcher.terms.select("term", "df", "ttf")
            .orderBy(F.col("df").desc(), F.col("term").asc())
            .limit(top_n)
        ),
    }


def duplicate_filter(
    field_docs: DataFrame,
    field: str,
    keep_mode: str = "last",
    processing_mode: str = "full",
    all_docs: DataFrame | None = None,
) -> DataFrame:
    """DuplicateFilter (lucene/sandbox/.../DuplicateFilter.java:38-160):
    one DocIdSet bit per distinct value of `field`, the kept doc being the
    first or last occurrence in docID order (KM_USE_FIRST_OCCURRENCE /
    KM_USE_LAST_OCCURRENCE, correctBits:90-125).

    processing_mode='full' (PM_FULL_VALIDATION): only docs that HAVE the
    field and win their group survive. 'fast' (PM_FAST_INVALIDATION,
    fastBits:127-160): start from ALL docs (pass `all_docs`) and unset the
    losers — docs without the field stay set, the documented fast-mode
    imprecision. One map-side-combinable min/max aggregation, no window.
    """
    agg = F.min("doc_id") if keep_mode in ("first", "KM_USE_FIRST_OCCURRENCE") \
        else F.max("doc_id")
    keepers = (
        field_docs.select("doc_id", field)
        .where(F.col(field).isNotNull())
        .groupBy(field)
        .agg(agg.alias("doc_id"))
        .select("doc_id")
    )
    if processing_mode in ("full", "PM_FULL_VALIDATION"):
        return keepers
    if all_docs is None:
        raise ValueError("processing_mode='fast' needs all_docs")
    losers = (
        field_docs.select("doc_id", field)
        .where(F.col(field).isNotNull())
        .join(keepers.withColumnRenamed("doc_id", "keep_id"),
              F.col("doc_id") == F.col("keep_id"), "left_anti")
        .select("doc_id")
    )
    return all_docs.select("doc_id").join(losers, "doc_id", "left_anti")

"""Solr function-query ValueSources re-expressed as Column factories.

Reference registry: ValueSourceParser.java:88-775 registers 46 named
ValueSources; each is a per-document scalar usable in sorting, boosting
(BoostedQuery: score × f(doc)) and pseudo-fields. The Spark mapping is a
Column expression per name — evaluated inside whole-stage codegen, no UDFs.

Index-statistic sources (docfreq/idf/termfreq/norm/maxdoc/...) read the
engine's tables; use the `index_*` factories with a Searcher.

Date math (`ms`, NOW/DAY rounding — DateMathParser.java) maps to interval
arithmetic / date_trunc.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- scalar math (ValueSourceParser.java: linear, recip, scale, div, mod,
# abs, sum, product, sub, map, sqrt, pow, log, max, min, pi, e) ---------------


def linear(x: Column, m: float, c: float) -> Column:
    """LinearFloatFunction: m*x + c."""
    return (F.lit(float(m)) * x + F.lit(float(c))).cast("double")


def recip(x: Column, m: float, a: float, b: float) -> Column:
    """ReciprocalFloatFunction: a/(m*x + b) — the classic recency boost."""
    return (F.lit(float(a)) / (F.lit(float(m)) * x + F.lit(float(b)))).cast("double")


def scale(df: DataFrame, x: Column, lo: float, hi: float) -> Column:
    """ScaleFloatFunction: min-max scale x into [lo, hi]. Needs the frame's
    global min/max — computed as scalar subqueries (two light aggregations,
    broadcast by Catalyst)."""
    mn, mx = df.agg(F.min(x), F.max(x)).head()
    mn, mx = float(mn), float(mx)
    rng = (mx - mn) or 1.0
    return ((x - F.lit(mn)) / F.lit(rng) * F.lit(float(hi - lo)) + F.lit(float(lo))).cast(
        "double"
    )


def div(a: Column, b: Column) -> Column:
    return (a.cast("double") / b.cast("double"))


def mod(a: Column, b: Column) -> Column:
    return (a.cast("double") % b.cast("double"))


def abs_(x: Column) -> Column:
    return F.abs(x)


def sum_(*xs: Column) -> Column:
    out = xs[0]
    for x in xs[1:]:
        out = out + x
    return out


def sub(a: Column, b: Column) -> Column:
    return a - b


def product(*xs: Column) -> Column:
    out = xs[0]
    for x in xs[1:]:
        out = out * x
    return out


def map_(x: Column, mn: float, mx: float, target: float) -> Column:
    """RangeMapFloatFunction: values in [mn,mx] → target, else passthrough."""
    return F.when((x >= mn) & (x <= mx), F.lit(float(target))).otherwise(x)


def max_(*xs: Column) -> Column:
    return F.greatest(*xs)


def min_(*xs: Column) -> Column:
    return F.least(*xs)


def sqrt(x: Column) -> Column:
    return F.sqrt(x)


def pow_(a: Column, b) -> Column:
    return F.pow(a, b)


def log(x: Column) -> Column:
    """Solr 'log' is base-10 (LogFloatFunction)."""
    return F.log10(x)


def ln(x: Column) -> Column:
    return F.log(x)


def pi() -> Column:
    return F.lit(float(np.pi))


def e() -> Column:
    return F.lit(float(np.e))


# --- boolean sources (if, exists, not, and, or, xor, def) --------------------


def if_(cond: Column, then: Column, otherwise: Column) -> Column:
    return F.when(cond, then).otherwise(otherwise)


def exists(x: Column) -> Column:
    return x.isNotNull()


def not_(x: Column) -> Column:
    return ~x


def and_(*xs: Column) -> Column:
    out = xs[0]
    for x in xs[1:]:
        out = out & x
    return out


def or_(*xs: Column) -> Column:
    out = xs[0]
    for x in xs[1:]:
        out = out | x
    return out


def xor(a: Column, b: Column) -> Column:
    return a != b


def def_(x: Column, fallback: Column) -> Column:
    """DefFunction: first defined (non-null) value."""
    return F.coalesce(x, fallback)


# --- strings / distance -------------------------------------------------------


def strdist_levenshtein(a: Column, b: Column) -> Column:
    """strdist(a, b, edit): Lucene's similarity form 1 - d/maxLen
    (LevensteinDistance.getDistance)."""
    mx = F.greatest(F.length(a), F.length(b))
    return (F.lit(1.0) - F.levenshtein(a, b).cast("double") / mx.cast("double"))


# --- date math (`ms`, DateMathParser rounding) -------------------------------


def ms(a: Column, b: Column | None = None) -> Column:
    """ms(a[, b]): epoch millis of a, or a-b in millis."""
    ams = (F.unix_timestamp(a).cast("long") * 1000)
    if b is None:
        return ams
    return ams - (F.unix_timestamp(b).cast("long") * 1000)


def date_round(ts: Column, unit: str) -> Column:
    """DateMathParser /UNIT rounding → date_trunc."""
    return F.date_trunc(unit, ts)


# --- index-statistic sources (docfreq, idf, termfreq, norm, maxdoc, numdocs,
# totaltermfreq, sumtotaltermfreq, joindf) -------------------------------------


def index_docfreq(searcher, term: str) -> int:
    """docfreq(field, term) from the term dictionary."""
    row = searcher.terms.where(F.col("term") == term).select("df").head()
    return int(row.df) if row else 0


def index_totaltermfreq(searcher, term: str) -> int:
    row = searcher.terms.where(F.col("term") == term).select("ttf").head()
    return int(row.ttf) if row else 0


def index_idf(searcher, term: str) -> float:
    """BM25 idf of a term (BM25Similarity.java:64-67)."""
    from ..query.bm25 import bm25_idf

    return float(bm25_idf(index_docfreq(searcher, term), searcher.stats.max_doc))


def index_maxdoc(searcher) -> int:
    return int(searcher.stats.max_doc)


def index_sumtotaltermfreq(searcher) -> int:
    return int(searcher.stats.sum_total_term_freq)


def index_termfreq(searcher, term: str) -> DataFrame:
    """termfreq(field, term) as a per-doc frame (doc_id, tf) — join it to
    apply as a per-document value."""
    import pandas as pd  # noqa: F401

    tinfo = searcher.lookup_terms([term])
    if tinfo.empty:
        return searcher.spark.createDataFrame([], "doc_id long, tf int")

    from typing import Iterator

    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            docs_out, tfs_out = [], []
            for row in pdf.itertuples(index=False):
                gaps = np.asarray(row.doc_gaps, dtype=np.int64)
                docs_out.append(row.first_doc + np.cumsum(gaps))
                tfs_out.append(np.asarray(row.tfs, dtype=np.int32))
            if docs_out:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(docs_out),
                        "tf": np.concatenate(tfs_out),
                    }
                )

    rows = searcher.postings.where(F.col("term") == term).select(
        "first_doc", "doc_gaps", "tfs"
    )
    return rows.mapInPandas(kernel, schema="doc_id long, tf int")


def index_norm_decoded(searcher) -> DataFrame:
    """norm(field) per doc: the byte315 round-tripped 1/sqrt(len) weight."""
    from ..index.norms import NORM_DOCLEN_TABLE  # decoded lengths

    # decoded doc length table indexed by the stored byte
    tbl = F.array(*[F.lit(float(v)) for v in NORM_DOCLEN_TABLE.tolist()])
    return searcher.docs.select(
        "doc_id", F.element_at(tbl, F.col("norm_byte") + 1).alias("decoded_len")
    )


def index_joindf(searcher, frame: DataFrame, col: str) -> DataFrame:
    """JoinDocFreqValueSource / `joindf(field)`: the document frequency of
    the term held in another frame's column, read from the term dictionary
    (JoinDocFreqValueSource.java; ValueSourceParser.java:287). Terms not in
    the dictionary get df = 0."""
    t = searcher.terms.select(F.col("term").alias(col), F.col("df").alias("joindf"))
    return frame.join(t, col, "left").withColumn(
        "joindf", F.coalesce(F.col("joindf"), F.lit(0)).cast("long")
    )


def ord_frame(frame: DataFrame, col: str, out_col: str = "ord") -> DataFrame:
    """OrdFieldSource / `ord(field)` (ValueSourceParser.java:95): 1-based
    ordinal of the doc's value in the field's sorted value dictionary, 0 for
    missing. Scale-out: global ordinals come from a dense rank over the
    DISTINCT values (assign_dense_ids range-partition pass), joined back —
    never a single-task global window over the corpus."""
    from ..index.docids import assign_dense_ids

    vals = frame.select(col).where(F.col(col).isNotNull()).distinct()
    ranked = assign_dense_ids(vals, order_col=col, id_col="__ord")
    ranked = ranked.select(col, (F.col("__ord") + 1).alias(out_col))
    return frame.join(ranked, col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(0)).cast("long")
    )


def rord_frame(frame: DataFrame, col: str, out_col: str = "rord") -> DataFrame:
    """ReverseOrdFieldSource / `rord(field)` (ValueSourceParser.java:127):
    numValues - ord + 1 (so the LAST value gets 1), 0 for missing."""
    with_ord = ord_frame(frame, col, out_col="__o")
    n_vals = with_ord.agg(F.max("__o")).head()[0] or 0
    return with_ord.withColumn(
        out_col,
        F.when(F.col("__o") > 0, F.lit(int(n_vals) + 1) - F.col("__o"))
        .otherwise(F.lit(0))
        .cast("long"),
    ).drop("__o")


def query_score(searcher, terms: list[str], out_col: str = "qscore") -> DataFrame:
    """QueryValueSource / `query($q)` (ValueSourceParser.java:266): the
    subquery's relevance score as a per-doc value, default 0 where the
    subquery does not match. Returns (doc_id, qscore) to join onto any
    frame keyed by doc_id."""
    tinfo = searcher.lookup_terms(terms)
    if tinfo.empty:
        return searcher.spark.createDataFrame([], f"doc_id long, {out_col} float")
    return (
        searcher._scored(tinfo)
        .groupBy("doc_id")
        .agg(F.sum("score").cast("float").alias(out_col))
    )


EARTH_RADIUS_KM = 6371.0087714  # GeoUtils mean earth radius


def geodist(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """`geodist()` (ValueSourceParser.java:296 → HaversineFunction): great-
    circle distance in km on the mean earth radius — exactly hsin() pinned
    to that radius (one haversine implementation; {!geofilt}'s prefilter+
    verify contract depends on the two staying numerically identical)."""
    return hsin(EARTH_RADIUS_KM, lat1, lon1, lat2, lon2)


def boosted_topk(
    searcher,
    terms: list[str],
    boost_frame: DataFrame,
    boost_col: str,
    k: int = 10,
) -> DataFrame:
    """BoostedQuery (FunctionQParser boost): final = relevance × f(doc).
    `boost_frame` carries (doc_id, boost_col); docs missing from it keep
    their relevance score (boost treated as 1).

    The match set is scored WITHOUT a top-k (no global sort of every match):
    boost joins onto the unsorted scored frame, and the only ordering is the
    final distributed TakeOrderedAndProject at limit(k)."""
    tinfo = searcher.lookup_terms(terms)
    if tinfo.empty:
        return searcher._empty()
    matched = searcher._drop_deleted(
        searcher._scored(tinfo)
        .groupBy("doc_id")
        .agg(F.sum("score").cast("float").alias("score"))
    )
    joined = matched.join(boost_frame.select("doc_id", boost_col), "doc_id", "left")
    boosted = joined.select(
        "doc_id",
        (F.col("score") * F.coalesce(F.col(boost_col), F.lit(1.0)))
        .cast("double")
        .alias("score"),
    )
    return (
        boosted.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def boosting_query_topk(
    searcher,
    match_terms: list[str],
    context_terms: list[str],
    boost: float,
    k: int = 10,
) -> DataFrame:
    """BoostingQuery (lucene/queries/src/java/org/apache/lucene/queries/
    BoostingQuery.java:28-75): demote (boost < 1) or promote (boost > 1)
    docs that ALSO match a context query, without letting the context match
    anything by itself. The reference rewrites to BooleanQuery(match MUST,
    context SHOULD with boost 0) plus a coord override — context adds 0 to
    the sum, coord multiplies the score by `boost` exactly when both clauses
    matched. Net effect: score = match_score × (boost iff doc matches
    context else 1).

    Plan: the match terms score in one term-pruned scan; context docs decode
    NON-SCORING (like MUST_NOT's excluded side) and left-join as a flag —
    no second scoring pass, no global sort before the final top-k."""
    tinfo = searcher.lookup_terms(match_terms)
    if tinfo.empty:
        return searcher._empty()
    matched = (
        searcher._scored(tinfo)
        .groupBy("doc_id")
        .agg(F.sum("score").cast("float").alias("score"))
    )
    ctx_info = searcher.lookup_terms(context_terms)
    if not ctx_info.empty:
        ctx = searcher._posting_docs(ctx_info)
        if len(ctx_info) > 1:
            ctx = ctx.distinct()
        b32 = float(np.float32(boost))
        matched = matched.join(
            ctx.withColumn("_in_ctx", F.lit(True)), "doc_id", "left"
        ).select(
            "doc_id",
            F.when(
                F.col("_in_ctx"), (F.col("score") * F.lit(b32)).cast("float")
            )
            .otherwise(F.col("score"))
            .alias("score"),
        )
    return searcher._topk(searcher._drop_deleted(matched), k)


def custom_score_topk(
    searcher,
    terms: list[str],
    source_frame: DataFrame,
    value_cols: list[Column | str],
    k: int = 10,
    query_boost: float = 1.0,
) -> DataFrame:
    """CustomScoreQuery with the default provider (CustomScoreQuery.java,
    CustomScoreProvider.java:64-86): ModifiedScore = queryBoost ×
    subQueryScore × Π valSrcScores — the N-ValueSource generalization of
    BoostedQuery (boosted_topk handles the 1-source case with missing-row
    semantics). `value_cols` are Column expressions over `source_frame`
    (which must carry doc_id); docs absent from source_frame keep their
    relevance score (each missing factor is 1, FunctionQuery's default).

    Same plan discipline as boosted_topk: score the match set unsorted,
    join the factors, single TakeOrderedAndProject."""
    tinfo = searcher.lookup_terms(terms)
    if tinfo.empty:
        return searcher._empty()
    matched = searcher._drop_deleted(
        searcher._scored(tinfo)
        .groupBy("doc_id")
        .agg(F.sum("score").cast("float").alias("score"))
    )
    cols = [F.col(c) if isinstance(c, str) else c for c in value_cols]
    factors = source_frame.select(
        "doc_id", *(c.cast("double").alias(f"_vs{i}") for i, c in enumerate(cols))
    )
    joined = matched.join(factors, "doc_id", "left")
    product = F.lit(float(query_boost)).cast("double")
    for i in range(len(cols)):
        product = product * F.coalesce(F.col(f"_vs{i}"), F.lit(1.0))
    scored = joined.select(
        "doc_id", (F.col("score") * product).cast("double").alias("score")
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def function_range_docset(
    searcher,
    source: DataFrame,
    value: Column,
    l: float | None = None,
    u: float | None = None,
    incl: bool = True,
    incu: bool = True,
    key_col: str = "url",
) -> DataFrame:
    """{!frange} as a filter: ValueSourceRangeFilter semantics
    (solr/core/src/java/org/apache/solr/search/function/
    ValueSourceRangeFilter.java; FunctionRangeQParserPlugin.java:46-72) —
    docs whose function value lies in [l, u], bounds optional, inclusivity
    per `incl`/`incu` (both default true, like the parser). `value` is any
    ValueSource Column composed from this module (e.g.
    `sum_(F.col("rank_a"), F.col("rank_b"))` for the
    `fq={!frange l=0 u=2.2}sum(...)` example).

    Returns a non-scoring DocSet that composes with
    `search(..., filter_docs=...)` and `put_filter` (the fq/filterCache
    path) — the predicate evaluates as a pushdown-able Catalyst expression
    over the source scan, never a per-doc Python loop."""
    pred = F.lit(True)
    if l is not None:
        pred = pred & (value >= F.lit(l) if incl else value > F.lit(l))
    if u is not None:
        pred = pred & (value <= F.lit(u) if incu else value < F.lit(u))
    return searcher.filter_docs_from_source(source, pred, key_col=key_col)


def function_range_query(
    searcher,
    source: DataFrame,
    value: Column,
    l: float | None = None,
    u: float | None = None,
    incl: bool = True,
    incu: bool = True,
    boost: float = 1.0,
    k: int = 10,
    key_col: str = "url",
) -> DataFrame:
    """{!frange} as the MAIN query: FunctionRangeQuery extends
    SolrConstantScoreQuery (FunctionRangeQuery in
    FunctionRangeQParserPlugin.java:69-71), so every matching doc scores
    the query boost; top-k ties resolve docID-ascending exactly like
    TopScoreDocCollector on equal scores."""
    docset = function_range_docset(searcher, source, value, l, u, incl, incu, key_col)
    scored = docset.select(
        "doc_id", F.lit(float(np.float32(boost))).cast("float").alias("score")
    )
    return searcher._topk(searcher._drop_deleted(scored), k)


# --- registry tail (ValueSourceParser.java:95-444): the remaining named
# sources. threadid/sleep/testfunc are diagnostics with no analytics
# meaning (documented n/a). ---------------------------------------------------


def literal(value: str) -> Column:
    """LiteralValueSource (ValueSourceParser.java:119): constant string."""
    return F.lit(str(value))


def field(name: str) -> Column:
    """FieldValueSource — a raw field reference (ValueSourceParser.java:388
    `field(...)`); in the DataFrame model a column is already a value
    source."""
    return F.col(name)


def true_() -> Column:
    """BoolConstValueSource true (ValueSourceParser.java:410)."""
    return F.lit(True)


def false_() -> Column:
    """BoolConstValueSource false (ValueSourceParser.java:416)."""
    return F.lit(False)


def index_numdocs(searcher) -> int:
    """NumDocsValueSource (ValueSourceParser.java:434): maxDoc minus
    deleted docs — the live document count."""
    from ..index.deletes import read_deletes

    dels = read_deletes(searcher.spark, searcher.paths)
    n_deleted = dels.count() if dels is not None else 0
    return int(searcher.stats.max_doc) - int(n_deleted)


def top(x: Column) -> Column:
    """TopValueSource (ValueSourceParser.java:102): re-binds a source to the
    top-level reader. DataFrame columns are always collection-global, so
    this is the identity."""
    return x


def vector(*xs: Column) -> Column:
    """VectorValueSource (ValueSourceParser.java:302 `vector(...)`): bundle
    scalar sources into one multi-valued value."""
    return F.array(*[x.cast("double") for x in xs])


def sqedist(a: list[Column], b: list[Column]) -> Column:
    """SquaredEuclideanFunction (ValueSourceParser.java:337 `sqedist`)."""
    out = F.lit(0.0)
    for xa, xb in zip(a, b):
        d = xa.cast("double") - xb.cast("double")
        out = out + d * d
    return out


def dist(power: float, a: list[Column], b: list[Column]) -> Column:
    """VectorDistanceFunction (ValueSourceParser.java:345 `dist`): Minkowski
    p-norm distance; p=0 counts differing dimensions (sparseness), p=∞ is
    the max coordinate delta."""
    deltas = [F.abs(xa.cast("double") - xb.cast("double")) for xa, xb in zip(a, b)]
    if power == 0:
        out = F.lit(0.0)
        for d in deltas:
            out = out + F.when(d != 0.0, 1.0).otherwise(0.0)
        return out
    if power == float("inf"):
        return F.greatest(*deltas) if len(deltas) > 1 else deltas[0]
    out = F.lit(0.0)
    for d in deltas:
        out = out + F.pow(d, F.lit(float(power)))
    return F.pow(out, F.lit(1.0 / float(power)))


def hsin(radius: float, lat1: Column, lon1: Column, lat2: Column, lon2: Column,
         to_radians: bool = True) -> Column:
    """HaversineFunction (ValueSourceParser.java:311 `hsin`): great-circle
    distance on a caller-supplied sphere radius; inputs in degrees unless
    `to_radians=False` (the hsin convertToRadians flag)."""
    rlat1 = F.radians(lat1) if to_radians else lat1.cast("double")
    rlat2 = F.radians(lat2) if to_radians else lat2.cast("double")
    rlon1 = F.radians(lon1) if to_radians else lon1.cast("double")
    rlon2 = F.radians(lon2) if to_radians else lon2.cast("double")
    dlat = (rlat2 - rlat1) / 2.0
    dlon = (rlon2 - rlon1) / 2.0
    a = F.sin(dlat) * F.sin(dlat) + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    return (F.lit(2.0 * float(radius)) * F.asin(F.sqrt(a))).cast("double")


_GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lat: Column, lon: Column, precision: int = 12) -> Column:
    """GeoHashValueSource (ValueSourceParser.java:319 `geohash`):
    interleaved-bit base-32 geohash. Vectorized Arrow UDF (bit twiddling
    has no Catalyst expression); geohashing is a per-row O(precision)
    integer op, never a shuffle."""
    from pyspark.sql.functions import pandas_udf

    prec = int(precision)

    @pandas_udf("string")
    def _gh(la: pd.Series, lo: pd.Series) -> pd.Series:
        la_v = np.asarray(la, dtype=np.float64)
        lo_v = np.asarray(lo, dtype=np.float64)
        nbits = prec * 5
        # interleave lon (even bit positions, incl. the MSB) and lat (odd)
        lon_n = (nbits + 1) // 2
        lat_n = nbits // 2
        lon_q = np.floor((lo_v + 180.0) / 360.0 * (1 << lon_n)).astype(np.uint64)
        lat_q = np.floor((la_v + 90.0) / 180.0 * (1 << lat_n)).astype(np.uint64)
        np.clip(lon_q, 0, (1 << lon_n) - 1, out=lon_q)
        np.clip(lat_q, 0, (1 << lat_n) - 1, out=lat_q)
        out = []
        for lq, tq in zip(lon_q.tolist(), lat_q.tolist()):
            bits = 0
            for i in range(nbits):
                if i % 2 == 0:
                    b = (lq >> (lon_n - 1 - i // 2)) & 1
                else:
                    b = (tq >> (lat_n - 1 - i // 2)) & 1
                bits = (bits << 1) | b
            out.append(
                "".join(
                    _GEOHASH_B32[(bits >> (5 * (prec - 1 - j))) & 31]
                    for j in range(prec)
                )
            )
        return pd.Series(out)

    return _gh(lat.cast("double"), lon.cast("double"))


def ghhsin(radius: float, gh1: Column, gh2: Column) -> Column:
    """GeohashHaversineFunction (ValueSourceParser.java:327 `ghhsin`):
    haversine between two geohash-encoded points (decode → hsin)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def _decode(gh: pd.Series) -> pd.Series:
        def dec(s: str) -> list[float]:
            bits = 0
            for ch in s:
                bits = (bits << 5) | _GEOHASH_B32.index(ch)
            nbits = len(s) * 5
            lon_q = lat_q = 0
            for i in range(nbits):
                b = (bits >> (nbits - 1 - i)) & 1
                if i % 2 == 0:
                    lon_q = (lon_q << 1) | b
                else:
                    lat_q = (lat_q << 1) | b
            lon_n = (nbits + 1) // 2
            lat_n = nbits // 2
            lon = (lon_q + 0.5) / (1 << lon_n) * 360.0 - 180.0
            lat = (lat_q + 0.5) / (1 << lat_n) * 180.0 - 90.0
            return [lat, lon]

        return gh.map(dec)

    p1, p2 = _decode(gh1), _decode(gh2)
    return hsin(
        radius,
        F.element_at(p1, 1), F.element_at(p1, 2),
        F.element_at(p2, 1), F.element_at(p2, 2),
        to_radians=True,
    )


def strdist_jaro_winkler(a: Column, b: Column) -> Column:
    """strdist(..., 'jw') (ValueSourceParser.java:352 → JaroWinklerDistance):
    similarity in [0,1]. Vectorized Arrow UDF (no Catalyst builtin)."""
    from pyspark.sql.functions import pandas_udf

    def jw(s1: str, s2: str) -> float:
        if s1 == s2:
            return 1.0
        l1, l2 = len(s1), len(s2)
        if not l1 or not l2:
            return 0.0
        window = max(l1, l2) // 2 - 1
        m1 = [False] * l1
        m2 = [False] * l2
        matches = 0
        for i, c in enumerate(s1):
            lo, hi = max(0, i - window), min(l2, i + window + 1)
            for j in range(lo, hi):
                if not m2[j] and s2[j] == c:
                    m1[i] = m2[j] = True
                    matches += 1
                    break
        if not matches:
            return 0.0
        t = 0
        k = 0
        for i in range(l1):
            if m1[i]:
                while not m2[k]:
                    k += 1
                if s1[i] != s2[k]:
                    t += 1
                k += 1
        t //= 2
        jaro = (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0
        prefix = 0
        for c1, c2 in zip(s1, s2):
            if c1 != c2 or prefix == 4:
                break
            prefix += 1
        return jaro + prefix * 0.1 * (1.0 - jaro)

    @pandas_udf("double")
    def _jw(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series([jw(p or "", q or "") for p, q in zip(x, y)])

    return _jw(a, b)


def strdist_ngram(a: Column, b: Column, n: int = 2) -> Column:
    """strdist(..., 'ngram') (ValueSourceParser.java:352 → NGramDistance).
    DECLARED DIVERGENCE: the reference scores a DP alignment over n-gram
    profiles; this maps the name to a pure-JVM Jaccard over the distinct
    n-gram sets — same [0,1] range and 1.0-on-equal contract, stays inside
    whole-stage codegen (the exact DP would force a per-row UDF)."""
    def grams(c: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(1)))
        return F.array_distinct(F.transform(idx, lambda i: c.substr(i, F.lit(n))))

    ga, gb = grams(a), grams(b)
    inter = F.size(F.array_intersect(ga, gb)).cast("double")
    union = F.size(F.array_union(ga, gb)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(1.0))


def currency_convert(
    amount: Column, code: Column, target: str, rates: dict[str, float]
) -> Column:
    """CurrencyValueSource (ValueSourceParser.java:385 / CurrencyField):
    convert (amount, currency_code) into the target currency with a
    caller-supplied rate table (the FileExchangeRateProvider analog — Solr
    also loads rates from configuration, never the index)."""
    to_target = F.lit(float(rates[target]))
    expr = F.lit(None).cast("double")
    for cur, rate in rates.items():
        expr = F.when(code == cur, amount.cast("double") / F.lit(float(rate)) * to_target).otherwise(expr)
    return expr

"""XML query parser — the CoreParser query syntax over the engine's ops.

Reference: lucene/queryparser/src/java/org/apache/lucene/queryparser/xml/
CoreParser.java:60-117 (the default builder registry) and the builders/
package. Element coverage and their engine mappings:

  TermQuery / TermsQuery         → analyzed term clause(s)
  MatchAllDocsQuery              → match-all DocSet
  BooleanQuery / Clause@occurs   → Searcher.boolean_search (must / should /
                                   mustNot, minimumNumberShouldMatch)
  DisjunctionMaxQuery@tieBreaker → Searcher.max_score_search over the
                                   children's terms (term-shaped children)
  UserQuery                      → the classic QueryParser (query/parser.py)
  RangeFilter / TermRangeQuery   → dictionary range rewrite
  FilteredQuery                  → inner query with the filter's DocSet as
                                   filter_docs
  ConstantScoreQuery             → filter DocSet at constant score = boost
  SpanTerm / SpanOr / SpanOrTerms / SpanNear@slop,inOrder / SpanFirst@end /
  SpanNot                        → the span tree (query/spans.py) through
                                   Searcher.span_search

Attribute semantics follow the reference builders (TermQueryBuilder.java:34,
SpanNearBuilder.java:42-44, BooleanQueryBuilder.java:49-70,
SpanFirstBuilder, SpanNotBuilder). Unsupported elements raise ValueError
with the element name — the ParserException analog.

Scope notes (documented subset): BooleanQuery clauses must be term-shaped
(TermQuery/TermsQuery/UserQuery); payload-based BoostingTermQuery scores as
a plain SpanTerm (payloads are not indexed here); CachedFilter is the
filterCache's job and collapses to its wrapped filter.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .spans import SpanFirst, SpanNear, SpanNot, SpanOr, SpanTerm


def _text(e: ET.Element) -> str:
    return (e.text or "").strip()


def _terms_under(searcher, e: ET.Element) -> list[str]:
    """Term list for a term-shaped element."""
    tag = e.tag
    if tag in ("TermQuery", "SpanTerm", "BoostingTermQuery"):
        return searcher.analyze_query(_text(e))[:1] or []
    if tag in ("TermsQuery", "SpanOrTerms", "UserQuery"):
        return searcher.analyze_query(_text(e))
    raise ValueError(f"expected a term-shaped element, got <{tag}>")


def _span_node(searcher, e: ET.Element):
    tag = e.tag
    if tag in ("SpanTerm", "BoostingTermQuery"):
        t = _terms_under(searcher, e)
        return SpanTerm(t[0]) if t else None
    if tag == "SpanOrTerms":
        ts = _terms_under(searcher, e)
        return SpanOr(tuple(SpanTerm(t) for t in ts)) if ts else None
    if tag == "SpanOr":
        kids = [_span_node(searcher, c) for c in e]
        kids = [k for k in kids if k is not None]
        return SpanOr(tuple(kids)) if kids else None
    if tag == "SpanNear":
        slop = int(e.get("slop"))  # required (SpanNearBuilder.java:42)
        in_order = e.get("inOrder", "false").lower() == "true"
        kids = [_span_node(searcher, c) for c in e]
        if any(k is None for k in kids) or not kids:
            return None
        return SpanNear(tuple(kids), slop=slop, in_order=in_order)
    if tag == "SpanFirst":
        end = int(e.get("end"))
        kid = _span_node(searcher, e[0])
        return SpanFirst(kid, end=end) if kid is not None else None
    if tag == "SpanNot":
        inc = e.find("Include")
        exc = e.find("Exclude")
        i = _span_node(searcher, inc[0]) if inc is not None and len(inc) else None
        x = _span_node(searcher, exc[0]) if exc is not None and len(exc) else None
        if i is None:
            return None
        return SpanNot(i, x) if x is not None else i
    raise ValueError(f"unsupported span element <{tag}>")


def _filter_docset(searcher, e: ET.Element) -> DataFrame:
    tag = e.tag
    if tag == "CachedFilter":  # collapses to its wrapped filter/query
        return _filter_docset(searcher, e[0])
    if tag in ("RangeFilter", "TermRangeQuery", "NumericRangeFilter",
               "NumericRangeQuery"):
        lower, upper = e.get("lowerTerm"), e.get("upperTerm")
        inc_l = e.get("includeLower", "true").lower() != "false"
        inc_u = e.get("includeUpper", "true").lower() != "false"
        cond = None
        if lower is not None:
            cond = F.col("term") >= lower if inc_l else F.col("term") > lower
        if upper is not None:
            hi = F.col("term") <= upper if inc_u else F.col("term") < upper
            cond = hi if cond is None else (cond & hi)
        terms = searcher._rewrite_terms(cond) if cond is not None else []
        if not terms:
            return searcher.spark.createDataFrame([], "doc_id long")
        return searcher.match_docs(terms)
    # any query element can act as a filter (its match DocSet)
    hits = xml_query_search(searcher, e, k=2_000_000_000)
    return hits.select("doc_id")


def xml_query_search(
    searcher,
    xml: str | ET.Element,
    k: int = 10,
    filter_docs: DataFrame | None = None,
) -> DataFrame:
    """Parse a CoreParser XML query and execute it. Returns (doc_id, score)."""
    if isinstance(xml, str):
        # CoreParser hardens its SAX parser against DOCTYPE/entity tricks
        # (disallow-doctype-decl); mirror that — rejects billion-laughs
        # expansion bombs regardless of the host expat version.
        if "<!DOCTYPE" in xml or "<!ENTITY" in xml:
            raise ValueError("DOCTYPE/ENTITY declarations are not allowed in query XML")
        e = ET.fromstring(xml)
    else:
        e = xml
    tag = e.tag
    boost = float(e.get("boost", "1.0"))

    def _boosted(df: DataFrame) -> DataFrame:
        if boost == 1.0:
            return df
        return df.select(
            "doc_id", (F.col("score") * F.lit(boost)).cast("float").alias("score")
        )

    if tag in ("TermQuery", "TermsQuery", "UserQuery"):
        terms = _terms_under(searcher, e)
        if not terms:
            return searcher._empty()
        return _boosted(searcher.search(terms, k=k, filter_docs=filter_docs))
    if tag == "MatchAllDocsQuery":
        docs = searcher.docs.select("doc_id", F.lit(float(boost)).cast("float").alias("score"))
        if filter_docs is not None:
            docs = docs.join(filter_docs.select("doc_id"), "doc_id", "left_semi")
        return searcher._topk(searcher._drop_deleted(docs), k)
    if tag == "BooleanQuery":
        msm = int(e.get("minimumNumberShouldMatch", "0"))
        must, should, must_not = [], [], []
        for clause in e.findall("Clause"):
            occurs = clause.get("occurs", "should")
            child = clause[0]
            bucket = {"must": must, "should": should, "mustNot": must_not}[occurs]
            bucket.extend(_terms_under(searcher, child))
        return _boosted(
            searcher.boolean_search(
                must=must, should=should, must_not=must_not,
                min_should_match=msm, k=k, filter_docs=filter_docs,
            )
        )
    if tag == "DisjunctionMaxQuery":
        tie = float(e.get("tieBreaker", "0.0"))
        terms: list[str] = []
        for child in e:
            terms.extend(_terms_under(searcher, child))
        return _boosted(
            searcher.max_score_search(
                should=terms, tie=tie, k=k, filter_docs=filter_docs
            )
        )
    if tag == "FilteredQuery":
        q = e.find("Query")
        f = e.find("Filter")
        fd = _filter_docset(searcher, f[0]) if f is not None and len(f) else None
        if filter_docs is not None and fd is not None:
            fd = fd.join(filter_docs.select("doc_id"), "doc_id", "left_semi")
        return xml_query_search(searcher, q[0], k=k, filter_docs=fd)
    if tag == "ConstantScoreQuery":
        docset = _filter_docset(searcher, e[0])
        scored = docset.select(
            "doc_id", F.lit(float(boost)).cast("float").alias("score")
        )
        if filter_docs is not None:
            scored = scored.join(filter_docs.select("doc_id"), "doc_id", "left_semi")
        return searcher._topk(searcher._drop_deleted(scored), k)
    if tag in ("TermRangeQuery", "RangeFilter", "NumericRangeQuery",
               "NumericRangeFilter"):
        docset = _filter_docset(searcher, e)
        scored = docset.select(
            "doc_id", F.lit(float(boost)).cast("float").alias("score")
        )
        return searcher._topk(searcher._drop_deleted(scored), k)
    if tag in ("SpanTerm", "SpanOr", "SpanOrTerms", "SpanNear", "SpanFirst",
               "SpanNot", "BoostingTermQuery"):
        node = _span_node(searcher, e)
        if node is None:
            return searcher._empty()
        return _boosted(searcher.span_search(node, k=k, filter_docs=filter_docs))
    raise ValueError(f"unsupported query element <{tag}>")

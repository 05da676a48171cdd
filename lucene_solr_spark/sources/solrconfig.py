"""SolrConfig: solrconfig.xml parsing — caches, query-section knobs,
requestHandler registry with defaults/appends/invariants, update
processor chains, indexConfig — and the request-parameter resolution
the reference applies per request.

Reference:
- solr/core/src/java/org/apache/solr/core/SolrConfig.java — cache
  configs (filterCache/queryResultCache/documentCache/fieldValueCache +
  user caches), queryResultWindowSize, queryResultMaxDocsCached,
  maxBooleanClauses, enableLazyFieldLoading, useFilterForSortedQuery,
  indexConfig (ramBufferSizeMB/maxBufferedDocs/mergePolicy + factory
  args).
- solr/core/src/java/org/apache/solr/util/SolrPluginUtils.java
  setDefaults/setAppends/setInvariants: per request the effective
  params are  invariants  ▷  (user params  ▷  defaults)  plus appends
  concatenated onto whatever multi-valued list exists — invariants win
  unconditionally, appends can never be suppressed by the client.
- example solr/example/solr/collection1/conf/solrconfig.xml:506-606,
  804-900 for the canonical shapes (typed <str>/<int>/<bool>/<float>
  entries inside <lst name="defaults">, duplicate names = multi-valued).

Driver-side configuration surface: parsed once, the handler params feed
SolrQueries.select via resolve_params, cache sizes/window feed the
engine's existing filterCache/queryResultWindow knobs, indexConfig maps
onto build_index's ram_budget_mb.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

__all__ = ["SolrConfig", "resolve_params"]


def _typed_value(el) -> object:
    text = (el.text or "").strip()
    if el.tag == "int":
        return int(text)
    if el.tag == "long":
        return int(text)
    if el.tag == "float" or el.tag == "double":
        return float(text)
    if el.tag == "bool":
        return text.lower() == "true"
    if el.tag == "arr":
        return [_typed_value(c) for c in el]
    if el.tag == "lst":
        return _parse_lst(el)
    return text


def _parse_lst(lst_el) -> dict:
    """NamedList → dict; duplicate names become lists (multi-valued
    params like fq/facet.field)."""
    out: dict = {}
    for child in lst_el:
        name = child.get("name")
        val = _typed_value(child)
        if name in out:
            prev = out[name]
            if isinstance(prev, list) and not isinstance(val, list):
                prev.append(val)
            else:
                out[name] = [prev, val]
        else:
            out[name] = val
    return out


class CacheConfig:
    def __init__(self, el):
        self.class_ = el.get("class", "solr.LRUCache")
        self.size = int(el.get("size", 512))
        self.initial_size = int(el.get("initialSize", self.size))
        self.autowarm_count = int(el.get("autowarmCount", 0))
        self.name = el.get("name")


class RequestHandlerConfig:
    def __init__(self, el):
        self.name = el.get("name")
        self.class_ = el.get("class", "")
        self.default = el.get("default", "").lower() == "true"
        self.defaults: dict = {}
        self.appends: dict = {}
        self.invariants: dict = {}
        self.components: list[str] = []
        for lst in el.findall("lst"):
            section = lst.get("name")
            if section in ("defaults", "appends", "invariants"):
                setattr(self, section, _parse_lst(lst))
        for arr in el.findall("arr"):
            if arr.get("name") in ("components", "last-components",
                                   "first-components"):
                self.components.extend(
                    (c.text or "").strip() for c in arr)


class SolrConfig:
    STANDARD_CACHES = ("filterCache", "queryResultCache", "documentCache",
                       "fieldValueCache")

    def __init__(self):
        self.lucene_match_version = ""
        self.caches: dict[str, CacheConfig] = {}
        self.query_result_window_size = 1
        self.query_result_max_docs_cached = 1 << 31
        self.max_boolean_clauses = 1024
        self.enable_lazy_field_loading = False
        self.use_filter_for_sorted_query = False
        self.handlers: dict[str, RequestHandlerConfig] = {}
        self.update_chains: dict[str, list[tuple[str, dict]]] = {}
        self.ram_buffer_size_mb = 100.0  # 4.x solrconfig default
        self.max_buffered_docs: int | None = None
        self.merge_policy: str | None = None
        self.merge_policy_args: dict = {}

    @classmethod
    def from_xml(cls, xml_str: str) -> "SolrConfig":
        if "<!DOCTYPE" in xml_str or "<!ENTITY" in xml_str:
            raise ValueError(
                "solrconfig.xml must not contain a DOCTYPE declaration")
        root = ET.fromstring(xml_str)
        if root.tag != "config":
            raise ValueError(f"root element must be <config>, got {root.tag}")
        self = cls()
        lmv = root.find("luceneMatchVersion")
        if lmv is not None:
            self.lucene_match_version = (lmv.text or "").strip()

        query = root.find("query")
        if query is not None:
            for cache_name in self.STANDARD_CACHES:
                el = query.find(cache_name)
                if el is not None:
                    self.caches[cache_name] = CacheConfig(el)
            for el in query.findall("cache"):
                cc = CacheConfig(el)
                if cc.name:
                    self.caches[cc.name] = cc
            for tag, attr, conv in (
                    ("queryResultWindowSize", "query_result_window_size", int),
                    ("queryResultMaxDocsCached",
                     "query_result_max_docs_cached", int),
                    ("maxBooleanClauses", "max_boolean_clauses", int),
                    ("enableLazyFieldLoading",
                     "enable_lazy_field_loading",
                     lambda s: s.lower() == "true"),
                    ("useFilterForSortedQuery",
                     "use_filter_for_sorted_query",
                     lambda s: s.lower() == "true")):
                el = query.find(tag)
                if el is not None and el.text:
                    setattr(self, attr, conv(el.text.strip()))

        for el in root.findall(".//requestHandler"):
            h = RequestHandlerConfig(el)
            self.handlers[h.name] = h

        for chain in root.findall(".//updateRequestProcessorChain"):
            name = chain.get("name", "")
            procs = []
            for p in chain.findall("processor"):
                procs.append((p.get("class", ""), _parse_lst(p)))
            self.update_chains[name] = procs

        idx = root.find("indexConfig")
        if idx is not None:
            el = idx.find("ramBufferSizeMB")
            if el is not None and el.text:
                self.ram_buffer_size_mb = float(el.text.strip())
            el = idx.find("maxBufferedDocs")
            if el is not None and el.text:
                self.max_buffered_docs = int(el.text.strip())
            mp = idx.find("mergePolicy")
            if mp is not None:
                self.merge_policy = mp.get("class")
                self.merge_policy_args = _parse_lst(mp)
        return self

    def default_handler(self) -> RequestHandlerConfig | None:
        for h in self.handlers.values():
            if h.default:
                return h
        return self.handlers.get("/select")

    def handler_params(self, name: str, user_params: dict) -> dict:
        """Effective params for a request against the named handler."""
        h = self.handlers.get(name)
        if h is None:
            raise KeyError(f"unknown requestHandler {name!r}")
        return resolve_params(user_params, h.defaults, h.appends,
                              h.invariants)


def _as_list(v) -> list:
    return list(v) if isinstance(v, list) else [v]


def resolve_params(user: dict, defaults: dict | None = None,
                   appends: dict | None = None,
                   invariants: dict | None = None) -> dict:
    """SolrPluginUtils.setDefaults/setAppends/setInvariants: user params
    override defaults; appends concatenate onto the (possibly
    multi-valued) result; invariants override everything."""
    out = dict(defaults or {})
    out.update(user)
    for k, v in (appends or {}).items():
        if k in out:
            out[k] = _as_list(out[k]) + _as_list(v)
        else:
            out[k] = v
    out.update(invariants or {})
    return out

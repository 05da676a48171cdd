"""SolrConfig parsing + SolrPluginUtils param resolution
(solr/core SolrConfig.java, SolrPluginUtils.java; shapes from the
example solrconfig.xml:506-606, 804-900)."""

import pytest

from lucene_solr_spark.sources.solrconfig import SolrConfig, resolve_params

CONFIG = """
<config>
  <luceneMatchVersion>4.4</luceneMatchVersion>
  <indexConfig>
    <ramBufferSizeMB>16</ramBufferSizeMB>
    <maxBufferedDocs>1000</maxBufferedDocs>
    <mergePolicy class="org.apache.lucene.index.TieredMergePolicy">
      <int name="maxMergeAtOnce">10</int>
      <int name="segmentsPerTier">10</int>
    </mergePolicy>
  </indexConfig>
  <query>
    <maxBooleanClauses>1024</maxBooleanClauses>
    <filterCache class="solr.FastLRUCache" size="512" initialSize="512" autowarmCount="0"/>
    <queryResultCache class="solr.LRUCache" size="512" initialSize="512" autowarmCount="0"/>
    <documentCache class="solr.LRUCache" size="512" initialSize="512" autowarmCount="0"/>
    <cache name="myUserCache" class="solr.LRUCache" size="4096" initialSize="1024" autowarmCount="1024"/>
    <enableLazyFieldLoading>true</enableLazyFieldLoading>
    <queryResultWindowSize>20</queryResultWindowSize>
    <queryResultMaxDocsCached>200</queryResultMaxDocsCached>
  </query>
  <requestHandler name="/select" class="solr.SearchHandler" default="true">
    <lst name="defaults">
      <str name="echoParams">explicit</str>
      <int name="rows">10</int>
      <str name="df">text</str>
    </lst>
    <lst name="appends">
      <str name="fq">inStock:true</str>
    </lst>
    <lst name="invariants">
      <str name="facet.field">cat</str>
    </lst>
  </requestHandler>
  <requestHandler name="/query" class="solr.SearchHandler">
    <lst name="defaults">
      <str name="echoParams">explicit</str>
      <str name="wt">json</str>
      <str name="indent">true</str>
    </lst>
  </requestHandler>
  <updateRequestProcessorChain name="dedupe">
    <processor class="solr.processor.SignatureUpdateProcessorFactory">
      <bool name="enabled">true</bool>
      <str name="signatureField">id</str>
      <str name="fields">name,features,cat</str>
    </processor>
    <processor class="solr.RunUpdateProcessorFactory"/>
  </updateRequestProcessorChain>
</config>
"""


@pytest.fixture(scope="module")
def cfg():
    return SolrConfig.from_xml(CONFIG)


class TestParsing:
    def test_caches(self, cfg):
        assert cfg.caches["filterCache"].class_ == "solr.FastLRUCache"
        assert cfg.caches["filterCache"].size == 512
        assert cfg.caches["myUserCache"].size == 4096
        assert cfg.caches["myUserCache"].autowarm_count == 1024

    def test_query_section(self, cfg):
        assert cfg.query_result_window_size == 20
        assert cfg.query_result_max_docs_cached == 200
        assert cfg.max_boolean_clauses == 1024
        assert cfg.enable_lazy_field_loading is True

    def test_index_config(self, cfg):
        assert cfg.ram_buffer_size_mb == 16.0
        assert cfg.max_buffered_docs == 1000
        assert cfg.merge_policy.endswith("TieredMergePolicy")
        assert cfg.merge_policy_args == {
            "maxMergeAtOnce": 10, "segmentsPerTier": 10}

    def test_handlers(self, cfg):
        h = cfg.handlers["/select"]
        assert h.defaults == {"echoParams": "explicit", "rows": 10,
                              "df": "text"}
        assert h.appends == {"fq": "inStock:true"}
        assert h.invariants == {"facet.field": "cat"}
        assert cfg.default_handler().name == "/select"

    def test_update_chain(self, cfg):
        procs = cfg.update_chains["dedupe"]
        assert procs[0][0].endswith("SignatureUpdateProcessorFactory")
        assert procs[0][1] == {"enabled": True, "signatureField": "id",
                               "fields": "name,features,cat"}
        assert procs[1][0] == "solr.RunUpdateProcessorFactory"

    def test_doctype_rejected(self):
        with pytest.raises(ValueError, match="DOCTYPE"):
            SolrConfig.from_xml("<!DOCTYPE config []><config/>")


class TestParamResolution:
    def test_defaults_overridden_by_user(self, cfg):
        p = cfg.handler_params("/select", {"q": "spark", "rows": 3})
        assert p["rows"] == 3
        assert p["df"] == "text"

    def test_appends_concatenate(self, cfg):
        p = cfg.handler_params("/select", {"q": "x", "fq": "cat:a"})
        assert p["fq"] == ["cat:a", "inStock:true"]
        p2 = cfg.handler_params("/select", {"q": "x"})
        assert p2["fq"] == "inStock:true"

    def test_invariants_win(self, cfg):
        p = cfg.handler_params("/select",
                               {"q": "x", "facet.field": "brand"})
        assert p["facet.field"] == "cat"

    def test_resolve_params_order(self):
        out = resolve_params(
            {"a": "user", "m": "u1"},
            defaults={"a": "def", "b": "def"},
            appends={"m": "app"},
            invariants={"b": "inv"})
        assert out == {"a": "user", "b": "inv", "m": ["u1", "app"]}


class TestFacadeIntegration:
    def test_handler_select_applies_defaults(self, spark, tmp_path):
        from lucene_solr_spark.index.build import build_index
        from lucene_solr_spark.query.executor import Searcher
        from lucene_solr_spark.query.qparser import SolrQueries

        pages = spark.createDataFrame(
            [(f"u{i}", "spark fast" if i % 2 else "other words")
             for i in range(12)], "url string, text string")
        paths = build_index(spark, pages, str(tmp_path / "idx"))
        cfg = SolrConfig.from_xml("""
<config><requestHandler name="/select" class="solr.SearchHandler">
  <lst name="defaults"><int name="rows">2</int></lst>
</requestHandler></config>""")
        sq = SolrQueries(Searcher(spark, paths), config=cfg)
        res = sq.handler_select({"q": "spark"})
        assert len(res["response"]["docs"]) == 2  # rows default applied
        assert res["response"]["numFound"] == 6

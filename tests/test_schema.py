"""IndexSchema parity: schema.xml parsing, dynamic-field precedence,
copyField semantics, analyzer chain compilation.

Semantics from solr/core/src/java/org/apache/solr/schema/IndexSchema.java:
pattern forms and longest-first precedence (java:691-694, 933-990),
copyField validation messages (java:842-846), maxChars truncation;
analyzer chains per the example solr/example/solr/collection1/conf/
schema.xml field types.
"""

import pytest

from lucene_solr_spark.sources.schema import IndexSchema

SCHEMA = """
<schema name="test" version="1.5">
  <types>
    <fieldType name="string" class="solr.StrField"/>
    <fieldType name="int" class="solr.TrieIntField"/>
    <fieldType name="text_general" class="solr.TextField">
      <analyzer type="index">
        <tokenizer class="solr.StandardTokenizerFactory"/>
        <filter class="solr.StopFilterFactory" ignoreCase="true" words="stopwords.txt"/>
        <filter class="solr.LowerCaseFilterFactory"/>
      </analyzer>
      <analyzer type="query">
        <tokenizer class="solr.StandardTokenizerFactory"/>
        <filter class="solr.StopFilterFactory" ignoreCase="true" words="stopwords.txt"/>
        <filter class="solr.SynonymFilterFactory" synonyms="synonyms.txt" ignoreCase="true" expand="true"/>
        <filter class="solr.LowerCaseFilterFactory"/>
      </analyzer>
    </fieldType>
    <fieldType name="text_en" class="solr.TextField">
      <analyzer>
        <tokenizer class="solr.StandardTokenizerFactory"/>
        <filter class="solr.LowerCaseFilterFactory"/>
        <filter class="solr.KeywordMarkerFilterFactory" protected="protwords.txt"/>
        <filter class="solr.PorterStemFilterFactory"/>
      </analyzer>
    </fieldType>
  </types>
  <fields>
    <field name="id" type="string" indexed="true" stored="true" required="true"/>
    <field name="title" type="text_general" indexed="true" stored="true"/>
    <field name="body" type="text_en" indexed="true" stored="false"/>
    <field name="all_text" type="text_general" indexed="true" stored="false" multiValued="true"/>
    <field name="title_exact" type="string" indexed="true" stored="false"/>
    <dynamicField name="*_i" type="int" indexed="true" stored="true"/>
    <dynamicField name="*_s" type="string" indexed="true" stored="true"/>
    <dynamicField name="attr_*" type="string" indexed="true" stored="true" multiValued="true"/>
    <dynamicField name="*_exact_s" type="string" indexed="true" stored="false"/>
  </fields>
  <copyField source="title" dest="all_text"/>
  <copyField source="body" dest="all_text"/>
  <copyField source="title" dest="title_exact" maxChars="5"/>
  <uniqueKey>id</uniqueKey>
</schema>
"""

RESOURCES = {
    "stopwords.txt": ["# comment", "a", "an", "the"],
    "synonyms.txt": ["tv, television", "seabiscuit => biscuit"],
    "protwords.txt": ["running"],
}


@pytest.fixture(scope="module")
def schema():
    return IndexSchema.from_xml(SCHEMA, resources=RESOURCES)


class TestParsing:
    def test_basics(self, schema):
        assert schema.name == "test"
        assert schema.unique_key == "id"
        assert set(schema.fields) == {
            "id", "title", "body", "all_text", "title_exact"}
        assert schema.resolve("id").type.class_ == "solr.StrField"

    def test_unknown_field_raises(self, schema):
        with pytest.raises(KeyError, match="undefined field"):
            schema.resolve("nope")

    def test_doctype_rejected(self):
        with pytest.raises(ValueError, match="DOCTYPE"):
            IndexSchema.from_xml(
                "<!DOCTYPE schema []><schema name='x'></schema>")


class TestDynamicFields:
    def test_suffix_and_prefix_patterns(self, schema):
        assert schema.resolve("count_i").type.class_ == "solr.TrieIntField"
        assert schema.resolve("foo_s").type.class_ == "solr.StrField"
        assert schema.resolve("attr_color").multi_valued

    def test_longest_pattern_wins(self, schema):
        # *_exact_s is longer than *_s and must win for name_exact_s
        # (IndexSchema sorts dynamic fields longest-first, java:691-694)
        sf = schema.resolve("name_exact_s")
        assert sf.props.get("stored") == "false"
        sf2 = schema.resolve("name_s")
        assert sf2.props.get("stored", "true") == "true"


class TestAnalyzers:
    def test_index_chain(self, schema):
        # stop (ignoreCase, applied pre-lowercase) then lowercase
        assert schema.analyze("title", "The Quick A Fox") == \
            ["quick", "fox"]

    def test_query_chain_synonyms(self, schema):
        assert schema.analyze("title", "TV show", mode="query") == \
            ["tv", "television", "show"]
        assert schema.analyze("title", "seabiscuit", mode="query") == \
            ["biscuit"]

    def test_keyword_marker_protects_stemming(self, schema):
        # 'running' is protected from the Porter stage; 'jumping' is not
        assert schema.analyze("body", "running jumping") == \
            ["running", "jump"]

    def test_untyped_analyzer_serves_both(self, schema):
        assert schema.analyze("body", "Walking", mode="query") == ["walk"]

    def test_str_field_is_keyword(self, schema):
        assert schema.analyze("id", "Hello World") == ["Hello World"]


class TestCopyFields:
    def test_validation_messages(self):
        with pytest.raises(ValueError, match="is not a glob and doesn't"):
            IndexSchema.from_xml("""
<schema name="x"><fieldType name="string" class="solr.StrField"/>
<field name="a" type="string"/>
<copyField source="missing" dest="a"/></schema>""")
        with pytest.raises(ValueError, match="is not an explicit field"):
            IndexSchema.from_xml("""
<schema name="x"><fieldType name="string" class="solr.StrField"/>
<field name="a" type="string"/>
<copyField source="a" dest="missing"/></schema>""")

    def test_apply_multivalued_dest(self, schema, spark):
        df = spark.createDataFrame(
            [("1", "Hello World", "some body text")],
            "id string, title string, body string")
        out = schema.apply_copy_fields(df)
        row = out.collect()[0]
        assert row["all_text"] == ["Hello World", "some body text"]
        # maxChars=5 truncation (CopyField.getLimitedValue)
        assert row["title_exact"] == "Hello"

    def test_glob_source(self, spark):
        schema = IndexSchema.from_xml("""
<schema name="x"><fieldType name="string" class="solr.StrField"/>
<field name="catchall" type="string" multiValued="true"/>
<dynamicField name="attr_*" type="string"/>
<copyField source="attr_*" dest="catchall"/></schema>""")
        df = spark.createDataFrame(
            [("red", "large", "x")],
            "attr_color string, attr_size string, other string")
        row = schema.apply_copy_fields(df).collect()[0]
        assert sorted(row["catchall"]) == ["large", "red"]

    def test_single_valued_dest_with_two_sources_raises(self, spark):
        schema = IndexSchema.from_xml("""
<schema name="x"><fieldType name="string" class="solr.StrField"/>
<field name="a" type="string"/><field name="b" type="string"/>
<field name="dst" type="string"/>
<copyField source="a" dest="dst"/><copyField source="b" dest="dst"/>
</schema>""")
        df = spark.createDataFrame([("1", "2", None)],
                                   "a string, b string, dst string")
        with pytest.raises(ValueError, match="not multiValued"):
            schema.apply_copy_fields(df)

    def test_flatten_multivalued_source(self, spark):
        schema = IndexSchema.from_xml("""
<schema name="x"><fieldType name="string" class="solr.StrField"/>
<field name="tags" type="string" multiValued="true"/>
<field name="all" type="string" multiValued="true"/>
<copyField source="tags" dest="all"/></schema>""")
        df = spark.createDataFrame([(["a", "b"],)], "tags array<string>")
        row = schema.apply_copy_fields(df).collect()[0]
        assert row["all"] == ["a", "b"]


class TestSparkDDL:
    def test_struct_ddl(self, schema):
        ddl = schema.struct_type_ddl()
        assert "`id` string" in ddl
        assert "`all_text` array<string>" in ddl

    def test_resource_missing_raises(self):
        with pytest.raises(KeyError, match="stopwords.txt"):
            IndexSchema.from_xml(SCHEMA, resources={})

"""DataImportHandler transformer parity (solr/contrib/dataimporthandler).

Goldens ported from TestRegexTransformer.java (split/groupNames/
replaceWith cases), plus template/date/number/htmlstrip semantics per
their transformer sources.
"""

import datetime

import pytest

from lucene_solr_spark.sources.dih import transform_entity


def _row(spark, df):
    return df.collect()[0].asDict()


class TestRegex:
    def test_comma_separated(self, spark):
        # TestRegexTransformer.testCommaSeparated
        df = spark.createDataFrame([("a,bb,cc,d",)], "a string")
        out = transform_entity(
            df, [{"column": "col1", "sourceColName": "a", "splitBy": ","}],
            "RegexTransformer")
        assert _row(spark, out)["col1"] == ["a", "bb", "cc", "d"]

    def test_split_drops_trailing_empties(self, spark):
        # Java String.split semantics
        df = spark.createDataFrame([("a,,b,,",)], "a string")
        out = transform_entity(
            df, [{"column": "c", "sourceColName": "a", "splitBy": ","}],
            "RegexTransformer")
        assert _row(spark, out)["c"] == ["a", "", "b"]

    def test_group_names(self, spark):
        # testGroupNames: groupNames=",firstName,lastName" — the empty
        # first name skips group 1
        df = spark.createDataFrame([("Mr Noble Paul",)], "fullName string")
        out = transform_entity(
            df, [{"column": "fullName", "groupNames": ",firstName,lastName",
                  "regex": r"(\w*) (\w*) (\w*)"}], "RegexTransformer")
        row = _row(spark, out)
        assert row["firstName"] == "Noble"
        assert row["lastName"] == "Paul"
        assert row["fullName"] == "Mr Noble Paul"  # column untouched

    def test_replace_with(self, spark):
        # testReplaceWith: regex="'" replaceWith="''"
        df = spark.createDataFrame([("D'souza",)], "name string")
        out = transform_entity(
            df, [{"column": "name", "regex": "'", "replaceWith": "''"}],
            "RegexTransformer")
        assert _row(spark, out)["name"] == "D''souza"

    def test_mileage_extraction_and_nonmatch(self, spark):
        # testMileage shapes: extraction, replaceWith with $1, and a
        # non-matching regex leaving the value untouched
        s = "Fuel Economy Range: 26 mpg Hwy, 19 mpg City"
        df = spark.createDataFrame([(s,)], "rowdata string")
        fields = [
            {"column": "city_mileage", "sourceColName": "rowdata",
             "regex": r"([0-9]+) mpg City"},
            {"column": "highway_mileage", "sourceColName": "rowdata",
             "regex": r"([0-9]+) mpg Hwy"},
            {"column": "hltCityMPG", "sourceColName": "rowdata",
             "regex": r"([0-9]+ mpg City)", "replaceWith": "*** $1 ***"},
        ]
        out = transform_entity(df, fields, "RegexTransformer")
        row = _row(spark, out)
        assert row["city_mileage"] == "19"
        assert row["highway_mileage"] == "26"
        assert row["rowdata"] == s
        assert row["hltCityMPG"].endswith("*** 19 mpg City ***")

    def test_multiple_unnamed_groups_make_array(self, spark):
        df = spark.createDataFrame([("26 Hwy, 19 City",)], "rowdata string")
        out = transform_entity(
            df, [{"column": "both", "sourceColName": "rowdata",
                  "regex": r"([0-9]+) Hwy, ([0-9]+) City"}],
            "RegexTransformer")
        assert _row(spark, out)["both"] == ["26", "19"]


class TestTemplate:
    def test_concat(self, spark):
        df = spark.createDataFrame([("A", "B")], "x string, y string")
        out = transform_entity(
            df, [{"column": "joined", "template": "${e.x}-${e.y}"}],
            "TemplateTransformer")
        assert _row(spark, out)["joined"] == "A-B"

    def test_null_variable_leaves_column(self, spark):
        # TemplateTransformer: unresolvable variable → column untouched
        df = spark.createDataFrame([("A", None, "orig")],
                                   "x string, y string, joined string")
        out = transform_entity(
            df, [{"column": "joined", "template": "${e.x}-${e.y}"}],
            "TemplateTransformer")
        assert _row(spark, out)["joined"] == "orig"

    def test_bare_variable_keeps_type(self, spark):
        df = spark.createDataFrame([(7,)], "n long")
        out = transform_entity(
            df, [{"column": "copy", "template": "${e.n}"}],
            "TemplateTransformer")
        row = _row(spark, out)
        assert row["copy"] == 7 and isinstance(row["copy"], int)


class TestDateNumber:
    def test_date_parse(self, spark):
        df = spark.createDataFrame([("2007-02-15 13:45:09",)], "d string")
        out = transform_entity(
            df, [{"column": "ts", "sourceColName": "d",
                  "dateTimeFormat": "yyyy-MM-dd HH:mm:ss"}],
            "DateFormatTransformer")
        assert _row(spark, out)["ts"] == datetime.datetime(2007, 2, 15, 13, 45, 9)

    def test_number_styles(self, spark):
        df = spark.createDataFrame(
            [("123,567", "50%", "$1,234.56", "2,200")],
            "n string, p string, c string, i string")
        fields = [
            {"column": "n", "formatStyle": "number"},
            {"column": "p", "formatStyle": "percent"},
            {"column": "c", "formatStyle": "currency"},
            {"column": "i", "formatStyle": "integer"},
        ]
        row = _row(spark, transform_entity(
            df, fields, "NumberFormatTransformer"))
        assert row["n"] == 123567.0
        assert row["p"] == 0.5
        assert row["c"] == 1234.56
        assert row["i"] == 2200

    def test_number_locale_de(self, spark):
        df = spark.createDataFrame([("1.234,56",)], "n string")
        row = _row(spark, transform_entity(
            df, [{"column": "n", "formatStyle": "number",
                  "locale": "de-DE"}], "NumberFormatTransformer"))
        assert row["n"] == 1234.56


class TestOthers:
    def test_htmlstrip_and_clob(self, spark):
        df = spark.createDataFrame(
            [("<b>hello</b> <i>world</i>",)], "body string")
        row = _row(spark, transform_entity(
            df, [{"column": "body", "stripHTML": "true"}],
            "HTMLStripTransformer"))
        assert "hello" in row["body"] and "<b>" not in row["body"]

        df2 = spark.createDataFrame([(b"bytes here",)], "lob binary")
        row2 = _row(spark, transform_entity(
            df2, [{"column": "lob", "clob": "true"}], "ClobTransformer"))
        assert row2["lob"] == "bytes here"

    def test_chain_order(self, spark):
        # regex extract then template over the extracted column
        df = spark.createDataFrame([("id=42 rest",)], "raw string")
        fields = [
            {"column": "ident", "sourceColName": "raw",
             "regex": r"id=(\d+)"},
            {"column": "key", "template": "doc-${e.ident}"},
        ]
        row = _row(spark, transform_entity(
            df, fields, "RegexTransformer,TemplateTransformer"))
        assert row["key"] == "doc-42"

    def test_script_transformer_excluded(self, spark):
        df = spark.createDataFrame([("x",)], "a string")
        with pytest.raises(NotImplementedError):
            transform_entity(df, [], "ScriptTransformer")

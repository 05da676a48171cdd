"""Update-processor chain tests (solr update/processor factories)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.pipeline import processors as P


def test_trim_remove_blank_truncate(spark):
    df = spark.createDataFrame(
        [("  hi  ", [" a ", "", "b  "]),], "s string, m array<string>"
    )
    out = P.trim_fields(df, ["s", "m"])
    r = out.collect()[0]
    assert r["s"] == "hi" and r["m"] == ["a", "", "b"]
    r2 = P.remove_blank_fields(out, ["s", "m"]).collect()[0]
    assert r2["m"] == ["a", "b"]
    r3 = P.remove_blank_fields(
        spark.createDataFrame([("",)], "s string"), ["s"]
    ).collect()[0]
    assert r3["s"] is None
    r4 = P.truncate_fields(df, ["s"], 4).collect()[0]
    assert r4["s"] == "  hi"


def test_regex_replace_is_literal(spark):
    # RegexReplaceProcessorFactory quotes the replacement: "$1" is literal
    df = spark.createDataFrame([("a  b\tc",)], "s string")
    r = P.regex_replace_fields(df, ["s"], r"\s+", " ").collect()[0]
    assert r["s"] == "a b c"
    r2 = P.regex_replace_fields(df, ["s"], r"\s+", "$1").collect()[0]
    assert r2["s"] == "a$1b$1c"


def test_lengths_counts_clones(spark):
    df = spark.createDataFrame(
        [("hello", ["x", "y", "z"])], "s string, m array<string>"
    )
    assert P.field_length(df, ["s"]).collect()[0]["s"] == 5
    assert P.count_field_values(df, "m", "m_count").collect()[0]["m_count"] == 3
    assert P.clone_field(df, "s", "s2").collect()[0]["s2"] == "hello"
    assert "m" not in P.ignore_fields(df, ["m"]).columns
    assert P.concat_fields(df, ["m"], "; ").collect()[0]["m"] == "x; y; z"


def test_subset_selectors(spark):
    df = spark.createDataFrame([([3, 1, 2, 1],)], "m array<int>")
    assert P.first_field_value(df, ["m"]).collect()[0]["m"] == 3
    assert P.last_field_value(df, ["m"]).collect()[0]["m"] == 1
    assert P.min_field_value(df, ["m"]).collect()[0]["m"] == 1
    assert P.max_field_value(df, ["m"]).collect()[0]["m"] == 3
    assert P.uniq_field_values(df, ["m"]).collect()[0]["m"] == [3, 1, 2]


def test_defaults_timestamp_uuid(spark):
    df = spark.createDataFrame([("x", None)], "a string, b string")
    assert P.default_value(df, "b", "fb").collect()[0]["b"] == "fb"
    assert P.default_value(df, "c", 7).collect()[0]["c"] == 7
    r = P.timestamp_field(df, "ts").collect()[0]
    assert r["ts"] is not None
    r2 = P.uuid_field(df, "id").collect()[0]
    assert len(r2["id"]) == 36


def test_parse_numeric_all_or_none(spark):
    good = spark.createDataFrame([("1",), (" 2 ",), (None,)], "v string")
    out = P.parse_int_fields(good, ["v"])
    assert [r["v"] for r in out.orderBy("v").collect()] == [None, 1, 2]
    assert dict(out.dtypes)["v"] == "int"
    # one bad value → whole field untouched (string type kept)
    mixed = spark.createDataFrame([("1",), ("x",)], "v string")
    out2 = P.parse_int_fields(mixed, ["v"])
    assert dict(out2.dtypes)["v"] == "string"


def test_parse_boolean_and_date(spark):
    df = spark.createDataFrame([("TRUE",), ("false",)], "v string")
    out = P.parse_boolean_fields(df, ["v"])
    assert {r["v"] for r in out.collect()} == {True, False}
    # case-sensitive: "TRUE" no longer parses → untouched
    out2 = P.parse_boolean_fields(df, ["v"], case_sensitive=True)
    assert dict(out2.dtypes)["v"] == "string"

    dd = spark.createDataFrame([("2024-02-29 10:00:00",), ("2024/03/01",)], "v string")
    out3 = P.parse_date_fields(
        dd, ["v"], ["yyyy-MM-dd HH:mm:ss", "yyyy/MM/dd"]
    )
    assert dict(out3.dtypes)["v"] == "timestamp"
    assert all(r["v"] is not None for r in out3.collect())


def test_chain_composes(spark):
    df = spark.createDataFrame([("  42  ", None)], "n string, note string")
    chain = P.ProcessorChain(
        lambda d: P.trim_fields(d, ["n"]),
        lambda d: P.parse_int_fields(d, ["n"]),
        lambda d: P.default_value(d, "note", "none"),
        lambda d: P.timestamp_field(d, "ts"),
    )
    r = chain.run(df).collect()[0]
    assert r["n"] == 42 and r["note"] == "none" and r["ts"] is not None


def test_regexp_boost(spark):
    from lucene_solr_spark.pipeline.processors import regexp_boost

    df = spark.createDataFrame(
        [("https://my.domain.com/temp1",),
         ("https://my.domain.com/keep",),
         ("https://spam.site/temp2",)],
        "url string",
    )
    out = regexp_boost(df, [
        (r"https?://my\.domain\.com/temp.*", 0.2),
        (r".*spam.*", 0.1),
        (r".*temp.*", 0.5),   # multiplies with the others on overlap
    ])
    got = {r["url"]: r["urlboost"] for r in out.collect()}
    assert got["https://my.domain.com/temp1"] == pytest.approx(0.2 * 0.5)
    assert got["https://my.domain.com/keep"] == 1.0
    assert got["https://spam.site/temp2"] == pytest.approx(0.1 * 0.5)

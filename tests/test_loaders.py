"""Loader parity: format readers conform to the input_hint schema; delta
pulls filter by watermark with scan-level pruning."""

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.sources.loaders import conform_pages, delta_pages, read_pages


def test_conform_fills_missing_optional(spark):
    df = spark.createDataFrame([("u1", "hello world")], "url string, text string")
    out = conform_pages(df)
    assert [f.name for f in out.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    row = out.head()
    assert row.url == "u1" and row.text == "hello world" and row.lang is None


def test_conform_derives_text_from_html(spark):
    df = spark.createDataFrame(
        [("u1", bytearray(b"<html><body><p>Fast &amp; <b>simple</b></p></body></html>"))],
        "url string, html binary",
    )
    out = conform_pages(df)
    row = out.head()
    assert row.text == "Fast & simple"
    assert row.html is not None  # raw html column preserved alongside


def test_conform_rejects_missing_required(spark):
    df = spark.createDataFrame([("x",)], "lang string")
    with pytest.raises(ValueError, match="required"):
        conform_pages(df)


def test_read_json_and_csv(spark, tmp_path):
    rows = [
        {"url": "u1", "text": "alpha beta", "lang": "en", "extra": 1},
        {"url": "u2", "text": "gamma", "lang": "de", "extra": 2},
    ]
    jpath = str(tmp_path / "pages.json")
    with open(jpath, "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in rows))
    out = read_pages(spark, jpath, fmt="json").orderBy("url").collect()
    assert [r.url for r in out] == ["u1", "u2"]
    assert "extra" not in read_pages(spark, jpath, fmt="json").columns

    cpath = str(tmp_path / "pages_csv")
    spark.createDataFrame(
        [("u3", "delta text", "fr")], "url string, text string, lang string"
    ).write.option("header", "true").csv(cpath)
    out2 = read_pages(spark, cpath, fmt="csv").collect()
    assert out2[0].url == "u3" and out2[0].warc_ts is None


def test_delta_pull_filters_and_prunes(spark, tmp_path):
    base = datetime.datetime(2025, 1, 1)
    rows = [
        ("u1", base, "old"),
        ("u2", base + datetime.timedelta(days=2), "new"),
    ]
    p = str(tmp_path / "pages_pq")
    spark.createDataFrame(rows, "url string, warc_ts timestamp, text string").write.parquet(p)
    got = delta_pages(spark, p, since=base + datetime.timedelta(days=1)).collect()
    assert [r.url for r in got] == ["u2"]
    # predicate reaches the scan (file/row-group pruning at scale)
    plan = (
        delta_pages(spark, p, since=base)._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan or "DataFilters" in plan

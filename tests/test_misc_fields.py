"""ExternalFileField loader, RandomSortField hash, ToChildBlockJoinQuery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.query.components import (
    block_join_children,
    random_sort_value,
)
from lucene_solr_spark.sources.loaders import external_file_field


def _wang_oracle(key: int) -> int:
    """Thomas Wang hash32shift exactly as RandomSortField.java:68-77."""
    M = 0xFFFFFFFF
    key &= M
    key = ((~key & M) + ((key << 15) & M)) & M
    key ^= key >> 12
    key = (key + ((key << 2) & M)) & M
    key ^= key >> 4
    key = (key * 2057) & M
    key ^= key >> 16
    return key >> 1


def _java_string_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) & 0xFFFFFFFF
    return h - (1 << 32) if h >= 1 << 31 else h


def test_external_file_field_parse_rules(spark, tmp_path):
    p = tmp_path / "external_rank"
    p.write_text(
        "u0=1.5\n"
        "garbage line without delimiter\n"
        "u1=notafloat\n"
        "u2=2.0\n"
        "a=b=3.25\n"  # split on LAST '=' -> key 'a=b'
        "u0=9.0\n"  # last line for u0 wins
    )
    out = external_file_field(spark, str(p), key_col="url", val_col="v").toPandas()
    got = dict(zip(out["url"], out["v"]))
    assert got == {"u0": pytest.approx(9.0), "u2": pytest.approx(2.0),
                   "a=b": pytest.approx(3.25)}


def test_random_sort_value_matches_java_hash(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    out = df.select(
        "doc_id", random_sort_value(F.col("doc_id"), "rand_1", 7).alias("r")
    ).toPandas()
    seed = (_java_string_hash("rand_1") + 7) & 0xFFFFFFFF
    for doc, r in zip(out["doc_id"], out["r"]):
        assert int(r) == _wang_oracle(seed + int(doc))
    # a different field name / version reshuffles
    out2 = df.select(random_sort_value(F.col("doc_id"), "rand_2", 7).alias("r")).toPandas()
    assert out2["r"].tolist() != out["r"].tolist()
    # deterministic across evaluations
    out3 = df.select(random_sort_value(F.col("doc_id"), "rand_1", 7).alias("r")).toPandas()
    assert out3["r"].tolist() == out["r"].tolist()


def test_block_join_children(spark):
    parents = spark.createDataFrame(
        [("p1", 5.0), ("p2", 1.0), ("p3", 8.0)], "pk string, pscore double"
    )
    children = spark.createDataFrame(
        [("p1", "c1"), ("p1", "c2"), ("p2", "c3"), ("p3", "c4")],
        "pk string, cid string",
    )
    got = block_join_children(
        children, parents, F.col("pscore") > 3.0, "pk", score_col="pscore"
    ).toPandas()
    scores = dict(zip(got["cid"], got["parent_score"]))
    assert scores == {"c1": 5.0, "c2": 5.0, "c4": 8.0}
    semi = block_join_children(children, parents, F.col("pscore") > 3.0, "pk")
    assert sorted(r.cid for r in semi.collect()) == ["c1", "c2", "c4"]

"""SweetSpotSimilarity: tf/lengthNorm kernels vs the Java formulas, and
engine top-k vs the exhaustive oracle (SweetSpotSimilarity.java:137-227)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.query.executor import Searcher
from lucene_solr_spark.query.sweetspot import (
    baseline_tf,
    brute_force_topk_sweetspot,
    compute_length_norm,
    hyperbolic_tf,
    sweetspot_norm_table,
)


def test_length_norm_plateau():
    # lengths within [min, max] norm to exactly 1.0
    ln = compute_length_norm(np.array([3, 4, 5]), ln_min=3, ln_max=5, steep=0.5)
    assert (ln == np.float32(1.0)).all()
    # outside the plateau it decays
    out = compute_length_norm(np.array([10]), ln_min=3, ln_max=5, steep=0.5)
    assert float(out[0]) == pytest.approx(1.0 / math.sqrt(0.5 * (7 + 5 - 2) + 1))


def test_default_degrades_to_inverse_sqrt():
    # javadoc: min=max=1, steepness=0.5 degrades to 1/sqrt(x)
    lens = np.array([1, 4, 9, 16, 49])
    ln = compute_length_norm(lens)
    np.testing.assert_allclose(ln, 1.0 / np.sqrt(lens), rtol=1e-6)


def test_baseline_tf_defaults_degrade_to_sqrt():
    fr = np.array([0, 1, 2, 9], dtype=np.float32)
    np.testing.assert_allclose(baseline_tf(fr), np.sqrt(fr), rtol=1e-6)


def test_baseline_tf_floor_and_base():
    got = baseline_tf(np.array([0.0, 1.0, 5.0, 10.0]), base=1.5, tf_min=5.0)
    assert float(got[0]) == 0.0
    assert float(got[1]) == np.float32(1.5)  # freq <= min -> base
    assert float(got[2]) == np.float32(1.5)
    assert float(got[3]) == pytest.approx(math.sqrt(10 + 1.5**2 - 5), rel=1e-6)


def test_hyperbolic_tf_bounds_and_midpoint():
    got = hyperbolic_tf(np.array([0.0, 10.0, 1000.0], dtype=np.float32))
    assert float(got[0]) == 0.0
    assert float(got[1]) == pytest.approx(1.0, rel=1e-6)  # midpoint: min+(max-min)/2
    assert float(got[2]) == pytest.approx(2.0, rel=1e-6)  # hard ceiling (or NaN clamp)


def test_norm_table_requantizes_through_byte315():
    from lucene_solr_spark.index.norms import byte315_to_float, float_to_byte315

    table = sweetspot_norm_table(ln_min=2, ln_max=6, steep=0.4)
    # every entry must be exactly representable as a byte315 decode
    rt = byte315_to_float(float_to_byte315(table.astype(np.float32)))
    np.testing.assert_array_equal(table, rt.astype(np.float32))


def _texts(n=40, seed=13):
    rng = np.random.default_rng(seed)
    vocab = ["spark", "merge", "query", "fast", "index", "scan", "shard",
             "table", "row", "plan"]
    return {
        d: " ".join(rng.choice(vocab, size=int(rng.integers(2, 40))).tolist())
        for d in range(n)
    }


@pytest.fixture(scope="module")
def ss_index(spark, tmp_path_factory):
    texts = _texts()
    pages = spark.createDataFrame(sorted(texts.items()), "orig_id long, text string")
    paths = build_index(
        spark, pages, str(tmp_path_factory.mktemp("ss_idx")), num_segments=2,
        key_col="orig_id",
    )
    return Searcher(spark, paths), texts


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),  # defaults: degrade to classic-like
        dict(ln_min=5, ln_max=20, steep=0.5),  # plateau
        dict(tf_mode="hyperbolic", ln_min=3, ln_max=10),
        dict(tf_mode="baseline", base=1.0, tf_min=2.0, ln_min=2, ln_max=8),
    ],
)
def test_engine_matches_oracle(ss_index, kwargs):
    searcher, texts = ss_index
    terms = ["spark", "merge"]
    got = searcher.search_sweetspot(terms, k=10, **kwargs).toPandas()
    expect = brute_force_topk_sweetspot(texts, terms, k=10, **kwargs)
    assert got["doc_id"].tolist() == [d for d, _ in expect]
    np.testing.assert_allclose(
        got["score"].values,
        np.array([s for _, s in expect], dtype=np.float32),
        rtol=1e-6,
    )


def test_classic_unchanged_by_tfidf_refactor(ss_index):
    from lucene_solr_spark.query.classic import brute_force_topk_classic

    searcher, texts = ss_index
    got = searcher.search_classic(["query", "fast", "shard"], k=10).toPandas()
    expect = brute_force_topk_classic(texts, ["query", "fast", "shard"], k=10)
    assert got["doc_id"].tolist() == [d for d, _ in expect]


def test_plateau_changes_ranking_vs_classic(ss_index):
    searcher, _ = ss_index
    classic = searcher.search_classic(["spark"], k=40).toPandas()
    plateau = searcher.search_sweetspot(["spark"], k=40, ln_min=2, ln_max=39).toPandas()
    # with the whole corpus inside the plateau, lengthNorm is ~1 for all:
    # short docs lose their advantage -> order generally differs
    assert set(classic["doc_id"]) == set(plateau["doc_id"])
    assert classic["doc_id"].tolist() != plateau["doc_id"].tolist()

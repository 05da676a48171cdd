"""Deterministic synthetic Common-Crawl-style page corpus.

Produces the exact input_hint shape from BASELINE.json:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Mirrors the reference benchmark's content sources (EnwikiContentSource /
ReutersContentSource — reference EnwikiContentSource.java:131-134) as a
seeded generator: Zipfian bag-of-words text over a fixed vocabulary with the
33 stopwords at natural high frequency, ~1% duplicated urls with newer
warc_ts (exercises dedup-keep-latest), UAX#29 edge tokens sprinkled in.

Generation is DISTRIBUTED and deterministic: each row is derived purely from
its index i via a counter-based RNG (hash of (seed, i)), so the same (seed,
n) yields byte-identical rows at any parallelism — the property the scaling
benchmark (local[8] vs local[32]) relies on.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# fixed vocabulary: common words (Zipf head), mid, and rare tail + stopwords
_STOP = (
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with"
).split()
_CONTENT = [
    f"w{i:05d}" for i in range(2000)
] + "spark index query merge sort fast slow table scan filter stream window batch value part hash row line key data column order group customer supplier big small agg join".split()
_EDGE = ["o'brien", "3.14", "u.s.a", "r2d2", "café", "日本", "1,000"]

SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _row_rng(seed: int, i: int) -> np.random.RandomState:
    return np.random.RandomState((seed * 1_000_003 + i * 31337) % (2**31 - 1))


# topical terms for bursty mode (includes the wand-bench query terms)
_TOPICS = "spark merge query window stream value fast index".split()


def _make_text(rng: np.random.RandomState, bursty: bool = False, tail: bool = False) -> str:
    n = int(rng.randint(20, 400))
    # Zipfian over content vocab
    ranks = rng.zipf(1.3, size=n) % len(_CONTENT)
    words = [_CONTENT[r] for r in ranks]
    # stopwords interleaved at ~30% natural frequency
    n_stop = int(n * 0.4)
    stop_pos = rng.randint(0, len(words) + 1, size=n_stop)
    for p in sorted(stop_pos.tolist(), reverse=True):
        words.insert(p, _STOP[int(rng.randint(0, len(_STOP)))])
    if rng.rand() < 0.05:
        words.insert(0, _EDGE[int(rng.randint(0, len(_EDGE)))])
    if bursty and rng.rand() < 0.02:
        # term-frequency burstiness (real web text: a page ABOUT a topic
        # repeats it tens of times; background pages mention it 0-2×).
        # Flat synthetic tf is provably unprunable for block-max WAND —
        # bursts are what give per-block maxima the variance pruning needs.
        t = _TOPICS[int(rng.randint(0, len(_TOPICS)))]
        reps = int(rng.randint(15, 60))
        pos = rng.randint(0, len(words) + 1, size=reps)
        for p in sorted(pos.tolist(), reverse=True):
            words.insert(p, t)
    if tail:
        # rare-term tail (real web vocabulary is mostly hapax-ish terms;
        # the fixed 2k-word vocab above bottoms out at df≈1% — unrealistic,
        # and provably chunk-unprunable for ANY multi-term query). 1-3
        # draws per doc from a 400k-id space → df ≈ n_docs/160k per id:
        # the "navigational" head+tail query shape becomes representable.
        for _ in range(int(rng.randint(1, 4))):
            words.append(f"t{int(rng.randint(0, 400_000)):06d}")
    return " ".join(words)


def generate_pages(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    partitions: int | None = None,
    bursty: bool = False,
    tail: bool = False,
) -> DataFrame:
    """n synthetic pages, deterministic for (n, seed, bursty) at any
    parallelism. bursty=False (default) is byte-identical to prior rounds;
    bursty=True adds topical tf bursts; tail=True adds a rare-term
    vocabulary tail (see _make_text) — both opt-in, default output stays
    byte-identical to prior rounds."""
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = spark.range(0, n, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = _row_rng(seed, i)
                # ~1% duplicated urls: row i duplicates url of i-1 with newer ts
                is_dup = i > 0 and (i % 101 == 0)
                src = i - 1 if is_dup else i
                url = f"https://site{src % 1000}.example/p/{src}"
                text = (
                    _make_text(_row_rng(seed, src), bursty, tail)
                    if not is_dup
                    else _make_text(rng, bursty, tail)
                )
                ts = np.datetime64("2025-01-01") + np.timedelta64(i, "s")
                title = f"page {src}"
                html = f"<html><head><title>{title}</title></head><body>{text}</body></html>".encode()
                lang = "en" if (i % 20) else ["de", "fr", "es", "ja"][i % 4]
                rows.append((url, ts, html, text, lang))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return base.mapInPandas(gen, schema=SCHEMA)

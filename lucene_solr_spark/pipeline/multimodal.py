"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real and tested — schema contracts, Arrow batch
shapes, `mapInPandas` feature extraction, partition sizing — while the
actual codec work is stubbed: the decode UDFs use real libraries when
importable (PIL etc., absent in this container) and otherwise either raise
`NotImplementedError` or run a clearly-marked deterministic fake decoder so
the pipeline plumbing stays exercisable end-to-end.

Schema contract for a multimodal corpus table:
    id: long, media: binary, media_type: string,
    meta: struct<width:int, height:int, n_frames:int, sample_rate:int>

Scale notes: binary payloads dominate row size → keep
`spark.sql.files.maxPartitionBytes` small enough that one Arrow batch of
rows fits executor memory; feature extraction projects away `media` as the
FIRST select after the UDF so downstream stages never shuffle the blobs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decoder if available (not in this container)
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

MEDIA_SCHEMA = (
    "id long, media binary, media_type string, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int>"
)

FEATURE_DIM = 16


def _fake_decode(blob: bytes, width: int, height: int) -> np.ndarray:
    """DETERMINISTIC FAKE image decode (container has no image libs):
    derives a (height, width) uint8 'pixel' grid from the blob digest.
    Replace with PIL/libvips in production."""
    digest = hashlib.sha256(blob).digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
    return rng.randint(0, 256, size=(height, width), dtype=np.uint8)


def decode_image(blob: bytes, width: int, height: int) -> np.ndarray:
    if _HAS_PIL:  # pragma: no cover - not installed in this container
        import io

        return np.asarray(Image.open(io.BytesIO(blob)).convert("L"))
    raise NotImplementedError(
        "real image decode needs PIL/libvips; use image_features(fake=True) "
        "for plumbing tests"
    )


def image_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """media → fixed-width feature vector (mean/std per tile) via Arrow
    batches. The Spark plumbing (batch shape, schema, blob projection) is
    identical for the real decoder."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, ws, hs = [], [], [], []
            for row in pdf.itertuples(index=False):
                meta = row.meta
                w, h = int(meta["width"]), int(meta["height"])
                if fake:
                    px = _fake_decode(bytes(row.media), w, h)
                else:  # pragma: no cover
                    px = decode_image(bytes(row.media), w, h)
                # 4x4 tile means → FEATURE_DIM floats (deterministic)
                th, tw = max(1, px.shape[0] // 4), max(1, px.shape[1] // 4)
                tiles = [
                    float(px[i * th : (i + 1) * th, j * tw : (j + 1) * tw].mean())
                    for i in range(4)
                    for j in range(4)
                ]
                ids.append(row.id)
                feats.append(np.asarray(tiles, dtype=np.float32))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {"id": ids, "features": feats, "width": ws, "height": hs}
            )

    # project media away immediately after extraction — blobs never shuffle
    return df.select("id", "media", "meta").mapInPandas(
        kernel, schema="id long, features array<float>, width int, height int"
    )


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling STUB: emits (id, frame_idx) for frames
    0, every_n, 2*every_n, ... of meta.n_frames — the real implementation
    would attach the decoded frame bytes. JVM-only (sequence + explode)."""
    idxs = F.sequence(
        F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n)
    )
    return df.select("id", F.explode(idxs).alias("frame_idx"))


def synthetic_media(spark, n: int = 64, seed: int = 3) -> DataFrame:
    """Deterministic fake multimodal corpus for plumbing tests."""
    rows = []
    for i in range(n):
        rng = np.random.RandomState(seed * 100003 + i)
        w, h = int(rng.randint(8, 33)), int(rng.randint(8, 33))
        blob = rng.bytes(w * h)
        rows.append(
            (i, bytearray(blob), "image/fake", (w, h, int(rng.randint(1, 100)), 0))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)

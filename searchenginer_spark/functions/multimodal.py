"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing here is REAL and tested — schemas, Arrow batch
shapes, mapInPandas signatures, partitioning — while the actual media
decoding is stubbed: the sandbox has no image/audio libraries, so
``decoder='fake'`` runs a deterministic stand-in (header-derived features)
and ``decoder='real'`` raises NotImplementedError at the exact seam where
PIL/libsndfile/ffmpeg would plug in. A cluster deployment swaps the decode
function; nothing else changes.

Media table shape:
    media(doc_id long, kind string, data binary,
          meta struct<width:int, height:int, sample_rate:int, n_frames:int>)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "doc_id long, kind string, data binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

IMAGE_FEATURES_SCHEMA = "doc_id long, width int, height int, features array<float>"
FRAME_SAMPLE_SCHEMA = "doc_id long, frame_idx int, frame binary"

N_IMAGE_FEATURES = 16


def _fake_decode_image(data: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for image decode + feature extraction:
    a 16-dim feature vector derived from the byte histogram."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(N_IMAGE_FEATURES, dtype=np.float32)
    hist, _ = np.histogram(arr, bins=N_IMAGE_FEATURES, range=(0, 256))
    return (hist / max(arr.size, 1)).astype(np.float32)


def extract_image_features(
    media: DataFrame, decoder: str = "fake", batch_hint: int = 1024
) -> DataFrame:
    """(doc_id, width, height, features) via mapInPandas over image rows.

    The filter on kind prunes non-image rows BEFORE the Python boundary
    (pushed to the parquet scan); the UDF sees only image bytes.
    """
    imgs = media.filter(media.kind == "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real image decode requires PIL/opencv — plug in here"
                )
            feats = [
                _fake_decode_image(
                    d if d is not None else b"",
                    int(m["width"] or 0),
                    int(m["height"] or 0),
                ).tolist()
                for d, m in zip(pdf["data"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [int(m["width"] or 0) for m in pdf["meta"]],
                    "height": [int(m["height"] or 0) for m in pdf["meta"]],
                    "features": feats,
                }
            )

    return imgs.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def sample_video_frames(
    media: DataFrame, every_n: int = 10, decoder: str = "fake"
) -> DataFrame:
    """(doc_id, frame_idx, frame) — sample every n-th frame of video rows.

    Fake decoder slices the raw byte stream into n_frames equal chunks (the
    Arrow/batch shape is identical to a real ffmpeg-backed splitter)."""
    vids = media.filter(media.kind == "video")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real frame extraction requires ffmpeg — plug in here"
                )
            out_doc, out_idx, out_frame = [], [], []
            for doc_id, data, meta in zip(pdf["doc_id"], pdf["data"], pdf["meta"]):
                n = int(meta["n_frames"] or 0)
                if not data or n <= 0:
                    continue
                size = max(len(data) // n, 1)
                for i in range(0, n, every_n):
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_frame.append(bytes(data[i * size : (i + 1) * size]))
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame": out_frame}
            )

    return vids.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests/demos."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        data = bytes(rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8))
        meta = {
            "width": 32 + i % 7 if kind == "image" else None,
            "height": 24 + i % 5 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 12 + i % 4 if kind == "video" else None,
        }
        rows.append((i, kind, data, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)

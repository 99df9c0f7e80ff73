"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``BINARY`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The decode step is STUBBED (image/audio libs are not
in this container): ``decoder="fake"`` produces a deterministic feature vector
from the payload bytes so the Spark-side plumbing — schema, batching,
partitioning, UDF signatures — is real and tested; ``decoder="real"`` raises
NotImplementedError at the clearly marked point where PIL/ffmpeg would go.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id BIGINT, kind STRING, payload BINARY, "
    "meta STRUCT<width: INT, height: INT, duration_ms: INT, mime: STRING>"
)
FEATURE_DIM = 16
FEATURES_SCHEMA = f"media_id BIGINT, kind STRING, features ARRAY<FLOAT>, n_bytes BIGINT"


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for image/audio decode + embed: md5-seeded
    uniform floats. Stable across executors/runs; replaced in production."""
    h = hashlib.md5(payload).digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.random(dim, dtype=np.float32)


def extract_features(media: DataFrame, decoder: str = "fake",
                     batch_max: int = 256) -> DataFrame:
    """mapInPandas feature extraction; Arrow batches keep per-row overhead off
    the table, `batch_max` bounds executor memory for large payloads
    (set spark.sql.execution.arrow.maxRecordsPerBatch accordingly)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                # >>> real decode would go here (PIL / torchaudio / ffmpeg) <<<
                raise NotImplementedError(
                    "real media decode not available in this environment")
            feats = [
                _fake_decode(bytes(p)).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "features": feats,
                "n_bytes": [len(bytes(p)) if p is not None else 0
                            for p in pdf["payload"]],
            })

    return media.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled timestamp
    (payload decode stubbed; timestamps computed from metadata)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                dur = (r.meta or {}).get("duration_ms") or 0
                for ts in range(0, int(dur), every_ms):
                    rows.append((r.media_id, ts))
            yield pd.DataFrame(rows, columns=["media_id", "ts_ms"]) if rows else \
                pd.DataFrame({"media_id": pd.Series(dtype="int64"),
                              "ts_ms": pd.Series(dtype="int64")})

    return media.mapInPandas(run, "media_id BIGINT, ts_ms BIGINT")

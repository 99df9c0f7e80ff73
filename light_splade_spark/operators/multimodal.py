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


def resize_images(media: DataFrame, width: int = 224, height: int = 224,
                  decoder: str = "fake") -> DataFrame:
    """Image resize plumbing (mapInPandas, Arrow-batched): output schema,
    metadata rewrite, and payload transform are real; the pixel work is the
    stub (md5-chained deterministic bytes) until PIL is available."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = []
            out_meta = []
            for r in pdf.itertuples(index=False):
                if r.kind != "image" or r.payload is None:
                    out_payload.append(None)
                    out_meta.append(None)
                    continue
                if decoder == "real":
                    # >>> real path: PIL.Image.open(bytes).resize((w, h)) <<<
                    raise NotImplementedError(
                        "real image decode not available in this environment")
                seed = hashlib.md5(
                    bytes(r.payload) + f"|{width}x{height}".encode()).digest()
                out_payload.append(bytearray(seed * 4))  # deterministic stub
                m = dict(r.meta.asDict()) if hasattr(r.meta, "asDict") else dict(r.meta or {})
                m["width"], m["height"] = width, height
                out_meta.append((m.get("width"), m.get("height"),
                                 m.get("duration_ms"), m.get("mime")))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "payload": out_payload,
                "meta": out_meta,
            })

    return media.mapInPandas(run, MEDIA_SCHEMA)


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

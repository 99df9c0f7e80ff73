"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``BINARY`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. Decoders:

* ``decoder="fake"`` — deterministic md5-seeded features from the payload
  bytes: the Spark-side plumbing (schema, batching, partitioning, UDF
  signatures, byte accounting) is real and oracle-checked while staying
  dependency-free.
* ``decoder="real"`` — actual decoding behind OPTIONAL imports resolved at
  module load: images via PIL when installed (grayscale thumbnail mean
  pixels), audio via the stdlib ``wave`` module (per-segment RMS over PCM
  frames — works everywhere, no extra dependency), video via the
  pure-stdlib RIFF/AVI demuxer (operators/riff_avi.py: BI_RGB frames
  decode with numpy alone; MJPG frames via PIL; per-frame grayscale means
  over evenly-sampled frames). A kind/codec whose decoder is missing
  raises NotImplementedError naming what's absent — never a silent fake.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# optional decode backends, probed once at import
try:  # pragma: no cover - absent in this container
    from PIL import Image as _PILImage
except ImportError:
    _PILImage = None

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


def _real_decode_image(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    if _PILImage is None:
        raise NotImplementedError(
            "real image decode requires Pillow (PIL); not installed in this "
            "environment — install Pillow or use decoder='fake'")
    img = _PILImage.open(io.BytesIO(payload)).convert("L")
    side = int(np.sqrt(dim))
    thumb = img.resize((side, max(dim // side, 1)))
    arr = np.asarray(thumb, dtype=np.float32).reshape(-1) / 255.0
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, arr.size)] = arr[:dim]
    return out


def _real_decode_audio(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """WAV (PCM) decode via the stdlib ``wave`` module: per-segment RMS over
    ``dim`` equal time slices — a real, dependency-free decode path."""
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            n = w.getnframes()
            width = w.getsampwidth()
            raw = w.readframes(n)
    except (wave.Error, EOFError) as e:
        raise ValueError(f"payload is not decodable WAV audio: {e}") from e
    dtype = {1: np.int8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported WAV sample width {width}")
    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if x.size == 0:
        return np.zeros(dim, dtype=np.float32)
    x = x / float(np.iinfo(dtype).max)
    segs = np.array_split(x, dim)
    return np.asarray([np.sqrt(np.mean(s * s)) if s.size else 0.0
                       for s in segs], dtype=np.float32)


def _pyav_video_features(payload: bytes, dim: int) -> np.ndarray:
    """General-container decode (MP4/H.264/WebM/...) via the public PyAV
    ffmpeg binding when installed — the same temporal pooling as the AVI
    path: grayscale means of ``dim`` evenly-sampled frames."""
    import av  # optional; caller guards ImportError

    with av.open(io.BytesIO(bytes(payload))) as container:
        stream = next((s for s in container.streams if s.type == "video"),
                      None)
        if stream is None:
            raise ValueError("no video stream in container")
        n = int(stream.frames or 0)
        if n > 0:
            # frame count known: pixel-convert ONLY the <=dim sampled
            # frames (a long clip would otherwise pay a gray conversion +
            # mean per frame to fill a 16-float vector); packets still
            # demux/decode sequentially — inter-frame codecs need that
            want = set(np.linspace(0, n - 1, num=min(dim, n),
                                   dtype=np.int64).tolist())
            means = []
            for i, f in enumerate(container.decode(stream)):
                if i in want:
                    means.append(float(np.asarray(
                        f.to_ndarray(format="gray"),
                        dtype=np.float32).mean()) / 255.0)
            out = np.zeros(dim, dtype=np.float32)
            out[:len(means)] = means
            return out
        # unknown frame count: convert everything, then sample
        means = [float(np.asarray(f.to_ndarray(format="gray"),
                                  dtype=np.float32).mean()) / 255.0
                 for f in container.decode(stream)]
    out = np.zeros(dim, dtype=np.float32)
    if means:
        idx = np.linspace(0, len(means) - 1, num=min(dim, len(means)),
                          dtype=np.int64)
        for i, fi in enumerate(idx):
            out[i] = means[fi]
    return out


def _real_decode_video(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """RIFF/AVI decode via the pure-stdlib demuxer (operators/riff_avi.py):
    per-frame grayscale means over ``dim`` evenly-sampled frames. BI_RGB
    frames decode with numpy alone (runs everywhere, no ffmpeg); MJPG
    frames route through PIL when installed. Non-AVI containers (MP4/H.264,
    WebM, ...) route through PyAV when the public ``av`` package is
    installed — otherwise a NotImplementedError naming what is missing,
    never a silent fake."""
    from light_splade_spark.operators.riff_avi import AviError, video_features

    try:
        return video_features(bytes(payload), dim)
    except AviError as e:
        try:
            import av  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                f"video payload is not RIFF/AVI ({e}); non-AVI containers "
                "require the public PyAV (ffmpeg) package, which is not "
                "installed — install `av`, use decoder='fake', or repack "
                "as AVI") from e
        return _pyav_video_features(payload, dim)


_REAL_DECODERS = {
    "image": _real_decode_image,
    "audio": _real_decode_audio,
    "video": _real_decode_video,
}


def decode_features(payload: bytes, kind: str, decoder: str) -> np.ndarray:
    if decoder == "fake":
        return _fake_decode(bytes(payload))
    if decoder == "real":
        return _REAL_DECODERS[kind](bytes(payload))
    raise ValueError(f"unknown decoder {decoder!r} (use 'fake' or 'real')")


def extract_features(media: DataFrame, decoder: str = "fake",
                     batch_max: int = 256) -> DataFrame:
    """mapInPandas feature extraction; Arrow batches keep per-row overhead off
    the table, `batch_max` bounds executor memory for large payloads
    (set spark.sql.execution.arrow.maxRecordsPerBatch accordingly)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_features(p, k, decoder).tolist()
                if p is not None else None
                for p, k in zip(pdf["payload"], pdf["kind"])
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
    """Image resize (mapInPandas, Arrow-batched): output schema, metadata
    rewrite, and payload transform are always real; the pixel work is PIL
    when installed (``decoder="real"``), an md5-chained deterministic stub
    otherwise."""

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
                    if _PILImage is None:
                        raise NotImplementedError(
                            "real image resize requires Pillow (PIL); not "
                            "installed — install Pillow or use "
                            "decoder='fake'")
                    img = _PILImage.open(io.BytesIO(bytes(r.payload)))
                    buf = io.BytesIO()
                    img.resize((width, height)).save(buf, format="PNG")
                    out_payload.append(buf.getvalue())
                else:
                    seed = hashlib.md5(
                        bytes(r.payload) + f"|{width}x{height}".encode()).digest()
                    out_payload.append(bytearray(seed * 4))  # deterministic stub
                m = dict(r.meta.asDict()) if hasattr(r.meta, "asDict") else dict(r.meta or {})
                m["width"], m["height"] = width, height
                if decoder == "real":
                    # the real path re-encodes every payload as PNG, so the
                    # metadata must follow the bytes
                    m["mime"] = "image/png"
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


EXTRACTED_FRAME_SCHEMA = ("media_id BIGINT, frame_idx INT, ts_ms BIGINT, "
                          "gray_mean FLOAT, width INT, height INT")


def extract_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL frame extraction from RIFF/AVI payloads (mapInPandas,
    Arrow-batched): demux each video payload with the pure-stdlib parser
    (operators/riff_avi.py), pick the frame ON DISPLAY at each ``every_ms``
    timestamp (floor by the container's own us_per_frame clock — standard
    video sampling semantics), decode it to grayscale, and emit
    (frame_idx, ts_ms, gray_mean, dims) rows — the
    payload-driven counterpart of ``frame_sample``'s metadata-only
    timestamps. Non-video rows are passed over; a video payload that is
    not AVI raises (never silently skipped)."""
    from light_splade_spark.operators.riff_avi import (
        decode_frame_gray,
        parse_avi,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, means, ws, hs = [], [], [], [], [], []
            for r in pdf.itertuples(index=False):
                if r.kind != "video" or r.payload is None:
                    continue
                info = parse_avi(bytes(r.payload))
                frames = info["frames"]
                if not frames:
                    continue
                us_pf = info["us_per_frame"] or 40000
                dur_ms = len(frames) * us_pf / 1000.0
                t = 0.0
                while t < dur_ms:
                    fi = min(int(t * 1000.0 / us_pf), len(frames) - 1)
                    gray = decode_frame_gray(info, frames[fi])
                    ids.append(r.media_id)
                    idxs.append(fi)
                    tss.append(int(t))
                    means.append(float(gray.mean()))
                    ws.append(info["width"])
                    hs.append(info["height"])
                    t += every_ms
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "ts_ms": pd.Series(tss, dtype="int64"),
                "gray_mean": pd.Series(means, dtype="float32"),
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
            })

    return media.mapInPandas(run, EXTRACTED_FRAME_SCHEMA)

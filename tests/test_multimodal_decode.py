"""Multimodal decoders: parameterized over what's available in the env.

``decoder="fake"`` always works (oracle rows cover it); ``decoder="real"``
decodes WAV audio via the stdlib everywhere, uses PIL for images when
installed, and raises a NotImplementedError naming the missing library
otherwise — never silently falling back to the fake path.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from light_splade_spark.operators import multimodal as mm


def _wav_bytes(freq: float = 440.0, n: int = 800, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        t = np.arange(n) / rate
        x = (np.sin(2 * np.pi * freq * t) * 20000).astype(np.int16)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def test_real_audio_decode_direct():
    feats = mm.decode_features(_wav_bytes(), "audio", "real")
    assert feats.shape == (mm.FEATURE_DIM,)
    assert np.isfinite(feats).all()
    # a steady sine has roughly constant per-segment RMS ~ 20000/32767/sqrt(2)
    assert 0.3 < float(feats.mean()) < 0.6
    # silence decodes to ~zero energy
    silent = mm.decode_features(_wav_bytes(freq=0.0), "audio", "real")
    assert float(silent.max()) < 1e-6
    # garbage payload is a loud error, not a fake vector
    with pytest.raises(ValueError, match="not decodable WAV"):
        mm.decode_features(b"not a wav at all", "audio", "real")


def test_real_audio_decode_through_spark(spark):
    media = spark.createDataFrame(
        [(1, "audio", _wav_bytes(), (0, 0, 100, "audio/wav")),
         (2, "audio", _wav_bytes(freq=880.0), (0, 0, 100, "audio/wav"))],
        mm.MEDIA_SCHEMA)
    rows = {r.media_id: r for r in
            mm.extract_features(media, decoder="real").collect()}
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert len(r.features) == mm.FEATURE_DIM
        assert r.n_bytes > 44  # WAV header + frames


@pytest.mark.skipif(mm._PILImage is not None, reason="PIL installed")
def test_real_image_decode_raises_without_pil():
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm.decode_features(b"\x89PNG fake", "image", "real")


@pytest.mark.skipif(mm._PILImage is None, reason="PIL not installed")
def test_real_image_decode_with_pil():
    img = mm._PILImage.new("RGB", (8, 8), color=(128, 64, 32))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    feats = mm.decode_features(buf.getvalue(), "image", "real")
    assert feats.shape == (mm.FEATURE_DIM,)
    assert np.isfinite(feats).all()


def test_real_video_decode_raises():
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        mm.decode_features(b"\x00\x00\x00 ftypmp42", "video", "real")


def test_fake_decoder_unchanged_and_deterministic():
    a = mm.decode_features(b"payload", "image", "fake")
    b = mm.decode_features(b"payload", "audio", "fake")
    assert (a == b).all()  # fake features depend only on bytes
    assert (a == mm._fake_decode(b"payload")).all()


# -- optional PyAV seam for non-AVI containers (skip-paired) ------------------

def _pyav_available() -> bool:
    try:
        import av  # noqa: F401
        return True
    except ImportError:
        return False


import pytest as _pytest


@_pytest.mark.skipif(_pyav_available(), reason="PyAV installed — the "
                     "decode test runs instead")
def test_non_avi_video_without_pyav_is_loud():
    """Non-AVI bytes with no PyAV: the error names the missing package —
    never a fabricated feature vector (round-4 'what's missing' #3)."""
    from light_splade_spark.operators.multimodal import decode_features

    with _pytest.raises(NotImplementedError, match="PyAV"):
        decode_features(b"\x00\x00\x00\x18ftypmp42 not a real mp4", "video",
                        "real")


@_pytest.mark.skipif(not _pyav_available(), reason="public `av` (PyAV) not "
                     "installed (skip-paired: the loud-absence test runs "
                     "instead)")
def test_non_avi_video_decodes_via_pyav(tmp_path):
    """When PyAV is installed, encode a tiny MP4 with it and assert the
    decode path recovers the brightness ramp, matching the AVI path's
    temporal pooling semantics."""
    import av
    import numpy as np

    from light_splade_spark.operators.multimodal import decode_features

    p = tmp_path / "t.mp4"
    with av.open(str(p), "w") as c:
        s = c.add_stream("mpeg4", rate=25)
        s.width, s.height, s.pix_fmt = 32, 32, "yuv420p"
        for i in range(10):
            img = np.full((32, 32, 3), int(255 * i / 9), dtype=np.uint8)
            for pkt in s.encode(av.VideoFrame.from_ndarray(img, format="rgb24")):
                c.mux(pkt)
        for pkt in s.encode():
            c.mux(pkt)
    feats = decode_features(p.read_bytes(), "video", "real")
    assert feats.shape == (16,)
    ramp = feats[:10]
    assert ramp[0] < 0.2 and ramp[9] > 0.8

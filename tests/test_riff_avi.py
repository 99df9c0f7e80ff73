"""RIFF/AVI demuxer + uncompressed-frame decode, end-to-end in pure stdlib.

The fixture below WRITES a minimal valid AVI (RIFF header, hdrl with
avih/strh/strf, movi with BI_RGB 24-bit bottom-up frames) with struct
alone, then the demuxer must recover dims, frame count, codec, and exact
pixel values — so the video path is tested for real in this container,
no ffmpeg, no skip.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from light_splade_spark.operators.riff_avi import (
    AviError,
    decode_frame_gray,
    parse_avi,
    video_features,
    write_avi,
)

# the shared writer (riff_avi.write_avi) is the fixture source here AND in
# Q:extracted_frames — the property tests below prove writer<->parser
# exact-pixel roundtrip, which is what lets the driver oracle use a
# closed-form gray-level formula
make_avi = write_avi


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def _gradient_frames(n: int, h: int = 8, w: int = 6) -> list[np.ndarray]:
    out = []
    for i in range(n):
        v = int(255 * i / max(n - 1, 1))
        out.append(np.full((h, w, 3), v, dtype=np.uint8))
    return out


def test_parse_and_decode_roundtrip():
    frames = _gradient_frames(5)
    payload = make_avi(frames)
    info = parse_avi(payload)
    assert (info["width"], info["height"]) == (6, 8)
    assert info["n_frames"] == 5 and len(info["frames"]) == 5
    assert info["codec"] == "RGB " and info["us_per_frame"] == 40000
    for i, fb in enumerate(info["frames"]):
        gray = decode_frame_gray(info, fb)
        assert gray.shape == (8, 6)
        want = int(255 * i / 4) / 255.0
        assert gray.mean() == pytest.approx(want, abs=1e-6)


def test_video_features_temporal_pooling():
    payload = make_avi(_gradient_frames(10))
    feats = video_features(payload, dim=5)
    # 5 evenly-sampled frames of a 0->1 ramp: monotone nondecreasing,
    # first (dark) < last (bright)
    assert feats.shape == (5,)
    assert feats[0] == pytest.approx(0.0, abs=1e-6)
    assert feats[-1] == pytest.approx(1.0, abs=1e-6)
    assert (np.diff(feats) >= -1e-6).all()
    # short clip: frames < dim pads zeros at the tail
    short = video_features(make_avi(_gradient_frames(2)), dim=6)
    assert short[2:].sum() == 0.0


def test_real_video_decoder_wired_into_multimodal():
    from light_splade_spark.operators.multimodal import decode_features

    payload = make_avi(_gradient_frames(4))
    feats = decode_features(payload, "video", "real")
    assert feats.shape == (16,)
    assert feats[:4].max() > 0.9  # the bright last frame is sampled

    # non-AVI bytes raise the named NotImplementedError, never a fake
    with pytest.raises(NotImplementedError, match="PyAV"):
        decode_features(b"not a video", "video", "real")


def test_unknown_codec_is_loud():
    payload = bytearray(make_avi(_gradient_frames(2)))
    i = payload.find(b"strf")
    # biCompression lives 16 bytes into the strf body (after fourcc+size)
    comp_off = i + 8 + 16
    payload[comp_off:comp_off + 4] = struct.pack("<I", 0x34363248)  # 'H264'
    info = parse_avi(bytes(payload))
    with pytest.raises(NotImplementedError, match="H264"):
        decode_frame_gray(info, info["frames"][0])


def test_garbage_rejected():
    with pytest.raises(AviError):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(AviError):
        parse_avi(b"")


def test_extract_frames_distributed(spark):
    """The payload-real frame extractor runs as a distributed mapInPandas
    stage over a DataFrame of AVI payloads built by the in-test writer."""
    from light_splade_spark.operators.multimodal import extract_frames

    rows = []
    for mid, n_frames in ((0, 10), (1, 3)):
        payload = make_avi(_gradient_frames(n_frames), us_per_frame=40000)
        rows.append((mid, "video", bytearray(payload),
                     (6, 8, n_frames * 40, "video/avi")))
    rows.append((2, "image", bytearray(b"png..."), (1, 1, None, "image/png")))
    media = spark.createDataFrame(
        rows, "media_id BIGINT, kind STRING, payload BINARY, "
              "meta STRUCT<width: INT, height: INT, duration_ms: INT, "
              "mime: STRING>")
    out = extract_frames(media, every_ms=120).collect()
    by_id: dict[int, list] = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    # 10 frames x 40ms = 400ms -> samples at 0,120,240,360
    assert len(by_id[0]) == 4
    assert [r.ts_ms for r in by_id[0]] == [0, 120, 240, 360]
    assert [r.frame_idx for r in by_id[0]] == [0, 3, 6, 9]
    # brightness ramps with the gradient frames
    g = [r.gray_mean for r in by_id[0]]
    assert g[0] < g[-1] and all(r.width == 6 and r.height == 8
                                for r in by_id[0])
    # 3 frames x 40ms = 120ms -> sample at 0 only
    assert len(by_id[1]) == 1 and by_id[1][0].ts_ms == 0
    # image row contributes nothing
    assert 2 not in by_id


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 12), st.integers(1, 17), st.integers(1, 9),
       st.integers(1, 200))
def test_avi_writer_parser_roundtrip_properties(n, w, h, seed):
    """Random dims (odd widths exercise row padding and chunk alignment),
    random pixel content: parse recovers exact geometry and every frame's
    exact grayscale values."""
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
              for _ in range(n)]
    info = parse_avi(make_avi(frames))
    assert (info["width"], info["height"], len(info["frames"])) == (w, h, n)
    for f, fb in zip(frames, info["frames"]):
        got = decode_frame_gray(info, fb)
        want = f.astype(np.float32).mean(axis=2) / 255.0
        assert np.allclose(got, want, atol=1e-6)


def make_avi_audio_first(frames: list[np.ndarray],
                         rec_wrap: bool = False) -> bytes:
    """AVI variant with an AUDIO strl FIRST (video = stream 1, chunks
    '01db') and optional 'rec '-interleaved movi — the legal layouts the
    round-4 review flagged as silently yielding zero frames."""
    h, w = frames[0].shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    avih = struct.pack("<10I16x", 40000, 0, 0, 0, len(frames), 0, 2,
                       0, w, h)
    strh_a = (b"auds" + b"\x00" * 4 + struct.pack("<IHHIIIIIIIi4H", 0, 0, 0,
                                                  0, 1, 8000, 0, 0, 0, 0,
                                                  -1, 0, 0, 0, 0))
    strf_a = struct.pack("<HHIIHHH", 1, 1, 8000, 8000, 1, 8, 0)
    strh_v = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIi4H", 0, 0, 0, 0,
                                              1, 25, 0, len(frames), 0, 0,
                                              -1, 0, 0, w, h))
    strf_v = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h,
                         0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh_a)
                         + _chunk(b"strf", strf_a))
                 + _list(b"strl", _chunk(b"strh", strh_v)
                         + _chunk(b"strf", strf_v)))
    movi_body = b""
    for f in frames:
        rows = []
        for y in range(h - 1, -1, -1):
            row = f[y].astype(np.uint8).tobytes()
            rows.append(row + b"\x00" * (stride - len(row)))
        fchunk = _chunk(b"01db", b"".join(rows))
        achunk = _chunk(b"00wb", b"\x80" * 320)
        movi_body += (_list(b"rec ", achunk + fchunk) if rec_wrap
                      else achunk + fchunk)
    movi = _list(b"movi", movi_body)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_audio_first_and_rec_interleaved_layouts():
    """Video as stream 1 ('01db') and 'rec '-grouped movi both decode;
    a declared vids stream with no matching frame chunks raises instead of
    fabricating zeros (the round-4 review findings)."""
    frames = _gradient_frames(4)
    for rec in (False, True):
        info = parse_avi(make_avi_audio_first(frames, rec_wrap=rec))
        assert len(info["frames"]) == 4, rec
        assert decode_frame_gray(info, info["frames"][3]).mean() == \
            pytest.approx(1.0, abs=1e-6)
    # strip the frame chunks: vids declared, zero frames -> loud
    broken = make_avi_audio_first(frames).replace(b"01db", b"99xx")
    with pytest.raises(AviError, match="no '01db'"):
        parse_avi(broken)


def test_second_vids_stream_does_not_clobber_geometry():
    """Two vids strls: the strf of the SECOND must not overwrite the
    geometry/codec of the first, whose frames are the ones collected
    (ADVICE r4)."""
    frames = _gradient_frames(3, h=8, w=6)
    h2, w2 = 4, 10  # a second video stream with different dims
    stride = ((6 * 3 + 3) // 4) * 4
    avih = struct.pack("<10I16x", 40000, 0, 0, 0, len(frames), 0, 2,
                       0, 6, 8)
    strh_v = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIi4H", 0, 0, 0, 0,
                                              1, 25, 0, len(frames), 0, 0,
                                              -1, 0, 0, 6, 8))
    strf_v1 = struct.pack("<IiiHHIIiiII", 40, 6, 8, 1, 24, 0, stride * 8,
                          0, 0, 0, 0)
    strf_v2 = struct.pack("<IiiHHIIiiII", 40, w2, h2, 1, 16,
                          0x34363248, 0, 0, 0, 0, 0)  # 'H264', 16-bit
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh_v)
                         + _chunk(b"strf", strf_v1))
                 + _list(b"strl", _chunk(b"strh", strh_v)
                         + _chunk(b"strf", strf_v2)))
    movi_body = b""
    for f in frames:
        rows = []
        for y in range(7, -1, -1):
            row = f[y].astype(np.uint8).tobytes()
            rows.append(row + b"\x00" * (stride - len(row)))
        movi_body += _chunk(b"00db", b"".join(rows))
    body = b"AVI " + hdrl + _list(b"movi", movi_body)
    info = parse_avi(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert (info["width"], info["height"]) == (6, 8)
    assert info["codec"] == "RGB " and info["bitcount"] == 24
    got = decode_frame_gray(info, info["frames"][2])
    assert got.shape == (8, 6)
    assert got.mean() == pytest.approx(1.0, abs=1e-6)


def test_truncated_headers_raise_avierror_not_struct_error():
    """Truncated avih/strf bodies raise AviError (so the multimodal
    wrapper's AviError->NotImplementedError contract holds), never a raw
    struct.error (ADVICE r4)."""
    avih_ok = struct.pack("<10I16x", 40000, 0, 0, 0, 1, 0, 1, 0, 6, 8)
    strh_v = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIi4H", 0, 0, 0, 0,
                                              1, 25, 0, 1, 0, 0, -1,
                                              0, 0, 6, 8))

    def avi_with(avih_body: bytes, strf_body: bytes) -> bytes:
        hdrl = _list(b"hdrl", _chunk(b"avih", avih_body)
                     + _list(b"strl", _chunk(b"strh", strh_v)
                             + _chunk(b"strf", strf_body)))
        body = b"AVI " + hdrl + _list(b"movi", _chunk(b"00db", b"\x00" * 96))
        return b"RIFF" + struct.pack("<I", len(body)) + body

    with pytest.raises(AviError, match="truncated strf"):
        parse_avi(avi_with(avih_ok, b"\x00" * 12))
    with pytest.raises(AviError, match="truncated avih"):
        parse_avi(avi_with(b"\x00" * 16, b"\x00" * 40))

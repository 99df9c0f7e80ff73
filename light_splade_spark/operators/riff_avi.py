"""Pure-stdlib RIFF/AVI demuxer + uncompressed-frame decoder.

The AVI container is a public RIFF format (Microsoft "AVI RIFF File
Reference"): a chunk tree of (fourcc, size, payload) with LIST nodes.
Walking it needs only ``struct`` — no ffmpeg/PyAV — which turns the video
decode path from an environment-limited ``NotImplementedError`` into a
real decoder for the two codec cases a dependency-free engine can own:

* ``BI_RGB`` (uncompressed bottom-up DIB frames, ``##db`` chunks):
  decoded straight to numpy grayscale here;
* ``MJPG`` (``##dc`` chunks are plain JPEG images): bytes handed to PIL
  when installed, the same optional-import contract as the image path.

Anything else raises NotImplementedError naming the codec — never a
silent fake.

Layout parsed (chunks are word-aligned; odd sizes carry a pad byte):

    RIFF <size> 'AVI '
      LIST 'hdrl'
        'avih' <56>  main header: us/frame, total frames, width, height
        LIST 'strl'
          'strh' <56> stream header: fccType ('vids'), fccHandler
          'strf' <40+> BITMAPINFOHEADER: width, height, bitcount, compression
      LIST 'movi'
        '00db'/'00dc' <frame bytes> ...
"""

from __future__ import annotations

import struct

import numpy as np


class AviError(ValueError):
    """Payload is not a parseable RIFF/AVI stream."""


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


def _walk(b: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for sibling chunks in [start, end);
    LIST chunks yield ('LIST:<type>', ...) with the body excluding the type."""
    off = start
    while off + 8 <= end:
        fourcc = b[off:off + 4].decode("latin-1")
        size = _u32(b, off + 4)
        body = off + 8
        if body + size > end:
            raise AviError(f"chunk {fourcc!r} overruns container")
        if fourcc == "LIST":
            ltype = b[body:body + 4].decode("latin-1")
            yield f"LIST:{ltype}", body + 4, body + size
        else:
            yield fourcc, body, body + size
        off = body + size + (size & 1)  # word alignment


def parse_avi(payload: bytes) -> dict:
    """-> {width, height, n_frames, us_per_frame, codec, frames: [bytes]}.

    ``codec`` is the strf biCompression fourcc ('\\0'*4 == BI_RGB reported
    as 'RGB '); ``frames`` are the stream-0 video chunk payloads in file
    order ('##db' uncompressed / '##dc' compressed).
    """
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise AviError("payload is not a RIFF/AVI container")
    info: dict = {"width": 0, "height": 0, "n_frames": 0,
                  "us_per_frame": 0, "codec": None, "frames": []}
    stream_idx = -1          # strl order defines the '##' chunk prefix
    vids_idx: int | None = None  # which stream index is the video stream
    in_vids = False
    movi_ranges: list[tuple[int, int]] = []
    for cc, s, e in _walk(b, 12, min(len(b), 8 + _u32(b, 4))):
        if cc == "LIST:hdrl":
            for hcc, hs, he in _walk(b, s, e):
                if hcc == "avih":
                    if he - hs < 40:
                        raise AviError("truncated avih header")
                    (uspf, _mbps, _pad, _flags, total, _init, _streams,
                     _sug, w, h) = struct.unpack_from("<10I", b, hs)
                    info.update(us_per_frame=uspf, n_frames=total,
                                width=w, height=h)
                elif hcc == "LIST:strl":
                    stream_idx += 1
                    for scc, ss, se in _walk(b, hs, he):
                        if scc == "strh":
                            in_vids = b[ss:ss + 4] == b"vids"
                            if in_vids and vids_idx is None:
                                vids_idx = stream_idx
                        elif (scc == "strf" and in_vids
                              and vids_idx == stream_idx):
                            # Pinned to the stream whose frames we collect:
                            # a second vids strl must not overwrite the
                            # geometry/codec of the first.
                            if se - ss < 20:
                                raise AviError("truncated strf header")
                            # BITMAPINFOHEADER: biSize, biWidth, biHeight,
                            # biPlanes, biBitCount, biCompression
                            (_bisz, biw, bih, _planes, bitcount,
                             compression) = struct.unpack_from(
                                 "<IiiHHI", b, ss)
                            comp = struct.pack("<I", compression)
                            info["codec"] = ("RGB " if compression == 0
                                             else comp.decode("latin-1"))
                            info["bitcount"] = bitcount
                            # strf dims override avih when present
                            info["width"] = biw or info["width"]
                            info["height"] = abs(bih) or info["height"]
                            info["bottom_up"] = bih > 0
        elif cc == "LIST:movi":
            movi_ranges.append((s, e))
    if info["codec"] is None or vids_idx is None:
        raise AviError("no video ('vids') stream found")
    prefix = f"{vids_idx:02d}"  # e.g. '01dc' when audio is stream 0

    def collect(start: int, end: int) -> None:
        for mcc, ms, me in _walk(b, start, end):
            if mcc == "LIST:rec ":  # interleaved record grouping
                collect(ms, me)
            elif mcc[:2] == prefix and mcc[2:] in ("db", "dc"):
                info["frames"].append(b[ms:me])

    for s, e in movi_ranges:
        collect(s, e)
    if not info["frames"]:
        # a vids stream was declared but no frame chunks matched — a codec
        # /layout this parser doesn't cover. Raising keeps the module's
        # 'never a silent fake' contract (zeros would be wrong-but-plausible)
        raise AviError(
            f"vids stream {vids_idx} declared but no '{prefix}db'/'{prefix}"
            f"dc' frame chunks found in movi")
    if not info["n_frames"]:
        info["n_frames"] = len(info["frames"])
    return info


def decode_frame_gray(info: dict, frame: bytes) -> np.ndarray:
    """One frame chunk -> float32 grayscale array (h, w) in [0, 1].

    BI_RGB 24-bit: pure numpy (BGR rows padded to 4 bytes, bottom-up);
    MJPG: the chunk is a JPEG image, decoded via PIL when installed.
    """
    w, h = info["width"], info["height"]
    codec = info["codec"]
    if codec == "RGB ":
        if info.get("bitcount", 24) != 24:
            raise NotImplementedError(
                f"BI_RGB bitcount {info.get('bitcount')} not supported "
                "(24-bit only)")
        stride = ((w * 3 + 3) // 4) * 4
        if len(frame) < stride * h:
            raise AviError("frame chunk shorter than stride * height")
        rows = np.frombuffer(frame[:stride * h], dtype=np.uint8)
        rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if info.get("bottom_up", True):
            rows = rows[::-1]
        return rows.astype(np.float32).mean(axis=2) / 255.0
    if codec in ("MJPG", "mjpg"):
        try:
            from PIL import Image
        except ImportError:
            raise NotImplementedError(
                "MJPG frame decode requires Pillow (PIL); not installed — "
                "re-encode as BI_RGB or install Pillow") from None
        import io as _io
        img = Image.open(_io.BytesIO(frame)).convert("L")
        return np.asarray(img, dtype=np.float32) / 255.0
    raise NotImplementedError(
        f"AVI codec {codec!r} not supported without ffmpeg/PyAV "
        "(supported here: BI_RGB 24-bit, MJPG via PIL)")


def write_avi(frames: list[np.ndarray], us_per_frame: int = 40000) -> bytes:
    """Minimal BI_RGB 24-bit AVI from (h, w, 3) uint8 arrays — the inverse
    of ``parse_avi`` for the one codec this module owns end-to-end. Used by
    the deterministic media fixtures (Q:extracted_frames) and the
    writer<->parser property tests; rows are written bottom-up with 4-byte
    stride padding per the DIB spec."""
    h, w = frames[0].shape[:2]
    stride = ((w * 3 + 3) // 4) * 4

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack("<10I16x", us_per_frame, 0, 0, 0, len(frames), 0, 1,
                       0, w, h)
    strh = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIi4H", 0, 0, 0, 0, 1,
                                            25, 0, len(frames), 0, 0, -1,
                                            0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h,
                       0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b""
    for f in frames:
        rows = []
        for y in range(h - 1, -1, -1):  # bottom-up DIB row order
            row = np.ascontiguousarray(f[y], dtype=np.uint8).tobytes()
            rows.append(row + b"\x00" * (stride - len(row)))
        movi_body += chunk(b"00db", b"".join(rows))
    body = b"AVI " + hdrl + lst(b"movi", movi_body)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def video_features(payload: bytes, dim: int) -> np.ndarray:
    """Per-frame grayscale means over ``dim`` evenly-sampled frames — the
    video analog of the image path's thumbnail means (temporal instead of
    spatial pooling). Missing frames (short clips) pad with zeros."""
    info = parse_avi(payload)
    frames = info["frames"]
    out = np.zeros(dim, dtype=np.float32)
    if not frames:
        return out
    idx = np.linspace(0, len(frames) - 1, num=min(dim, len(frames)),
                      dtype=np.int64)
    for i, fi in enumerate(idx):
        out[i] = float(decode_frame_gray(info, frames[fi]).mean())
    return out

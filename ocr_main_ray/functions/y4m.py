"""Pure-stdlib Y4M (YUV4MPEG2) video codec: decode uncompressed planar
YUV streams to per-frame numpy planes, plus an encoder for synthesizing
test corpora.

No ffmpeg/pyav — Y4M is the uncompressed interchange container those
tools emit (``ffmpeg -f yuv4mpegpipe``), an ASCII stream header followed
by ``FRAME`` markers and raw planar data, so a correct parser needs only
bytes + numpy.  This is the video analogue of ``functions/wav.py`` (RIFF)
and ``functions/png.py``: it closes the last real-decode gate behind
``VideoFrameSample(fake="real")`` — a payload this parser rejects
degrades that ROW (None features), never the batch.

Supported colorspaces: C420 (jpeg/paldv/mpeg2 variants share the plane
layout), C422, C444, and Cmono.  Streams without a C tag default to 420
per the spec.

Reference for the stage contract: the reference repo treats binary
payloads as opaque per-document blobs (backend file handling); media
decode as a batch stage is the engine charter's addition.
"""
from __future__ import annotations

import numpy as np


class Y4mError(ValueError):
    """Raised for payloads that are not decodable YUV4MPEG2 video."""


_MAGIC = b"YUV4MPEG2"

# colorspace tag -> (chroma width divisor, chroma height divisor);
# None = no chroma planes
_CHROMA = {
    "420": (2, 2), "420jpeg": (2, 2), "420paldv": (2, 2),
    "420mpeg2": (2, 2),
    "422": (2, 1),
    "444": (1, 1),
    "mono": None,
}


def _parse_header(line: bytes) -> dict:
    meta = {"width": None, "height": None, "fps": (25, 1),
            "colorspace": "420", "interlace": "?", "aspect": (0, 0)}
    for tok in line.split(b" ")[1:]:
        if not tok:
            continue
        tag, val = chr(tok[0]), tok[1:].decode("ascii", "replace")
        try:
            if tag == "W":
                meta["width"] = int(val)
            elif tag == "H":
                meta["height"] = int(val)
            elif tag == "F":
                num, den = val.split(":")
                meta["fps"] = (int(num), int(den))
            elif tag == "C":
                meta["colorspace"] = val
            elif tag == "I":
                meta["interlace"] = val
            elif tag == "A":
                num, den = val.split(":")
                meta["aspect"] = (int(num), int(den))
            # X<comment> and unknown tags are ignored per spec
        except (ValueError, IndexError) as e:
            raise Y4mError(f"malformed header token {tok!r}") from e
    if not meta["width"] or not meta["height"]:
        raise Y4mError("header missing W/H")
    if meta["width"] <= 0 or meta["height"] <= 0:
        raise Y4mError("non-positive frame dimensions")
    return meta


def decode_y4m(payload: bytes, planes: str = "luma"
               ) -> tuple[list, dict]:
    """Decode a YUV4MPEG2 payload.

    Returns ``(frames, meta)``.  With ``planes="luma"`` (default) each
    frame is a (height, width) uint8 luma array — what the feature stages
    consume; with ``planes="all"`` each frame is a ``(y, u, v)`` tuple
    (``u``/``v`` are None for mono).  ``meta`` carries width, height,
    fps (num, den), colorspace, and n_frames.  Raises Y4mError on
    anything that is not well-formed Y4M.
    """
    if planes not in ("luma", "all"):
        raise ValueError(f"unknown planes mode {planes!r}")
    if not payload.startswith(_MAGIC):
        raise Y4mError("not a YUV4MPEG2 payload")
    nl = payload.find(b"\n")
    if nl < 0:
        raise Y4mError("unterminated stream header")
    meta = _parse_header(payload[:nl])
    w, h = meta["width"], meta["height"]
    cs = meta["colorspace"]
    if cs not in _CHROMA:
        raise Y4mError(f"unsupported colorspace C{cs}")
    chroma = _CHROMA[cs]
    y_size = w * h
    if chroma is None:
        cw = ch = c_size = 0
    else:
        dw, dh = chroma
        if w % dw or h % dh:
            raise Y4mError(f"dimensions {w}x{h} not divisible for C{cs}")
        cw, ch = w // dw, h // dh
        c_size = cw * ch
    frame_size = y_size + 2 * c_size

    frames = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos:pos + 5] != b"FRAME":
            raise Y4mError(f"expected FRAME marker at byte {pos}")
        data_start = fnl + 1
        if data_start + frame_size > n:
            raise Y4mError("truncated frame data")
        buf = np.frombuffer(payload, np.uint8, frame_size, data_start)
        y = buf[:y_size].reshape(h, w)
        if planes == "all":
            if chroma is None:
                frames.append((y, None, None))
            else:
                u = buf[y_size:y_size + c_size].reshape(ch, cw)
                v = buf[y_size + c_size:].reshape(ch, cw)
                frames.append((y, u, v))
        else:
            frames.append(y)
        pos = data_start + frame_size
    meta["n_frames"] = len(frames)
    return frames, meta


def encode_y4m(frames, fps: tuple[int, int] = (25, 1),
               colorspace: str = "mono") -> bytes:
    """Encode luma frames (list of equal-shape (h, w) uint8 arrays) as a
    YUV4MPEG2 stream.  For chroma colorspaces the U/V planes are filled
    with 128 (neutral) — enough to synthesize test corpora with known
    luma content in every supported layout."""
    if not frames:
        raise ValueError("need at least one frame")
    if colorspace not in _CHROMA:
        raise ValueError(f"unsupported colorspace C{colorspace}")
    h, w = np.asarray(frames[0]).shape
    chroma = _CHROMA[colorspace]
    if chroma is not None and (w % chroma[0] or h % chroma[1]):
        raise ValueError(f"dimensions {w}x{h} not divisible for "
                         f"C{colorspace}")
    parts = [f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A0:0 "
             f"C{colorspace}\n".encode()]
    neutral = (b"" if chroma is None else
               bytes([128]) * ((w // chroma[0]) * (h // chroma[1])))
    for f in frames:
        arr = np.asarray(f, np.uint8)
        if arr.shape != (h, w):
            raise ValueError("all frames must share one shape")
        parts.append(b"FRAME\n")
        parts.append(arr.tobytes())
        parts.append(neutral)
        parts.append(neutral)
    return b"".join(parts)

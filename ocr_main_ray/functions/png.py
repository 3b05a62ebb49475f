"""Pure-Python PNG codec (stdlib zlib + numpy) — the real-codec backend
for the multimodal image stage.

The sandbox has no PIL/opencv, but PNG itself needs nothing beyond
DEFLATE (zlib) and the five scanline filters (RFC 2083 / ISO 15948), so
`media_features` can decode REAL image bytes instead of the deterministic
stand-in.  Supported: 8-bit depth, color types 0 (gray), 2 (RGB),
3 (palette, expanded to RGB/RGBA via PLTE/tRNS), 4 (gray+alpha),
6 (RGBA), non-interlaced.  Anything else raises :class:`PngError`
(no silent wrong pixels).

The encoder exists for fixtures and round-trip tests; it can emit any
filter type per image so the decoder's five unfilter paths are all
exercised.  Chunk CRCs are verified on decode.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # 3 = palette index stream
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


class PngError(ValueError):
    pass


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body)))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w[, ch]) uint8 -> PNG bytes, every scanline filtered with
    ``filter_type`` (0 none, 1 sub, 2 up, 3 average, 4 paeth)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch not in _COLOR_TYPE:
        raise PngError(f"unsupported channel count {ch}")
    if filter_type not in range(5):
        raise PngError(f"bad filter type {filter_type}")
    raw = bytearray()
    prev = np.zeros((w, ch), np.int32)
    for y in range(h):
        line = img[y].astype(np.int32)
        if filter_type == 0:
            filt = line
        elif filter_type == 1:
            left = np.vstack([np.zeros((1, ch), np.int32), line[:-1]])
            filt = line - left
        elif filter_type == 2:
            filt = line - prev
        elif filter_type == 3:
            left = np.vstack([np.zeros((1, ch), np.int32), line[:-1]])
            filt = line - (left + prev) // 2
        else:  # paeth
            filt = np.empty_like(line)
            for x in range(w):
                for c in range(ch):
                    a = int(line[x - 1, c]) if x else 0
                    b = int(prev[x, c])
                    cc = int(prev[x - 1, c]) if x else 0
                    filt[x, c] = int(line[x, c]) - _paeth(a, b, cc)
        raw.append(filter_type)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w) uint8 for grayscale, (h, w, ch) otherwise.
    Verifies chunk CRCs and supports all five scanline filters."""
    if data[:8] != PNG_SIG:
        raise PngError("not a PNG (bad signature)")
    pos, w = 8, None
    idat = bytearray()
    h = ch = None
    ctype = 0
    palette = trns = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise PngError("truncated chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        if crc != zlib.crc32(tag + body):
            raise PngError(f"bad CRC in {tag!r}")
        pos += 12 + length
        if tag == b"IHDR":
            if len(body) != 13:
                raise PngError("bad IHDR length")
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth}")
            if ctype not in _CHANNELS:
                raise PngError(f"unsupported color type {ctype}")
            if comp or filt:
                raise PngError("nonstandard compression/filter method")
            if interlace:
                raise PngError("interlaced PNG not supported")
            ch = _CHANNELS[ctype]
        elif tag == b"PLTE":
            if len(body) % 3:
                raise PngError("bad PLTE length")
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS" and ctype == 3:
            trns = np.frombuffer(body, np.uint8)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise PngError("missing IHDR/IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"corrupt IDAT stream: {e}") from e
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise PngError("decompressed size mismatch")
    out = np.empty((h, w, ch), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1).astype(np.int32)
        if ft == 0:
            rec = line
        elif ft == 2:
            rec = (line + prev) % 256
        elif ft in (1, 3, 4):
            rec = np.empty(stride, np.int32)
            for i in range(stride):
                a = rec[i - ch] if i >= ch else 0
                if ft == 1:
                    rec[i] = (line[i] + a) % 256
                elif ft == 3:
                    rec[i] = (line[i] + (a + prev[i]) // 2) % 256
                else:
                    c = prev[i - ch] if i >= ch else 0
                    rec[i] = (line[i] + _paeth(int(a), int(prev[i]),
                                               int(c))) % 256
        else:
            raise PngError(f"bad scanline filter {ft}")
        out[y] = rec.astype(np.uint8).reshape(w, ch)
        prev = rec
    if ctype == 3:
        if palette is None:
            raise PngError("palette image without PLTE")
        idx = out[:, :, 0]
        if idx.max() >= len(palette):
            raise PngError("palette index out of range")
        rgb = palette[idx]
        if trns is None:
            return rgb
        alpha = np.full(len(palette), 255, np.uint8)
        alpha[: len(trns)] = trns
        return np.dstack([rgb, alpha[idx]])
    return out[:, :, 0] if ch == 1 else out

"""Pure-Python PNG codec (functions/png.py) + real-codec multimodal mode."""
import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from ocr_main_ray.functions.png import (PNG_SIG, PngError, decode_png,
                                        encode_png)


def _rand(shape, seed=7):
    return np.random.RandomState(seed).randint(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("shape", [(5, 7), (8, 3, 2), (6, 9, 3), (4, 4, 4),
                                   (1, 1), (16, 16, 3)])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter(shape, ft):
    img = _rand(shape)
    out = decode_png(encode_png(img, filter_type=ft))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.array_equal(out, img)


def test_reference_palette_png_byte_exact():
    """A hand-assembled palette PNG (independent of our encoder): 2x2
    indices into a 3-color PLTE with tRNS alpha — pixel values pinned."""
    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255])
    trns = bytes([10, 20])                      # 3rd entry -> opaque 255
    raw = bytes([0, 0, 1, 0, 2, 1])             # filter0 rows: [0,1], [2,1]
    data = (PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
            + chunk(b"tRNS", trns) + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))
    img = decode_png(data)
    want = np.array([[[255, 0, 0, 10], [0, 255, 0, 20]],
                     [[0, 0, 255, 255], [0, 255, 0, 20]]], np.uint8)
    assert np.array_equal(img, want)


def test_reference_up_filter_byte_exact():
    """Hand-assembled grayscale PNG using the UP filter — decoder output
    pinned against the spec's reconstruction rule."""
    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
    raw = bytes([0, 10, 20, 30,       # row0 unfiltered
                 2, 5, 250, 240])     # row1 = row0 + deltas mod 256
    data = (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    img = decode_png(data)
    want = np.array([[10, 20, 30], [15, 14, 14]], np.uint8)
    assert np.array_equal(img, want)


def test_corruption_raises():
    img = _rand((4, 4))
    data = bytearray(encode_png(img))
    data[20] ^= 0xFF
    with pytest.raises(PngError):
        decode_png(bytes(data))
    with pytest.raises(PngError):
        decode_png(b"not a png at all")


def test_media_pipeline_real_codec(ray_session):
    """media_features with image_mode='real': PNG payloads decode via the
    pure-Python codec; a corrupt payload degrades its row, never the
    batch."""
    import ray.data as rd

    from ocr_main_ray.functions.multimodal import (MEDIA_SCHEMA,
                                                   media_feature_pipeline)

    imgs = [_rand((16, 16), seed=i) for i in range(6)]
    payloads = [encode_png(im, filter_type=i % 5) for i, im in enumerate(imgs)]
    payloads.append(b"garbage bytes, not a png")
    rows = {
        "media_id": list(range(7)),
        "kind": ["image"] * 7,
        "payload": payloads,
        "mime": ["image/png"] * 7,
        "width": [16] * 7,
        "height": [16] * 7,
        "duration_ms": [-1] * 7,
    }
    tbl = pa.table(rows, schema=MEDIA_SCHEMA)
    rows_out = sorted(
        media_feature_pipeline(rd.from_arrow(tbl), concurrency=1,
                               batch_size=4, image_mode="real").take_all(),
        key=lambda r: r["media_id"])
    for i in range(6):
        assert abs(rows_out[i]["px_mean"] - imgs[i].mean()) < 1e-9
        assert abs(rows_out[i]["px_std"] - imgs[i].std()) < 1e-9
    assert rows_out[6]["px_mean"] is None  # corrupt row degraded alone

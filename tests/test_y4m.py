"""Pure-stdlib Y4M codec (functions/y4m.py): header parsing, roundtrip
fidelity in every supported colorspace, plane layout, malformed-payload
rejection, and a byte-pinned encode fixture."""
import hashlib

import numpy as np
import pytest

from ocr_main_ray.functions.y4m import (Y4mError, decode_y4m, encode_y4m)


def _frames(n=4, h=8, w=12):
    rng = np.random.default_rng(7)
    return [rng.integers(0, 256, (h, w)).astype(np.uint8)
            for _ in range(n)]


@pytest.mark.parametrize("cs", ["mono", "420jpeg", "420", "422", "444"])
def test_roundtrip_luma_all_colorspaces(cs):
    frames = _frames()
    payload = encode_y4m(frames, fps=(30, 1), colorspace=cs)
    got, meta = decode_y4m(payload)
    assert meta["width"] == 12 and meta["height"] == 8
    assert meta["fps"] == (30, 1) and meta["n_frames"] == 4
    assert meta["colorspace"] == cs
    for a, b in zip(frames, got):
        assert np.array_equal(a, b)


def test_planes_all_chroma_layout():
    frames = _frames(2, 8, 8)
    trip = decode_y4m(encode_y4m(frames, colorspace="420jpeg"),
                      planes="all")[0]
    y, u, v = trip[0]
    assert y.shape == (8, 8) and u.shape == (4, 4) and v.shape == (4, 4)
    assert (u == 128).all() and (v == 128).all()
    y422 = decode_y4m(encode_y4m(frames, colorspace="422"),
                      planes="all")[0][0]
    assert y422[1].shape == (8, 4)
    ym = decode_y4m(encode_y4m(frames, colorspace="mono"),
                    planes="all")[0][0]
    assert ym[1] is None and ym[2] is None


def test_default_colorspace_is_420():
    frames = [np.zeros((2, 2), np.uint8)]
    # hand-built stream without a C tag: 4 luma + 1 U + 1 V bytes
    payload = (b"YUV4MPEG2 W2 H2 F25:1\n"
               b"FRAME\n" + bytes(4) + bytes([128]) + bytes([128]))
    got, meta = decode_y4m(payload)
    assert meta["colorspace"] == "420" and meta["n_frames"] == 1
    assert np.array_equal(got[0], frames[0])


@pytest.mark.parametrize("payload,msg", [
    (b"AVI1 nope", "not a YUV4MPEG2"),
    (b"YUV4MPEG2 W8 H8 F25:1 C420\nGARBAGE", "FRAME marker"),
    (b"YUV4MPEG2 W8 H8 F25:1 C420\nFRAME\n" + bytes(10), "truncated"),
    (b"YUV4MPEG2 W8 H8 F25:1 Cweird\nFRAME\n", "unsupported colorspace"),
    (b"YUV4MPEG2 F25:1 C420\n", "missing W/H"),
    (b"YUV4MPEG2 W7 H8 F25:1 C420\nFRAME\n" + bytes(100), "divisible"),
    (b"YUV4MPEG2 W8 H8 FX:1\n", "malformed header"),
])
def test_rejects_malformed(payload, msg):
    with pytest.raises(Y4mError, match=msg):
        decode_y4m(payload)


def test_encode_validations():
    with pytest.raises(ValueError, match="at least one"):
        encode_y4m([])
    with pytest.raises(ValueError, match="divisible"):
        encode_y4m([np.zeros((3, 3), np.uint8)], colorspace="420")
    with pytest.raises(ValueError, match="share one shape"):
        encode_y4m([np.zeros((4, 4), np.uint8),
                    np.zeros((4, 6), np.uint8)])


def test_encode_bytes_pinned():
    """Frozen fixture: the exact encoded bytes must never drift — the
    encoder is the test-corpus generator other tests and goldens rely on."""
    frames = [np.arange(16, dtype=np.uint8).reshape(4, 4),
              np.full((4, 4), 200, np.uint8)]
    payload = encode_y4m(frames, fps=(24, 1), colorspace="420jpeg")
    assert payload[:46] == (b"YUV4MPEG2 W4 H4 F24:1 Ip A0:0 C420jpeg\n"
                            b"FRAME\n\x00")
    assert hashlib.sha256(payload).hexdigest() == (
        "9e888cd7a01ced9121ca3b2b89b7e3dbc1bc05f83a9fb434211089de33724111")
    # and it decodes back to itself
    got, meta = decode_y4m(payload)
    assert meta["n_frames"] == 2
    assert np.array_equal(got[0], frames[0])
    assert np.array_equal(got[1], frames[1])

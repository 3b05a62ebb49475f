"""Pure-stdlib WAV (RIFF) codec: decode PCM 8/16/24/32-bit and IEEE
float32/float64 payloads to normalized float64 samples, plus a PCM16
encoder for synthesizing test corpora.

No soundfile/librosa/ffmpeg — just struct + numpy over the RIFF chunk
layout, the audio analogue of ``functions/png.py``.  Used by the
``AudioFeatures(fake="real")`` actor stage: a payload this parser rejects
degrades that ROW (None features), never the batch.

Reference for the stage contract: the reference repo treats binary
payloads as opaque per-document blobs (backend file handling); here media
decode is a first-class batch stage per the engine charter.
"""
from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    """Raised for payloads that are not decodable RIFF/WAVE audio."""


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE payload.

    Returns ``(samples, sample_rate)`` where samples is float64 of shape
    (n_frames, n_channels), normalized to [-1, 1] for integer PCM and
    passed through for IEEE-float data.  Raises WavError on anything that
    is not a well-formed PCM/float WAV.
    """
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        (csize,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + csize]
        if cid == b"fmt " and fmt is None:
            if len(body) < 16:
                raise WavError("truncated fmt chunk")
            audio_format, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0)
            if audio_format == 0xFFFE and len(body) >= 40:
                # WAVE_FORMAT_EXTENSIBLE: real format is the GUID prefix
                (audio_format,) = struct.unpack_from("<H", body, 24)
            fmt = (audio_format, channels, rate, bits)
        elif cid == b"data" and data is None:
            if len(body) < csize:
                raise WavError("truncated data chunk")
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise WavError("missing fmt or data chunk")
    audio_format, channels, rate, bits = fmt
    if channels < 1 or channels > 64 or rate < 1:
        raise WavError(f"implausible channels={channels} rate={rate}")
    if audio_format == 1:  # integer PCM
        if bits == 8:
            x = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            usable = len(data) // 2 * 2
            x = np.frombuffer(data[:usable], "<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            usable = len(data) // 3 * 3
            b = np.frombuffer(data[:usable], np.uint8).reshape(-1, 3).astype(np.int64)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            usable = len(data) // 4 * 4
            x = np.frombuffer(data[:usable], "<i4").astype(np.float64) / float(1 << 31)
        else:
            raise WavError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            usable = len(data) // 4 * 4
            x = np.frombuffer(data[:usable], "<f4").astype(np.float64)
        elif bits == 64:
            usable = len(data) // 8 * 8
            x = np.frombuffer(data[:usable], "<f8").astype(np.float64)
        else:
            raise WavError(f"unsupported float bit depth {bits}")
    else:
        raise WavError(f"unsupported audio format {audio_format}")
    frames = len(x) // channels
    if frames == 0:
        raise WavError("no complete audio frames")
    return x[: frames * channels].reshape(frames, channels), int(rate)


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """Encode float samples in [-1, 1] (shape (n,) or (n, channels)) as a
    canonical 16-bit PCM WAV — the synthesis half used by tests and the
    media corpus generator."""
    s = np.asarray(samples, np.float64)
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    block = channels * 2
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, channels, rate, rate * block, block, 16,
        b"data", len(data))
    return hdr + data

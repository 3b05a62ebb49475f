"""Multimodal columns: image / audio / video payloads as opaque binary.

Design per the engine's charter: media travels as ``large_binary`` columns
with typed metadata columns beside it; decode / feature-extract / resize /
frame-sample are actor-pool ``map_batches`` stages with small batch sizes
(payloads are large — batch_size * concurrency must fit the worker heap).

Codec availability: all three modalities decode FOR REAL via pure-Python
codecs — PNG images through ``functions/png.py`` (stdlib zlib + the five
scanline filters; no PIL), WAV audio through ``functions/wav.py``
(pure-stdlib RIFF parser, PCM 8/16/24/32 + IEEE float), and uncompressed
YUV4MPEG2 video through ``functions/y4m.py`` (C420/C422/C444/Cmono — the
container ffmpeg emits with ``-f yuv4mpegpipe``; compressed codecs like
H.264 genuinely need ffmpeg/pyav, absent in this sandbox).  Every stage
also keeps ``fake="deterministic"``: a seed-free stand-in (derived from
the payload bytes) so the Ray-side plumbing — schema, actor signature,
batch sizing, output layout — is testable without valid media bytes.
"""
from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),            # image | audio | video
        ("payload", pa.large_binary()),    # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),             # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int, offset: int = 0) -> pa.Table:
    """Deterministic fake media corpus (payload = structured pseudo-bytes)."""
    rows = {k: [] for k in ("media_id", "kind", "payload", "mime",
                            "width", "height", "duration_ms")}
    kinds = [("image", "image/png"), ("audio", "audio/wav"), ("video", "video/mp4")]
    for i in range(offset, offset + n):
        kind, mime = kinds[i % 3]
        seed = hashlib.md5(f"media-{i}".encode()).digest()
        payload = (seed * (64 + (i * 37) % 512))[: 1024 + (i * 911) % 8192]
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(mime)
        rows["width"].append(64 + (i % 8) * 32 if kind != "audio" else -1)
        rows["height"].append(64 + (i % 5) * 32 if kind != "audio" else -1)
        rows["duration_ms"].append(-1 if kind == "image" else 1000 + (i % 60) * 500)
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "kind": pa.array(rows["kind"], pa.string()),
            "payload": pa.array(rows["payload"], pa.large_binary()),
            "mime": pa.array(rows["mime"], pa.string()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "duration_ms": pa.array(rows["duration_ms"], pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def synth_real_media_table(n: int, offset: int = 0) -> pa.Table:
    """Deterministic media corpus with REAL encoded payloads — PNG via
    ``functions/png.py``, WAV via ``functions/wav.py``, YUV4MPEG2 via
    ``functions/y4m.py`` — so the feature pipeline can run all three
    real-decode modes end-to-end.  Every 17th row carries a corrupt
    payload to exercise per-row degradation."""
    from .png import encode_png
    from .wav import encode_wav_pcm16
    from .y4m import encode_y4m

    rows = {k: [] for k in ("media_id", "kind", "payload", "mime",
                            "width", "height", "duration_ms")}
    kinds = [("image", "image/png"), ("audio", "audio/wav"),
             ("video", "video/y4m")]
    for i in range(offset, offset + n):
        kind, mime = kinds[i % 3]
        rng = np.random.default_rng(1000 + i)
        w = h = dur = -1
        if i % 17 == 16:
            payload = b"corrupt payload " + bytes([i % 256]) * 32
        elif kind == "image":
            h, w = 8 + (i % 4) * 4, 8 + (i % 5) * 4
            img = rng.integers(0, 256, (h, w)).astype(np.uint8)
            payload = encode_png(img, filter_type=i % 5)
        elif kind == "audio":
            rate, nsamp = 8000, 400 + (i % 5) * 100
            t = np.arange(nsamp) / rate
            freq = 200.0 + (i % 20) * 40.0
            payload = encode_wav_pcm16(0.5 * np.sin(2 * np.pi * freq * t),
                                       rate)
            dur = int(nsamp * 1000 / rate)
        else:
            h = w = 8 + (i % 3) * 4
            nf = 2 + (i % 4)
            frames = [rng.integers(0, 256, (h, w)).astype(np.uint8)
                      for _ in range(nf)]
            cs = ("mono", "420jpeg", "444")[i % 3]
            payload = encode_y4m(frames, colorspace=cs)
            dur = nf * 40
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(mime)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(dur)
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "kind": pa.array(rows["kind"], pa.string()),
            "payload": pa.array(rows["payload"], pa.large_binary()),
            "mime": pa.array(rows["mime"], pa.string()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "duration_ms": pa.array(rows["duration_ms"], pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def _fake_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic pseudo-decode: payload bytes -> (h, w) uint8 raster."""
    base = np.frombuffer(
        hashlib.sha256(payload).digest() * ((w * h) // 32 + 1), dtype=np.uint8
    )[: w * h]
    return base.reshape(h, w)


class ImageDecodeFeatures:
    """Actor stage: decode image payloads -> feature columns.

    batch_size guidance: payloads are MBs; keep batch_size small (4-16) so
    batch * pool fits in worker heap — the media analogue of the OCR
    stage's sizing."""

    def __init__(self, fake: str = "deterministic", thumb: int = 8):
        if fake not in ("deterministic", "real"):
            raise ValueError(f"unknown mode {fake!r}")
        self.fake = fake
        self.thumb = thumb

    def _decode(self, payload: bytes, w: int, h: int) -> "np.ndarray | None":
        if self.fake == "deterministic":
            return _fake_pixels(payload, max(w, 1), max(h, 1))
        # real mode: pure-Python PNG codec (functions/png.py); a payload
        # the codec rejects degrades that ROW (None features), never the
        # batch — the dataplane's per-row error discipline
        from .png import PngError, decode_png

        try:
            px = decode_png(payload)
        except PngError:
            return None
        if px.ndim == 3:  # luma for the scalar/thumbnail features
            px = px[:, :, : min(3, px.shape[2])].mean(axis=2)
        return px.astype(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, stds, thumbs = [], [], []
        for payload, kind, w, h in zip(batch.column("payload").to_pylist(),
                                       batch.column("kind").to_pylist(),
                                       batch.column("width").to_pylist(),
                                       batch.column("height").to_pylist()):
            px = (self._decode(payload, w, h)
                  if kind == "image" else None)
            if px is None:
                means.append(None); stds.append(None); thumbs.append(None)
                continue
            means.append(float(px.mean()))
            stds.append(float(px.std()))
            # "resize": block-mean thumbnail, flattened
            th = px[: (px.shape[0] // self.thumb) * self.thumb,
                    : (px.shape[1] // self.thumb) * self.thumb]
            if th.size:
                t = th.reshape(self.thumb, th.shape[0] // self.thumb,
                               self.thumb, th.shape[1] // self.thumb).mean(axis=(1, 3))
            else:
                t = np.zeros((self.thumb, self.thumb))
            thumbs.append([float(x) for x in t.ravel()])
        return batch.drop(["payload"]).append_column(
            "px_mean", pa.array(means, pa.float64())
        ).append_column("px_std", pa.array(stds, pa.float64())).append_column(
            "thumbnail", pa.array(thumbs, pa.list_(pa.float32()))
        )


class AudioFeatures:
    """Actor stage: audio payload -> (rms, zero-crossings) features.

    ``fake="real"`` decodes RIFF/WAVE payloads FOR REAL via the pure-
    stdlib parser in ``functions/wav.py`` (PCM 8/16/24/32 + IEEE float);
    a payload the parser rejects degrades that ROW (None features), never
    the batch.  ``fake="deterministic"`` keeps the payload-derived
    stand-in so plumbing tests don't need valid WAV bytes."""

    def __init__(self, fake: str = "deterministic"):
        if fake not in ("deterministic", "real"):
            raise ValueError(f"unknown mode {fake!r}")
        self.fake = fake

    def _samples(self, payload: bytes) -> "np.ndarray | None":
        if self.fake == "deterministic":
            return (np.frombuffer(payload, dtype=np.uint8)
                    .astype(np.float32) - 127.5) / 127.5
        from .wav import WavError, decode_wav

        try:
            samples, _ = decode_wav(payload)
        except WavError:
            return None
        return samples.mean(axis=1)  # mono mix for the scalar features

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms, zc = [], []
        for payload, kind in zip(batch.column("payload").to_pylist(),
                                 batch.column("kind").to_pylist()):
            wave = self._samples(payload) if kind == "audio" else None
            if wave is None or not len(wave):
                rms.append(None); zc.append(None)
                continue
            rms.append(float(np.sqrt((wave ** 2).mean())))
            zc.append(int(((wave[1:] * wave[:-1]) < 0).sum()))
        return batch.drop(["payload"]).append_column(
            "rms", pa.array(rms, pa.float64())
        ).append_column("zero_crossings", pa.array(zc, pa.int64()))


class VideoFrameSample:
    """Actor stage: sample n_frames frames per video -> per-frame luma
    means.

    ``fake="real"`` decodes uncompressed YUV4MPEG2 payloads FOR REAL via
    the pure-stdlib parser in ``functions/y4m.py`` (C420/C422/C444/Cmono
    — the container ffmpeg emits with ``-f yuv4mpegpipe``); frames are
    sampled evenly across the stream (linspace over frame indices, so the
    output list length is always ``n_frames`` and the choice is
    deterministic), and a payload the parser rejects degrades that ROW
    (None features), never the batch.  ``fake="deterministic"`` keeps the
    payload-derived stand-in so plumbing tests don't need valid Y4M
    bytes."""

    def __init__(self, n_frames: int = 3, fake: str = "deterministic"):
        if fake not in ("deterministic", "real"):
            raise ValueError(f"unknown mode {fake!r}")
        self.n_frames = n_frames
        self.fake = fake

    def _real_means(self, payload: bytes) -> "list[float] | None":
        from .y4m import Y4mError, decode_y4m

        try:
            frames, _ = decode_y4m(payload)
        except Y4mError:
            return None
        if not frames:
            return None
        idx = np.linspace(0, len(frames) - 1, self.n_frames).round()
        return [float(frames[int(i)].mean()) for i in idx]

    def __call__(self, batch: pa.Table) -> pa.Table:
        frame_means = []
        for payload, kind in zip(batch.column("payload").to_pylist(),
                                 batch.column("kind").to_pylist()):
            if kind != "video":
                frame_means.append(None)
                continue
            if self.fake == "real":
                frame_means.append(self._real_means(payload))
                continue
            means = []
            for fi in range(self.n_frames):
                fseed = zlib.crc32(payload, fi)
                means.append(float(fseed % 256))
            frame_means.append(means)
        return batch.drop(["payload"]).append_column(
            "frame_means", pa.array(frame_means, pa.list_(pa.float32()))
        )


def media_feature_pipeline(ds, concurrency=(1, 4), batch_size: int = 8,
                           image_mode: str = "deterministic",
                           audio_mode: str = "deterministic",
                           video_mode: str = "deterministic"):
    """media Dataset -> per-kind feature Dataset (three actor-pool stages in
    one pass each; payload column dropped at the first stage that consumes
    it would break later stages, so each stage runs on the original ds and
    results are column-joined by media_id at small scale / unioned by kind
    at large scale).  Here: single combined stage for simplicity."""

    class Combined:
        def __init__(self):
            self.img = ImageDecodeFeatures(fake=image_mode)
            self.aud = AudioFeatures(fake=audio_mode)
            self.vid = VideoFrameSample(fake=video_mode)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = self.img(batch)
            b = self.aud(batch)
            c = self.vid(batch)
            out = a
            for col in ("rms", "zero_crossings"):
                out = out.append_column(col, b.column(col))
            out = out.append_column("frame_means", c.column("frame_means"))
            return out

    return ds.map_batches(Combined, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1)

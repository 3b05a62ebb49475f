import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from ocr_main_ray.functions.multimodal import (AudioFeatures,
                                               ImageDecodeFeatures,
                                               MEDIA_SCHEMA, VideoFrameSample,
                                               media_feature_pipeline,
                                               synth_media_table)


def test_media_schema_and_determinism():
    a, b = synth_media_table(30), synth_media_table(30)
    assert a.schema.equals(MEDIA_SCHEMA)
    assert a.equals(b)
    kinds = set(a.column("kind").to_pylist())
    assert kinds == {"image", "audio", "video"}


def test_real_codecs_all_construct():
    # all three modalities now have real pure-Python codecs
    # (png.py / wav.py / y4m.py); only unknown modes are rejected.
    ImageDecodeFeatures(fake="real")
    AudioFeatures(fake="real")
    VideoFrameSample(fake="real")
    with pytest.raises(ValueError):
        VideoFrameSample(fake="ffmpeg")


def test_video_real_mode_decodes_y4m():
    from ocr_main_ray.functions.y4m import encode_y4m

    frames = [np.full((8, 8), v, np.uint8) for v in (10, 60, 200, 250)]
    payload = encode_y4m(frames, colorspace="420jpeg")
    tbl = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "kind": pa.array(["video", "video"], pa.string()),
        "payload": pa.array([payload, b"not a video"], pa.large_binary()),
        "mime": pa.array(["video/y4m", "video/y4m"], pa.string()),
        "width": pa.array([8, -1], pa.int32()),
        "height": pa.array([8, -1], pa.int32()),
        "duration_ms": pa.array([160, -1], pa.int32()),
    }, schema=MEDIA_SCHEMA)
    out = VideoFrameSample(n_frames=3, fake="real")(tbl)
    means = out.column("frame_means").to_pylist()
    # linspace(0, 3, 3).round() -> frames 0, 2, 3
    assert means[0] == [10.0, 200.0, 250.0]
    assert means[1] is None  # undecodable row degrades, batch survives


def test_image_stage_direct():
    tbl = synth_media_table(9)
    out = ImageDecodeFeatures()(tbl)
    assert "payload" not in out.column_names
    for kind, mean, thumb in zip(out.column("kind").to_pylist(),
                                 out.column("px_mean").to_pylist(),
                                 out.column("thumbnail").to_pylist()):
        if kind == "image":
            assert mean is not None and len(thumb) == 64
        else:
            assert mean is None and thumb is None


@pytest.mark.usefixtures("ray_session")
def test_media_pipeline_on_ray():
    tbl = synth_media_table(60)
    ds = rd.from_arrow(tbl).repartition(6)
    out = media_feature_pipeline(ds, concurrency=2, batch_size=8)
    rows = out.take_all()
    assert len(rows) == 60
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], []).append(r)
    assert all(r["px_mean"] is not None for r in by_kind["image"])
    assert all(r["rms"] is not None for r in by_kind["audio"])
    assert all(len(r["frame_means"]) == 3 for r in by_kind["video"])
    # deterministic across runs
    rows2 = media_feature_pipeline(rd.from_arrow(tbl).repartition(3),
                                   concurrency=2, batch_size=8).take_all()
    key = lambda rs: sorted((r["media_id"], r["px_mean"], r["rms"]) for r in rs)
    assert key(rows) == key(rows2)


def test_synth_real_media_table_deterministic():
    from ocr_main_ray.functions.multimodal import synth_real_media_table
    a, b = synth_real_media_table(24), synth_real_media_table(24)
    assert a.equals(b)
    assert a.schema.equals(MEDIA_SCHEMA)
    pl = a.column("payload").to_pylist()
    kinds = a.column("kind").to_pylist()
    assert pl[0][:8] == b"\x89PNG\r\n\x1a\n" and kinds[0] == "image"
    assert pl[1][:4] == b"RIFF" and kinds[1] == "audio"
    assert pl[2][:9] == b"YUV4MPEG2" and kinds[2] == "video"
    assert pl[16].startswith(b"corrupt payload")


@pytest.mark.usefixtures("ray_session")
def test_media_pipeline_all_real_codecs():
    """All three modalities through their REAL pure-Python codecs in one
    actor-pool pass; corrupt rows degrade per-row."""
    from ocr_main_ray.functions.multimodal import synth_real_media_table

    tbl = synth_real_media_table(36)
    rows = sorted(
        media_feature_pipeline(rd.from_arrow(tbl).repartition(4),
                               concurrency=2, batch_size=8,
                               image_mode="real", audio_mode="real",
                               video_mode="real").take_all(),
        key=lambda r: r["media_id"])
    for r in rows:
        corrupt = r["media_id"] % 17 == 16
        if r["kind"] == "image":
            assert (r["px_mean"] is None) == corrupt
        elif r["kind"] == "audio":
            assert (r["rms"] is None) == corrupt
            if not corrupt:
                # 0.5-amplitude sine -> rms ~ 0.3536
                assert abs(r["rms"] - 0.3536) < 0.02
        else:
            assert (r["frame_means"] is None) == corrupt
            if not corrupt:
                assert len(r["frame_means"]) == 3

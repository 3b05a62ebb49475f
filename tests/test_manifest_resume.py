"""Resume semantics: a rerun skips completed partitions; output matches the
single-pass pipeline byte-for-byte."""
import json
import pathlib
import shutil

import pyarrow.parquet as pq
import pytest

from ocr_main_ray.config import PipelineConfig
from ocr_main_ray.sources.synth import synth_pages
from ocr_main_ray.state.manifest import run_checkpointed, stage_version

N_DOCS = 40


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    tbl = synth_pages(N_DOCS)
    pq.write_table(tbl.slice(0, tbl.num_rows // 2), d / "a.parquet")
    pq.write_table(tbl.slice(tbl.num_rows // 2), d / "b.parquet")
    return d


@pytest.mark.usefixtures("ray_session")
def test_checkpointed_run_and_resume(pages_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("ckpt")
    cfg = PipelineConfig(ocr_concurrency=2)

    summary1 = run_checkpointed(str(pages_dir), str(out), cfg)
    assert summary1["partitions_processed"] > 0
    assert summary1["partitions_skipped"] == 0

    def read_all():
        tbl = pq.read_table(summary1["out_dir"])
        df = tbl.select(["url", "extracted_text", "n_pages", "error"]).to_pandas()
        return df.sort_values("url").reset_index(drop=True)

    first = read_all()
    assert len(first) == N_DOCS  # no duplicate urls in this corpus

    # full resume: nothing reprocessed
    summary2 = run_checkpointed(str(pages_dir), str(out), cfg)
    assert summary2["partitions_processed"] == 0
    assert summary2["partitions_skipped"] == summary1["partitions_total"]

    # kill one partition (simulate crash after partial work) -> only it reruns
    manifests = sorted((out / "manifests").glob("part-*.json"))
    victim = json.loads(manifests[0].read_text())
    part_id = (f"{victim['partition']['content_type']}-"
               f"{victim['partition']['size_bucket']}")
    manifests[0].unlink()
    shutil.rmtree(out / "extracted" / f"part={part_id}")
    summary3 = run_checkpointed(str(pages_dir), str(out), cfg)
    assert summary3["partitions_processed"] == 1
    assert summary3["partitions_skipped"] == summary1["partitions_total"] - 1

    assert read_all().equals(first)  # byte-identical after resume


@pytest.mark.usefixtures("ray_session")
def test_manifest_lineage_fields(pages_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("ckpt2")
    cfg = PipelineConfig(ocr_concurrency=2)
    run_checkpointed(str(pages_dir), str(out), cfg)
    from ocr_main_ray.state.manifest import input_fingerprint

    m = json.loads(next((out / "manifests").glob("part-*.json")).read_text())
    assert m["stage_version"] == stage_version(cfg, input_fingerprint(str(pages_dir)))
    assert m["input_files"] and m["row_count"] > 0
    assert "wall_ms" in m and "error_rows" in m


def test_stage_version_changes_with_config():
    assert stage_version(PipelineConfig()) != stage_version(PipelineConfig(dpi=600))


@pytest.mark.usefixtures("ray_session")
def test_input_change_invalidates_resume(pages_dir, tmp_path_factory):
    """Adding an input shard after a completed run must reprocess — not
    silently skip the new data."""
    import pyarrow.parquet as pq

    from ocr_main_ray.sources.synth import synth_pages

    out = tmp_path_factory.mktemp("ckpt3")
    cfg = PipelineConfig(ocr_concurrency=2)
    run_checkpointed(str(pages_dir), str(out), cfg)
    n1 = pq.read_table(str(out / "extracted")).num_rows

    extra = synth_pages(6, offset=5000)
    pq.write_table(extra, pages_dir / "c.parquet")
    try:
        summary = run_checkpointed(str(pages_dir), str(out), cfg)
        assert summary["partitions_skipped"] == 0  # everything invalidated
        n2 = pq.read_table(str(out / "extracted")).num_rows
        assert n2 > n1
    finally:
        (pages_dir / "c.parquet").unlink()


@pytest.mark.usefixtures("ray_session")
def test_checkpointed_concurrent_partitions_equivalent(pages_dir,
                                                       tmp_path_factory):
    """max_concurrent_partitions=3 (overlapped partition pipelines) must
    produce exactly the sequential output, keep resume semantics, and
    leave one manifest per partition."""
    import pyarrow.parquet as pq

    out_seq = tmp_path_factory.mktemp("ckpt_seq")
    out_par = tmp_path_factory.mktemp("ckpt_par")
    cfg = PipelineConfig(ocr_concurrency=2)
    s1 = run_checkpointed(str(pages_dir), str(out_seq), cfg)
    s2 = run_checkpointed(str(pages_dir), str(out_par), cfg,
                          dispatch_mode="tasks",
                          max_concurrent_partitions=3)
    assert s2["partitions_total"] == s1["partitions_total"]
    assert s2["partitions_processed"] == s1["partitions_total"]

    def read_all(summary):
        tbl = pq.read_table(summary["out_dir"])
        df = tbl.select(["url", "extracted_text", "n_pages"]).to_pandas()
        return df.sort_values("url").reset_index(drop=True)

    import pandas as pd
    pd.testing.assert_frame_equal(read_all(s1), read_all(s2))
    # resume after the concurrent run: everything skipped
    s3 = run_checkpointed(str(pages_dir), str(out_par), cfg,
                          dispatch_mode="tasks",
                          max_concurrent_partitions=3)
    assert s3["partitions_processed"] == 0
    assert s3["partitions_skipped"] == s2["partitions_total"]

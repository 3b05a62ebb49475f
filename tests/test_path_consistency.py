"""The three execution paths (generic extract_dataset, tuned extract_run in
both dispatch modes, checkpointed runner) must produce identical rows."""
import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from ocr_main_ray.config import PipelineConfig
from ocr_main_ray.pipelines.extract import extract_run
from ocr_main_ray.sources.synth import synth_pages
from ocr_main_ray.state.manifest import run_checkpointed, summarize_run

COLS = ["url", "content_type", "extracted_text", "n_pages", "word_count", "error"]


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("consist")
    tbl = synth_pages(50)
    pq.write_table(tbl.slice(0, 30), d / "a.parquet")
    pq.write_table(tbl.slice(30), d / "b.parquet")
    return d


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df[COLS].sort_values("url").reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_all_paths_identical(pages_dir, tmp_path_factory):
    cfg = PipelineConfig(ocr_concurrency=2)

    a = _norm(extract_run(rd.read_parquet(str(pages_dir)), config=cfg,
                          dispatch_mode="actors").to_pandas())
    b = _norm(extract_run(rd.read_parquet(str(pages_dir)), config=cfg,
                          dispatch_mode="tasks").to_pandas())
    out = tmp_path_factory.mktemp("ckpt_consist")
    summary = run_checkpointed(str(pages_dir), str(out), cfg)
    c = _norm(pq.read_table(summary["out_dir"]).to_pandas())

    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)

    rollup = summarize_run(str(out))
    assert rollup["row_count"] == len(a)
    assert rollup["partitions"] == summary["partitions_total"]
    assert rollup["engine_info"]["hermetic"] is True

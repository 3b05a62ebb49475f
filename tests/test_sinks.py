"""Parquet sink terminals for corpus-sized results (round-4 verdict
"What's missing" item 3): the sink variants must write the EXACT row set
the oracle-checked driver-side queries return, sharded and hive-partitioned
so the 100-TB consumer never drives the corpus through the driver."""
import pathlib

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _read_back(out_dir):
    import ray.data as rd

    df = rd.read_parquet(out_dir).to_pandas()
    # the hive partition column comes back as a string; drop it after
    # checking it exists — the layout IS the contract under test
    assert "shard" in df.columns
    return df.drop(columns=["shard"])


def test_doc_chunks_sink_matches_query(ray_session, tmp_path):
    from ocr_main_ray.pipelines.queries import q_doc_chunks
    from ocr_main_ray.pipelines.sinks import doc_chunks_to_parquet

    out = tmp_path / "chunks"
    res = doc_chunks_to_parquet(SF, str(out))
    assert res["n_files"] > 0
    # hive layout: one directory per shard
    assert any(p.name.startswith("shard=") for p in out.iterdir())
    got = (_read_back(str(out))
           .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    expect = q_doc_chunks(SF)
    pd.testing.assert_frame_equal(
        got[expect.columns.tolist()], expect, check_dtype=False)


def test_doc_chunks_overlap_sink_matches_query(ray_session, tmp_path):
    from ocr_main_ray.pipelines.queries import q_doc_chunks_overlap
    from ocr_main_ray.pipelines.sinks import doc_chunks_to_parquet

    out = tmp_path / "chunks_overlap"
    doc_chunks_to_parquet(SF, str(out), overlap=True)
    got = (_read_back(str(out))
           .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    expect = q_doc_chunks_overlap(SF)
    pd.testing.assert_frame_equal(
        got[expect.columns.tolist()], expect, check_dtype=False)


def test_segment_dedup_sink_matches_query(ray_session, tmp_path):
    from ocr_main_ray.pipelines.queries import q_segment_dedup
    from ocr_main_ray.pipelines.sinks import segment_dedup_to_parquet

    out = tmp_path / "segdedup"
    segment_dedup_to_parquet(SF, str(out))
    got = (_read_back(str(out))
           .sort_values("doc_id").reset_index(drop=True))
    expect = q_segment_dedup(SF)
    pd.testing.assert_frame_equal(
        got[expect.columns.tolist()], expect, check_dtype=False)


def test_shard_is_doc_id_mod(ray_session, tmp_path):
    """Resumable layout contract: shard == doc_id % shards, so a re-run
    can deterministically target one shard directory."""
    import ray.data as rd

    from ocr_main_ray.pipelines.sinks import doc_chunks_to_parquet

    out = tmp_path / "sharded"
    doc_chunks_to_parquet(SF, str(out), shards=8)
    df = rd.read_parquet(str(out)).to_pandas()
    assert (df["shard"].astype("int64") == df["doc_id"] % 8).all()


def test_curation_sink_matches_query(ray_session, tmp_path):
    from ocr_main_ray.pipelines.queries import q_curation
    from ocr_main_ray.pipelines.sinks import curation_to_parquet

    out = tmp_path / "curation"
    curation_to_parquet(SF, str(out))
    got = (_read_back(str(out))
           .sort_values("doc_id").reset_index(drop=True))
    expect = q_curation(SF)
    pd.testing.assert_frame_equal(
        got[expect.columns.tolist()], expect, check_dtype=False)

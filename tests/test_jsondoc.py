"""JSON content route: detection, prose-leaf extraction, error isolation."""
import datetime

import pyarrow as pa

from ocr_main_ray.stages.jsondoc import extract_json_blocks, looks_json

DOC = (b'{"id": 7, "title": "short", '
       b'"body": "This is a long enough paragraph of text to keep.", '
       b'"tags": ["a", "b"], '
       b'"comments": [{"text": "Another sufficiently long comment body."}]}')


def test_looks_json():
    assert looks_json(b'  {"a": 1}')
    assert looks_json(b"[1, 2]")
    assert not looks_json(b"<html>")
    assert not looks_json(b"%PDF-")


def test_extract_json_blocks_prose_only_in_order():
    assert extract_json_blocks(DOC) == [
        "This is a long enough paragraph of text to keep.",
        "Another sufficiently long comment body."]


def test_json_through_pipeline_and_malformed_isolated(ray_session):
    import ray.data as rd

    from ocr_main_ray.pipelines.extract import extract_dataset

    ts = datetime.datetime(2025, 1, 1)
    pages = pa.table({
        "url": pa.array(["http://api.com/a", "http://api.com/bad"],
                        pa.string()),
        "warc_ts": pa.array([ts, ts], pa.timestamp("us")),
        "html": pa.array([DOC, b'{"broken": '], pa.large_binary()),
        "text": pa.array(["", ""], pa.string()),
        "lang": pa.array(["", ""], pa.string()),
    })
    out = (extract_dataset(rd.from_arrow(pages)).to_pandas()
           .set_index("url"))
    good = out.loc["http://api.com/a"]
    assert good["content_type"] == "json"
    assert "paragraph of text" in good["extracted_text"]
    bad = out.loc["http://api.com/bad"]
    assert bad["content_type"] == "json"
    assert bad["extracted_text"] == ""
    assert bad["error"] and "JSONDecodeError" in bad["error"]

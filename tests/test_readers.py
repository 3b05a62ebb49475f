import pytest

from ocr_main_ray.sources.pdfgen import native_pdf
from ocr_main_ray.sources.readers import pages_from_binary_dir
from ocr_main_ray.pipelines.extract import extract_dataset


@pytest.mark.usefixtures("ray_session")
def test_pages_from_binary_dir(tmp_path):
    pdf = native_pdf(["hello from a real file " * 5])
    pdf += b"%" + b"P" * 1024 + b"\n"
    (tmp_path / "doc1.pdf").write_bytes(pdf)
    (tmp_path / "page2.html").write_bytes(
        b"<html><body><p>real html file content with several words here"
        b"</p></body></html>")
    ds = pages_from_binary_dir(str(tmp_path))
    out = {r["url"].rsplit("/", 1)[-1]: r
           for r in extract_dataset(ds).take_all()}
    assert out["doc1.pdf"]["content_type"] == "pdf_native"
    assert "hello from a real file" in out["doc1.pdf"]["extracted_text"]
    assert out["page2.html"]["content_type"] == "html"
    assert "real html file content" in out["page2.html"]["extracted_text"]


@pytest.mark.usefixtures("ray_session")
def test_interchange_jsonl_csv_roundtrip(tmp_path):
    """JSONL and CSV crawl dumps decode to the same pages the parquet path
    carries: base64 payload, ISO timestamp, identical extraction output."""
    import base64
    import csv
    import json

    from ocr_main_ray.sources.readers import pages_from_csv, pages_from_jsonl, read_pages

    html_payload = (b"<html><body><p>interchange row with words enough to "
                    b"extract</p></body></html>")
    row = {
        "url": "http://example.com/a",
        "warc_ts": "2025-01-02T03:04:05",
        "html_b64": base64.b64encode(html_payload).decode("ascii"),
        "text": "",
        "lang": "en",
    }

    jl = tmp_path / "pages.jsonl"
    jl.write_text(json.dumps(row) + "\n")
    cv = tmp_path / "pages.csv"
    with cv.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(row))
        w.writeheader()
        w.writerow(row)

    for src in (pages_from_jsonl(str(jl)), pages_from_csv(str(cv)),
                read_pages(str(jl)), read_pages(str(cv))):
        rows = src.take_all()
        assert len(rows) == 1
        r = rows[0]
        assert r["url"] == row["url"]
        assert bytes(r["html"]) == html_payload
        assert str(r["warc_ts"]).startswith("2025-01-02 03:04:05")
        out = extract_dataset(src).take_all()[0]
        assert out["content_type"] == "html"
        assert "interchange row" in out["extracted_text"]


def test_read_pages_dispatch_errors(tmp_path):
    from ocr_main_ray.sources.readers import read_pages

    bad = tmp_path / "pages.xml"
    bad.write_text("<pages/>")
    with pytest.raises(ValueError):
        read_pages(str(bad))


# ---------------------------------------------------------------------------
# schema-evolution-tolerant parquet read
# ---------------------------------------------------------------------------

def test_pages_from_parquet_evolving_fills_missing_columns(ray_session, tmp_path):
    import datetime
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_main_ray.schema import PAGES_SCHEMA
    from ocr_main_ray.sources.readers import pages_from_parquet_evolving

    ts = datetime.datetime(2025, 3, 1)
    # old shard: written before `lang`/`text` existed, plus a retired column
    pq.write_table(pa.table({
        "url": pa.array(["http://old/1"], pa.string()),
        "warc_ts": pa.array([ts], pa.timestamp("us")),
        "html": pa.array([b"<html>old</html>"], pa.large_binary()),
        "retired_col": pa.array([42], pa.int64()),
    }), tmp_path / "old.parquet")
    # new shard: full schema
    pq.write_table(pa.table({
        "url": pa.array(["http://new/1"], pa.string()),
        "warc_ts": pa.array([ts], pa.timestamp("us")),
        "html": pa.array([b"<html>new</html>"], pa.large_binary()),
        "text": pa.array(["t"], pa.string()),
        "lang": pa.array(["en"], pa.string()),
    }), tmp_path / "new.parquet")

    out = pages_from_parquet_evolving(str(tmp_path))
    tbl = pa.concat_tables(
        out.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    assert tbl.schema.equals(PAGES_SCHEMA)
    by_url = {u: i for i, u in enumerate(tbl.column("url").to_pylist())}
    assert tbl.column("lang")[by_url["http://old/1"]].as_py() == ""
    assert tbl.column("text")[by_url["http://old/1"]].as_py() == ""
    assert tbl.column("lang")[by_url["http://new/1"]].as_py() == "en"
    assert "retired_col" not in tbl.column_names

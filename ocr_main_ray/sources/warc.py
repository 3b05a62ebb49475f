"""WARC source: Common Crawl's native archive format -> pages table.

A WARC file is a concatenation of records, each::

    WARC/1.0\r\n
    <header-name>: <value>\r\n ...          (headers, CRLF-terminated)
    \r\n
    <Content-Length bytes of payload>
    \r\n\r\n                                 (record separator)

``response`` records carry the fetched HTTP response — status line +
HTTP headers, a blank line, then the HTML body — under a
``WARC-Target-URI`` and ``WARC-Date``.  Common Crawl ships files
gzip-compressed with one gzip MEMBER per record, so a plain
``gzip.decompress`` of the whole file yields the concatenated records
(members decompress in sequence) — no index needed.

Scale shape: one WARC file is one work unit (`read_binary_files` keeps
file bytes in the object store; parsing is a flat-map inside the task).
A 1-GiB .warc.gz stays a single-task unit — exactly how Common Crawl
distributes (its segments are ~1 GiB files); parallelism comes from the
file count, which is the natural partitioning of the corpus.
"""
from __future__ import annotations

import datetime as _dt
import gzip

import pyarrow as pa

from ..schema import PAGES_SCHEMA

_CRLF2 = b"\r\n\r\n"


def _parse_warc_records(raw: bytes):
    """Yield (headers: dict, payload: bytes) per WARC record."""
    pos = 0
    n = len(raw)
    while pos < n:
        start = raw.find(b"WARC/", pos)
        if start == -1:
            return
        hdr_end = raw.find(_CRLF2, start)
        if hdr_end == -1:
            return
        headers = {}
        for line in raw[start:hdr_end].split(b"\r\n")[1:]:
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().decode("ascii", "replace").lower()] = \
                    v.strip().decode("utf-8", "replace")
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body_start = hdr_end + len(_CRLF2)
        payload = raw[body_start:body_start + length]
        yield headers, payload
        pos = body_start + length


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP status line + headers from a response payload."""
    sep = payload.find(_CRLF2)
    return payload[sep + len(_CRLF2):] if sep != -1 else payload


def _parse_ts(value: str) -> _dt.datetime:
    try:
        return _dt.datetime.strptime(value, "%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        return _dt.datetime(1970, 1, 1)


def warc_bytes_to_pages(raw: bytes) -> pa.Table:
    """One WARC (or .warc.gz) file's bytes -> pages-schema Arrow table."""
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    urls, tss, payloads = [], [], []
    for headers, payload in _parse_warc_records(raw):
        if headers.get("warc-type") != "response":
            continue
        uri = headers.get("warc-target-uri")
        if not uri:
            continue
        urls.append(uri)
        tss.append(_parse_ts(headers.get("warc-date", "")))
        payloads.append(_http_body(payload))
    n = len(urls)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(payloads, pa.large_binary()),
        "text": pa.array([""] * n, pa.string()),
        "lang": pa.array([""] * n, pa.string()),
    }, schema=PAGES_SCHEMA)


def pages_from_warc(path: str):
    """Directory (or single file) of .warc / .warc.gz -> pages Dataset."""
    import ray.data as rd

    def to_pages(batch: pa.Table) -> pa.Table:
        tables = [warc_bytes_to_pages(b)
                  for b in batch.column("bytes").to_pylist()]
        return (pa.concat_tables(tables) if tables
                else PAGES_SCHEMA.empty_table())

    ds = rd.read_binary_files(path, file_extensions=["warc", "gz"])
    return ds.map_batches(to_pages, batch_format="pyarrow", batch_size=1)

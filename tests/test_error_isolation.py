"""Per-row error isolation (SURVEY §4.3.5): one bad payload degrades one
row — never a block, never the job."""
import datetime as dt
import zlib

import pyarrow as pa
import pytest

from ocr_main_ray.pipelines.extract import extract_pages_table
from ocr_main_ray.sources.pdfgen import native_pdf, scanned_pdf
from ocr_main_ray.sources.synth import PAGES_SCHEMA


def _pages(payloads):
    n = len(payloads)
    return pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(n)], pa.string()),
            "warc_ts": pa.array([dt.datetime(2025, 1, 1)] * n, pa.timestamp("us")),
            "html": pa.array(payloads, pa.large_binary()),
            "text": pa.array([""] * n, pa.string()),
            "lang": pa.array(["eng"] * n, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def _pad(pdf):
    return pdf + b"%" + b"P" * max(0, 1024 - len(pdf)) + b"\n" if len(pdf) < 1024 else pdf


@pytest.mark.usefixtures("ray_session")
def test_corrupt_stream_isolates_to_row():
    good = _pad(native_pdf(["perfectly good text content " * 4]))
    scanned = scanned_pdf(["good scanned line " + "word " * 30])
    scanned = _pad(scanned)
    # corrupt the zlib image stream of a scanned pdf: flip bytes mid-stream
    corrupt = bytearray(scanned)
    start = bytes(corrupt).find(b"stream\n", bytes(corrupt).find(b"/Image"))
    for off in range(start + 20, start + 40):
        corrupt[off] ^= 0xFF
    rows = {r["url"]: r for r in extract_pages_table(
        _pages([good, bytes(corrupt), scanned])).take_all()}
    assert rows["u0"]["error"] is None and rows["u0"]["extracted_text"]
    assert rows["u2"]["error"] is None and rows["u2"]["extracted_text"]
    bad = rows["u1"]
    assert bad["extracted_text"] == "" and bad["error"] is not None


@pytest.mark.usefixtures("ray_session")
def test_giant_doc_among_small_ones():
    """Skew smoke: one 20-page scanned doc among small docs — all complete,
    output correct page count."""
    pages = [f"Giant page {i} body line one\nBody line two {i * i}\n"
             f"Third line {i}\nFourth body line {i}" for i in range(20)]
    giant = _pad(scanned_pdf(pages))
    small = [_pad(native_pdf([f"small doc {i} content " * 3])) for i in range(12)]
    rows = {r["url"]: r for r in
            extract_pages_table(_pages([giant] + small)).take_all()}
    assert len(rows) == 13
    assert rows["u0"]["content_type"] == "pdf_scanned"
    assert rows["u0"]["n_pages"] == 20
    assert rows["u0"]["error"] is None
    assert all(rows[f"u{i}"]["error"] is None for i in range(1, 13))

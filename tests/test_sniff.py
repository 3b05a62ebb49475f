import pyarrow as pa

from ocr_main_ray.config import (CT_EMPTY, CT_HTML, CT_PDF_NATIVE,
                                 CT_PDF_SCANNED)
from ocr_main_ray.sources.pdfgen import native_pdf, scanned_pdf
from ocr_main_ray.sources.synth import PAGES_SCHEMA
from ocr_main_ray.stages import sniff
import datetime as dt


def _pages(payloads):
    n = len(payloads)
    ts = [dt.datetime(2025, 1, 1)] * n
    return pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(n)], pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(payloads, pa.large_binary()),
            "text": pa.array([""] * n, pa.string()),
            "lang": pa.array(["eng"] * n, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def test_sniff_routes():
    native = native_pdf(["x" * 60])  # >50 chars on page 1 -> native
    if len(native) < 1024:
        native += b"%" + b"P" * (1024 - len(native) - 2) + b"\n"
    scanned = scanned_pdf(["scan body line " + "word " * 40])
    if len(scanned) < 1024:
        scanned += b"%" + b"P" * (1024 - len(scanned) - 2) + b"\n"
    payloads = [
        b"<!DOCTYPE html><html><body><p>hi</p></body></html>",
        native,
        scanned,
        b"",
        b"binary junk \xff\xfe not html",
        b"%PDF-1.7\ntoo small",
    ]
    out = sniff.sniff_batch(_pages(payloads))
    ct = out.column("content_type").to_pylist()
    err = out.column("error").to_pylist()
    assert ct[0] == CT_HTML
    assert ct[1] == CT_PDF_NATIVE
    assert ct[2] == CT_PDF_SCANNED
    assert ct[3] == CT_EMPTY and err[3] is None
    assert ct[4] == CT_EMPTY and err[4] == "unknown_payload"
    assert ct[5] == CT_EMPTY and "invalid_pdf" in err[5]


def test_first_page_50_char_boundary():
    """C4: strictly MORE than 50 stripped chars -> native (files.py:85-96)."""
    exactly_50 = native_pdf(["y" * 50])
    exactly_50 += b"%" + b"P" * 1024 + b"\n"
    over_50 = native_pdf(["y" * 51])
    over_50 += b"%" + b"P" * 1024 + b"\n"
    out = sniff.sniff_batch(_pages([exactly_50, over_50]))
    assert out.column("content_type").to_pylist() == [CT_PDF_SCANNED, CT_PDF_NATIVE]


def test_size_bucket():
    out = sniff.sniff_batch(_pages([b"x" * 1024, b"x" * 2047, b"x" * 2048, b""]))
    assert out.column("size_bucket").to_pylist() == [10, 10, 11, 0]


def test_size_sniff_fallback():
    """C3 parity: > 5 MB -> scanned."""
    assert sniff.size_sniff_fallback(5 * 1024 * 1024) == "native"
    assert sniff.size_sniff_fallback(5 * 1024 * 1024 + 1) == "scanned"


def test_classify_pdf_type_rules():
    native = native_pdf(["z" * 150, "w" * 150])
    assert sniff.classify_pdf_type(native) == sniff.PDF_TYPE_NATIVE
    scanned = scanned_pdf(["scan page body text", "more body"])
    assert sniff.classify_pdf_type(scanned) == sniff.PDF_TYPE_SCANNED
    short_native = native_pdf(["tiny"])  # has fonts but avg_text <= 100 -> MIXED
    assert sniff.classify_pdf_type(short_native) == sniff.PDF_TYPE_MIXED


def test_recommend_engine():
    assert sniff.recommend_engine("scanned") == ("opencv", 300)
    assert sniff.recommend_engine("pdf_scanned") == ("opencv", 300)
    assert sniff.recommend_engine("native_text") == ("basic", 150)

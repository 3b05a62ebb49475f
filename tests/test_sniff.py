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


def test_auto_config_table():
    """C2 parity: per-PDFType engine/flags/dpi/strategy value-for-value
    (pdf_analyzer.py:124-176), unknown types fall back to MIXED."""
    assert sniff.get_optimal_config("scanned") == {
        "engine_type": "opencv", "deskew": True, "denoise": True,
        "contrast": True, "dpi": 300, "strategy": "full_ocr"}
    assert sniff.get_optimal_config("native_text") == {
        "engine_type": "basic", "deskew": False, "denoise": False,
        "contrast": False, "dpi": 150, "strategy": "text_extraction"}
    assert sniff.get_optimal_config("mixed")["strategy"] == "hybrid"
    assert sniff.get_optimal_config("mixed")["dpi"] == 250
    assert sniff.get_optimal_config("mixed")["denoise"] is False
    assert sniff.get_optimal_config("table_heavy")["deskew"] is False
    assert sniff.get_optimal_config("image_heavy")["strategy"] == "image_focused"
    # reference: configs.get(pdf_type, configs[PDFType.MIXED])
    assert sniff.get_optimal_config("nonsense") == sniff.get_optimal_config("mixed")


import pytest


@pytest.mark.usefixtures("ray_session")
def test_dispatch_reflects_auto_config():
    """C1/C2 wired into ExtractDispatch: pdf_type/strategy/dpi/engine columns
    come from the classifier + config table, including the MIXED route."""
    from ocr_main_ray.pipelines.extract import extract_pages_table

    payloads = [
        native_pdf(["z" * 150, "w" * 150]),          # native_text
        scanned_pdf(["scan page body text here", "more body text lines"]),  # scanned
        # >=1024 B (D2 gate), first page strips to <50 chars (C4 -> OCR
        # route), text_pages=1 of 3 (<0.8) with fonts -> classified MIXED
        native_pdf(["tiny", " " * 1200, ""]),
    ]
    out = extract_pages_table(_pages(payloads), dedup=False).to_pandas()
    out = out.set_index("url").loc[[f"u{i}" for i in range(3)]]

    assert out.iloc[0]["content_type"] == CT_PDF_NATIVE
    assert out.iloc[0]["pdf_type"] == "native_text"
    assert out.iloc[0]["strategy"] == "text_extraction"
    assert out.iloc[0]["dpi"] == 150
    assert out.iloc[0]["engine"] == "basic"

    assert out.iloc[1]["content_type"] == CT_PDF_SCANNED
    assert out.iloc[1]["pdf_type"] == "scanned"
    assert out.iloc[1]["strategy"] == "full_ocr"
    assert out.iloc[1]["dpi"] == 300
    assert out.iloc[1]["engine"] == "opencv"
    assert len(out.iloc[1]["extracted_text"]) > 0

    # the CT_MIXED route: C4 sends it to the OCR fork, C1 classifies MIXED,
    # C2's hybrid config (opencv, dpi 250, denoise off) applies
    assert out.iloc[2]["content_type"] == CT_PDF_SCANNED
    assert out.iloc[2]["pdf_type"] == "mixed"
    assert out.iloc[2]["strategy"] == "hybrid"
    assert out.iloc[2]["dpi"] == 250
    assert out.iloc[2]["engine"] == "opencv"

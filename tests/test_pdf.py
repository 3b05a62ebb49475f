import numpy as np
import pytest

from ocr_main_ray.glyphs import decode_page, normalize_for_scan
from ocr_main_ray.sources.pdfgen import native_pdf, scanned_pdf
from ocr_main_ray.stages import pdf_native as P


def test_native_roundtrip():
    pages = ["line one\nline two (with parens) and \\ backslash", "second page"]
    for compress in (False, True):
        data = native_pdf(pages, compress=compress)
        assert data.startswith(b"%PDF-1.7")
        assert P.extract_page_texts(data) == pages
        assert P.page_count(data) == 2


def test_first_page_text():
    data = native_pdf(["alpha bravo", "charlie"])
    assert P.first_page_text(data) == "alpha bravo"


def test_scanned_has_no_text_layer():
    data = scanned_pdf(["Some scanned content"])
    assert P.first_page_text(data) == ""
    assert P.page_count(data) == 1


def test_scanned_images_decode():
    texts = ["Scan page one content", "Scan PAGE TWO"]
    data = scanned_pdf(texts)
    imgs = P.extract_page_images(data)
    assert len(imgs) == 2
    for img, t in zip(imgs, texts):
        assert isinstance(img, np.ndarray) and img.dtype == np.uint8
        assert decode_page(img) == normalize_for_scan(t)


def test_parse_errors():
    with pytest.raises(P.PdfParseError):
        P.parse_pdf(b"not a pdf at all")
    with pytest.raises(P.PdfParseError):
        P.parse_pdf(b"%PDF-1.7\ngarbage with no objects")
    assert P.page_count(b"%PDF-1.7\nbroken") == 1  # fallback-chain parity


def test_pdf_string_escapes():
    pages = ["octal \\ and (nested (parens)) ok"]
    data = native_pdf(pages)
    assert P.extract_page_texts(data) == pages


def test_doc_info_probe():
    """C6 parity (pdf_info_adapter.py:44-90): /Info dict fields recovered,
    '' + page-count fallback on anything else."""
    from ocr_main_ray.sources.pdfgen import native_pdf, scanned_pdf
    from ocr_main_ray.stages.pdf_native import doc_info

    p = native_pdf(["body text", "second page"], info={
        "Title": "A (nested) title", "Author": "Ann", "Creator": "gen",
        "Producer": "ocr_main_ray", "CreationDate": "D:20240101000000Z",
        "ModDate": "D:20240102000000Z"})
    inf = doc_info(p)
    assert inf == {"page_count": 2, "title": "A (nested) title",
                   "author": "Ann", "creator": "gen",
                   "producer": "ocr_main_ray",
                   "creation_date": "D:20240101000000Z",
                   "modification_date": "D:20240102000000Z"}
    # no /Info -> empty fields, page count still real
    assert doc_info(native_pdf(["x", "y", "z"])) == {
        "page_count": 3, "title": "", "author": "", "creator": "",
        "producer": "", "creation_date": "", "modification_date": ""}
    # garbage -> fallback chain bottoms out at page_count=1 (reference :40)
    assert doc_info(b"not a pdf")["page_count"] == 1
    # scanned flavour carries info too
    assert doc_info(scanned_pdf(["S"], info={"Title": "s"}))["title"] == "s"


def test_info_default_bytes_identical():
    """info=None must not change a single output byte (golden corpus)."""
    from ocr_main_ray.sources.pdfgen import native_pdf, scanned_pdf

    assert b"/Info" not in native_pdf(["x"])
    assert b"/Info" not in scanned_pdf(["x"])

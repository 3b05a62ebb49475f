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

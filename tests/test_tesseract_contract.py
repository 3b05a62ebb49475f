"""Hermetic contract test for TesseractEngine (round-4 verdict item 3).

The engine transcribes the call structure of the reference adapter
(/root/reference/backend/src/infrastructure/adapters/ocr_adapters.py:49-76):
render every page at config.dpi, recognize each page with
image_to_string(img, lang), join pages with "\n\n", and report the
constant-0.0 confidence (A7 bug parity).  The real binaries are absent in
this sandbox by design, so these tests inject stub ``pytesseract`` /
``pdf2image`` modules and assert the engine drives them exactly as the
reference drives the real ones — the code path is otherwise dead here.
"""
import sys
import types

import numpy as np
import pytest

from ocr_main_ray.config import (ENGINE_BASIC, ENGINE_OPENCV, PAGE_JOIN,
                                 PipelineConfig)


class _FakePilImage:
    """Minimal PIL stand-in: convert("L") yields the grayscale ndarray."""

    def __init__(self, arr: np.ndarray):
        self._arr = arr
        self.convert_calls = []

    def convert(self, mode):
        self.convert_calls.append(mode)
        assert mode == "L"
        return self._arr


def _install_stubs(monkeypatch, pages, texts):
    """Stub pdf2image/pytesseract recording every call the engine makes."""
    calls = {"convert": [], "ocr": []}

    pdf2image = types.ModuleType("pdf2image")

    def convert_from_bytes(pdf_bytes, dpi=None, **kw):
        calls["convert"].append({"pdf_bytes": pdf_bytes, "dpi": dpi, **kw})
        return [_FakePilImage(p) for p in pages]

    pdf2image.convert_from_bytes = convert_from_bytes

    pytesseract = types.ModuleType("pytesseract")

    def image_to_string(img, lang=None, **kw):
        calls["ocr"].append({"img": np.asarray(img), "lang": lang, **kw})
        return texts[len(calls["ocr"]) - 1]

    pytesseract.image_to_string = image_to_string

    monkeypatch.setitem(sys.modules, "pdf2image", pdf2image)
    monkeypatch.setitem(sys.modules, "pytesseract", pytesseract)
    return calls


def _pages(n, h=8, w=12):
    rng = np.random.default_rng(42)
    return [rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(n)]


def test_guard_without_modules():
    # the sandbox default: construction must raise the documented guard
    from ocr_main_ray.stages.ocr import TesseractEngine

    assert "pytesseract" not in sys.modules
    with pytest.raises(NotImplementedError):
        TesseractEngine(PipelineConfig())


def test_basic_engine_call_structure(monkeypatch):
    """A1 contract: one convert_from_bytes at config.dpi, one
    image_to_string(img, lang) per page IN PAGE ORDER, "\n\n" join,
    constant 0.0 confidence."""
    pages = _pages(3)
    texts = ["page one", "page two", "page three"]
    calls = _install_stubs(monkeypatch, pages, texts)

    from ocr_main_ray.stages.ocr import TesseractEngine

    cfg = PipelineConfig(engine_type=ENGINE_BASIC, lang="spa", dpi=300)
    eng = TesseractEngine(cfg)
    out = eng.extract_text(b"%PDF-fake")

    # one render pass, dpi forwarded, raw bytes forwarded
    assert len(calls["convert"]) == 1
    assert calls["convert"][0]["dpi"] == 300
    assert calls["convert"][0]["pdf_bytes"] == b"%PDF-fake"
    # per-page OCR in order, lang forwarded, grayscale image passed through
    assert len(calls["ocr"]) == 3
    for rec, page in zip(calls["ocr"], pages):
        assert rec["lang"] == "spa"
        np.testing.assert_array_equal(rec["img"], page)
    # page join parity with the reference's "\n\n".join
    assert out == PAGE_JOIN.join(texts)
    assert PAGE_JOIN == "\n\n"
    # A7 parity: confidence stays the never-updated 0.0 after extraction
    assert eng.get_confidence() == 0.0


def test_dpi_and_lang_come_from_config(monkeypatch):
    pages = _pages(1)
    calls = _install_stubs(monkeypatch, pages, ["x"])

    from ocr_main_ray.stages.ocr import TesseractEngine

    eng = TesseractEngine(PipelineConfig(lang="eng", dpi=150))
    eng.extract_pages(b"%PDF-")
    assert calls["convert"][0]["dpi"] == 150
    assert calls["ocr"][0]["lang"] == "eng"


def test_opencv_engine_preprocesses_before_ocr(monkeypatch):
    """A2 contract: engine_type=opencv runs the preprocess chain on each
    grayscale page BEFORE image_to_string; basic passes the raw page."""
    from ocr_main_ray.stages.preprocess import preprocess_chain

    pages = _pages(2, h=32, w=48)
    calls = _install_stubs(monkeypatch, pages, ["a", "b"])

    from ocr_main_ray.stages.ocr import TesseractEngine

    cfg = PipelineConfig(engine_type=ENGINE_OPENCV)
    eng = TesseractEngine(cfg)
    eng.extract_pages(b"%PDF-")
    assert len(calls["ocr"]) == 2
    for rec, page in zip(calls["ocr"], pages):
        expect = preprocess_chain(page, denoise=cfg.denoise,
                                  contrast=cfg.enhance_contrast,
                                  deskew=cfg.deskew)
        np.testing.assert_array_equal(rec["img"], expect)


def test_ocr_document_span_offsets_through_tesseract(monkeypatch):
    """ocr_document over the stubbed engine: spans tile the joined text
    exactly like the deterministic path (B1 parity is engine-agnostic)."""
    texts = ["alpha", "beta!", ""]
    _install_stubs(monkeypatch, _pages(3), texts)

    from ocr_main_ray.stages.ocr import TesseractEngine, ocr_document

    res = ocr_document(TesseractEngine(PipelineConfig()), b"%PDF-")
    joined = PAGE_JOIN.join(texts)
    assert res["extracted_text"] == joined
    assert res["n_pages"] == 3
    assert res["confidence"] == 0.0
    for span, text in zip(res["span_offsets"], texts):
        assert joined[span["start"]:span["end"]] == text

"""OCR engines + the scanned-document route.

Reproduces the reference's core transform shape (reference:
backend/src/infrastructure/adapters/ocr_adapters.py:49-76,131-168):

    PDF bytes -> page images -> [preprocess chain if engine=="opencv"] ->
    recognize per page -> pages joined with "\n\n"

Engines are pluggable through the OcrEngine protocol — the rebuild's version
of OCRPort (reference backend/src/domain/ports/ocr_port.py:9-49):

- DeterministicEngine: hermetic, numpy-only.  "Render" = the embedded page
  raster from the scanned PDF (sources/pdfgen.scanned_pdf); "recognize" =
  deterministic glyph matching (glyphs.decode_page).  Shares the whole
  pipeline skeleton with TesseractEngine; only the recognize call differs
  (SURVEY.md section 7.3 risk 7).
- TesseractEngine: the faithful structure of the reference adapter, used when
  pytesseract/pdf2image exist.  In this sandbox they do not; construction
  raises with a clear message.

Confidence parity: the reference's get_confidence() returns a
``last_confidence`` that is initialized to 0.0 and never updated
(ocr/tesseract_adapter.py:23,56-58) — every real extraction reports 0.0.  We
reproduce that bug because it feeds the golden outputs.

Per-document metrics parity: the reference accumulates the average confidence
with an order-dependent pairwise fold ``avg = (avg + page_conf) / 2``
(processing_metrics.py:21-28), NOT an arithmetic mean; preserved in
``pairwise_average``.  Page order inside a document is sequential, so the
quirk is deterministic.
"""
from __future__ import annotations

import time
from typing import Protocol

import numpy as np

from ..config import ENGINE_BASIC, ENGINE_OPENCV, PAGE_JOIN, PipelineConfig
from ..glyphs import decode_page
from . import pdf_native
from .preprocess import preprocess_chain


class OcrEngine(Protocol):
    """Engine contract (rebuild of OCRPort)."""

    def extract_pages(self, pdf_bytes: bytes) -> list[str]: ...
    def get_confidence(self) -> float: ...
    def get_engine_info(self) -> dict: ...
    def get_supported_languages(self) -> list[str]: ...


def pairwise_average(values: list[float]) -> float:
    """Order-dependent running average: avg = (avg + v) / 2 per page."""
    avg = 0.0
    for v in values:
        avg = (avg + v) / 2.0
    return avg


class DeterministicEngine:
    """Hermetic engine over the deterministic glyph font."""

    def __init__(self, config: PipelineConfig | None = None, engine_type: str | None = None):
        self.config = config or PipelineConfig()
        self.engine_type = engine_type or self.config.engine_type
        self.last_confidence = 0.0  # parity: never updated (A7)

    def extract_pages(self, pdf_bytes: bytes,
                      images: list | None = None) -> list[str]:
        # callers that already decoded the page rasters (e.g. the dispatch's
        # C1 classification pass) hand them in — the Flate decode of
        # full-page images is the expensive part of the parse
        if images is None:
            images = pdf_native.extract_page_images(pdf_bytes)
        pages: list[str] = []
        for img in images:
            if img is None:
                pages.append("")
                continue
            if self.engine_type == ENGINE_OPENCV:
                img = preprocess_chain(
                    img,
                    denoise=self.config.denoise,
                    contrast=self.config.enhance_contrast,
                    deskew=self.config.deskew,
                )
            pages.append(self._recognize(img))
        return pages

    def _recognize(self, img: np.ndarray) -> str:
        # the single call TesseractEngine replaces with image_to_string
        return decode_page(img)

    def extract_text(self, pdf_bytes: bytes) -> str:
        return PAGE_JOIN.join(self.extract_pages(pdf_bytes))

    def get_confidence(self) -> float:
        return self.last_confidence

    def get_engine_info(self) -> dict:
        return {
            "name": "deterministic-glyph",
            "engine_type": self.engine_type,
            "lang": self.config.lang,
            "dpi": self.config.dpi,
            "hermetic": True,
        }

    def get_supported_languages(self) -> list[str]:
        return ["spa", "eng", "por"]


class TesseractEngine(DeterministicEngine):
    """Reference-faithful engine; requires pytesseract + pdf2image + poppler.

    Identical skeleton to DeterministicEngine: only ``_recognize`` (and the
    page render source) differ — the parity claim of SURVEY.md section 7.0.
    """

    def __init__(self, config: PipelineConfig | None = None, engine_type: str | None = None):
        super().__init__(config, engine_type)
        try:
            import pytesseract  # noqa: F401
            import pdf2image  # noqa: F401
        except ImportError as e:  # sandbox: binaries absent by design
            raise NotImplementedError(
                "TesseractEngine needs pytesseract/pdf2image/poppler; "
                "use DeterministicEngine in hermetic environments"
            ) from e
        self._pytesseract = pytesseract
        self._pdf2image = pdf2image

    def extract_pages(self, pdf_bytes: bytes) -> list[str]:
        images = self._pdf2image.convert_from_bytes(pdf_bytes, dpi=self.config.dpi)
        pages = []
        for pil_img in images:
            img = np.asarray(pil_img.convert("L"))
            if self.engine_type == ENGINE_OPENCV:
                img = preprocess_chain(
                    img,
                    denoise=self.config.denoise,
                    contrast=self.config.enhance_contrast,
                    deskew=self.config.deskew,
                )
            pages.append(self._recognize(img))
        return pages

    def _recognize(self, img: np.ndarray) -> str:
        return self._pytesseract.image_to_string(img, lang=self.config.lang)


ENGINE_REGISTRY = {
    "deterministic": DeterministicEngine,
    "tesseract": TesseractEngine,
}


def create_engine(name: str, config: PipelineConfig | None = None,
                  engine_type: str = ENGINE_BASIC) -> OcrEngine:
    """Engine factory (rebuild of AdapterFactory, adapter_factory.py:19-51):
    unknown names raise, like the reference's ConfigurationError path."""
    from ..config import ConfigurationError

    if name not in ENGINE_REGISTRY:
        raise ConfigurationError(f"unknown OCR engine: {name!r}")
    return ENGINE_REGISTRY[name](config, engine_type)


def ocr_document(engine: OcrEngine, pdf_bytes: bytes) -> dict:
    """Run one document through an engine; returns the per-row result dict
    used by the assemble stage (text, spans, metrics)."""
    t0 = time.perf_counter()
    pages = engine.extract_pages(pdf_bytes)
    text = PAGE_JOIN.join(pages)
    spans, pos = [], 0
    for i, p in enumerate(pages):
        spans.append({"page": i, "start": pos, "end": pos + len(p)})
        pos += len(p) + len(PAGE_JOIN)
    return {
        "extracted_text": text,
        "span_offsets": spans,
        "n_pages": len(pages),
        "confidence": engine.get_confidence(),   # 0.0 — A7 parity
        "processing_ms": (time.perf_counter() - t0) * 1000.0,
    }

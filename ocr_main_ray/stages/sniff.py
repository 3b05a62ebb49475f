"""Content-type sniffing, validity gate, size bucketing (stage 1).

Re-expresses the reference's sniffers over Arrow batches:

- D2 validity gate: payload starts with ``%PDF-`` AND size >= 1024 bytes
  (reference backend/src/infrastructure/storage/file_utils.py:55-74).
- C4 first-page-text router (the one the live code paths actually reach,
  reference routers/files.py:85-96): > 50 stripped chars of text layer on
  page 1 -> pdf_native, else pdf_scanned.
- C3 size sniffer (> 5 MB -> "scanned") is exposed as
  ``size_sniff_fallback`` for parity tests but the pipeline routes via C4.
- size_bucket = floor(log2(bytes)) — the skew-defense key of SURVEY.md
  section 4.3.1 (repartition by (content_type, size_bucket)).

Cheap columns (size, magic, bucket) are pyarrow/numpy vectorized; only the
PDF first-page probe walks payloads row-at-a-time (it must parse page 1).
Batch format: pyarrow, zero-copy.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import (CT_EMPTY, CT_HTML, CT_PDF_NATIVE, CT_PDF_SCANNED,
                      FIRST_PAGE_TEXT_MIN_CHARS, MIN_VALID_PDF_BYTES,
                      PDF_MAGIC, SIZE_SNIFF_SCANNED_BYTES)
from . import pdf_native


def size_sniff_fallback(size_bytes: int) -> str:
    """C3 (menu_utils.py:123-126): size > 5 MB -> scanned else native."""
    return "scanned" if size_bytes > SIZE_SNIFF_SCANNED_BYTES else "native"


def _looks_html(prefix: bytes) -> bool:
    p = prefix.lstrip()[:64].lower()
    return p.startswith(b"<!doctype") or p.startswith(b"<html") or p.startswith(b"<")


def sniff_batch(batch: pa.Table) -> pa.Table:
    """Append content_type, size_bytes, size_bucket, error columns."""
    html_col = batch.column("html")
    size = pc.binary_length(html_col).fill_null(0)
    size_np = size.to_numpy(zero_copy_only=False).astype(np.int64)
    bucket = np.zeros(len(size_np), dtype=np.int32)
    nz = size_np > 0
    bucket[nz] = np.floor(np.log2(size_np[nz])).astype(np.int32)

    is_pdf_magic = pc.equal(pc.binary_slice(html_col, 0, 5), PDF_MAGIC).fill_null(False)
    pdf_mask = is_pdf_magic.to_numpy(zero_copy_only=False)

    n = len(batch)
    ctype = np.full(n, CT_EMPTY, dtype=object)
    error = np.full(n, None, dtype=object)

    # non-PDF rows: feed-vs-json-vs-html-vs-empty, fully VECTORIZED on the
    # 512 B prefix column (the dominant html path never enters Python):
    # pc.match_substring(_regex) run in Arrow/RE2 byte mode.  Semantics are
    # the scalar predicates' (feed.is_feed / jsondoc.looks_json /
    # _looks_html): containment is lstrip-invariant, the anchored regexes
    # use Python's bytes-whitespace class explicitly, and `^\s*<` subsumes
    # the doctype/html startswith checks.
    from ..config import CT_FEED, CT_JSON

    prefix = pc.binary_slice(html_col, 0, 512)

    def _contains(pat: bytes) -> np.ndarray:
        return (pc.match_substring(prefix, pat, ignore_case=True)
                .fill_null(False).to_numpy(zero_copy_only=False))

    def _matches(regex: bytes) -> np.ndarray:
        return (pc.match_substring_regex(prefix, regex)
                .fill_null(False).to_numpy(zero_copy_only=False))

    _WS = rb"[ \t\n\r\f\x0b]*"
    feed_m = _contains(b"<rss") | (_contains(b"<feed") & ~_contains(b"<html"))
    json_m = _matches(rb"^" + _WS + rb"[\[{]")
    html_m = _matches(rb"^" + _WS + rb"<")

    rem = ~pdf_mask & (size_np > 0)
    for mask, ct in ((feed_m, CT_FEED), (json_m, CT_JSON), (html_m, CT_HTML)):
        hit = rem & mask
        ctype[hit] = ct
        rem &= ~mask
    error[rem] = "unknown_payload"  # non-empty, unrecognized -> CT_EMPTY

    # PDF rows: validity gate (D2) then first-page text probe (C4)
    pdf_idx = np.nonzero(pdf_mask)[0]
    if pdf_idx.size:
        payloads = html_col.take(pa.array(pdf_idx)).to_pylist()
        for i, data in zip(pdf_idx, payloads):
            if size_np[i] < MIN_VALID_PDF_BYTES:
                ctype[i] = CT_EMPTY
                error[i] = "invalid_pdf: below minimum size"
                continue
            try:
                fp = pdf_native.first_page_text(data)
                if len(fp.strip()) > FIRST_PAGE_TEXT_MIN_CHARS:
                    ctype[i] = CT_PDF_NATIVE
                else:
                    ctype[i] = CT_PDF_SCANNED
            except pdf_native.PdfParseError as e:
                ctype[i] = CT_EMPTY
                error[i] = f"pdf_parse_error: {e}"

    return (
        batch.append_column("content_type", pa.array(ctype, type=pa.string()))
        .append_column("size_bytes", pa.array(size_np, type=pa.int64()))
        .append_column("size_bucket", pa.array(bucket, type=pa.int32()))
        .append_column("error", pa.array(error, type=pa.string()))
    )


# ---------------------------------------------------------------------------
# C1 — the full PDFType classifier (taxonomy + thresholds from
# pdf_analyzer.py:96-122), exposed as its own operator for parity testing.
# The reference module itself crashes on missing imports (latent bug,
# SURVEY.md section 2 C1); the thresholds are the contract we keep.
# ---------------------------------------------------------------------------

PDF_TYPE_SCANNED = "scanned"
PDF_TYPE_NATIVE = "native_text"
PDF_TYPE_TABLE_HEAVY = "table_heavy"
PDF_TYPE_IMAGE_HEAVY = "image_heavy"
PDF_TYPE_MIXED = "mixed"


def pdf_metrics_from_parsed(texts: list[str], images: list, data: bytes) -> dict:
    """Metrics from pre-parsed page texts/images — lets the dispatch stage
    classify without re-parsing the document it already parsed."""
    n_pages = max(len(texts), len(images), 1)
    text_pages = sum(1 for t in texts if t.strip())
    total_text = sum(len(t) for t in texts)
    n_images = sum(1 for im in images if im is not None)
    has_fonts = b"/Font" in data
    return {
        "n_pages": n_pages,
        "text_pages": text_pages,
        "total_text": total_text,
        "n_images": n_images,
        "n_tables": 0,  # table extractor is a stub returning [] (A9 parity)
        "has_fonts": has_fonts,
    }


def pdf_metrics(data: bytes) -> dict:
    return pdf_metrics_from_parsed(
        pdf_native.extract_page_texts(data),
        pdf_native.extract_page_images(data), data)


def classify_pdf_type(data: bytes) -> str:
    """Rule order and thresholds mirror pdf_analyzer.py:96-122."""
    return classify_from_metrics(pdf_metrics(data))


def classify_from_metrics(m: dict) -> str:
    pages = m["n_pages"]
    img_ratio = m["n_images"] / pages
    table_ratio = m["n_tables"] / pages
    avg_text = m["total_text"] / pages
    if (not m["has_fonts"]) and m["text_pages"] < 0.3 * pages and img_ratio > 0.5:
        return PDF_TYPE_SCANNED
    if table_ratio > 0.8:
        return PDF_TYPE_TABLE_HEAVY
    if img_ratio > 1.5:
        return PDF_TYPE_IMAGE_HEAVY
    if m["has_fonts"] and m["text_pages"] > 0.8 * pages and avg_text > 100:
        return PDF_TYPE_NATIVE
    return PDF_TYPE_MIXED


def recommend_engine(pdf_type: str) -> tuple[str, int]:
    """C5 (routers/documents.py:227-236): scanned -> ("opencv", 300),
    else ("basic", 150)."""
    if pdf_type in (PDF_TYPE_SCANNED, CT_PDF_SCANNED):
        return "opencv", 300
    return "basic", 150


# ---------------------------------------------------------------------------
# C2 — the full per-PDFType auto-config table (pdf_analyzer.py:124-176),
# value-for-value.  strategy names are the reference's; unknown types fall
# back to the MIXED entry exactly like configs.get(pdf_type, configs[MIXED]).
# ---------------------------------------------------------------------------

AUTO_CONFIGS = {
    PDF_TYPE_SCANNED: {
        "engine_type": "opencv", "deskew": True, "denoise": True,
        "contrast": True, "dpi": 300, "strategy": "full_ocr",
    },
    PDF_TYPE_NATIVE: {
        "engine_type": "basic", "deskew": False, "denoise": False,
        "contrast": False, "dpi": 150, "strategy": "text_extraction",
    },
    PDF_TYPE_MIXED: {
        "engine_type": "opencv", "deskew": True, "denoise": False,
        "contrast": True, "dpi": 250, "strategy": "hybrid",
    },
    PDF_TYPE_TABLE_HEAVY: {
        "engine_type": "opencv", "deskew": False, "denoise": True,
        "contrast": True, "dpi": 300, "strategy": "table_focused",
    },
    PDF_TYPE_IMAGE_HEAVY: {
        "engine_type": "opencv", "deskew": True, "denoise": True,
        "contrast": True, "dpi": 300, "strategy": "image_focused",
    },
}


def get_optimal_config(pdf_type: str) -> dict:
    """C2 (pdf_analyzer.py:124-176): per-type engine/flags/dpi/strategy."""
    return AUTO_CONFIGS.get(pdf_type, AUTO_CONFIGS[PDF_TYPE_MIXED])

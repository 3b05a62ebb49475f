"""Minimal deterministic PDF writer for synthetic fixtures.

Builds the same kind of raw, self-contained PDFs the reference uses as its own
inline test fixture (reference: tests/test_ocr_adapters.py:19-21 — a literal
``%PDF-1.7`` byte string with one page and a ``BT (Test PDF) Tj ET`` content
stream).  Two flavours:

- native_pdf(pages):   each page is a text content stream — one ``Tj`` per
  line separated by ``T*`` — optionally Flate-compressed.  This is the
  "pdf_native" route's input: a real text layer.
- scanned_pdf(pages):  each page is a DeviceGray image XObject whose pixels
  are a glyph raster of the page text (glyphs.render_page), Flate-compressed.
  No text layer at all -> the sniffer routes it to the OCR actor pool.

Output is a valid-enough PDF (header, numbered objects, xref, trailer) that
our own parser (stages/pdf_native.py) and any standards-based reader can walk.
"""
from __future__ import annotations

import zlib

import numpy as np

from ..glyphs import normalize_for_scan, render_page


def _escape_pdf_string(s: str) -> bytes:
    out = s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    return out.encode("latin-1", errors="replace")


def _assemble(objects: list[bytes], info: dict | None = None) -> bytes:
    """Number objects 1..n, build xref + trailer. objects[i] is the body
    (without 'N 0 obj'/'endobj').  ``info`` (e.g. {"Title": ..., "Author":
    ...}) appends a document-information dictionary referenced from the
    trailer's /Info — the C6 probe target.  Default None keeps output bytes
    identical to pre-info corpora (goldens)."""
    info_ref = b""
    if info:
        fields = b" ".join(
            b"/" + k.encode("ascii") + b" (" + _escape_pdf_string(v) + b")"
            for k, v in info.items())
        objects = objects + [b"<< " + fields + b" >>"]
        info_ref = b" /Info %d 0 R" % len(objects)
    header = b"%PDF-1.7\n"
    parts = [header]
    offsets = []
    pos = len(header)
    for i, body in enumerate(objects, start=1):
        obj = b"%d 0 obj\n" % i + body + b"\nendobj\n"
        offsets.append(pos)
        parts.append(obj)
        pos += len(obj)
    xref_pos = pos
    xref = [b"xref\n", b"0 %d\n" % (len(objects) + 1), b"0000000000 65535 f \n"]
    for off in offsets:
        xref.append(b"%010d 00000 n \n" % off)
    trailer = (
        b"trailer\n<< /Size %d /Root 1 0 R" + info_ref + b" >>\nstartxref\n%d\n%%%%EOF\n"
    ) % (len(objects) + 1, xref_pos)
    parts.extend(xref)
    parts.append(trailer)
    return b"".join(parts)


def native_pdf(pages: list[str], compress: bool = False,
               info: dict | None = None) -> bytes:
    """Text-layer PDF. Each page string may contain newlines; every line
    becomes ``(line) Tj`` followed by ``T*``."""
    n = len(pages)
    objects: list[bytes] = []
    # 1: catalog, 2: pages; page objects 3..3+n-1; content objects after
    kids = b" ".join(b"%d 0 R" % (3 + i) for i in range(n))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n)
    content_ids = [3 + n + i for i in range(n)]
    for i in range(n):
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents %d 0 R /Resources << /Font << /F1 << /Type /Font "
            b"/Subtype /Type1 /BaseFont /Helvetica >> >> >> >>" % content_ids[i]
        )
    for i, page in enumerate(pages):
        lines = page.split("\n")
        body = [b"BT /F1 12 Tf 72 720 Td 14 TL"]
        for ln in lines:
            body.append(b"(" + _escape_pdf_string(ln) + b") Tj T*")
        body.append(b"ET")
        stream = b"\n".join(body)
        if compress:
            stream = zlib.compress(stream)
            objects.append(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(stream)
                + stream
                + b"\nendstream"
            )
        else:
            objects.append(
                b"<< /Length %d >>\nstream\n" % len(stream) + stream + b"\nendstream"
            )
    return _assemble(objects, info=info)


def table_pdf(tables: list[list[list[str]]], info: dict | None = None) -> bytes:
    """Ruled-table PDF: one page per table, a drawn grid (``m``/``l``/``S``
    line segments) with one absolutely-positioned text op per cell — the
    geometry the lines-strategy table extractor consumes.  Row 0 renders at
    the top (the header row of the table contract)."""
    n = len(tables)
    objects: list[bytes] = []
    kids = b" ".join(b"%d 0 R" % (3 + i) for i in range(n))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n)
    content_ids = [3 + n + i for i in range(n)]
    for i in range(n):
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents %d 0 R /Resources << /Font << /F1 << /Type /Font "
            b"/Subtype /Type1 /BaseFont /Helvetica >> >> >> >>" % content_ids[i]
        )
    x0, y0, cw, rh = 72, 600, 120, 24
    for rows in tables:
        n_rows, n_cols = len(rows), max(len(r) for r in rows)
        body = []
        for j in range(n_cols + 1):                 # vertical rules
            x = x0 + j * cw
            body.append(b"%d %d m %d %d l S" % (x, y0, x, y0 + n_rows * rh))
        for i in range(n_rows + 1):                 # horizontal rules
            y = y0 + i * rh
            body.append(b"%d %d m %d %d l S" % (x0, y, x0 + n_cols * cw, y))
        for r, row in enumerate(rows):              # row 0 at the TOP
            ty = y0 + (n_rows - 1 - r) * rh + 6
            for c, cell in enumerate(row):
                tx = x0 + c * cw + 4
                body.append(b"BT /F1 10 Tf %d %d Td (%s) Tj ET"
                            % (tx, ty, _escape_pdf_string(str(cell))))
        stream = b"\n".join(body)
        objects.append(
            b"<< /Length %d >>\nstream\n" % len(stream) + stream + b"\nendstream"
        )
    return _assemble(objects, info=info)


def scanned_pdf(pages: list[str], info: dict | None = None) -> bytes:
    """Image-only PDF: page text is rasterized with the deterministic glyph
    font and embedded as a FlateDecode DeviceGray image XObject.  The text
    passed in is normalized (glyphs.normalize_for_scan) before rendering —
    the raster, not the string, is the payload."""
    n = len(pages)
    objects: list[bytes] = []
    kids = b" ".join(b"%d 0 R" % (3 + i) for i in range(n))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n)
    content_ids = [3 + n + 2 * i for i in range(n)]
    image_ids = [3 + n + 2 * i + 1 for i in range(n)]
    for i in range(n):
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents %d 0 R /Resources << /XObject << /Im0 %d 0 R >> >> >>"
            % (content_ids[i], image_ids[i])
        )
    for i, page in enumerate(pages):
        img = render_page(normalize_for_scan(page))
        h, w = img.shape
        content = b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (w, h)
        objects.append(
            b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream"
        )
        data = zlib.compress(np.ascontiguousarray(img).tobytes())
        objects.append(
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/BitsPerComponent 8 /ColorSpace /DeviceGray /Filter /FlateDecode "
            b"/Length %d >>\nstream\n" % (w, h, len(data))
            + data
            + b"\nendstream"
        )
    return _assemble(objects, info=info)

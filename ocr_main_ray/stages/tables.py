"""Table extraction (reference section A9 + extension surface J).

The reference ships a stub extractor returning ``[]`` (table_simple.py:16-29)
while documenting pdfplumber's lines strategy as the real implementation
(README.md:368-379).  This module rebuilds both sides of that contract:

- ``StubTableExtractor`` — the DEFAULT, byte-parity with the reference: every
  document gets ``tables_json == "[]"``.
- ``LinesTableExtractor`` — the working extension behind the same protocol: a
  lines-strategy extractor over the native content stream (ruled grid lines
  ``x y m x y l S`` define the cell lattice; text ops are assigned to cells
  by their Td position), the same geometry pdfplumber's "lines" strategy
  uses.  Selected via ``PipelineConfig(table_extractor="lines")``.

The registry mirrors the engine registry (AdapterFactory parity:
adapter_factory.py:19-51 — unknown names raise ConfigurationError).
"""
from __future__ import annotations

import re
from bisect import bisect_right
from typing import Protocol

from ..config import ConfigurationError
from . import pdf_native


class TableExtractor(Protocol):
    """Rebuild of TableExtractorPort (table_extractor_port.py:9-39)."""

    def extract_tables(self, pdf_bytes: bytes, **options) -> list[dict]: ...


class StubTableExtractor:
    """A9 parity: always ``[]`` (table_simple.py:16-29)."""

    def extract_tables(self, pdf_bytes: bytes, **options) -> list[dict]:
        return []


_LINE_RE = re.compile(
    rb"(\d+(?:\.\d+)?) (\d+(?:\.\d+)?) m (\d+(?:\.\d+)?) (\d+(?:\.\d+)?) l S")
_TEXT_RE = re.compile(rb"BT[^()]*?(\d+(?:\.\d+)?) (\d+(?:\.\d+)?) Td ")


class LinesTableExtractor:
    """Lines-strategy table extraction: infer the cell lattice from ruled
    lines, place text by position.  One grid per page (the common layout);
    pages without a ruled grid contribute no table."""

    def extract_tables(self, pdf_bytes: bytes, **options) -> list[dict]:
        objs, page_ids = pdf_native.parse_pdf(pdf_bytes)
        tables = []
        for pid in page_ids:
            stream = pdf_native.page_content_stream(objs, pid)
            if stream is None:
                continue
            t = self._table_from_stream(stream)
            if t is not None:
                tables.append(t)
        return tables

    def _table_from_stream(self, stream: bytes) -> dict | None:
        xs, ys = set(), set()
        for m in _LINE_RE.finditer(stream):
            x1, y1, x2, y2 = (float(m.group(i)) for i in (1, 2, 3, 4))
            if x1 == x2:
                xs.add(x1)
            elif y1 == y2:
                ys.add(y1)
        xs, ys = sorted(xs), sorted(ys)
        if len(xs) < 2 or len(ys) < 2:
            return None
        n_cols, n_rows = len(xs) - 1, len(ys) - 1
        grid = [["" for _ in range(n_cols)] for _ in range(n_rows)]
        filled = 0
        for m in _TEXT_RE.finditer(stream):
            tx, ty = float(m.group(1)), float(m.group(2))
            p = stream.find(b"(", m.end())
            if p < 0:
                continue
            text, _ = pdf_native._read_pdf_string(stream, p)
            if not text:                              # empty op != filled cell
                continue
            col = bisect_right(xs, tx) - 1
            row_b = bisect_right(ys, ty) - 1          # from bottom
            if 0 <= col < n_cols and 0 <= row_b < n_rows:
                row = n_rows - 1 - row_b              # row 0 = top = header
                if not grid[row][col]:
                    filled += 1
                grid[row][col] = text
        if not filled:
            return None
        # confidence = filled-cell fraction (deterministic, no model)
        return {"data": grid, "confidence": round(filled / (n_rows * n_cols), 6)}


TABLE_EXTRACTOR_REGISTRY = {
    "stub": StubTableExtractor,
    "lines": LinesTableExtractor,
}


def create_table_extractor(name: str) -> TableExtractor:
    if name not in TABLE_EXTRACTOR_REGISTRY:
        raise ConfigurationError(f"unknown table extractor: {name!r}")
    return TABLE_EXTRACTOR_REGISTRY[name]()

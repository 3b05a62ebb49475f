"""HTML document-metadata extraction: title / description / author /
published date from the <head> — the metadata half of main-content
extraction (the C6 doc-info probe's HTML sibling; reference parity:
pdf_info_adapter.py extracts /Title,/Author,/CreationDate for PDFs,
this stage does the same for web pages).

Sources, in priority order (first non-empty wins per field):
  1. Open Graph / article meta properties (og:title, article:author,
     article:published_time)
  2. standard meta names (description, author, date)
  3. <title> text; JSON-LD datePublished (regex probe, no JSON parse —
     the value is a quoted scalar)

Scan-side only (regex over the head window, zero-copy slice) — no
shuffle, embarrassingly parallel, same shape as sniff.
"""
from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_HEAD_BYTES = 16384


def _meta_re(attr: str, key: str) -> re.Pattern:
    return re.compile(
        ("<meta[^>]+{a}\\s*=\\s*[\"']{k}[\"'][^>]*content\\s*=\\s*"
         "[\"']([^\"']*)[\"']").format(a=attr, k=re.escape(key)).encode(),
        re.IGNORECASE)


def _meta_re_rev(attr: str, key: str) -> re.Pattern:
    return re.compile(
        ("<meta[^>]+content\\s*=\\s*[\"']([^\"']*)[\"'][^>]*{a}\\s*=\\s*"
         "[\"']{k}[\"']").format(a=attr, k=re.escape(key)).encode(),
        re.IGNORECASE)


_TITLE_OG = (_meta_re("property", "og:title"), _meta_re_rev("property", "og:title"))
_TITLE_TAG = re.compile(rb"<title[^>]*>([^<]*)</title>", re.IGNORECASE)
_DESC = (_meta_re("name", "description"), _meta_re_rev("name", "description"),
         _meta_re("property", "og:description"))
_AUTHOR = (_meta_re("name", "author"), _meta_re_rev("name", "author"),
           _meta_re("property", "article:author"))
_DATE = (_meta_re("property", "article:published_time"),
         _meta_re("name", "date"))
_JSONLD_DATE = re.compile(
    rb"\"datePublished\"\s*:\s*\"([^\"]+)\"", re.IGNORECASE)


def _first(patterns, blob: bytes) -> str:
    for p in patterns:
        m = p.search(blob)
        if m and m.group(1).strip():
            return m.group(1).strip().decode("utf-8", "replace")
    return ""


def extract_meta_batch(batch: pa.Table, html_col: str = "html") -> pa.Table:
    """Adds meta_title / meta_description / meta_author / meta_published
    string columns ("" when absent)."""
    heads = pc.binary_slice(batch.column(html_col), 0,
                            _HEAD_BYTES).to_pylist()
    titles, descs, authors, dates = [], [], [], []
    for h in heads:
        h = h or b""
        t = _first(_TITLE_OG, h)
        if not t:
            m = _TITLE_TAG.search(h)
            t = (m.group(1).strip().decode("utf-8", "replace") if m else "")
        titles.append(t)
        descs.append(_first(_DESC, h))
        authors.append(_first(_AUTHOR, h))
        d = _first(_DATE, h)
        if not d:
            m = _JSONLD_DATE.search(h)
            d = m.group(1).decode("utf-8", "replace") if m else ""
        dates.append(d)
    return (batch
            .append_column("meta_title", pa.array(titles, pa.string()))
            .append_column("meta_description", pa.array(descs, pa.string()))
            .append_column("meta_author", pa.array(authors, pa.string()))
            .append_column("meta_published", pa.array(dates, pa.string())))

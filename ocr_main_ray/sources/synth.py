"""Deterministic synthesizer for the Common-Crawl-style ``pages`` table.

The flagship input (BASELINE.json input_hint) is
``pages(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)``.  No such table ships in /root/testdata, so it is synthesized
*deterministically* from the driver-provided ``documents`` table (doc_id and
text drive every byte) or from a bare integer range — same construction
either way, seed-free and reproducible, the discipline FIXTURES.md section 1
prescribes.

Payload mix per key (mode = key % 10):
  0-3  html          (40%)  — main content wrapped in boilerplate chrome
  4-6  pdf_native    (30%)  — text-layer PDF, 1..5 pages, some Flate
  7-8  pdf_scanned   (20%)  — image-only PDF of glyph rasters, 1..3 pages
  9    edge cases    (10%)  — empty / garbage / truncated PDF / junk
plus a deterministic fraction of duplicate urls (key % 11 == 3) with later
warc_ts, exercising dedup-by-url keep-first (G6).

Size spread: a repeat factor stretches some documents so size_bucket spans
~1 KB .. ~1 MB; at bench scale this is the skew the repartition defense must
absorb.
"""
from __future__ import annotations

import datetime as _dt

import pyarrow as pa
import pyarrow.parquet as pq

from ..glyphs import normalize_for_scan
from ..schema import PAGES_SCHEMA
from .pdfgen import native_pdf, scanned_pdf

_EPOCH = _dt.datetime(2025, 1, 1)

# bump when payload construction changes — cache keys include it
SYNTH_VERSION = 3

_BOILER_LINKS = [
    ("Home", "/"), ("Products", "/products"), ("Pricing", "/pricing"),
    ("About us", "/about"), ("Careers", "/careers"), ("Contact", "/contact"),
    ("Blog", "/blog"), ("Support", "/support"),
]


def _wrap(words: list[str], width: int = 70) -> list[str]:
    lines, cur, n = [], [], 0
    for w in words:
        if n + len(w) + (1 if cur else 0) > width and cur:
            lines.append(" ".join(cur))
            cur, n = [], 0
        cur.append(w)
        n += len(w) + (1 if len(cur) > 1 else 0)
    if cur:
        lines.append(" ".join(cur))
    return lines


def _paragraphs(text: str, key: int) -> list[str]:
    """Split the source text into 2..6 deterministic paragraphs."""
    words = text.split()
    if not words:
        words = ["empty", "document", str(key)]
    nper = max(8, len(words) // (2 + key % 5))
    paras = [" ".join(words[i : i + nper]) for i in range(0, len(words), nper)]
    return [p for p in paras if p][:6] or [" ".join(words)]


def build_html(key: int, text: str) -> bytes:
    """Known-structure page: nav/header/ads/footer chrome around an
    <article> of real paragraphs.  The repeat factor widens the size
    distribution (bucket skew)."""
    paras = _paragraphs(text, key)
    repeat = 1 + (key % 7) ** 2 + (37 if key % 53 == 0 else 0)
    cap = 400
    if key % 101 == 0:  # ~1% heavy tail: ~0.5-1 MB pages (size_bucket skew)
        repeat += 500
        cap = 3000
    body_paras = (paras * repeat)[: max(2, min(len(paras) * repeat, cap))]
    nav = "".join(
        f'<li><a href="{href}">{label}</a></li>' for label, href in _BOILER_LINKS
    )
    ads = "".join(
        f'<div class="advert">Buy widget {i} now! <a href="/ad{i}">click</a></div>'
        for i in range(3)
    )
    article = "".join(f"<p>{p}</p>" for p in body_paras)
    heading = f"Document {key} report"
    html = (
        "<!DOCTYPE html><html><head><title>Doc {k}</title>"
        "<script>var x = 'not content';</script>"
        "<style>.a{{color:red}}</style></head><body>"
        '<header><div class="logo">MegaCorp portal</div></header>'
        "<nav><ul>{nav}</ul></nav>"
        '<div class="sidebar"><a href="/x">Trending one</a>'
        '<a href="/y">Trending two</a><a href="/z">Trending three</a></div>'
        "<main><article><h1>{heading}</h1>{article}</article></main>"
        "{ads}"
        '<footer><p>Copyright 2025 MegaCorp. All rights reserved.</p>'
        '<ul><li><a href="/tos">Terms</a></li><li><a href="/privacy">Privacy'
        "</a></li></ul></footer></body></html>"
    ).format(k=key, nav=nav, heading=heading, article=article, ads=ads)
    return html.encode("utf-8")


def build_native_pdf(key: int, text: str) -> bytes:
    paras = _paragraphs(text, key)
    n_pages = 1 + key % 5
    lines: list[str] = []
    for i, p in enumerate(paras * (1 + key % 3)):
        lines.extend(_wrap(p.split()))
        lines.append("")
    if lines and not lines[-1]:
        lines.pop()
    per = max(4, len(lines) // n_pages)
    pages = ["\n".join(lines[i : i + per]) for i in range(0, len(lines), per)][:n_pages]
    pages = [p for p in pages if p.strip()] or [f"Document {key} single page"]
    data = native_pdf(pages, compress=(key % 2 == 0))
    if len(data) < 1024:  # D2 gate: valid PDFs are >= 1024 bytes
        data += b"%" + b"P" * (1024 - len(data) - 2) + b"\n"
    return data


def build_scanned_pdf(key: int, text: str, deep_tail: bool = False) -> bytes:
    """Image-only PDF whose rasters are deskew-stable realistic pages:
    ruled header/footer + >= 4 body lines (see stages/preprocess deskew).

    ``deep_tail`` (the "skewed" mix): ~1% of scanned docs get 50-100x the
    median page count — the OCR-cost skew profile a real crawl has (court
    filings, scanned books) that the (content_type, size_bucket) staging
    defense is designed for."""
    words = normalize_for_scan(text).split() or ["EMPTY", "SCAN", str(key)]
    n_pages = 1 + key % 3
    if key % 97 == 0:  # ~1-2% deep documents: OCR-cost skew tail
        n_pages = 8 + key % 5
    if deep_tail and key % 103 == 0:  # ~1% EXTREME tail: 60-119 pages
        n_pages = 60 + key % 60
    per_line = 6 + key % 4
    body_lines = [
        " ".join(words[i : i + per_line]) for i in range(0, len(words), per_line)
    ]
    # stretch to at least 4 lines per page
    while len(body_lines) < 4 * n_pages:
        body_lines = body_lines + body_lines
    per_page = max(4, len(body_lines) // n_pages)
    width = 48
    rule = "-" * width
    pages = []
    for p in range(n_pages):
        chunk = body_lines[p * per_page : (p + 1) * per_page][:30]
        if not chunk:
            chunk = [f"BLANK PAGE {p + 1}"]
        pages.append(
            "\n".join([rule, f"SCAN DOC {key} PAGE {p + 1}", rule, ""] + chunk + ["", rule])
        )
    data = scanned_pdf(pages)
    if len(data) < 1024:  # D2 gate: valid PDFs are >= 1024 bytes
        data += b"%" + b"P" * (1024 - len(data) - 2) + b"\n"
    return data


def build_edge(key: int) -> bytes:
    sub = (key // 10) % 4
    if sub == 0:
        return b""
    if sub == 1:
        return b"random garbage payload that is neither html nor pdf " * 3
    if sub == 2:
        return b"%PDF-1.7\n% truncated, below validity threshold\n"
    return bytes([0xFF, 0xFE, 0x00, 0x01]) * 64


MIXES = {
    # mode thresholds over key % 10: (last html, last native, last scanned)
    "default": (3, 6, 8),      # 40% html / 30% native / 20% scanned / 10% edge
    "ocr-heavy": (2, 4, 8),    # 30% html / 20% native / 40% scanned / 10% edge
    # ocr-heavy shares + a ~1% 50-100x page-count scanned tail (skew bench)
    "skewed": (2, 4, 8),
}


def build_payload(key: int, text: str, mix: str = "default") -> tuple[bytes, str]:
    """-> (payload bytes, expected coarse route) — route is for test
    convenience only; the pipeline must re-derive it by sniffing.

    ``mix`` picks the content-type distribution; "ocr-heavy" weights the
    corpus toward scanned documents (the reference system's core workload)
    and is what the bench uses."""
    h, nv, sc = MIXES[mix]
    mode = key % 10
    if mode <= h:
        return build_html(key, text), "html"
    if mode <= nv:
        return build_native_pdf(key, text), "pdf_native"
    if mode <= sc:
        return build_scanned_pdf(key, text,
                                 deep_tail=(mix == "skewed")), "pdf_scanned"
    return build_edge(key), "edge"


def _rows_for(key: int, text: str, lang: str, mix: str = "default"):
    payload, _route = build_payload(key, text, mix)
    url = f"https://site-{key % 97}.example.com/doc/{key}"
    ts0 = _EPOCH + _dt.timedelta(seconds=key)
    crawler_text = text[:200] if key % 3 else ""
    rows = [(url, ts0, payload, crawler_text, lang)]
    if key % 11 == 3:  # duplicate url, later crawl, same payload
        rows.append((url, ts0 + _dt.timedelta(days=1), payload, crawler_text, lang))
        if key % 22 == 3:
            rows.append((url, ts0 + _dt.timedelta(days=2), payload, crawler_text, lang))
    return rows


_LANG_MAP = {"es": "spa", "en": "eng", "de": "deu", "fr": "fra", "zh": "zho"}


def pages_from_documents(sf_dir: str, limit: int | None = None,
                         repeat: int = 1, mix: str = "default") -> pa.Table:
    """Deterministic pages table from ``{sf_dir}/documents.parquet``.

    ``repeat`` replays the document corpus k times with shifted keys —
    used by the bench to scale input size without external data.
    """
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    if limit is not None:
        docs = docs.slice(0, limit)
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()
    urls, tss, payloads, ctexts, plangs = [], [], [], [], []
    for r in range(repeat):
        shift = r * 1_000_003
        for doc_id, text, lang in zip(ids, texts, langs):
            key = int(doc_id) + shift
            for (u, ts, pl, ct, lg) in _rows_for(key, text or "",
                                                 _LANG_MAP.get(lang, "eng"), mix):
                urls.append(u); tss.append(ts); payloads.append(pl)
                ctexts.append(ct); plangs.append(lg)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(payloads, pa.large_binary()),
            "text": pa.array(ctexts, pa.string()),
            "lang": pa.array(plangs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def pages_dataset_from_documents(sf_dir: str, repeat: int = 1,
                                 mix: str = "default"):
    """Distributed synthesis: same rows as pages_from_documents (payloads
    are a pure function of (doc_id + shift, text, lang)), built by Ray
    tasks instead of a driver loop — corpus generation parallelizes with
    the cluster.  Row order is nondeterministic; row SET is identical."""
    import ray.data as rd

    def build(batch: pa.Table, shift: int) -> pa.Table:
        urls, tss, payloads, ctexts, plangs = [], [], [], [], []
        for doc_id, text, lang in zip(batch.column("doc_id").to_pylist(),
                                      batch.column("text").to_pylist(),
                                      batch.column("lang").to_pylist()):
            key = int(doc_id) + shift
            for (u, ts, pl, ct, lg) in _rows_for(key, text or "",
                                                 _LANG_MAP.get(lang, "eng"), mix):
                urls.append(u); tss.append(ts); payloads.append(pl)
                ctexts.append(ct); plangs.append(lg)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(payloads, pa.large_binary()),
                "text": pa.array(ctexts, pa.string()),
                "lang": pa.array(plangs, pa.string()),
            },
            schema=PAGES_SCHEMA,
        )

    parts = []
    for r in range(repeat):
        shift = r * 1_000_003
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text", "lang"])
        ds = ds.repartition(16).map_batches(
            build, fn_kwargs={"shift": shift}, batch_format="pyarrow")
        parts.append(ds)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def synth_pages(n_docs: int, offset: int = 0) -> pa.Table:
    """Pages table from a bare integer range (unit tests / property tests)."""
    base_words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                  "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    urls, tss, payloads, ctexts, plangs = [], [], [], [], []
    for key in range(offset, offset + n_docs):
        nwords = 30 + (key * 7) % 120
        text = " ".join(base_words[(key + i) % len(base_words)] for i in range(nwords))
        lang = ("spa", "eng", "por")[key % 3]
        for (u, ts, pl, ct, lg) in _rows_for(key, text, lang):
            urls.append(u); tss.append(ts); payloads.append(pl)
            ctexts.append(ct); plangs.append(lg)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(payloads, pa.large_binary()),
            "text": pa.array(ctexts, pa.string()),
            "lang": pa.array(plangs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )

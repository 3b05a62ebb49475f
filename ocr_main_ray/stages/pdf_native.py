"""Pure-Python minimal PDF parser: text-layer extraction + page images.

Implements the "pdf_native" route of the pipeline: per-page text from content
stream text operators (``Tj`` / ``TJ``; line moves ``T*``/``Td``/``TD``/``'``),
pages joined with "\n\n" — the reference's page-join contract
(reference: backend/src/infrastructure/adapters/ocr_adapters.py:73 and the
first-page-text sniffer at backend/src/interfaces/api/routers/files.py:85-96).

Scope: uncompressed or FlateDecode streams, numbered non-updated xref PDFs —
exactly the class of documents our fixture generator (sources/pdfgen.py)
emits, which mirrors the reference's own inline fixture construction
(tests/test_ocr_adapters.py:19-21).  Anything else raises PdfParseError,
which the dataplane records in the per-row ``error`` column.

Stateless, per-document; called row-at-a-time inside Arrow batches.
"""
from __future__ import annotations

import re
import zlib

import numpy as np

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\b", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
_WH_RE = {
    "w": re.compile(rb"/Width\s+(\d+)"),
    "h": re.compile(rb"/Height\s+(\d+)"),
}


class PdfParseError(ValueError):
    pass


def _split_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """objnum -> (dict/body bytes, raw stream bytes or None)."""
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    for m in _OBJ_RE.finditer(data):
        num = int(m.group(1))
        end = data.find(b"endobj", m.end())
        if end < 0:
            continue
        body = data[m.end() : end]
        sm = _STREAM_RE.search(body)
        if sm:
            head = body[: sm.start()]
            se = body.rfind(b"endstream")
            stream = body[sm.end() : se] if se >= 0 else None
            if stream is not None and stream.endswith(b"\n"):
                stream = stream[:-1]
            objs[num] = (head, stream)
        else:
            objs[num] = (body, None)
    if not objs:
        raise PdfParseError("no PDF objects found")
    return objs


def _decode_stream(head: bytes, stream: bytes) -> bytes:
    if b"/FlateDecode" in head:
        try:
            return zlib.decompress(stream)
        except zlib.error as e:
            raise PdfParseError(f"bad FlateDecode stream: {e}") from e
    if b"/Filter" in head:
        raise PdfParseError("unsupported stream filter")
    return stream


def _page_object_ids(objs: dict[int, tuple[bytes, bytes | None]]) -> list[int]:
    """Page object ids in /Kids document order (Pages tree, 1 level)."""
    pages_nodes = [
        (num, head)
        for num, (head, _) in objs.items()
        if b"/Type" in head and b"/Pages" in head and b"/Kids" in head
    ]
    order: list[int] = []
    for _, head in sorted(pages_nodes):
        km = re.search(rb"/Kids\s*\[(.*?)\]", head, re.S)
        if not km:
            continue
        for rm in _REF_RE.finditer(km.group(1)):
            order.append(int(rm.group(1)))
    if not order:  # fall back: any /Type /Page objects in id order
        order = sorted(
            num
            for num, (head, _) in objs.items()
            if re.search(rb"/Type\s*/Page\b", head)
        )
    if not order:
        raise PdfParseError("no pages found")
    return order


def _parse_content_text(stream: bytes) -> str:
    """Walk a content stream; collect text shown by Tj / ' / TJ, starting a
    new line at each line-move operator (T*, Td, TD, ').  PDF string escapes
    and balanced parens are honoured.

    Line semantics: shows accumulate into the current line; a move pushes
    it.  A content stream that ENDS with a move (the writer emits ``T*``
    after every line) leaves one artifact empty line, which is dropped —
    interior and intentional trailing empty lines survive exactly."""
    lines: list[str] = []
    current: list[str] = []
    i, n = 0, len(stream)
    pending: list[str] = []  # strings on the operand stack since last operator
    saw_text = False
    ended_with_move = False

    def push_line():
        lines.append("".join(current))
        current.clear()

    while i < n:
        c = stream[i : i + 1]
        if c == b"(":
            s, i = _read_pdf_string(stream, i)
            pending.append(s)
            continue
        if c == b"%":  # comment to EOL
            j = stream.find(b"\n", i)
            i = n if j < 0 else j + 1
            continue
        if c.isalpha() or c in (b"'", b'"', b"*"):
            j = i
            while j < n and not stream[j : j + 1].isspace() and stream[j : j + 1] not in b"()[]<>/%":
                j += 1
            op = stream[i:j]
            if op in (b"Tj", b"TJ"):
                current.extend(pending)
                saw_text = True
                ended_with_move = False
            elif op in (b"'", b'"'):
                push_line()
                current.extend(pending)
                saw_text = True
                ended_with_move = False
            elif op in (b"T*", b"Td", b"TD"):
                if saw_text:
                    push_line()
                ended_with_move = True
            pending = []
            i = j
            continue
        i += 1
    if not saw_text:
        return ""
    if not ended_with_move:
        push_line()
    return "\n".join(lines)


def _read_pdf_string(data: bytes, i: int) -> tuple[str, int]:
    """Read a '(' ... ')' string starting at data[i] == '('; returns
    (decoded, next index)."""
    assert data[i : i + 1] == b"("
    i += 1
    depth = 1
    buf = bytearray()
    n = len(data)
    while i < n and depth > 0:
        b = data[i : i + 1]
        if b == b"\\" and i + 1 < n:
            nxt = data[i + 1 : i + 2]
            mapping = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
                       b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}
            if nxt in mapping:
                buf += mapping[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                while j < min(i + 4, n) and data[j : j + 1].isdigit():
                    j += 1
                buf.append(int(data[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            i += 2
            continue
        if b == b"(":
            depth += 1
        elif b == b")":
            depth -= 1
            if depth == 0:
                i += 1
                break
        if depth > 0:
            buf += b
        i += 1
    return buf.decode("latin-1"), i


def _content_refs(page_head: bytes) -> list[int]:
    cm = re.search(rb"/Contents\s+(\d+)\s+0\s+R", page_head)
    if cm:
        return [int(cm.group(1))]
    cm = re.search(rb"/Contents\s*\[(.*?)\]", page_head, re.S)
    if cm:
        return [int(m.group(1)) for m in _REF_RE.finditer(cm.group(1))]
    return []


def parse_pdf(data: bytes):
    """-> (objs, page_ids). Raises PdfParseError on non-PDF / unsupported."""
    if not data.startswith(b"%PDF-"):
        raise PdfParseError("missing %PDF- header")
    objs = _split_objects(data)
    page_ids = _page_object_ids(objs)
    return objs, page_ids


def page_count(data: bytes) -> int:
    """Page count with the reference's fallback-chain spirit (PyPDF2 ->
    pdfplumber -> 1; reference pdf_info_adapter.py:31-40): full parse, else 1."""
    try:
        _, page_ids = parse_pdf(data)
        return len(page_ids)
    except PdfParseError:
        return 1


def extract_page_texts(data: bytes) -> list[str]:
    """Per-page text-layer strings, document order.  Pages with no text
    operators (e.g. image-only pages) yield ''. """
    objs, page_ids = parse_pdf(data)
    texts = []
    for pid in page_ids:
        head, _ = objs.get(pid, (b"", None))
        chunks = []
        for cid in _content_refs(head):
            chead, cstream = objs.get(cid, (b"", None))
            if cstream is None:
                continue
            decoded = _decode_stream(chead, cstream)
            chunks.append(_parse_content_text(decoded))
        texts.append("\n".join(c for c in chunks if c))
    return texts


def page_content_stream(objs: dict, pid: int) -> bytes | None:
    """Concatenated decoded content stream(s) of one page object, or None
    if the page has no content (used by the lines-strategy table extractor)."""
    head, _ = objs.get(pid, (b"", None))
    chunks = []
    for cid in _content_refs(head):
        chead, cstream = objs.get(cid, (b"", None))
        if cstream is None:
            continue
        chunks.append(_decode_stream(chead, cstream))
    return b"\n".join(chunks) if chunks else None


def _find_object(data: bytes, num: int) -> tuple[bytes, bytes | None] | None:
    """Locate one numbered object without splitting the whole file."""
    m = re.search(rb"(?<![0-9])%d\s+0\s+obj\b" % num, data)
    if not m:
        return None
    end = data.find(b"endobj", m.end())
    if end < 0:
        return None
    body = data[m.end() : end]
    sm = _STREAM_RE.search(body)
    if sm:
        se = body.rfind(b"endstream")
        stream = body[sm.end() : se] if se >= 0 else None
        if stream is not None and stream.endswith(b"\n"):
            stream = stream[:-1]
        return body[: sm.start()], stream
    return body, None


def first_page_text(data: bytes) -> str:
    """Text layer of page 1 only — the C4 sniffer probe
    (reference routers/files.py:85-96: > 50 stripped chars -> native).

    Fast path: jump straight to the first /Kids ref -> its /Contents ->
    that one stream; never materializes the other objects (the sniffer
    runs on EVERY pdf payload, so this is hot).  Falls back to the full
    parse on any structural surprise."""
    if not data.startswith(b"%PDF-"):
        raise PdfParseError("missing %PDF- header")
    try:
        km = re.search(rb"/Kids\s*\[\s*(\d+)\s+0\s+R", data)
        if km:
            page = _find_object(data, int(km.group(1)))
            if page is not None:
                chunks = []
                for cid in _content_refs(page[0]):
                    cobj = _find_object(data, cid)
                    if cobj is None or cobj[1] is None:
                        continue
                    chunks.append(_parse_content_text(_decode_stream(*cobj)))
                return "\n".join(c for c in chunks if c)
    except PdfParseError:
        raise
    except Exception:
        pass
    objs, page_ids = parse_pdf(data)
    head, _ = objs.get(page_ids[0], (b"", None))
    chunks = []
    for cid in _content_refs(head):
        chead, cstream = objs.get(cid, (b"", None))
        if cstream is None:
            continue
        chunks.append(_parse_content_text(_decode_stream(chead, cstream)))
    return "\n".join(c for c in chunks if c)


def extract_page_images(data: bytes) -> list[np.ndarray | None]:
    """Per page: the first DeviceGray image XObject as a (H, W) uint8 array,
    or None when the page has no image — the 'render' step of the scanned
    route (reference renders via poppler, ocr_adapters.py:62)."""
    objs, page_ids = parse_pdf(data)
    images: list[np.ndarray | None] = []
    for pid in page_ids:
        head, _ = objs.get(pid, (b"", None))
        img = None
        xm = re.search(rb"/XObject\s*<<(.*?)>>", head, re.S)
        if xm:
            for rm in _REF_RE.finditer(xm.group(1)):
                xhead, xstream = objs.get(int(rm.group(1)), (b"", None))
                if xstream is None or b"/Image" not in xhead:
                    continue
                wm = _WH_RE["w"].search(xhead)
                hm = _WH_RE["h"].search(xhead)
                if not (wm and hm):
                    continue
                w, h = int(wm.group(1)), int(hm.group(1))
                raw = _decode_stream(xhead, xstream)
                if len(raw) < w * h:
                    raise PdfParseError("image stream truncated")
                img = np.frombuffer(raw[: w * h], dtype=np.uint8).reshape(h, w)
                break
        images.append(img)
    return images


# ---------------------------------------------------------------------------
# C6 — document-information dictionary probe
# ---------------------------------------------------------------------------

_DOC_INFO_FIELDS = {
    "Title": "title",
    "Author": "author",
    "Creator": "creator",
    "Producer": "producer",
    "CreationDate": "creation_date",
    "ModDate": "modification_date",
}


def doc_info(data: bytes) -> dict:
    """C6 (reference pdf_info_adapter.py:44-90): probe the trailer's /Info
    dictionary for /Title /Author /Creator /Producer /CreationDate /ModDate.

    Fallback-chain spirit preserved: any failure (no /Info, unparseable
    object, non-PDF bytes) degrades to '' fields with the page-count
    fallback — never an exception."""
    out = {"page_count": page_count(data)}
    out.update({v: "" for v in _DOC_INFO_FIELDS.values()})
    try:
        m = None
        for m in re.finditer(rb"/Info\s+(\d+)\s+0\s+R", data):
            pass  # last match wins (incremental-update PDFs append trailers)
        if m is None:
            return out
        obj = _find_object(data, int(m.group(1)))
        if obj is None:
            return out
        head = obj[0]
        for key, field in _DOC_INFO_FIELDS.items():
            km = re.search(rb"/" + key.encode("ascii") + rb"\s*\(", head)
            if km:
                s, _ = _read_pdf_string(head, km.end() - 1)
                out[field] = s
    except Exception:
        pass  # reference logs a warning and returns the fallback dict
    return out

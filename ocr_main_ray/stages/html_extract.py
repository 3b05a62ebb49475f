"""HTML main-content extraction: DOM-heuristic boilerplate stripping.

New capability required by the rebuild's north star (the reference engine has
no HTML path; its extraction semantics end at PDFs).  Approach follows the
published Readability / Boilerpipe family of heuristics: segment the DOM into
block-level units, score each by text mass and link density, drop chrome
(nav/header/footer/aside, ad/menu/sidebar class hints), keep content blocks,
join with "\n\n" — the same join byte the PDF page assembly uses
(reference ocr_adapters.py:73), so downstream formatting (B9 heading rule)
treats both routes uniformly.

Built on the stdlib ``html.parser`` only (no bs4/lxml in this sandbox).  Pure
deterministic function of the input bytes: the golden fixtures freeze its
behavior exactly like the reference freezes its PDF goldens
(tests/validation_test.py).

Per-row cost is O(payload); the stage is stateless -> plain ``map_batches``
tasks with large batches.
"""
from __future__ import annotations

import re
from html.parser import HTMLParser

BLOCK_TAGS = {
    "p", "div", "article", "section", "main", "li", "h1", "h2", "h3", "h4",
    "h5", "h6", "td", "th", "pre", "blockquote", "figcaption", "dd", "dt",
}
SKIP_TAGS = {"script", "style", "noscript", "template", "head", "svg",
             "iframe", "form", "button", "select", "option", "canvas"}
BOILER_TAGS = {"nav", "header", "footer", "aside"}
HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
# class/id hints, per the classic Readability negative list
_NEG_HINT = re.compile(
    r"nav|menu|footer|header|sidebar|side-bar|advert|banner|breadcrumb|"
    r"comment|share|social|related|promo|cookie|subscribe|masthead|widget",
    re.I,
)
_WS = re.compile(r"\s+")

MIN_WORDS = 3            # a content block needs at least this many words
MAX_LINK_DENSITY = 0.33  # more than this fraction of link text -> boilerplate


class _Block:
    __slots__ = ("tag", "depth", "chars", "link_chars", "words", "parts", "boiler")

    def __init__(self, tag: str, depth: int, boiler: bool):
        self.tag = tag
        self.depth = depth
        self.chars = 0
        self.link_chars = 0
        self.words = 0
        self.parts: list[str] = []
        self.boiler = boiler

    def text(self) -> str:
        return _WS.sub(" ", "".join(self.parts)).strip()


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self.stack: list[str] = []
        self.skip_depth = 0
        self.boiler_depth = 0
        self.link_depth = 0
        self.open_blocks: list[_Block] = []

    # -- tag events --------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        self.stack.append(tag)
        if tag in SKIP_TAGS:
            self.skip_depth += 1
            return
        hint = " ".join(v or "" for k, v in attrs if k in ("class", "id", "role"))
        boiler = tag in BOILER_TAGS or bool(_NEG_HINT.search(hint))
        if boiler:
            self.boiler_depth += 1
            # remember to decrement when this tag closes
            self.stack[-1] = tag + "\x00boiler"
        if tag == "a":
            self.link_depth += 1
        if tag == "br":
            self._emit(" ")
        if tag in BLOCK_TAGS:
            blk = _Block(tag, len(self.stack), self.boiler_depth > 0)
            self.blocks.append(blk)
            self.open_blocks.append(blk)

    def handle_startendtag(self, tag, attrs):
        if tag.lower() == "br":
            self._emit(" ")

    def handle_endtag(self, tag):
        tag = tag.lower()
        # a stray end tag with no matching open would otherwise unwind the
        # ENTIRE stack, losing skip/boiler/link bookkeeping for the rest of
        # the document — real crawls emit these constantly
        if not any(t.split("\x00", 1)[0] == tag for t in self.stack):
            return
        # unwind the stack to the matching open tag (tolerates bad nesting)
        while self.stack:
            top = self.stack.pop()
            base = top.split("\x00", 1)[0]
            if top.endswith("\x00boiler"):
                self.boiler_depth = max(0, self.boiler_depth - 1)
            if base in SKIP_TAGS:
                self.skip_depth = max(0, self.skip_depth - 1)
            if base == "a":
                self.link_depth = max(0, self.link_depth - 1)
            if base in BLOCK_TAGS:
                while self.open_blocks and self.open_blocks[-1].depth > len(self.stack):
                    self.open_blocks.pop()
            if base == tag:
                break

    # -- text --------------------------------------------------------------
    def handle_data(self, data):
        if self.skip_depth:
            return
        self._emit(data)

    def _emit(self, data: str):
        if not self.open_blocks:
            return
        blk = self.open_blocks[-1]
        stripped = _WS.sub(" ", data)
        if not stripped.strip():
            if blk.parts:
                blk.parts.append(" ")
            return
        blk.parts.append(stripped)
        nchars = len(stripped.strip())
        blk.chars += nchars
        blk.words += len(stripped.split())
        if self.link_depth:
            blk.link_chars += nchars


def _score_keep(blk: _Block) -> bool:
    if blk.boiler:
        return False
    text = blk.text()
    if not text:
        return False
    if blk.tag in HEADING_TAGS:
        return blk.link_chars == 0 and blk.words >= 1
    if blk.words < MIN_WORDS:
        return False
    link_density = blk.link_chars / max(1, blk.chars)
    return link_density <= MAX_LINK_DENSITY


def _sequence_fusion(blocks: list[_Block], keep: list[bool]) -> list[bool]:
    """Boilerpipe-style smoothing over the block sequence:

    - gap fill: a rejected non-boiler block with some text and moderate
      link density, sandwiched between kept blocks, is content (short
      connective paragraphs, data-table cells inside an article);
    - dangling headings: a kept heading with no kept content among the next
      3 blocks is chrome (section labels in footers/sidebars survive the
      per-block test otherwise)."""
    n = len(blocks)
    out = list(keep)
    # gap fill (one pass left->right against the original decisions)
    for i in range(1, n - 1):
        if out[i] or blocks[i].boiler:
            continue
        b = blocks[i]
        if not b.text():
            continue
        link_density = b.link_chars / max(1, b.chars)
        if link_density > 0.5:
            continue
        prev_kept = keep[i - 1]
        next_kept = any(keep[j] for j in range(i + 1, min(n, i + 3)))
        if prev_kept and next_kept:
            out[i] = True
    # dangling headings
    for i in range(n):
        if out[i] and blocks[i].tag in HEADING_TAGS:
            if not any(out[j] and blocks[j].tag not in HEADING_TAGS
                       for j in range(i + 1, min(n, i + 4))):
                out[i] = False
    return out


_META_CHARSET = __import__("re").compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""",
    __import__("re").IGNORECASE)

_BOMS = [(b"\xef\xbb\xbf", "utf-8-sig"), (b"\xff\xfe\x00\x00", "utf-32-le"),
         (b"\x00\x00\xfe\xff", "utf-32-be"), (b"\xff\xfe", "utf-16-le"),
         (b"\xfe\xff", "utf-16-be")]


def decode_html(html_bytes: bytes) -> str:
    """Charset-aware decode: BOM sniff -> strict utf-8 (the dominant and
    self-validating case — valid utf-8 inputs decode byte-identically to
    the old hard-coded path) -> declared <meta charset> within the first
    2 KiB -> windows-1252 fallback (the de-facto superset of latin-1 that
    real crawls degrade to; it can decode any byte sequence)."""
    for bom, enc in _BOMS:
        if html_bytes.startswith(bom):
            body = html_bytes if enc == "utf-8-sig" else html_bytes[len(bom):]
            try:
                return body.decode(enc)
            except (UnicodeDecodeError, LookupError):
                break
    try:
        return html_bytes.decode("utf-8")
    except UnicodeDecodeError:
        pass
    m = _META_CHARSET.search(html_bytes[:2048])
    if m:
        try:
            return html_bytes.decode(m.group(1).decode("ascii").lower())
        except (UnicodeDecodeError, LookupError):
            pass
    return html_bytes.decode("windows-1252", errors="replace")


def extract_main_blocks(html_bytes: bytes) -> list[str]:
    """Kept content blocks, in document order.

    Leaf-preference: when a block element contains child block elements, the
    parent's own direct text is scored separately from the children's (each
    DOM block accumulates only its direct text), so content is not double
    counted.
    """
    try:
        text = decode_html(html_bytes)
    except Exception:
        return []
    parser = _Extractor()
    try:
        parser.feed(text)
        parser.close()
    except Exception:
        pass  # extract from whatever was parsed before the error
    blocks = parser.blocks
    keep = [_score_keep(b) for b in blocks]
    keep = _sequence_fusion(blocks, keep)
    kept = []
    for blk, k in zip(blocks, keep):
        if k:
            t = blk.text()
            if t:
                kept.append(t)
    return kept


def extract_main_text(html_bytes: bytes) -> str:
    """Main content of an HTML payload, blocks joined with "\n\n"."""
    return "\n\n".join(extract_main_blocks(html_bytes))

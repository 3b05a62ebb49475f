"""RSS / Atom feed extraction: the syndication-format sibling of the HTML
main-content extractor.

Real crawls contain feed documents (Content-Type application/rss+xml /
atom+xml); the DOM-heuristic extractor treats them as tag soup, so feeds
get a dedicated content-type route.  Extraction is regex-framed (item /
entry elements), which survives the malformed XML crawls actually serve —
a strict parser dies on the first undeclared entity.

Output contract mirrors the HTML path: item blocks (title then
summary/description, entity-unescaped, inner tags stripped) joined with
"\\n\\n"; one span per block on page 0.
"""
from __future__ import annotations

import html as _html
import re

_ITEM = re.compile(rb"<(item|entry)[\s>].*?</\1>", re.IGNORECASE | re.DOTALL)
_TITLE = re.compile(rb"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)
_BODY = re.compile(
    rb"<(description|summary|content)[^>]*>(.*?)</\1>",
    re.IGNORECASE | re.DOTALL)
_CDATA = re.compile(rb"<!\[CDATA\[(.*?)\]\]>", re.DOTALL)
_TAG = re.compile(rb"<[^>]+>")


def _clean(raw: bytes) -> str:
    raw = _CDATA.sub(lambda m: m.group(1), raw)
    raw = _TAG.sub(b" ", raw)
    text = raw.decode("utf-8", "replace")
    return " ".join(_html.unescape(text).split())


def is_feed(prefix: bytes) -> bool:
    """Feed detector over a payload prefix: an <rss or <feed root element
    (xhtml also starts with <?xml — the root tag is what disambiguates)."""
    head = prefix.lstrip()[:512].lower()
    return b"<rss" in head or (b"<feed" in head and b"<html" not in head)


_LOC = re.compile(rb"<loc[^>]*>\s*([^<\s][^<]*?)\s*</loc>",
                  re.IGNORECASE | re.DOTALL)


def urls_from_sitemap(payload: bytes) -> list[str]:
    """sitemap.xml (urlset or sitemapindex) -> ordered <loc> urls; the
    crawl-frontier discovery companion of the feed route."""
    return [m.group(1).decode("utf-8", "replace")
            for m in _LOC.finditer(payload)]


def extract_feed_blocks(payload: bytes) -> list[str]:
    """Feed payload -> one text block per item/entry, document order."""
    blocks = []
    for m in _ITEM.finditer(payload):
        item = m.group(0)
        parts = []
        t = _TITLE.search(item)
        if t:
            tt = _clean(t.group(1))
            if tt:
                parts.append(tt)
        b = _BODY.search(item)
        if b:
            bb = _clean(b.group(2))
            if bb:
                parts.append(bb)
        if parts:
            blocks.append("\n".join(parts))
    return blocks

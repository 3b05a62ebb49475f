"""JSON document route: crawled API/endpoint payloads (application/json).

Extraction contract: depth-first walk of the parsed tree, collecting
string LEAF values that look like prose (>= MIN_TEXT_CHARS characters —
filters ids, urls, enum-ish fields), in document order (object keys keep
insertion order, arrays keep element order).  Blocks join with "\\n\\n"
like every other route.  Malformed JSON is a per-row error, never an
exception (section 4.3.5 isolation).
"""
from __future__ import annotations

import json

MIN_TEXT_CHARS = 20


def looks_json(prefix: bytes) -> bool:
    head = prefix.lstrip()[:1]
    return head in (b"{", b"[")


def extract_json_blocks(payload: bytes) -> list[str]:
    doc = json.loads(payload.decode("utf-8", "replace"))
    blocks: list[str] = []

    def walk(node):
        if isinstance(node, str):
            s = node.strip()
            if len(s) >= MIN_TEXT_CHARS:
                blocks.append(" ".join(s.split()))
        elif isinstance(node, dict):
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(doc)
    return blocks

"""URL canonicalization + registered-domain extraction for the pages table.

A crawl corpus keys everything by URL, and raw crawl URLs are noisy:
scheme/host case, default ports, fragments, trailing slashes and tracking
query parameters all create spurious "distinct" documents that defeat
dedup-by-url and skew per-domain quotas.  Canonicalization runs scan-side
(embarrassingly parallel, no shuffle) BEFORE the dedup exchange, so the
same page fetched as ``HTTP://Example.com:80/a/?utm_source=x#frag`` and
``http://example.com/a/`` deduplicates.

Rules (deterministic, order matters):
  1. scheme + host lowercased; default ports (:80 http, :443 https) dropped
  2. fragment dropped
  3. tracking params dropped (utm_*, fbclid, gclid, ref), remaining query
     params sorted by key for a canonical order
  4. duplicate slashes in the path collapsed; trailing slash kept as-is
     (a/ vs a may be different resources — do NOT merge)

Registered domain: last two host labels, extended to three for the common
two-level public suffixes (co.uk-style ccSLDs).  This is a deliberately
self-contained heuristic — the full Public Suffix List is an external
artifact this sandbox doesn't ship; the lookup table is the extension
point and the behavior is pinned by tests.
"""
from __future__ import annotations

import re
from urllib.parse import urlsplit, urlunsplit, parse_qsl, urlencode

import pandas as pd
import pyarrow as pa

_TRACKING = re.compile(r"^(utm_|fbclid$|gclid$|ref$)")
_CC_SLD = {
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "co.za", "com.ar", "com.tr",
}
_DEFAULT_PORT = {"http": ":80", "https": ":443"}


def canonical_url(url: str) -> str:
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    dp = _DEFAULT_PORT.get(scheme)
    if dp and netloc.endswith(dp):
        netloc = netloc[: -len(dp)]
    path = re.sub(r"/{2,}", "/", parts.path) or "/"
    q = [(k, v) for k, v in parse_qsl(parts.query, keep_blank_values=True)
         if not _TRACKING.match(k)]
    query = urlencode(sorted(q))
    return urlunsplit((scheme, netloc, path, query, ""))


def registered_domain(url: str) -> str:
    try:
        host = urlsplit(url).netloc.lower().rsplit("@", 1)[-1]
    except ValueError:
        return ""
    host = host.split(":", 1)[0]
    labels = [x for x in host.split(".") if x]
    if len(labels) < 2:
        return host
    tail2 = ".".join(labels[-2:])
    if tail2 in _CC_SLD and len(labels) >= 3:
        return ".".join(labels[-3:])
    return tail2


_NOINDEX = re.compile(
    rb"""<meta[^>]+name\s*=\s*["']?robots["']?[^>]*content\s*=\s*["'][^"']*\bnoindex\b""",
    re.IGNORECASE)
_NOINDEX_REV = re.compile(  # content= before name= (attribute order varies)
    rb"""<meta[^>]+content\s*=\s*["'][^"']*\bnoindex\b[^>]*name\s*=\s*["']?robots""",
    re.IGNORECASE)


def robots_noindex_batch(batch: pa.Table, html_col: str = "html",
                         head_bytes: int = 4096) -> pa.Table:
    """Scan-side crawl-politeness gate: flags pages whose <head> declares
    ``<meta name="robots" content="... noindex ...">`` (either attribute
    order).  Only the first ``head_bytes`` of each payload cross into
    Python — the meta must appear in <head> to be honored, mirroring how
    indexers treat it.  Adds a ``robots_noindex`` bool column; filtering
    stays the caller's policy decision."""
    import pyarrow.compute as pc

    prefixes = pc.binary_slice(batch.column(html_col), 0,
                               head_bytes).to_pylist()
    flags = [bool(p) and (bool(_NOINDEX.search(p))
                          or bool(_NOINDEX_REV.search(p)))
             for p in prefixes]
    return batch.append_column("robots_noindex",
                               pa.array(flags, pa.bool_()))


_HREF = re.compile(rb"""<a[^>]+href\s*=\s*["']([^"'#][^"']*)["']""",
                   re.IGNORECASE)


def extract_links_batch(batch: pa.Table, url_col: str = "url",
                        html_col: str = "html",
                        max_links_per_page: int = 200) -> pa.Table:
    """(url, html) batch -> (src_domain, dst_domain) edge rows for the
    link graph.  Relative hrefs resolve against the page url; a per-page
    link cap bounds the explode against link-farm pages (the same
    degenerate-bucket defense as the LSH pair cap)."""
    from urllib.parse import urljoin

    srcs, dsts = [], []
    for url, html in zip(batch.column(url_col).to_pylist(),
                         batch.column(html_col).to_pylist()):
        if not html:
            continue
        src_dom = registered_domain(url or "")
        n_page = 0
        for m in _HREF.finditer(html):
            if n_page >= max_links_per_page:
                break
            href = m.group(1).decode("utf-8", "replace")
            target = urljoin(url or "", href)
            dst_dom = registered_domain(target)
            if dst_dom:
                srcs.append(src_dom)
                dsts.append(dst_dom)
                n_page += 1
    return pa.table({"src_domain": pa.array(srcs, pa.string()),
                     "dst_domain": pa.array(dsts, pa.string())})


def canonicalize_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Scan-side stage: adds canonical_url + registered_domain columns."""
    urls = batch.column(url_col).to_pylist()
    canon = [canonical_url(u or "") for u in urls]
    dom = [registered_domain(u or "") for u in urls]
    batch = batch.append_column("canonical_url",
                                pa.array(canon, pa.string()))
    return batch.append_column("registered_domain",
                               pa.array(dom, pa.string()))

"""Dedup-by-url keep-first — THE wide op of the flagship pipeline (G6).

The reference guarantees "no two outputs collide" with a sequential
unique-directory probe (``{name}_01``, ``_02``, ... — reference
file_storage.py:179-190), an arrival-order artifact that cannot exist in a
distributed plan.  The Ray-native equivalent is a hash-shuffle groupby on
``url`` keeping one deterministic winner per group: the earliest
``warc_ts``, tie-broken by full row ordering, so reruns are byte-identical
regardless of block arrival order (SURVEY.md section 7.3 risk 5).

Scale notes: ``groupby("url")`` is an all-to-all exchange of every payload
byte; it is placed BEFORE extraction so duplicate documents are never
OCR'd twice.  url is a high-cardinality key (no hot-key salting needed —
duplicate groups are tiny by construction of a crawl frontier).
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def keep_first_group(group: pa.Table) -> pa.Table:
    idx = pc.sort_indices(
        group, sort_keys=[("warc_ts", "ascending"), ("url", "ascending")]
    )
    return group.take(idx[:1])


def dedup_by_url(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.groupby("url").map_groups(keep_first_group, batch_format="pyarrow")


def dedup_table(tbl: pa.Table) -> pa.Table:
    """Single-node oracle used by tests: identical semantics, no shuffle."""
    idx = pc.sort_indices(
        tbl, sort_keys=[("url", "ascending"), ("warc_ts", "ascending")]
    )
    s = tbl.take(idx)
    urls = s.column("url").to_pylist()
    keep = [i for i, u in enumerate(urls) if i == 0 or u != urls[i - 1]]
    return s.take(keep)

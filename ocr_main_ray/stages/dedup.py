"""Dedup-by-url keep-first — THE wide op of the flagship pipeline (G6).

The reference guarantees "no two outputs collide" with a sequential
unique-directory probe (``{name}_01``, ``_02``, ... — reference
file_storage.py:179-190), an arrival-order artifact that cannot exist in a
distributed plan.  The Ray-native equivalent keeps one deterministic winner
per url: the earliest ``warc_ts`` (ties by full ordering), so reruns are
byte-identical regardless of block arrival order (SURVEY.md section 7.3
risk 5).

Implementation (scale-shaped, and ~1000x cheaper than a per-url
``map_groups``, whose per-group UDF dispatch dominates at high key
cardinality):

1. local pre-dedup: vectorized keep-first per url inside each batch —
   shrinks duplicate mass before anything moves;
2. bucket = crc32(url) % B appended per row (deterministic across
   processes, unlike Python's seeded hash);
3. ``groupby("bucket")`` — the hash shuffle — with B ~ O(cpus), so the
   per-group UDF runs B times on large tables, fully vectorized inside.

At 10^12-document scale B scales with the cluster (e.g. 100k buckets);
url is high-cardinality so buckets balance without salting.
"""
from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _keep_first_sorted(tbl: pa.Table) -> pa.Table:
    """Vectorized keep-first: sort by (url, warc_ts, payload-crc), keep each
    url run's head.  The payload crc32 tiebreak makes the winner
    deterministic even for same-url same-timestamp rows with different
    bytes (arrow sort is stable, so without it the winner would depend on
    shuffle arrival order)."""
    if tbl.num_rows <= 1:
        return tbl
    sort_keys = [("url", "ascending"), ("warc_ts", "ascending")]
    added_tiebreak = False
    if "html" in tbl.column_names:
        crcs = np.fromiter(
            (zlib.crc32(p) if p is not None else 0
             for p in tbl.column("html").to_pylist()),
            dtype=np.int64, count=tbl.num_rows,
        )
        tbl = tbl.append_column("_payload_crc", pa.array(crcs, pa.int64()))
        sort_keys.append(("_payload_crc", "ascending"))
        added_tiebreak = True
    idx = pc.sort_indices(tbl, sort_keys=sort_keys)
    s = tbl.take(idx)
    if added_tiebreak:
        s = s.drop(["_payload_crc"])
    urls = s.column("url")
    first = pc.not_equal(urls.slice(1), urls.slice(0, len(urls) - 1))
    mask = pa.concat_arrays([pa.array([True]), first.combine_chunks()])
    return s.filter(mask)


def _bucket_batch(tbl: pa.Table, num_buckets: int) -> pa.Table:
    tbl = _keep_first_sorted(tbl)  # local pre-dedup before the shuffle
    buckets = np.fromiter(
        (zlib.crc32(u.encode("utf-8")) % num_buckets
         for u in tbl.column("url").to_pylist()),
        dtype=np.int32, count=tbl.num_rows,
    ) if tbl.num_rows else np.empty(0, np.int32)
    return tbl.append_column("bucket", pa.array(buckets, pa.int32()))


def _dedup_bucket(group: pa.Table) -> pa.Table:
    return _keep_first_sorted(group).drop(["bucket"])


def dedup_by_url(ds: "ray.data.Dataset", num_buckets: int | None = None) -> "ray.data.Dataset":
    if num_buckets is None:
        from ..config import cluster_cpus

        num_buckets = max(16, cluster_cpus() * 2)
    ds = ds.map_batches(
        _bucket_batch, fn_kwargs={"num_buckets": num_buckets},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return ds.groupby("bucket").map_groups(_dedup_bucket, batch_format="pyarrow")


def dedup_table(tbl: pa.Table) -> pa.Table:
    """Single-node oracle used by tests and the golden generator: identical
    semantics, no shuffle."""
    return _keep_first_sorted(tbl)

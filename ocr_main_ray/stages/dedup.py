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

import hashlib
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


# ---------------------------------------------------------------------------
# incremental-ingest dedup: filter a NEW batch of documents against an
# already-ingested corpus without re-shuffling the corpus.
# ---------------------------------------------------------------------------

def _content_hash64(t: str) -> np.int64:
    """Full-width 64-bit content key (md5 prefix).  A 32-bit key collides
    with certainty at 10^9+ docs (birthday bound ~77k keys per length
    class); 64 bits keeps the corpus-wide expected false-drop count <<1
    up to ~10^9 and a handful at 10^12."""
    d = hashlib.md5(t.encode("utf-8")).digest()
    return np.int64(int.from_bytes(d[:8], "little", signed=True))


def incremental_new_docs(new_ds: "ray.data.Dataset",
                         seen_hashes: "np.ndarray",
                         text_col: str = "text") -> "ray.data.Dataset":
    """Rows of ``new_ds`` whose content hash is NOT in ``seen_hashes``.

    Scale shape: the historical corpus is represented by its int64 content
    hashes (one pass at ingest time, stored beside the output parquet —
    ~8 bytes/doc, so 10^12 docs is ~8 TB spread across the cluster, and a
    per-node Bloom filter of it is ~2 GB at 16 bits/key).  Here the Bloom
    bits (built once, `functions.sketch.bloom_build`) are broadcast via
    ray.put and every new batch probes them vectorized; only Bloom
    POSITIVES (FP rate ~6e-5) are re-checked exactly against the sorted
    hash array — so the exact check touches ~0 rows when the batch is
    genuinely new.  The key is a full 64-bit content hash (md5 prefix,
    ``_content_hash64``): at 10^12 docs the birthday collision probability
    is ~(10^12)^2 / 2^65 ≈ 2.7e-2 corpus-wide — i.e. a handful of expected
    false drops across a trillion docs, vs the CERTAIN collisions a 32-bit
    key would produce per length class.  For byte-exactness guarantees use
    the full-text ``dedup_by_url`` path instead.
    """
    import ray as _ray

    from ..functions.sketch import bloom_build, bloom_test

    seen_sorted = np.sort(np.asarray(seen_hashes, dtype=np.int64))
    bits_ref = _ray.put(bloom_build(seen_sorted))
    seen_ref = _ray.put(seen_sorted)

    class _Filter:
        def __init__(self):
            self.bits = _ray.get(bits_ref)
            self.seen = _ray.get(seen_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            h = np.fromiter(
                (_content_hash64(t)
                 for t in batch.column(text_col).to_pylist()),
                dtype=np.int64, count=batch.num_rows)
            maybe = bloom_test(self.bits, h)
            exact = np.zeros(len(h), dtype=bool)
            if maybe.any():
                pos = np.searchsorted(self.seen, h[maybe])
                pos = np.clip(pos, 0, len(self.seen) - 1)
                exact[maybe] = self.seen[pos] == h[maybe] if len(self.seen) \
                    else False
            return batch.filter(pa.array(~exact))

    return new_ds.map_batches(_Filter, batch_format="pyarrow",
                              concurrency=(1, 4))


def content_hashes(ds: "ray.data.Dataset", text_col: str = "text") -> "np.ndarray":
    """One distributed pass producing the int64 content-hash array the
    incremental filter consumes (md5-prefix 64-bit — the same key)."""
    def hash_batch(batch: pa.Table) -> pa.Table:
        h = np.fromiter(
            (_content_hash64(t)
             for t in batch.column(text_col).to_pylist()),
            dtype=np.int64, count=batch.num_rows)
        return pa.table({"h": pa.array(h, pa.int64())})

    parts = [b.column("h").to_numpy() for b in
             ds.map_batches(hash_batch, batch_format="pyarrow")
             .iter_batches(batch_size=1 << 20, batch_format="pyarrow")]
    return (np.concatenate(parts) if parts
            else np.empty(0, np.int64))

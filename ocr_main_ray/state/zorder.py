"""Z-order (Morton-curve) clustered export: TWO-dimensional data skipping.

``state/export.py`` lays a table out for one key; many corpus reads
filter on two (domain x crawl-date, size x content-type, user x day).
Sorting by either key alone leaves the other dimension scattered across
every file, so a 2-D box read opens everything.  Interleaving the bits of
both keys (the Morton / Z-order curve) and range-partitioning on THAT
gives every file a tight axis-aligned bounding box in (a, b) space — the
same reason Delta/Iceberg offer OPTIMIZE ZORDER BY.

Layout pipeline: one cheap min-aggregate pass → per-batch vectorized
Morton keys (magic-mask bit spreading, no Python loop) → the same
distributed sort + parallel per-block write + bounding-box manifest shape
as ``sorted_export`` (one tiny metadata row per block crosses the
driver; manifest written last, so a crashed export is invisible).

Restriction: both columns must be integers whose span fits 31 bits
(2^31 ≈ 2.1e9 distinct values per dimension — domain ids, epoch days,
size buckets all qualify); the interleaved key then fits non-negative
int64, which Ray Data sorts natively.
"""
from __future__ import annotations

import hashlib
import json
import os
import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_Z = "__zorder"


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each value: abcd -> 0a0b0c0d."""
    x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def morton2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Interleave two non-negative <2^31 integer arrays into int64 keys."""
    return (_part1by1(a) | (_part1by1(b) << np.uint64(1))).astype(np.int64)


def zorder_export(ds, col_a: str, col_b: str, out_dir: str) -> dict:
    """Cluster ``ds`` on the Z-order curve of (col_a, col_b) and write
    range-partitioned files plus a ``_ZORDER.json`` manifest holding each
    file's (a, b) bounding box.  Returns the manifest dict."""
    mins = ds.min([col_a, col_b])
    a0 = int(mins[f"min({col_a})"])
    b0 = int(mins[f"min({col_b})"])

    def add_z(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column(col_a), pa.int64()).to_numpy() - a0
        b = pc.cast(t.column(col_b), pa.int64()).to_numpy() - b0
        if len(a) and (a.max() >= 1 << 31 or b.max() >= 1 << 31):
            raise ValueError("zorder_export: column span exceeds 31 bits")
        return t.append_column(_Z, pa.array(morton2(a, b)))

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        empty = pa.table({"file": pa.array([], pa.string()),
                          "rows": pa.array([], pa.int64()),
                          "a_min": pa.array([], pa.int64()),
                          "a_max": pa.array([], pa.int64()),
                          "b_min": pa.array([], pa.int64()),
                          "b_max": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        body = batch.drop_columns([_Z])
        amin = pc.min(body.column(col_a)).as_py()
        amax = pc.max(body.column(col_a)).as_py()
        bmin = pc.min(body.column(col_b)).as_py()
        bmax = pc.max(body.column(col_b)).as_py()
        # Name = hash of the block's CONTENT (normalized IPC bytes), not
        # just its bbox + row count: two sorted blocks with identical bbox
        # and size (low-cardinality dims, uniform block sizes) must never
        # share a filename — a bbox-only tag let the second os.replace
        # silently clobber the first while the manifest listed the name
        # twice.  Content-equal blocks MAY share a name safely: the file
        # then holds exactly the rows either block contributes, and the
        # manifest's duplicate entries read back the identical content.
        norm = body.take(pa.array(range(body.num_rows), pa.int64()))
        norm = norm.combine_chunks()
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, norm.schema) as writer:
            writer.write_table(norm)
        tag = hashlib.blake2b(sink.getvalue().to_pybytes(),
                              digest_size=8).hexdigest()
        name = f"zpart-{tag}.parquet"
        # unique tmp per writer: concurrent tasks that DO share a content
        # name (identical blocks) must not interleave on one tmp path
        tmp = out / f"{name}.{os.getpid()}-{id(batch):x}.tmp"
        pq.write_table(body, tmp)
        os.replace(tmp, out / name)
        return pa.table({"file": pa.array([name], pa.string()),
                         "rows": pa.array([batch.num_rows], pa.int64()),
                         "a_min": pa.array([amin], pa.int64()),
                         "a_max": pa.array([amax], pa.int64()),
                         "b_min": pa.array([bmin], pa.int64()),
                         "b_max": pa.array([bmax], pa.int64())})

    meta = (ds.map_batches(add_z, batch_format="pyarrow")
            .sort(_Z)
            .map_batches(write_block, batch_size=None,
                         batch_format="pyarrow")
            .to_pandas())  # one row per block — tiny
    meta = meta.sort_values(["a_min", "b_min"])
    files = [{"file": r.file, "rows": int(r.rows),
              "a_min": int(r.a_min), "a_max": int(r.a_max),
              "b_min": int(r.b_min), "b_max": int(r.b_max)}
             for r in meta.itertuples()]
    manifest = {"col_a": col_a, "col_b": col_b, "files": files,
                "total_rows": int(sum(f["rows"] for f in files))}
    tmp = out / "_ZORDER.json.tmp"
    tmp.write_text(json.dumps(manifest, indent=1))
    os.replace(tmp, out / "_ZORDER.json")
    # Re-export into a non-empty dir: zparts from a PREVIOUS export that
    # the new manifest doesn't reference are now orphans — unreachable via
    # read_box but visible to any *.parquet glob consumer and leaking
    # storage.  Deleting them AFTER the manifest rename keeps the crash
    # story intact: die earlier and the old manifest + old files are still
    # a complete consistent export.  Leftover writer tmps are swept too.
    live = {f["file"] for f in files}
    for p in out.glob("zpart-*.parquet"):
        if p.name not in live:
            p.unlink(missing_ok=True)
    for p in out.glob("zpart-*.tmp"):
        p.unlink(missing_ok=True)
    return manifest


def plan_box(out_dir: str, a_lo: int, a_hi: int,
             b_lo: int, b_hi: int) -> list[str]:
    """Files whose bounding box intersects the closed query box — the
    pruning decision, exposed for audit/testing."""
    manifest = json.loads(
        (pathlib.Path(out_dir) / "_ZORDER.json").read_text())
    return [f["file"] for f in manifest["files"]
            if not (f["a_max"] < a_lo or f["a_min"] > a_hi
                    or f["b_max"] < b_lo or f["b_min"] > b_hi)]


def read_box(out_dir: str, a_lo: int, a_hi: int,
             b_lo: int, b_hi: int) -> pa.Table:
    """2-D box read: open only bounding-box hits, exact-filter inside."""
    out = pathlib.Path(out_dir)
    manifest = json.loads((out / "_ZORDER.json").read_text())
    ca, cb = manifest["col_a"], manifest["col_b"]
    tabs = []
    for name in plan_box(out_dir, a_lo, a_hi, b_lo, b_hi):
        t = pq.read_table(out / name)
        keep = pc.and_(
            pc.and_(pc.greater_equal(t.column(ca), a_lo),
                    pc.less_equal(t.column(ca), a_hi)),
            pc.and_(pc.greater_equal(t.column(cb), b_lo),
                    pc.less_equal(t.column(cb), b_hi)))
        tabs.append(t.filter(keep))
    if not tabs:
        return pa.table({})
    return pa.concat_tables(tabs)

"""Globally-sorted, range-partitioned parquet export.

The flagship sink (``state/manifest.py``) hive-partitions by
(content_type, size_bucket) for OCR-cost skew; THIS module is the other
corpus layout a 100-TB pipeline needs: the whole table globally sorted by
one key (url / doc_id / content hash) and written as range-partitioned
files whose per-file [min, max] key ranges are disjoint.  That layout is
what makes downstream merge joins, binary-search point lookups and
footer-statistics range pruning (``state/delete.py``) cheap: a reader
probing a key range opens exactly the files whose range overlaps it.

Scale shape: ``Dataset.sort`` is Ray Data's distributed range-partitioned
sort — it samples key boundaries and range-shuffles blocks (one
all-to-all, the honest and unavoidable exchange for a global sort),
leaving every block internally sorted with pairwise-disjoint key ranges.
The write is therefore embarrassingly parallel: each worker writes its
own block to its own file (atomic temp + rename) and returns ONE tiny
metadata row (file, rows, key_min, key_max); only those rows reach the
driver, which orders them by key_min into the ``_RANGES.json`` manifest.
File ordering lives in the manifest, not the filenames, so no global
block index is needed and no row ever crosses the driver.

The reference has no sorted-export concept (its storage is one directory
per document, file_storage.py:40-81); this is an added training-data-ops
capability.
"""
from __future__ import annotations

import hashlib
import json
import os
import pathlib

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _block_writer(out: pathlib.Path, key: str):
    def write_block(batch: pa.Table) -> pa.Table:
        empty = pa.table({"file": pa.array([], pa.string()),
                          "rows": pa.array([], pa.int64()),
                          "key_min": pa.array([], batch.schema.field(key).type
                                              if key in batch.column_names
                                              else pa.int64()),
                          "key_max": pa.array([], batch.schema.field(key).type
                                              if key in batch.column_names
                                              else pa.int64())})
        if batch.num_rows == 0:
            return empty
        col = batch.column(key)
        lo, hi = col[0].as_py(), col[-1].as_py()
        kmin, kmax = (lo, hi) if lo <= hi else (hi, lo)
        # Filename uniqueness comes from the block's CONTENT (normalized
        # IPC bytes), order from the manifest: a (range, rowcount)-only
        # tag collided for two sorted blocks sharing a key range and size
        # (heavy duplicate keys, uniform block sizes — the bug class the
        # round-3 review caught in zorder.py), letting the second
        # os.replace silently clobber the first.  Content-equal blocks MAY
        # share a name safely: duplicate manifest entries then read back
        # identical content.
        norm = batch.take(pa.array(range(batch.num_rows), pa.int64()))
        norm = norm.combine_chunks()
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, norm.schema) as writer:
            writer.write_table(norm)
        tag = hashlib.blake2b(sink.getvalue().to_pybytes(),
                              digest_size=8).hexdigest()
        name = f"part-{tag}.parquet"
        # unique tmp per writer (concurrent identical blocks share a name)
        tmp = out / f"{name}.{os.getpid()}-{id(batch):x}.tmp"
        pq.write_table(batch, tmp)
        os.replace(tmp, out / name)
        return pa.table({"file": pa.array([name], pa.string()),
                         "rows": pa.array([batch.num_rows], pa.int64()),
                         "key_min": pa.array([kmin], col.type),
                         "key_max": pa.array([kmax], col.type)})

    return write_block


def sorted_export(ds, key: str, out_dir: str, descending: bool = False) -> dict:
    """Sort ``ds`` globally by ``key`` and write one parquet file per
    sorted block, in parallel from the workers.  Writes a
    ``_RANGES.json`` manifest recording each file's (rows, key_min,
    key_max) in key order so readers can range-prune without touching
    parquet footers.

    Returns the manifest dict.  Atomicity: data files are written to
    glob-invisible ``*.parquet.tmp`` names and renamed; the manifest is
    written LAST — a crashed export never leaves a readable-but-
    incomplete directory (no ``_RANGES.json`` == no export).
    """
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    meta = (ds.sort(key, descending=descending)
            .map_batches(_block_writer(out, key), batch_size=None,
                         batch_format="pyarrow")
            .to_pandas())  # one row PER BLOCK — tiny
    meta = meta.sort_values("key_min", ascending=True)

    def _json_safe(v):
        # int and string keys round-trip through JSON losslessly (the
        # supported key types); anything else degrades to str and
        # read_key_range documents the restriction.
        return v.item() if hasattr(v, "item") else v

    files = [{"file": r.file, "rows": int(r.rows),
              "key_min": _json_safe(r.key_min), "key_max": _json_safe(r.key_max)}
             for r in meta.itertuples()]
    manifest = {"key": key, "descending": descending, "files": files,
                "total_rows": int(sum(f["rows"] for f in files))}
    tmp = out / "_RANGES.json.tmp"
    tmp.write_text(json.dumps(manifest, indent=1, default=str))
    os.replace(tmp, out / "_RANGES.json")
    # sweep parts orphaned by a previous export into this directory plus
    # leftover writer tmps (same rule as zorder_export; deleting only
    # AFTER the manifest rename keeps the crash story intact)
    live = {f["file"] for f in files}
    for p in out.glob("part-*.parquet"):
        if p.name not in live:
            p.unlink(missing_ok=True)
    for p in out.glob("part-*.tmp"):
        p.unlink(missing_ok=True)
    return manifest


def read_key_range(out_dir: str, lo, hi) -> pa.Table:
    """Point/range lookup against a ``sorted_export`` directory: open ONLY
    the files whose manifest range overlaps the closed interval
    [lo, hi] — the cheap-read payoff of the sorted layout."""
    out = pathlib.Path(out_dir)
    manifest = json.loads((out / "_RANGES.json").read_text())
    key = manifest["key"]
    tabs = []
    for f in manifest["files"]:
        if f["key_max"] < lo or f["key_min"] > hi:
            continue
        t = pq.read_table(out / f["file"])
        keep = pc.and_(pc.greater_equal(t.column(key), lo),
                       pc.less_equal(t.column(key), hi))
        tabs.append(t.filter(keep))
    if not tabs:
        return pa.table({})
    return pa.concat_tables(tabs)

"""Keyed upsert (Delta-style MERGE) for the partitioned Parquet store —
the third partition-maintenance primitive next to ``delete_keys`` and
``compact_dir`` (state/delete.py).

Semantics: rows in the incoming table REPLACE existing rows with the same
key; unseen keys are appended.  At 100 TB this must be partition-local and
crash-recoverable, so the plan is:

1. **append first** — the incoming batch lands as ONE new part file whose
   name is derived from its own content hash, written via the glob-
   invisible temp + atomic rename discipline;
2. **then delete** the superseded keys from the OLD files only (footer-
   statistics pruning via ``delete_keys``'s machinery — untouched files
   are never opened), explicitly excluding the file written in step 1.

Crash window: dying between (1) and (2) leaves BOTH versions on disk —
never data loss — and re-running the SAME upsert heals it: the content-
derived filename makes step 1 a no-op and step 2 re-deletes.  Upsert is
therefore idempotent under retry, which is the property a driver-side
resume loop needs.

The reference engine overwrites whole files per upload (file_storage.py);
keyed row-level upsert is an added training-data-ops capability (refreshed
crawls re-deliver updated pages under the same url/key).
"""
from __future__ import annotations

import os
import pathlib
import zlib

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .delete import (_file_may_contain, _rewrite_one, _sweep_stale_tmps,
                     _tmp_path)


def _content_name(table: pa.Table, key_col: str) -> str:
    """Filename derived from the FULL logical content of the batch (every
    column, not just the key): retrying the identical upsert maps to the
    same name (idempotence), while re-upserting the same keys with UPDATED
    values — the module's stated use case, refreshed crawls re-delivering
    the same urls — gets a fresh name and merges normally instead of
    tripping the exists-with-different-content guard.

    The hash is slice/chunk-normalized: ``table.take`` materializes a
    compacted offset-0 copy, ``combine_chunks`` collapses it to one chunk,
    and the CRC runs over the Arrow IPC stream bytes of that — so a retry
    batch arriving sliced or differently chunked still hashes identically.
    Remaining 2^-32 collisions are caught by the exists check."""
    del key_col  # kept in the signature for call-site clarity
    norm = table.take(pa.array(range(table.num_rows), pa.int64()))
    norm = norm.combine_chunks()
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, norm.schema) as writer:
        writer.write_table(norm)
    crc = zlib.crc32(sink.getvalue())
    return f"upsert-{crc:08x}-{table.num_rows}.parquet"


def upsert_table(data_dir: str, table: pa.Table,
                 key_col: str = "doc_id") -> dict:
    """MERGE ``table`` into the parquet files under ``data_dir`` by
    ``key_col``: matching keys are replaced, new keys inserted.

    ``table`` must have unique keys (ambiguous merges are an error, not a
    silent last-wins).  Returns an audit dict."""
    if table.num_rows == 0:
        return {"rows_inserted": 0, "rows_replaced": 0,
                "files_rewritten": 0, "files_pruned": 0, "out_file": None}
    keys = table.column(key_col)
    n_unique = len(pc.unique(keys))
    if n_unique != table.num_rows:
        raise ValueError(
            f"incoming table has {table.num_rows - n_unique} duplicate "
            f"{key_col!r} keys — upsert requires one row per key")
    root = pathlib.Path(data_dir)
    root.mkdir(parents=True, exist_ok=True)
    _sweep_stale_tmps(root)

    # phase 1: append (atomic, content-named, idempotent under retry)
    out = root / _content_name(table, key_col)
    if out.exists():
        prev = pq.read_table(out)
        if not prev.equals(table):
            raise FileExistsError(
                f"{out} exists with different content — content-name "
                f"collision; remove or rename the stale file")
    else:
        tmp = _tmp_path(out)
        pq.write_table(table, tmp)
        os.replace(tmp, out)  # atomic on POSIX

    # phase 2: delete superseded keys from the OLD files only
    key_list = sorted(pc.unique(keys).to_pylist())
    keys_arr = pa.array(key_list)
    records, pruned = [], 0
    for f in sorted(root.rglob("*.parquet")):
        if f == out:
            continue
        if not _file_may_contain(f, key_col, key_list):
            pruned += 1
            continue
        records.append(_rewrite_one(f, key_col, keys_arr))
    replaced = sum(r["rows_before"] - r["rows_after"] for r in records)
    return {
        "rows_inserted": table.num_rows - replaced,
        "rows_replaced": replaced,
        "files_rewritten": sum(1 for r in records if r["rewritten"]),
        "files_pruned": pruned,
        "out_file": str(out),
        "records": records,
    }

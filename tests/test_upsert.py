"""Keyed upsert (state/upsert.py): replace-or-insert semantics, retry
idempotence (the crash-window healing path), footer pruning, and the
duplicate-key guard."""
import pathlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_main_ray.state.upsert import upsert_table


def _seed(root: pathlib.Path):
    root.mkdir(parents=True, exist_ok=True)
    pq.write_table(pa.table({"doc_id": pa.array(range(0, 10), pa.int64()),
                             "v": pa.array([f"old{i}" for i in range(10)])}),
                   root / "part-0.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(range(10, 20), pa.int64()),
                             "v": pa.array([f"old{i}" for i in range(10, 20)])}),
                   root / "part-1.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(range(1000, 1010), pa.int64()),
                             "v": pa.array([f"old{i}" for i in range(1000, 1010)])}),
                   root / "part-far.parquet")


def _read_all(root):
    import pyarrow.dataset as pds
    t = pds.dataset(str(root)).to_table()
    return dict(zip(t.column("doc_id").to_pylist(), t.column("v").to_pylist()))


def _batch():
    return pa.table({"doc_id": pa.array([5, 15, 100], pa.int64()),
                     "v": pa.array(["new5", "new15", "new100"])})


def test_upsert_replaces_and_inserts(tmp_path):
    _seed(tmp_path)
    audit = upsert_table(str(tmp_path), _batch())
    assert audit["rows_replaced"] == 2 and audit["rows_inserted"] == 1
    got = _read_all(tmp_path)
    assert len(got) == 31  # 30 seeded + 1 inserted
    assert got[5] == "new5" and got[15] == "new15" and got[100] == "new100"
    assert got[6] == "old6"  # neighbors untouched


def test_upsert_footer_pruning_skips_far_file(tmp_path):
    _seed(tmp_path)
    before = (tmp_path / "part-far.parquet").stat().st_mtime_ns
    audit = upsert_table(str(tmp_path), _batch())
    assert audit["files_pruned"] >= 1
    assert (tmp_path / "part-far.parquet").stat().st_mtime_ns == before


def test_upsert_retry_is_idempotent(tmp_path):
    _seed(tmp_path)
    upsert_table(str(tmp_path), _batch())
    audit2 = upsert_table(str(tmp_path), _batch())
    got = _read_all(tmp_path)
    assert len(got) == 31 and got[5] == "new5"
    # second run found nothing left to replace and re-used the same file
    assert audit2["rows_replaced"] == 0


def test_upsert_heals_crash_between_append_and_delete(tmp_path):
    """Simulate dying after phase 1: the content-named file exists but the
    old rows were never deleted -> both versions visible.  Retrying the
    same upsert must converge to exactly-once."""
    _seed(tmp_path)
    full = upsert_table(str(tmp_path), _batch())
    crash_file = pathlib.Path(full["out_file"])
    # reconstruct the crash state: restore old rows, keep the new file
    pq.write_table(
        pa.table({"doc_id": pa.array(range(0, 10), pa.int64()),
                  "v": pa.array([f"old{i}" for i in range(10)])}),
        tmp_path / "part-0.parquet")
    assert crash_file.exists()
    upsert_table(str(tmp_path), _batch())  # the retry
    got = _read_all(tmp_path)
    assert len(got) == 31 and got[5] == "new5" and got[3] == "old3"


def test_upsert_rejects_duplicate_keys(tmp_path):
    _seed(tmp_path)
    dup = pa.table({"doc_id": pa.array([7, 7], pa.int64()),
                    "v": pa.array(["a", "b"])})
    with pytest.raises(ValueError, match="duplicate"):
        upsert_table(str(tmp_path), dup)


def test_upsert_same_keys_updated_values_merges(tmp_path):
    """The module's stated use case: a refreshed crawl re-delivers the SAME
    key set with updated values.  This must merge (fresh content-derived
    filename), not raise FileExistsError — the round-3 ADVICE repro."""
    _seed(tmp_path)
    upsert_table(str(tmp_path), _batch())
    updated = pa.table({"doc_id": pa.array([5, 15, 100], pa.int64()),
                        "v": pa.array(["newer5", "newer15", "newer100"])})
    audit = upsert_table(str(tmp_path), updated)  # must not raise
    assert audit["rows_replaced"] == 3 and audit["rows_inserted"] == 0
    got = _read_all(tmp_path)
    assert len(got) == 31
    assert got[5] == "newer5" and got[100] == "newer100"


def test_upsert_retry_name_is_slice_and_chunk_invariant(tmp_path):
    """A logically identical retry batch arriving sliced or differently
    chunked must map to the SAME content name (true retry idempotence),
    not a duplicate append."""
    _seed(tmp_path)
    first = upsert_table(str(tmp_path), _batch())
    wide = pa.table({"doc_id": pa.array([999, 5, 15, 100], pa.int64()),
                     "v": pa.array(["pad", "new5", "new15", "new100"])})
    sliced = wide.slice(1, 3)  # same logical rows, nonzero offset
    chunked = pa.concat_tables([_batch().slice(0, 1), _batch().slice(1, 2)])
    for variant in (sliced, chunked):
        audit = upsert_table(str(tmp_path), variant)
        assert audit["out_file"] == first["out_file"]
    assert len(_read_all(tmp_path)) == 31


def test_upsert_empty_batch_noop(tmp_path):
    _seed(tmp_path)
    audit = upsert_table(
        str(tmp_path),
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "v": pa.array([], pa.string())}))
    assert audit["rows_inserted"] == 0 and audit["out_file"] is None
    assert len(_read_all(tmp_path)) == 30

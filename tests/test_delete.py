"""Targeted deletion / compaction (state/delete.py): partition-local
rewrites, footer-statistics pruning, atomicity of untouched files."""
import pathlib

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_main_ray.state.delete import delete_keys


def _write_parts(root: pathlib.Path):
    # three "partitions" with disjoint doc_id ranges -> footer stats prune
    for lo, name in [(0, "a"), (1000, "b"), (2000, "c")]:
        d = root / f"part={name}"
        d.mkdir(parents=True)
        t = pa.table({"doc_id": pa.array(range(lo, lo + 100), pa.int64()),
                      "text": pa.array([f"doc {i}" for i in range(100)])})
        pq.write_table(t, d / "data.parquet")


def test_delete_rewrites_only_hit_partitions(tmp_path):
    _write_parts(tmp_path)
    before = {p: p.stat().st_mtime_ns
              for p in tmp_path.rglob("*.parquet")}
    audit = delete_keys(str(tmp_path), [1005, 1010, 2099])
    assert audit["files_scanned"] == 3
    assert audit["files_pruned"] == 1          # part=a never read
    assert audit["files_rewritten"] == 2
    assert audit["rows_removed"] == 3
    # untouched partition file is bit-identical (same inode mtime)
    a_file = next(tmp_path.glob("part=a/*.parquet"))
    assert a_file.stat().st_mtime_ns == before[a_file]
    # deleted ids are gone, everything else intact
    left = pq.read_table(tmp_path / "part=b" / "data.parquet")
    ids = set(left.column("doc_id").to_pylist())
    assert 1005 not in ids and 1010 not in ids and len(ids) == 98
    c = pq.read_table(tmp_path / "part=c" / "data.parquet")
    assert 2099 not in set(c.column("doc_id").to_pylist())


def test_delete_no_hits_rewrites_nothing(tmp_path):
    _write_parts(tmp_path)
    audit = delete_keys(str(tmp_path), [99999])
    assert audit["files_rewritten"] == 0
    assert audit["rows_removed"] == 0


def test_delete_empty_keys(tmp_path):
    _write_parts(tmp_path)
    audit = delete_keys(str(tmp_path), [])
    assert audit == {"files_scanned": 0, "files_pruned": 0,
                     "files_rewritten": 0, "rows_removed": 0, "records": []}


def test_delete_within_range_but_absent(tmp_path):
    # key inside a file's [min,max] but not present: file is read, found
    # clean, NOT rewritten (no churn)
    _write_parts(tmp_path)
    audit = delete_keys(str(tmp_path), [1000])  # present -> removed
    assert audit["rows_removed"] == 1
    audit2 = delete_keys(str(tmp_path), [1000])  # now absent, range hits
    assert audit2["rows_removed"] == 0
    assert audit2["files_rewritten"] == 0


def test_delete_cli_roundtrip(tmp_path):
    import json
    import subprocess
    import sys

    _write_parts(tmp_path)
    r = subprocess.run(
        [sys.executable, "-m", "ocr_main_ray.cli", "delete",
         str(tmp_path), "5,1001"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout)
    assert out["status"] == "ok" and out["rows_removed"] == 2


def test_delete_cli_rejects_mixed_key_types(tmp_path, capsys):
    from ocr_main_ray.cli import main

    _write_parts(tmp_path)
    rc = main(["delete", str(tmp_path), "12,abc"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "mixed key types" in err
    rc = main(["delete", str(tmp_path), ","])
    assert rc == 1


def test_compact_merges_small_files(tmp_path):
    from ocr_main_ray.state.delete import compact_dir

    d = tmp_path / "part=a"
    d.mkdir(parents=True)
    for i in range(5):
        pq.write_table(pa.table({
            "doc_id": pa.array(range(i * 10, i * 10 + 10), pa.int64())}),
            d / f"f{i}.parquet")
    big = tmp_path / "part=b"
    big.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array(range(10_000), pa.int64())}),
                   big / "big.parquet")
    audit = compact_dir(str(tmp_path), target_rows=100)
    assert audit["partitions_compacted"] == 1
    assert audit["files_merged"] == 5
    files = sorted(d.glob("*.parquet"))
    assert len(files) == 1
    t = pq.read_table(files[0])
    assert sorted(t.column("doc_id").to_pylist()) == list(range(50))
    assert (big / "big.parquet").exists()  # untouched partition


def test_compact_leaves_singletons(tmp_path):
    from ocr_main_ray.state.delete import compact_dir

    d = tmp_path / "part=x"
    d.mkdir(parents=True)
    pq.write_table(pa.table({"doc_id": pa.array([1], pa.int64())}),
                   d / "only.parquet")
    audit = compact_dir(str(tmp_path))
    assert audit["files_merged"] == 0


def test_recompaction_never_loses_rows(tmp_path):
    """Regression: a second compaction whose new small files sort BEFORE a
    previous compact-00000.parquet must not overwrite it — output names are
    verified absent (or group members) before the rename."""
    from ocr_main_ray.state.delete import compact_dir

    d = tmp_path / "part=a"
    d.mkdir(parents=True)
    for i in range(4):
        pq.write_table(pa.table({
            "doc_id": pa.array(range(i * 10, i * 10 + 10), pa.int64())}),
            d / f"f{i}.parquet")
    compact_dir(str(tmp_path), target_rows=100)   # -> one compact-*.parquet
    # new small appends that sort BEFORE "compact-..." in name order
    for i in range(3):
        pq.write_table(pa.table({
            "doc_id": pa.array(range(100 + i * 10, 110 + i * 10), pa.int64())}),
            d / f"append-{i}.parquet")
    compact_dir(str(tmp_path), target_rows=25)    # groups split; old file in a later group
    got = sorted(sum((pq.read_table(f).column("doc_id").to_pylist()
                      for f in d.glob("*.parquet")), []))
    assert got == list(range(40)) + list(range(100, 130))


def test_stale_tmp_invisible_and_swept(tmp_path):
    """A crashed rewrite's temp must not match *.parquet globs and must be
    cleaned up by the next maintenance pass."""
    from ocr_main_ray.state.delete import compact_dir

    _write_parts(tmp_path)
    stale = tmp_path / "part=a" / "data.parquet.tmp"
    pq.write_table(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                             "text": pa.array(["x", "y"])}), stale)
    assert stale not in set(tmp_path.rglob("*.parquet"))
    audit = delete_keys(str(tmp_path), [0])
    assert audit["files_scanned"] == 3            # stale tmp never counted
    assert not stale.exists()                     # swept at pass start
    stale2 = tmp_path / "part=b" / "data.parquet.tmp"
    stale2.write_bytes(b"garbage half-written")
    compact_dir(str(tmp_path))
    assert not stale2.exists()


def test_content_hash_is_64_bit():
    """Regression: crc32("plumless") == crc32("buckeroo") (same length) —
    the old 32-bit-per-length-class key silently dropped one of them."""
    from ocr_main_ray.stages.dedup import _content_hash64

    assert _content_hash64("plumless") != _content_hash64("buckeroo")
    assert _content_hash64("a") == _content_hash64("a")  # deterministic

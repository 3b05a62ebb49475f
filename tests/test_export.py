"""sorted_export: global sort + range-partitioned files + manifest pruning."""
import json
import pathlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from ocr_main_ray.state.export import read_key_range, sorted_export

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_sorted_export_global_order_and_disjoint_ranges(tmp_path):
    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "n_chars"]).repartition(7)
    man = sorted_export(ds, "doc_id", str(tmp_path / "out"))

    assert man["total_rows"] == 500
    assert len(man["files"]) >= 2  # actually range-partitioned

    # manifest ranges: each file's [min, max] honest and pairwise ordered
    prev_max = None
    all_ids = []
    for f in man["files"]:
        t = pq.read_table(tmp_path / "out" / f["file"])
        ids = t.column("doc_id").to_pylist()
        assert ids == sorted(ids)              # sorted WITHIN the file
        assert ids[0] == f["key_min"] and ids[-1] == f["key_max"]
        if prev_max is not None:
            assert f["key_min"] >= prev_max    # ordered ACROSS files
        prev_max = f["key_max"]
        all_ids.extend(ids)
    assert all_ids == sorted(all_ids)          # global order, no loss
    assert sorted(all_ids) == list(range(500))

    # manifest written last; no stray temp files remain
    assert (tmp_path / "out" / "_RANGES.json").exists()
    assert not list((tmp_path / "out").glob("*.tmp"))


@pytest.mark.usefixtures("ray_session")
def test_read_key_range_prunes_and_filters(tmp_path):
    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "n_chars"]).repartition(7)
    sorted_export(ds, "doc_id", str(tmp_path / "out"))
    man = json.loads((tmp_path / "out" / "_RANGES.json").read_text())

    got = read_key_range(str(tmp_path / "out"), 100, 149)
    ids = sorted(got.column("doc_id").to_pylist())
    assert ids == list(range(100, 150))

    # pruning is real: a 1-key probe must touch fewer files than exist
    n_overlap = sum(1 for f in man["files"]
                    if not (f["key_max"] < 7 or f["key_min"] > 7))
    assert n_overlap < len(man["files"])
    one = read_key_range(str(tmp_path / "out"), 7, 7)
    assert one.column("doc_id").to_pylist() == [7]

    # empty probe beyond the domain
    assert read_key_range(str(tmp_path / "out"), 10_000, 20_000).num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_sorted_export_descending(tmp_path):
    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id"]).repartition(5)
    man = sorted_export(ds, "doc_id", str(tmp_path / "out"), descending=True)
    assert man["descending"] is True
    # manifest files are ALWAYS listed ascending by key_min (range-pruning
    # order); within each file rows follow the requested descending order
    f0 = man["files"][0]
    t = pq.read_table(tmp_path / "out" / f0["file"])
    ids = t.column("doc_id").to_pylist()
    assert ids == sorted(ids, reverse=True)
    assert f0["key_min"] == min(ids) and f0["key_max"] == max(ids)
    assert man["total_rows"] == 500


@pytest.mark.usefixtures("ray_session")
def test_sorted_export_duplicate_key_blocks_do_not_collide(tmp_path):
    """Same bug class the round-3 review caught in zorder: a constant key
    gives every sorted block an identical (key_min, key_max); with uniform
    block sizes a range-only filename tag collided and the second
    os.replace clobbered the first.  Content-derived names must keep every
    row readable."""
    import numpy as np
    import ray.data as rd

    n = 4096
    t = pa.table({"k": pa.array(np.full(n, 42, np.int64())),
                  "v": pa.array(np.arange(n))})
    ds = rd.from_arrow([t.slice(i * 512, 512) for i in range(8)])
    manifest = sorted_export(ds, "k", str(tmp_path))
    assert manifest["total_rows"] == n
    got = read_key_range(str(tmp_path), 42, 42)
    assert got.num_rows == n
    assert sorted(got.column("v").to_pylist()) == list(range(n))


@pytest.mark.usefixtures("ray_session")
def test_sorted_export_reexport_removes_orphans(tmp_path):
    import numpy as np
    import ray.data as rd

    mk = lambda lo: pa.table({"k": pa.array(np.arange(lo, lo + 2048)),
                              "v": pa.array(np.arange(2048))})
    sorted_export(rd.from_arrow(mk(0)), "k", str(tmp_path))
    m2 = sorted_export(rd.from_arrow(mk(10_000)), "k", str(tmp_path))
    on_disk = sorted(p.name for p in tmp_path.glob("part-*.parquet"))
    assert on_disk == sorted({f["file"] for f in m2["files"]})
    assert read_key_range(str(tmp_path), 0, 2048).num_rows == 0
    assert read_key_range(str(tmp_path), 10_000, 12_047).num_rows == 2048

"""Z-order clustered export: Morton-key correctness, box-read exactness,
and the data-skipping payoff (a small box opens few files)."""
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from ocr_main_ray.state.zorder import (morton2, plan_box, read_box,
                                       zorder_export)


def test_morton2_interleaves_bits():
    a = np.array([0, 1, 0, 1, 2, 3], np.int64)
    b = np.array([0, 0, 1, 1, 2, 3], np.int64)
    # z = bits of a at even positions, b at odd: (a,b)=(1,0)->1, (0,1)->2,
    # (1,1)->3, (2,2)->12, (3,3)->15
    assert morton2(a, b).tolist() == [0, 1, 2, 3, 12, 15]


def test_morton2_locality_monotone_blocks():
    # quadrant property: all of [0,1]x[0,1] sorts before anything with a
    # coordinate >= 2
    lo = [morton2(np.array([x]), np.array([y]))[0]
          for x in (0, 1) for y in (0, 1)]
    hi = morton2(np.array([2]), np.array([0]))[0]
    assert max(lo) < hi


@pytest.mark.usefixtures("ray_session")
def test_zorder_export_box_read_exact_and_pruned(tmp_path):
    rng = np.random.default_rng(5)
    n = 4096
    a = rng.integers(0, 64, n).astype(np.int64)
    b = rng.integers(0, 64, n).astype(np.int64)
    v = np.arange(n)
    tables = [pa.table({"a": pa.array(a[i::8]), "b": pa.array(b[i::8]),
                        "v": pa.array(v[i::8])}) for i in range(8)]
    ds = rd.from_arrow(tables)
    manifest = zorder_export(ds, "a", "b", str(tmp_path))
    assert manifest["total_rows"] == n
    n_files = len(manifest["files"])
    assert n_files >= 4  # sorted into multiple range files

    got = read_box(str(tmp_path), 10, 20, 30, 40)
    mask = (a >= 10) & (a <= 20) & (b >= 30) & (b <= 40)
    assert got.num_rows == int(mask.sum())
    assert sorted(got.column("v").to_pylist()) == sorted(v[mask].tolist())

    # data skipping: an 8x8 box must prune most of the files
    opened = plan_box(str(tmp_path), 16, 23, 16, 23)
    assert 0 < len(opened) < n_files
    # empty box off the grid opens nothing
    assert plan_box(str(tmp_path), 100, 200, 100, 200) == []
    assert read_box(str(tmp_path), 100, 200, 100, 200).num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_zorder_identical_bbox_blocks_do_not_collide(tmp_path):
    """Round-3 ADVICE repro: constant (a, b) gives every sorted block the
    SAME bounding box; with uniform block sizes a bbox-only filename tag
    collided and the second os.replace silently clobbered the first.
    Content-derived names must keep every row readable."""
    n = 4096
    t = pa.table({"a": pa.array(np.full(n, 7, np.int64())),
                  "b": pa.array(np.full(n, 9, np.int64())),
                  "v": pa.array(np.arange(n))})
    ds = rd.from_arrow([t.slice(i * 512, 512) for i in range(8)])
    manifest = zorder_export(ds, "a", "b", str(tmp_path))
    assert manifest["total_rows"] == n
    got = read_box(str(tmp_path), 7, 7, 9, 9)
    assert got.num_rows == n
    assert sorted(got.column("v").to_pylist()) == list(range(n))


@pytest.mark.usefixtures("ray_session")
def test_zorder_reexport_removes_orphan_zparts(tmp_path):
    """Exporting into a dir that already holds a previous export must not
    leave stale zpart files orphaned (unreferenced by the new manifest but
    visible to *.parquet globs)."""
    rng = np.random.default_rng(11)
    mk = lambda lo: pa.table({
        "a": pa.array(rng.integers(lo, lo + 8, 2048).astype(np.int64)),
        "b": pa.array(rng.integers(lo, lo + 8, 2048).astype(np.int64)),
        "v": pa.array(np.arange(2048) + lo)})
    zorder_export(rd.from_arrow(mk(0)), "a", "b", str(tmp_path))
    manifest2 = zorder_export(rd.from_arrow(mk(100)), "a", "b",
                              str(tmp_path))
    on_disk = sorted(p.name for p in tmp_path.glob("zpart-*.parquet"))
    assert on_disk == sorted({f["file"] for f in manifest2["files"]})
    assert not list(tmp_path.glob("zpart-*.tmp"))
    # old export's rows are gone from box reads too
    assert read_box(str(tmp_path), 0, 8, 0, 8).num_rows == 0
    assert read_box(str(tmp_path), 100, 108, 100, 108).num_rows == 2048


@pytest.mark.usefixtures("ray_session")
def test_zorder_export_rejects_wide_span(tmp_path):
    ds = rd.from_arrow(pa.table({"a": pa.array([0, 1 << 32], pa.int64()),
                                 "b": pa.array([0, 1], pa.int64())}))
    with pytest.raises(Exception, match="31 bits"):
        zorder_export(ds, "a", "b", str(tmp_path / "z"))

import json

import pyarrow.parquet as pq
import pytest

from ocr_main_ray.cli import main
from ocr_main_ray.sources.synth import synth_pages


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clipages")
    pq.write_table(synth_pages(30), d / "pages.parquet")
    return d


@pytest.mark.usefixtures("ray_session")
def test_cli_run(pages_dir, tmp_path, capsys):
    rc = main(["run", str(pages_dir), str(tmp_path / "out"), "--dispatch", "tasks"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["status"] == "ok" and out["rows"] == 30


@pytest.mark.usefixtures("ray_session")
def test_cli_sniff(pages_dir, capsys):
    rc = main(["sniff", str(pages_dir)])
    assert rc == 0
    hist = json.loads(capsys.readouterr().out.strip())["histogram"]
    assert hist["html"] > 0 and hist["pdf_scanned"] > 0


def test_cli_info(capsys):
    assert main(["info"]) == 0
    info = json.loads(capsys.readouterr().out.strip())
    assert "deterministic" in info["engines"]


@pytest.mark.usefixtures("ray_session")
def test_cli_error_paths(tmp_path, capsys):
    assert main(["run", "/nonexistent/path", str(tmp_path / "o")]) == 1
    assert main(["nope"]) == 2
    assert main(["run", "x", "y", "--profile", "bogus"]) == 2


@pytest.mark.usefixtures("ray_session")
def test_cli_export_sorted(tmp_path, capsys):
    rc = main(["export-sorted", "/root/testdata/sf0.001/documents.parquet",
               str(tmp_path / "sorted"), "--key", "doc_id"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["status"] == "ok" and out["total_rows"] == 500
    man = json.loads((tmp_path / "sorted" / "_RANGES.json").read_text())
    assert man["key"] == "doc_id" and len(man["files"]) == out["files"]

    # bad key column -> usage error
    rc = main(["export-sorted", "/root/testdata/sf0.001/documents.parquet",
               str(tmp_path / "s2"), "--key", "nope"])
    assert rc == 2


def test_cli_upsert_roundtrip(tmp_path, capsys):
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_main_ray.cli import main

    root = tmp_path / "data"
    root.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                             "v": pa.array(["a", "b", "c"])}),
                   root / "part-0.parquet")
    batch = tmp_path / "batch.parquet"
    pq.write_table(pa.table({"doc_id": pa.array([2, 9], pa.int64()),
                             "v": pa.array(["B", "I"])}), batch)
    rc = main(["upsert", str(root), str(batch)])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["status"] == "ok"
    assert out["rows_replaced"] == 1 and out["rows_inserted"] == 1
    import pyarrow.dataset as pds
    t = pds.dataset(str(root)).to_table()
    got = dict(zip(t.column("doc_id").to_pylist(), t.column("v").to_pylist()))
    assert got == {1: "a", 2: "B", 3: "c", 9: "I"}


def test_cli_upsert_bad_key_col(tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_main_ray.cli import main

    batch = tmp_path / "batch.parquet"
    pq.write_table(pa.table({"x": pa.array([1], pa.int64())}), batch)
    rc = main(["upsert", str(tmp_path / "d"), str(batch),
               "--key-col", "doc_id"])
    assert rc == 1
    assert "key column" in capsys.readouterr().err

"""Checkpointed, resumable extraction runs (SURVEY.md section 4.3.4).

Two-phase layout — the 100 TB shape of the flagship pipeline:

  {out}/staged/content_type=X/size_bucket=N/*.parquet   (phase A)
  {out}/extracted/part=X-N/*.parquet                    (phase B)
  {out}/manifests/stage.json, part-X-N.json             (lineage records)

Phase A runs sniff + dedup ONCE and writes the deduped pages as
hive-partitioned Parquet keyed by (content_type, size_bucket).  This is the
"explicit repartitioning by content-type and document byte-size" skew
defense: it is a physical layout change done by the regular block writer —
no extra all-to-all beyond the dedup shuffle itself.

Phase B runs one extraction job per partition, each with a batch size tuned
to its cost class (scanned PDFs: small batches on the OCR actor pool; HTML /
native: large batches), writing each partition's output atomically
(temp dir + rename) and then its manifest.  A rerun skips every partition
whose manifest matches the current stage version — idempotent resume with
per-partition lineage (input files, row counts, stage versions, wall ms,
error counts).

The reference has no resume story (re-runs create ``_01`` suffix dirs,
file_storage.py:179-190); this replaces it with deterministic
partition -> output mapping.
"""
from __future__ import annotations

import hashlib
import json
import os
import pathlib
import shutil
import time
from dataclasses import asdict

import ray.data as rd

from ..config import CT_PDF_SCANNED, PipelineConfig
from ..pipelines.extract import ExtractDispatch, extract_dataset
from .. import __version__

STAGE_VERSION_SALT = "ocr-main-ray-extract-v1"


def input_fingerprint(pages_dir: str) -> str:
    """Fingerprint of the input file set (names + sizes): a changed, added
    or removed input shard must invalidate the staged table and every
    partition manifest, or a resume run would silently skip new data."""
    entries = sorted(
        (p.name, p.stat().st_size)
        for p in pathlib.Path(pages_dir).glob("*.parquet")
    )
    return hashlib.md5(json.dumps(entries).encode()).hexdigest()[:16]


def stage_version(config: PipelineConfig, input_fp: str = "") -> str:
    payload = json.dumps({"v": __version__, "salt": STAGE_VERSION_SALT,
                          "config": asdict(config), "input": input_fp},
                         sort_keys=True, default=str)
    return hashlib.md5(payload.encode()).hexdigest()[:16]


def _atomic_write_json(path: pathlib.Path, obj: dict) -> None:
    tmp = path.with_suffix(".tmp")
    tmp.write_text(json.dumps(obj, indent=2, sort_keys=True))
    os.replace(tmp, path)


def _list_partitions(staged: pathlib.Path) -> list[tuple[str, str, pathlib.Path]]:
    parts = []
    for ct_dir in sorted(staged.glob("content_type=*")):
        ct = ct_dir.name.split("=", 1)[1]
        for sb_dir in sorted(ct_dir.glob("size_bucket=*")):
            parts.append((ct, sb_dir.name.split("=", 1)[1], sb_dir))
    return parts


# Relative per-byte extraction cost by content type, used ONLY for
# scheduling (longest-first partition order) and dispatch granularity —
# never for results.  Scanned PDFs pay page render + OCR per page; native
# PDFs parse objects; HTML is a single tokenizer pass; empty rows are
# pass-through.  Exact values are uncritical: LPT only needs the ordering
# to be monotone in true cost.
_CT_COST_WEIGHT = {CT_PDF_SCANNED: 12.0, "pdf_native": 2.0,
                   "html": 1.0, "empty": 0.1}


def _partition_cost(ct: str, part_dir: pathlib.Path) -> float:
    """Estimated extraction cost of one staged partition: staged bytes
    (free, from file metadata) x the content-type cost weight."""
    nbytes = sum(p.stat().st_size for p in part_dir.glob("**/*.parquet"))
    return nbytes * _CT_COST_WEIGHT.get(ct, 1.0)


def _partition_stats(part_out: pathlib.Path) -> tuple[int, int]:
    """(row_count, error_rows) for a written partition, from parquet FILE
    METADATA only: num_rows is always present and the error column's
    null_count rides the column-chunk statistics, so counting costs zero
    data reads (the previous per-partition Ray stats job was a fixed
    ~0.3 s x partitions tax the hi scaling leg paid disproportionally).
    Falls back to reading the one slim column if a writer omitted
    statistics."""
    import pyarrow.parquet as pq

    n_rows = 0
    n_errors = 0
    for f in sorted(part_out.glob("**/*.parquet")):
        md = pq.read_metadata(f)
        n_rows += md.num_rows
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        try:
            ei = names.index("error")
        except ValueError:
            continue
        file_err = 0
        from_stats = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ei).statistics
            if st is None or not st.has_null_count:
                from_stats = False
                break
            file_err += md.row_group(rg).num_rows - st.null_count
        if not from_stats:
            t = pq.read_table(f, columns=["error"])
            file_err = t.num_rows - t.column("error").null_count
        n_errors += file_err
    return n_rows, n_errors


def _write_part_manifest(manifests: pathlib.Path, ct: str, sb, version: str,
                         part_dir: pathlib.Path, n_rows: int, n_errors: int,
                         t0: float) -> None:
    _atomic_write_json(manifests / f"part-{ct}-{sb}.json", {
        "phase": "extracted",
        "partition": {"content_type": ct, "size_bucket": int(sb)},
        "stage_version": version,
        "input_files": sorted(str(p) for p in part_dir.glob("**/*.parquet")),
        "row_count": n_rows,
        "error_rows": n_errors,
        "wall_ms": round((time.perf_counter() - t0) * 1000, 1),
    })


def run_staged(pages_dir: str, out_dir: str,
               config: PipelineConfig | None = None) -> dict:
    """Phase A: read -> sniff -> dedup -> hive-partitioned staged parquet.

    Skipped entirely on resume when the stage manifest matches."""
    config = config or PipelineConfig()
    out = pathlib.Path(out_dir)
    manifests = out / "manifests"
    manifests.mkdir(parents=True, exist_ok=True)
    stage_manifest = manifests / "stage.json"
    version = stage_version(config, input_fingerprint(pages_dir))
    if stage_manifest.exists():
        m = json.loads(stage_manifest.read_text())
        if m.get("stage_version") == version and (out / "staged").exists():
            return m

    staged_tmp = out / "staged.tmp"
    staged = out / "staged"
    shutil.rmtree(staged_tmp, ignore_errors=True)
    shutil.rmtree(staged, ignore_errors=True)

    t0 = time.perf_counter()
    ds = rd.read_parquet(pages_dir)
    ds = extract_dataset(ds, config=config, dedup=True, stop_after="dedup")
    ds.write_parquet(str(staged_tmp), partition_cols=["content_type", "size_bucket"])
    os.replace(staged_tmp, staged)

    manifest = {
        "phase": "staged",
        "stage_version": version,
        "input": pages_dir,
        "input_files": sorted(str(p) for p in pathlib.Path(pages_dir).glob("*.parquet")),
        "wall_ms": round((time.perf_counter() - t0) * 1000, 1),
    }
    _atomic_write_json(stage_manifest, manifest)
    return manifest


def run_checkpointed(pages_dir: str, out_dir: str,
                     config: PipelineConfig | None = None,
                     dispatch_mode: str = "actors",
                     max_concurrent_partitions: int = 1) -> dict:
    """Phase A + phase B with per-partition resume.  Returns a summary dict
    {partitions_total, partitions_skipped, partitions_processed}.

    ``dispatch_mode`` mirrors ``extract_run``'s: "actors" (default) keeps a
    fixed pool for engines whose state is expensive to build; "tasks" is
    measured faster for cheap-state engines (see extract_run's docstring)
    and is what the bench uses so the staged path is compared
    apples-to-apples with the single-pass path.

    ``max_concurrent_partitions`` > 1 runs that many partition pipelines
    concurrently (each a thread driving its own streaming execution —
    Ray schedules their tasks into the shared CPU pool).  Per-partition
    manifests keep resume semantics identical: a crash mid-run leaves each
    partition either complete (manifest written last) or restartable.  At
    100-TB every partition saturates the cluster alone, so 1 is the
    deployment default; at bench scale the SEQUENTIAL barrier between
    partitions idles CPUs behind each partition's straggling tail.

    Scheduling (round 5, each piece A/B-measured — BASELINE.md section 7):
    partitions start longest-first (LPT by staged bytes x content-type
    cost weight), each gets dispatch blocks proportional to its cost
    share (~10 blocks/cpu across the phase), stats come free from parquet
    footer metadata, and with LPT the overlap sweet spot moved from the
    pre-LPT 3-4 plateau to 5 (the bench default).  Staged+skewed
    two-scale efficiency: 0.790 -> 0.895 raw."""
    config = config or PipelineConfig()
    out = pathlib.Path(out_dir)
    run_staged(pages_dir, out_dir, config)
    version = stage_version(config, input_fingerprint(pages_dir))
    manifests = out / "manifests"
    extracted = out / "extracted"
    extracted.mkdir(parents=True, exist_ok=True)

    import threading

    # Dataset CONSTRUCTION (parquet path resolution) probes optional
    # fsspec modules whose failed imports are not thread-safe (a
    # concurrent failed `import aiohttp` in two threads surfaces as a
    # spurious "cannot import name HTTPFileSystem" ImportError instead of
    # the ModuleNotFoundError Ray tolerates).  Construction is cheap
    # driver-side work — serialize it; EXECUTION stays concurrent.
    read_lock = threading.Lock()

    from ..config import cluster_cpus

    parts = _list_partitions(out / "staged")
    costs = {p[2]: _partition_cost(p[0], p[2]) for p in parts}
    total_cost = sum(costs.values()) or 1.0
    cpus = cluster_cpus()

    def _one_partition(part) -> str:
        ct, sb, part_dir = part
        part_id = f"{ct}-{sb}"
        part_manifest = manifests / f"part-{part_id}.json"
        part_out = extracted / f"part={part_id}"
        if part_manifest.exists():
            m = json.loads(part_manifest.read_text())
            if m.get("stage_version") == version and part_out.exists():
                return "skipped"
        t0 = time.perf_counter()
        with read_lock:
            ds = rd.read_parquet(str(part_dir))
        # hive partition columns are consumed by the path; re-attach them
        ds = ds.map_batches(
            _reattach_partition_cols, fn_kwargs={"ct": ct, "sb": int(sb)},
            batch_format="pyarrow", zero_copy_batch=True,
        )
        # Metadata-only split (same trick as extract_run's dispatch
        # granularity): give each partition a number of dispatch tasks
        # proportional to its estimated cost share, ~10 blocks/cpu across
        # the whole phase, so the heavy pdf_scanned partitions' skewed
        # per-document cost rebalances across the shared CPU pool instead
        # of straggling behind the staged file layout's block boundaries.
        share = costs[part_dir] / total_cost
        nblocks = max(4, min(cpus * 10, round(share * cpus * 10)))
        ds = ds.repartition(nblocks)
        batch_size = (config.ocr_batch_size if ct == CT_PDF_SCANNED
                      else max(64, config.extract_batch_size))
        if dispatch_mode == "tasks":
            def _dispatch(batch, _config=config):
                return ExtractDispatch(_config)(batch)

            ds = ds.map_batches(_dispatch, batch_format="pyarrow",
                                batch_size=batch_size)
        else:
            ds = ds.map_batches(
                ExtractDispatch, fn_constructor_kwargs={"config": config},
                batch_format="pyarrow", batch_size=batch_size,
                concurrency=_pool_size(), num_cpus=1,
            )
        tmp = extracted / f".tmp-part={part_id}"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(part_out, ignore_errors=True)
        ds.write_parquet(str(tmp))
        os.replace(tmp, part_out)
        n_rows, n_errors = _partition_stats(part_out)
        _write_part_manifest(manifests, ct, sb, version, part_dir,
                             n_rows, n_errors, t0)
        return "processed"

    def _skip_ok(part) -> bool:
        ct, sb, _part_dir = part
        part_manifest = manifests / f"part-{ct}-{sb}.json"
        part_out = extracted / f"part={ct}-{sb}"
        if not part_manifest.exists():
            return False
        m = json.loads(part_manifest.read_text())
        return m.get("stage_version") == version and part_out.exists()

    # Longest-processing-time-first: start the costly pdf_scanned
    # partitions FIRST so their straggling tails overlap the cheap
    # html/native partitions instead of running alone at the end of the
    # run behind the partition barrier (lexical order put them last).
    # Classic LPT greedy — the thread pool pulls from this order.
    # (A fused "light batch" pipeline for the low-cost partitions was
    # built and MEASURED here: the union's repartition barrier serialized
    # read->dispatch across every fused partition and the two-scale ratio
    # dropped 0.79 -> 0.73, so each partition keeps its own streaming
    # pipeline — their fixed startups overlap across the thread pool.)
    pending = [p for p in parts if not _skip_ok(p)]
    n_skipped = len(parts) - len(pending)
    sched = sorted(pending, key=lambda p: costs[p[2]], reverse=True)
    if max_concurrent_partitions > 1 and len(sched) > 1:
        from concurrent.futures import ThreadPoolExecutor

        _seed_fsspec_http_stub()
        with ThreadPoolExecutor(max_concurrent_partitions) as pool:
            results = list(pool.map(_one_partition, sched))
    else:
        results = [_one_partition(p) for p in sched]
    processed = results.count("processed")
    return {"partitions_total": len(parts), "partitions_skipped": n_skipped,
            "partitions_processed": processed, "out_dir": str(extracted)}


def summarize_run(out_dir: str) -> dict:
    """Roll the per-partition manifests up into the run-level summary the
    reference records per document tree (B11 aggregates + engine metadata,
    the A8 'recorded in run manifest' item)."""
    from ..stages.ocr import DeterministicEngine

    out = pathlib.Path(out_dir)
    parts = []
    for m in sorted((out / "manifests").glob("part-*.json")):
        parts.append(json.loads(m.read_text()))
    eng = DeterministicEngine()
    return {
        "partitions": len(parts),
        "row_count": sum(p["row_count"] for p in parts),
        "error_rows": sum(p["error_rows"] for p in parts),
        "wall_ms_total": round(sum(p["wall_ms"] for p in parts), 1),
        "stage_versions": sorted({p["stage_version"] for p in parts}),
        "engine_info": eng.get_engine_info(),
        "supported_languages": eng.get_supported_languages(),
    }


def _seed_fsspec_http_stub() -> None:
    """Make Ray's per-path HTTP-filesystem probe thread-safe in this
    environment.  ``ray.data.datasource.path_util._is_http_filesystem``
    runs ``from fsspec.implementations.http import HTTPFileSystem`` on
    EVERY path resolution and tolerates only ``ModuleNotFoundError``; with
    aiohttp absent the import fails every time, and two threads failing
    the import concurrently can surface as a spurious plain ``ImportError``
    ("cannot import name HTTPFileSystem") that Ray does not catch.  Seed a
    stub module exposing a sentinel ``HTTPFileSystem`` class (never
    instantiated by anything) so the probe import always SUCCEEDS and its
    isinstance check correctly answers False for local filesystems."""
    import sys
    import types

    name = "fsspec.implementations.http"
    if name in sys.modules:
        return
    try:
        __import__(name)  # use the real module when aiohttp exists
    except Exception:
        stub = types.ModuleType(name)

        class HTTPFileSystem:  # sentinel only — nothing instantiates it
            pass

        stub.HTTPFileSystem = HTTPFileSystem
        sys.modules[name] = stub


def _reattach_partition_cols(batch, ct: str, sb: int):
    """Hive partition values come back as strings (or may be dropped);
    normalize to the sniff stage's schema."""
    import pyarrow as pa

    n = batch.num_rows
    for name in ("content_type", "size_bucket"):
        if name in batch.column_names:
            batch = batch.drop([name])
    batch = batch.append_column("content_type", pa.array([ct] * n, pa.string()))
    batch = batch.append_column("size_bucket", pa.array([sb] * n, pa.int32()))
    return batch


def _pool_size():
    from ..config import cluster_cpus

    cpus = cluster_cpus()
    return (min(4, max(2, cpus - 2)), max(4, cpus - 2))

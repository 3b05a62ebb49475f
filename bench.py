"""Benchmark harness: flagship extraction throughput + relational queries.

Prints ONE JSON line:
  {"metric": "e2e_extract_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>, "num_cpus": N,
   "docs_per_sec": ..., "ocr_pages_per_sec": ...}

Env knobs:
  GRAFT_SF_DIR     input tables dir (default /root/testdata/sf0.1)
  RAY_GRAFT_CPUS   ray.init(num_cpus=...) (default 32)
  OCR_BENCH_REPEAT pages-corpus replication factor (default 2)

--scaling: runs this script twice in fresh subprocesses at 8 and 32 CPUs on
the same cached input and reports throughputs + scaling efficiency
(the sandbox substitute for N vs 4N Ray nodes — BASELINE.md section 3);
writes BENCH/BASELINE.md.
"""
from __future__ import annotations

import json
import os
import pathlib
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("OCR_BENCH_REPEAT", "6"))
CACHE_ROOT = pathlib.Path("/tmp/ocr_main_ray_bench")
N_INPUT_FILES = 32


def _pages_cache_dir() -> pathlib.Path:
    tag = SF_DIR.strip("/").replace("/", "_")
    return CACHE_ROOT / f"pages_{tag}_r{REPEAT}"


def ensure_pages_input() -> pathlib.Path:
    """Synthesize the pages corpus once (untimed) and shard it into
    N_INPUT_FILES parquet files so the read parallelizes."""
    out = _pages_cache_dir()
    done = out / "_DONE"
    if done.exists():
        return out
    import pyarrow.parquet as pq
    from ocr_main_ray.sources.synth import pages_from_documents

    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True, exist_ok=True)
    tbl = pages_from_documents(SF_DIR, repeat=REPEAT)
    n = tbl.num_rows
    per = (n + N_INPUT_FILES - 1) // N_INPUT_FILES
    for i in range(N_INPUT_FILES):
        part = tbl.slice(i * per, per)
        if part.num_rows:
            pq.write_table(part, out / f"pages_{i:03d}.parquet")
    done.write_text(f"{n}\n")
    return out


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.preserve_order = False

    import ray.data as rd
    from ocr_main_ray.config import PipelineConfig
    from ocr_main_ray.pipelines.extract import extract_run

    pages_dir = ensure_pages_input()
    out_dir = CACHE_ROOT / f"out_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)

    # warm the page cache (untimed read)
    for f in sorted(pages_dir.glob("*.parquet")):
        f.read_bytes()

    config = PipelineConfig()
    t0 = time.perf_counter()
    ds = rd.read_parquet(str(pages_dir))
    extract_run(ds, config=config).write_parquet(str(out_dir))
    headline = time.perf_counter() - t0

    # output stats (cheap re-read of the small result)
    stats = rd.read_parquet(str(out_dir), columns=["content_type", "n_pages"])
    n_docs = stats.count()
    ocr_pages = (
        stats.map_batches(
            lambda t: t.filter(t.column("content_type").to_pandas().eq("pdf_scanned").values)
            if t.num_rows else t,
            batch_format="pyarrow",
        ).sum("n_pages")
        or 0
    )

    from ocr_main_ray.pipelines import queries as q

    query_times = {}
    for name in ("pricing_summary", "events_by_type", "revenue_by_segment",
                 "summary_by_lang", "dedup_exact", "docs_topk_chars"):
        t0 = time.perf_counter()
        res = q.QUERIES[name](SF_DIR)
        if hasattr(res, "count") and not hasattr(res, "__len__"):
            res.count()
        query_times[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "e2e_extract_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": query_times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "num_cpus": NUM_CPUS,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / headline, 2),
        "ocr_pages": int(ocr_pages),
        "ocr_pages_per_sec": round(ocr_pages / headline, 2),
        "repeat": REPEAT,
    }


def run_scaling() -> dict:
    """Same job, fresh processes, 8 vs 32 CPUs (N vs 4N substitute)."""
    ensure_pages_input()  # shared cached input for both runs

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = one(8), one(32)
    r_lo = lo["docs_per_sec"]
    r_hi = hi["docs_per_sec"]
    eff = (r_hi / r_lo) / (32 / 8)
    result = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "docs_per_sec_8": r_lo,
        "docs_per_sec_32": r_hi,
        "ocr_pages_per_sec_8": lo["ocr_pages_per_sec"],
        "ocr_pages_per_sec_32": hi["ocr_pages_per_sec"],
        "n_docs": lo["n_docs"],
        "sf": lo["sf"],
    }
    bench_dir = pathlib.Path(__file__).parent / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / "BASELINE.md").write_text(
        "# BENCH — measured two-scale results\n\n"
        "Protocol: identical flagship extraction job (read pages parquet -> "
        "sniff -> dedup-by-url -> html/pdf/OCR extract -> write parquet) on "
        "the same cached synthetic input, two fresh processes "
        "(`ray.init(num_cpus=8)` vs `ray.init(num_cpus=32)`), the sandbox "
        "substitute for N vs 4N nodes (BASELINE.md section 3).\n\n"
        f"| metric | 8 cpus | 32 cpus |\n|---|---|---|\n"
        f"| wall sec | {lo['value']} | {hi['value']} |\n"
        f"| docs/sec | {r_lo} | {r_hi} |\n"
        f"| OCR pages/sec | {lo['ocr_pages_per_sec']} | {hi['ocr_pages_per_sec']} |\n\n"
        f"docs = {lo['n_docs']} (sf={lo['sf']}, repeat={REPEAT}); "
        f"**scaling efficiency = {result['value']}** "
        f"(requirement: >= 0.8)\n"
    )
    return result


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))

"""Command-line interface — the rebuild of the reference's batch CLI
(reference backend/src/interfaces/cli/menu.py:27-144: argparse over pdf_path
/ --engine / --output-dir / --mode, exit codes 0/1/2).

Subcommands:
  run     one-shot extraction: pages parquet (or a directory of raw files)
          -> extracted parquet
  resume  checkpointed two-phase run with per-partition manifests; rerun
          skips completed partitions
  sniff   content-type histogram only (no extraction)
  info    engine metadata (A8)

The CLI owns the Ray session (guarded init; never in library code).
Exit codes: 0 success, 1 processing error, 2 usage error — reference parity.
"""
from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    """Guarded init.  Returns (ray, owns_session): the CLI shuts Ray down
    only if IT started the session — joining an existing cluster (e.g. the
    test fixture's, or a driver's) must leave it running."""
    import ray

    owns = not ray.is_initialized()
    if owns:
        kwargs = dict(address="local", include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.preserve_order = False
    return ray, owns


def _load_pages(input_path: str):
    from .sources.readers import read_pages

    return read_pages(input_path)


def _config(args) -> "object":
    import dataclasses

    from .config import PipelineConfig

    cfg = (PipelineConfig.from_quality_profile(args.profile)
           if args.profile else PipelineConfig())
    hygiene = {}
    if getattr(args, "canonical_urls", False):
        hygiene["canonical_urls"] = True
    if getattr(args, "drop_noindex", False):
        hygiene["drop_noindex"] = True
    return dataclasses.replace(cfg, **hygiene) if hygiene else cfg


def cmd_run(args) -> int:
    ray, owns = _init_ray(args.num_cpus)
    from .pipelines.extract import extract_run

    ds = _load_pages(args.input)
    out = extract_run(ds, config=_config(args), dedup=not args.no_dedup,
                      dispatch_mode=args.dispatch)
    out.write_parquet(args.output)
    if args.stats:
        # per-stage wall/cpu/row breakdown (ray.data.Dataset.stats) — the
        # operability hook for tuning batch sizes and stage concurrency
        print(out.stats(), file=sys.stderr)
    import ray.data as rd

    n = rd.read_parquet(args.output, columns=["url"]).count()
    print(json.dumps({"status": "ok", "rows": n, "output": args.output}))
    if owns:
        ray.shutdown()
    return 0


def cmd_resume(args) -> int:
    ray, owns = _init_ray(args.num_cpus)
    from .state.manifest import run_checkpointed

    summary = run_checkpointed(args.input, args.output, _config(args))
    print(json.dumps({"status": "ok", **summary}))
    if owns:
        ray.shutdown()
    return 0


def cmd_sniff(args) -> int:
    ray, owns = _init_ray(args.num_cpus)
    from ray.data.aggregate import Count

    from .stages.sniff import sniff_batch

    ds = _load_pages(args.input).map_batches(
        sniff_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    hist = ds.groupby("content_type").aggregate(Count(alias_name="n")).take_all()
    print(json.dumps({"status": "ok",
                      "histogram": {r["content_type"]: r["n"] for r in hist}}))
    if owns:
        ray.shutdown()
    return 0


def cmd_info(args) -> int:
    from .stages.ocr import DeterministicEngine, ENGINE_REGISTRY

    eng = DeterministicEngine()
    print(json.dumps({
        "engines": sorted(ENGINE_REGISTRY),
        "info": eng.get_engine_info(),
        "supported_languages": eng.get_supported_languages(),
    }))
    return 0


def cmd_delete(args) -> int:
    from .state.delete import delete_keys

    keys = [int(k) if k.lstrip("-").isdigit() else k
            for k in args.ids.split(",") if k != ""]
    if not keys:
        print(json.dumps({"status": "error",
                          "error": "no keys given"}), file=sys.stderr)
        return 1
    # mixed int/str keys would raise an opaque TypeError inside
    # sorted()/min() and make the pc.is_in filter fail against a typed key
    # column — reject them up front with a usable message
    kinds = {type(k).__name__ for k in keys}
    if len(kinds) > 1:
        print(json.dumps({
            "status": "error",
            "error": f"mixed key types {sorted(kinds)}: all ids must parse "
                     f"as the same type (got {args.ids!r})"}), file=sys.stderr)
        return 1
    audit = delete_keys(args.data_dir, keys, key_col=args.key_col)
    if not args.verbose:
        audit.pop("records", None)
    print(json.dumps({"status": "ok", **audit}))
    return 0


def cmd_upsert(args) -> int:
    import pyarrow.parquet as pq

    from .state.upsert import upsert_table

    table = pq.read_table(args.batch)
    if args.key_col not in table.column_names:
        print(json.dumps({
            "status": "error",
            "error": f"key column {args.key_col!r} not in batch schema "
                     f"{table.column_names}"}), file=sys.stderr)
        return 1
    audit = upsert_table(args.data_dir, table, key_col=args.key_col)
    if not args.verbose:
        audit.pop("records", None)
    print(json.dumps({"status": "ok", **audit}))
    return 0


def cmd_export_sorted(args) -> int:
    ray, owns = _init_ray(args.num_cpus)
    try:
        import ray.data as rd

        from .state.export import sorted_export

        ds = rd.read_parquet(args.input)
        if args.key not in ds.schema().names:
            print(json.dumps({
                "status": "error",
                "error": f"key column {args.key!r} not in input schema "
                         f"{ds.schema().names}"}), file=sys.stderr)
            return 2
        man = sorted_export(ds, args.key, args.output,
                            descending=args.descending)
        print(json.dumps({"status": "ok", "key": man["key"],
                          "files": len(man["files"]),
                          "total_rows": man["total_rows"]}))
        return 0
    finally:
        if owns:
            ray.shutdown()


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ocr_main_ray",
                                description="Ray-Data-native extraction engine")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="extract pages -> parquet")
    runp.add_argument("input", help="pages parquet file/dir, .jsonl/.csv "
                                    "interchange dump, or dir of raw files")
    runp.add_argument("output", help="output parquet dir")
    runp.add_argument("--profile", choices=["fast", "balanced", "high"])
    runp.add_argument("--no-dedup", action="store_true")
    runp.add_argument("--dispatch", choices=["actors", "tasks"], default="actors")
    runp.add_argument("--stats", action="store_true",
                      help="print per-stage execution stats to stderr")
    runp.add_argument("--canonical-urls", action="store_true",
                      dest="canonical_urls",
                      help="dedup on canonicalized urls (crawl hygiene)")
    runp.add_argument("--drop-noindex", action="store_true",
                      dest="drop_noindex",
                      help="drop pages declaring <meta robots noindex>")
    runp.set_defaults(fn=cmd_run)

    res = sub.add_parser("resume", help="checkpointed run with manifests")
    res.add_argument("input", help="pages parquet dir")
    res.add_argument("output", help="checkpoint root dir")
    res.add_argument("--profile", choices=["fast", "balanced", "high"])
    res.set_defaults(fn=cmd_resume)

    sn = sub.add_parser("sniff", help="content-type histogram")
    sn.add_argument("input")
    sn.set_defaults(fn=cmd_sniff)

    inf = sub.add_parser("info", help="engine metadata")
    inf.set_defaults(fn=cmd_info)

    dl = sub.add_parser("delete", help="targeted deletion with "
                        "partition-local compaction (footer-stats pruning)")
    dl.add_argument("data_dir", help="parquet output dir (recursed)")
    dl.add_argument("ids", help="comma-separated key values to delete")
    dl.add_argument("--key-col", default="doc_id")
    dl.add_argument("--verbose", action="store_true",
                    help="include the per-file audit records")
    dl.set_defaults(fn=cmd_delete)

    up = sub.add_parser("upsert", help="keyed MERGE of a parquet batch "
                        "into a data dir (append-first, idempotent retry)")
    up.add_argument("data_dir", help="parquet output dir (recursed)")
    up.add_argument("batch", help="parquet file with the rows to merge")
    up.add_argument("--key-col", default="doc_id")
    up.add_argument("--verbose", action="store_true",
                    help="include the per-file audit records")
    up.set_defaults(fn=cmd_upsert)

    ex = sub.add_parser("export-sorted", help="globally-sorted range-"
                        "partitioned export with a _RANGES.json manifest")
    ex.add_argument("input", help="parquet file/dir to sort")
    ex.add_argument("output", help="export dir")
    ex.add_argument("--key", default="doc_id", help="sort key column")
    ex.add_argument("--descending", action="store_true")
    ex.set_defaults(fn=cmd_export_sorted)
    return p


def main(argv=None) -> int:
    try:
        args = build_parser().parse_args(argv)
    except SystemExit as e:  # argparse uses 2 for usage errors already
        return int(e.code or 0)
    try:
        return args.fn(args)
    except Exception as e:
        print(json.dumps({"status": "error", "error": f"{type(e).__name__}: {e}"}),
              file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())

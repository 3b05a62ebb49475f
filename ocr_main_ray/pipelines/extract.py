"""The flagship extraction pipeline (reference B1, rebuilt Ray-Data-first).

    read_parquet(pages)
      -> map_batches(sniff_batch)                 stateless, big Arrow batches
      -> groupby("url") keep-first dedup          the one required shuffle
      -> map_batches(ExtractDispatch, actor pool) html | pdf_native | OCR
    [ -> write_parquet(out, partition_cols=...) ]

Single-pass design rationale: Ray Data executes each consumer's lineage
independently (no common-subexpression sharing), so forking the deduped
stream into per-content-type branches would re-run the sniff + dedup shuffle
once per branch.  One dispatch actor pool with a modest batch size keeps the
plan single-pass; per-row cost skew (one 20-page scanned PDF vs dozens of
HTML pages) is absorbed by small batches + many concurrent blocks +
``preserve_order=False``.  The 100 TB path with explicit
(content_type, size_bucket) physical partitioning lives in
state/manifest.run_checkpointed, which writes the sniffed+deduped table as
hive-partitioned Parquet (a layout change, not an extra shuffle) and then
runs one tuned extraction job per partition group, resumable via manifests.

Engine selection parity (C5): pdf_scanned -> "opencv" (preprocess chain on),
everything else -> "basic".  Confidence is constant 0.0 (A7), tables_json is
"[]" (A9 stub parity).
"""
from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import (CT_HTML, CT_PDF_NATIVE, CT_PDF_SCANNED, ENGINE_BASIC,
                      ENGINE_OPENCV, HIGH_QUALITY_THRESHOLD,
                      MIN_QUALITY_THRESHOLD, PAGE_JOIN, PipelineConfig)
from ..schema import EXTRACTED_SCHEMA, SPAN_TYPE
from ..stages import pdf_native
from ..stages.assemble import word_count
from ..stages.dedup import dedup_by_url
from ..stages.html_extract import extract_main_blocks
from ..stages.ocr import DeterministicEngine
from ..stages.sniff import sniff_batch


def _spans_for_pages(pages: list[str]) -> list[dict]:
    spans, pos = [], 0
    for i, p in enumerate(pages):
        spans.append({"page": i, "start": pos, "end": pos + len(p)})
        pos += len(p) + len(PAGE_JOIN)
    return spans


class ExtractDispatch:
    """Stateful dispatch stage: engines built once per actor in __init__
    (F1 — the reference builds its adapters once per run via AdapterFactory,
    adapter_factory.py:23-35), plus a lazy cache of per-auto-config engine
    variants (C2: the per-PDFType flags/dpi table).

    Routing contract: the native-vs-OCR FORK follows the C4 first-page-text
    probe (content_type) — the router the reference's live code paths
    actually reach (routers/files.py:85-96).  The C1 5-class PDFType and its
    C2 auto-config drive (a) the preprocessing flags + dpi of the OCR route
    and (b) the pdf_type/strategy/dpi/engine metadata columns — mirroring
    the reference, where the auto-detected engine recommendation is logged
    but the pre-built processor's route wins (documents.py:227-239)."""

    def __init__(self, config: PipelineConfig | None = None):
        from ..stages.tables import create_table_extractor

        self.config = config or PipelineConfig()
        self.basic_engine = DeterministicEngine(self.config, ENGINE_BASIC)
        self.opencv_engine = DeterministicEngine(self.config, ENGINE_OPENCV)
        self._auto_engines: dict[tuple, DeterministicEngine] = {}
        self.table_extractor = create_table_extractor(self.config.table_extractor)

    def _engine_for(self, auto: dict) -> DeterministicEngine:
        """Engine variant for a C2 auto-config row (cached per actor)."""
        key = (auto["engine_type"], auto["dpi"], auto["deskew"],
               auto["denoise"], auto["contrast"])
        eng = self._auto_engines.get(key)
        if eng is None:
            import dataclasses
            cfg = dataclasses.replace(
                self.config, dpi=auto["dpi"], deskew=auto["deskew"],
                denoise=auto["denoise"], enhance_contrast=auto["contrast"],
                engine_type=auto["engine_type"])
            eng = DeterministicEngine(cfg, auto["engine_type"])
            self._auto_engines[key] = eng
        return eng

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.sniff import (classify_from_metrics, get_optimal_config,
                                    pdf_metrics_from_parsed)

        urls = batch.column("url").to_pylist()
        tss = batch.column("warc_ts").to_pylist()
        langs = batch.column("lang").to_pylist()
        ctypes = batch.column("content_type").to_pylist()
        sizes = batch.column("size_bytes").to_pylist()
        buckets = batch.column("size_bucket").to_pylist()
        errors = batch.column("error").to_pylist()
        payloads = batch.column("html").to_pylist()

        out = {k: [] for k in ("extracted_text", "span_offsets", "n_pages",
                               "processing_ms", "engine", "error",
                               "pdf_type", "strategy", "dpi", "tables_json")}
        for ct, payload, err in zip(ctypes, payloads, errors):
            t0 = time.perf_counter()
            text, spans, n_pages, engine, row_err = "", [], 0, ENGINE_BASIC, err
            pdf_type = strategy = None
            dpi = None
            tables_json = "[]"
            try:
                if ct in (CT_HTML, "feed", "json"):
                    if ct == "feed":
                        from ..stages.feed import extract_feed_blocks
                        blocks = extract_feed_blocks(payload)
                    elif ct == "json":
                        from ..stages.jsondoc import extract_json_blocks
                        blocks = extract_json_blocks(payload)
                    else:
                        blocks = extract_main_blocks(payload)
                    text = PAGE_JOIN.join(blocks)
                    # span per content block (all on "page" 0): the html
                    # analogue of per-page spans — slices rejoin to text
                    spans, pos = [], 0
                    for b in blocks:
                        spans.append({"page": 0, "start": pos, "end": pos + len(b)})
                        pos += len(b) + len(PAGE_JOIN)
                    n_pages = 1
                elif ct == CT_PDF_NATIVE:
                    pages = pdf_native.extract_page_texts(payload)
                    images = pdf_native.extract_page_images(payload)
                    pdf_type = classify_from_metrics(
                        pdf_metrics_from_parsed(pages, images, payload))
                    auto = get_optimal_config(pdf_type)
                    strategy, dpi = auto["strategy"], auto["dpi"]
                    text = PAGE_JOIN.join(pages)
                    spans = _spans_for_pages(pages)
                    n_pages = len(pages)
                elif ct == CT_PDF_SCANNED:
                    pages_txt = pdf_native.extract_page_texts(payload)
                    images = pdf_native.extract_page_images(payload)
                    pdf_type = classify_from_metrics(
                        pdf_metrics_from_parsed(pages_txt, images, payload))
                    auto = get_optimal_config(pdf_type)
                    strategy, dpi = auto["strategy"], auto["dpi"]
                    engine = auto["engine_type"]   # C5/C2: scanned -> opencv
                    pages = self._engine_for(auto).extract_pages(
                        payload, images=images)
                    text = PAGE_JOIN.join(pages)
                    spans = _spans_for_pages(pages)
                    n_pages = len(pages)
                if ct in (CT_PDF_NATIVE, CT_PDF_SCANNED):
                    # B1 step (b): extract tables; stub -> "[]" (A9 parity),
                    # json.dump(ensure_ascii=False) like file_storage.py:53-56
                    import json as _json
                    tables_json = _json.dumps(
                        self.table_extractor.extract_tables(payload),
                        ensure_ascii=False)
                # CT_EMPTY / invalid rows pass through with empty text
            except Exception as e:  # per-row isolation (section 4.3.5)
                text, spans, n_pages = "", [], 0
                row_err = f"{type(e).__name__}: {e}"
            out["extracted_text"].append(text)
            out["span_offsets"].append(spans)
            out["n_pages"].append(n_pages)
            out["processing_ms"].append((time.perf_counter() - t0) * 1000.0)
            out["engine"].append(engine)
            out["error"].append(row_err)
            out["pdf_type"].append(pdf_type)
            out["strategy"].append(strategy)
            out["dpi"].append(dpi)
            out["tables_json"].append(tables_json)

        texts = out["extracted_text"]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "lang": pa.array(langs, pa.string()),
                "content_type": pa.array(ctypes, pa.string()),
                "extracted_text": pa.array(texts, pa.large_string()),
                "span_offsets": pa.array(out["span_offsets"], SPAN_TYPE),
                "confidence": pa.array([0.0] * len(texts), pa.float64()),
                "tables_json": pa.array(out["tables_json"], pa.large_string()),
                "n_pages": pa.array(out["n_pages"], pa.int32()),
                "word_count": pa.array([word_count(t) for t in texts], pa.int64()),
                "text_length": pa.array([len(t) for t in texts], pa.int64()),
                "processing_ms": pa.array(out["processing_ms"], pa.float64()),
                "engine": pa.array(out["engine"], pa.string()),
                "pdf_type": pa.array(out["pdf_type"], pa.string()),
                "strategy": pa.array(out["strategy"], pa.string()),
                "dpi": pa.array(out["dpi"], pa.int32()),
                "size_bytes": pa.array(sizes, pa.int64()),
                "size_bucket": pa.array(buckets, pa.int32()),
                # B2 enhanced metrics (use_cases.py:131,189-198): MB size,
                # meets_threshold = conf >= 60, high_quality = conf >= 80 —
                # both always False because confidence is constantly 0.0
                # (the A7 bug the goldens encode)
                "file_size_mb": pa.array(
                    [round(s / (1024 * 1024), 2) for s in sizes], pa.float64()),
                "meets_threshold": pa.array(
                    [0.0 >= MIN_QUALITY_THRESHOLD] * len(texts), pa.bool_()),
                "high_quality": pa.array(
                    [0.0 >= HIGH_QUALITY_THRESHOLD] * len(texts), pa.bool_()),
                "error": pa.array(out["error"], pa.string()),
            },
            schema=EXTRACTED_SCHEMA,
        )


def extract_dataset(ds: "ray.data.Dataset", config: PipelineConfig | None = None,
                    dedup: bool = True,
                    stop_after: str | None = None) -> "ray.data.Dataset":
    """pages Dataset -> extracted Dataset (lazy; caller consumes).

    stop_after="sniff"|"dedup" returns the partially-built plan — used by
    the checkpointed runner (state/manifest.py) to stage the deduped table
    before per-partition extraction."""
    config = config or PipelineConfig()
    if config.canonical_urls or config.drop_noindex:
        # crawl-hygiene pre-stages (scan-side, before any exchange):
        # noindex gate filters rows; canonicalization REPLACES url so the
        # dedup key collapses scheme/port/tracking-param variants
        from ..stages.urlnorm import canonicalize_batch, robots_noindex_batch

        def hygiene(t: pa.Table) -> pa.Table:
            if config.drop_noindex:
                t = robots_noindex_batch(t)
                t = (t.filter(pc.invert(t.column("robots_noindex")))
                     .drop_columns(["robots_noindex"]))
            if config.canonical_urls:
                t = canonicalize_batch(t)
                keep = [c for c in t.column_names
                        if c not in ("url", "canonical_url",
                                     "registered_domain")]
                t = t.select(["canonical_url"] + keep).rename_columns(
                    ["url"] + keep)
            return t

        ds = ds.map_batches(hygiene, batch_format="pyarrow",
                            zero_copy_batch=True)
    ds = ds.map_batches(
        sniff_batch, batch_format="pyarrow", batch_size=config.sniff_batch_size,
        zero_copy_batch=True,
    )
    # the crawler-provided `text` column is never consumed downstream —
    # drop it BEFORE the dedup shuffle so it doesn't ride the exchange
    # (round-1 verdict: the one leak in the flagship plan)
    ds = ds.drop_columns(["text"])
    if stop_after == "sniff":
        return ds
    if dedup:
        ds = dedup_by_url(ds)
    if stop_after == "dedup":
        return ds
    from ..config import cluster_cpus

    cpus = cluster_cpus()
    # split dedup output into many small blocks (metadata-only, no shuffle):
    # breaks operator fusion with the per-bucket dedup so the heavy dispatch
    # stage gets fine-grained tasks that rebalance across the actor pool
    # instead of one task per dedup bucket.
    ds = ds.repartition(cpus * 8)
    concurrency = config.ocr_concurrency
    if concurrency is None:
        concurrency = (min(4, max(2, cpus - 2)), max(4, cpus - 2))
    return ds.map_batches(
        ExtractDispatch,
        fn_constructor_kwargs={"config": config},
        batch_format="pyarrow",
        batch_size=config.extract_batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def extract_run(ds: "ray.data.Dataset", config: PipelineConfig | None = None,
                dedup: bool = True,
                dispatch_mode: str = "actors") -> "ray.data.Dataset":
    """Throughput-tuned two-phase execution for bounded corpora (bench /
    entry): phase 1 (read+sniff+dedup) materializes with every CPU on
    stateless tasks; phase 2 runs the dispatch on a FIXED-size actor pool.

    Design (each point measured, see BENCH):

    - single streaming plan, dedup-first: duplicates never cost OCR, and
      the OCR pool consumes dedup shuffle partitions as their reduces
      complete.  (Dedup AFTER extraction was tried — it frees the heavy
      stage from the shuffle barrier, but the trailing shuffle then moves
      fat extracted rows and duplicates get extracted: net slower.)
    - the pool is FIXED size (the autoscaling ramp costs 2x wall on the
      heavy stage) but leaves ~1/5 of the CPUs free: fixed-pool actors hold
      their CPU slot while idle, and a pool spanning the node starves the
      read/sniff/shuffle stages feeding it (pool=30/32 -> 51 s, 26/32 ->
      32 s on the same corpus).
    - a metadata-only repartition (no shuffle) splits the dedup output into
      ~6 blocks per CPU before dispatch: the groupby alone emits one block
      per bucket (~2 per CPU), which is exactly 2 scheduling waves — OCR
      cost skew then idles CPUs behind the last wave's stragglers.
      Measured at repeat=16: 139 -> 124 s at 24 CPUs, 430 -> 418 s at 6
      (on the small repeat<=10 corpus the effect is within noise, which is
      why an earlier round measured the opposite and removed it).

    dispatch_mode:
    - "actors": fixed-size actor pool — the right shape when engine state is
      expensive to build (Tesseract + language packs).  The pool leaves
      ~1/5 of the CPUs free for the stages feeding it.
    - "tasks": stateless tasks, one engine per task — measured strictly
      faster at BOTH parallelism levels for the DeterministicEngine, whose
      state costs microseconds to rebuild: tasks are fully elastic (no idle
      CPU reservation across the shuffle barrier, no pool ramp), 30->83 s
      vs 45->135 s on the r10 corpus.  The bench uses this mode; a
      deployment with a heavyweight engine should use "actors".

    The unbounded-corpus path is state/manifest.run_checkpointed (stages
    to partitioned parquet, spillable and resumable)."""
    from ..config import cluster_cpus

    config = config or PipelineConfig()
    staged = extract_dataset(ds, config=config, dedup=dedup, stop_after="dedup")
    pool_cpus = cluster_cpus()
    if dedup:
        # metadata-only split: finer dispatch tasks, no extra shuffle.
        # An EXACT equal split (num_blocks) measurably beats Ray's
        # target_num_rows_per_block at the same granularity (730-740 vs
        # 690 docs/s on the 30k corpus) — the row-target path splits
        # per input block and leaves ragged tails.  Blocks-per-cpu optimum
        # shifts with corpus size (6 on the 30k/32cpu corpus, 10 on the
        # 80k/24cpu scaling corpus — both measured); env-tunable.
        per_cpu = int(os.environ.get("OCR_DISPATCH_BLOCKS_PER_CPU", "6"))
        staged = staged.repartition(pool_cpus * per_cpu)
    if dispatch_mode == "tasks":
        def dispatch(batch: pa.Table) -> pa.Table:
            return ExtractDispatch(config)(batch)

        return staged.map_batches(dispatch, batch_format="pyarrow", batch_size=16)
    pool = max(2, pool_cpus - max(2, pool_cpus // 5))
    return staged.map_batches(
        ExtractDispatch,
        fn_constructor_kwargs={"config": config},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=pool,
        num_cpus=1,
    )


def extract_pages_table(tbl: pa.Table, config: PipelineConfig | None = None,
                        dedup: bool = True) -> "ray.data.Dataset":
    """Convenience: in-memory pages table -> extracted Dataset.

    from_arrow yields ONE block; split it so the plan parallelizes (a
    single-block input serializes every downstream stage)."""
    ds = ray.data.from_arrow(tbl)
    nblocks = max(2, min(64, tbl.num_rows // 8))
    return extract_dataset(ds.repartition(nblocks), config=config, dedup=dedup)

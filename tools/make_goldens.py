"""Generate the frozen golden extraction fixtures (run once, commit output).

Single-process oracle path — the same per-row transforms the Ray pipeline
uses, called directly with no Ray session, following the reference's own
golden-tree discipline (reference tests/validation_test.py:11-17: byte-level
MD5 comparison of output trees).  The pytest golden test then requires the
distributed pipeline to reproduce these bytes exactly, per url.

Usage: python tools/make_goldens.py
"""
from __future__ import annotations

import hashlib
import pathlib
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from ocr_main_ray.pipelines.extract import ExtractDispatch  # noqa: E402
from ocr_main_ray.sources.synth import synth_pages  # noqa: E402
from ocr_main_ray.stages.dedup import dedup_table  # noqa: E402
from ocr_main_ray.stages.sniff import sniff_batch  # noqa: E402

GOLDEN_N_DOCS = 80
GOLDEN_COLS = ["url", "content_type", "extracted_text", "span_offsets",
               "confidence", "tables_json", "n_pages", "word_count",
               "text_length", "engine", "file_size_mb", "meets_threshold",
               "high_quality", "error"]


def build_golden() -> pa.Table:
    pages = synth_pages(GOLDEN_N_DOCS)
    sniffed = sniff_batch(pages)
    deduped = dedup_table(sniffed)
    extracted = ExtractDispatch()(deduped)
    idx = pa.compute.sort_indices(extracted, sort_keys=[("url", "ascending")])
    return extracted.take(idx).select(GOLDEN_COLS)


def corpus_md5(tbl: pa.Table) -> str:
    h = hashlib.md5()
    for url, text in zip(tbl.column("url").to_pylist(),
                         tbl.column("extracted_text").to_pylist()):
        h.update(url.encode())
        h.update(b"\x00")
        h.update(text.encode())
        h.update(b"\x01")
    return h.hexdigest()


if __name__ == "__main__":
    out_dir = pathlib.Path(__file__).resolve().parents[1] / "tests" / "goldens"
    out_dir.mkdir(parents=True, exist_ok=True)
    tbl = build_golden()
    pq.write_table(tbl, out_dir / "extracted_golden.parquet")
    (out_dir / "extracted_golden.md5").write_text(corpus_md5(tbl) + "\n")
    print(f"wrote {tbl.num_rows} golden rows, corpus md5 {corpus_md5(tbl)}")

"""Input sources for the pages table.

The reference discovers input by globbing a directory of PDFs
(reference backend/src/infrastructure/storage/file_utils.py:16-37).  The
Ray-native equivalents:

- pages_from_parquet: the canonical source — Parquet files already in the
  pages schema (column-pruned read).
- pages_from_binary_dir: a directory of raw .pdf/.html files ->
  pages-shaped Dataset via ray.data.read_binary_files(include_paths=True);
  url = file path, warc_ts = a fixed epoch (filesystem mtime is
  deliberately NOT used — the reference's mtime ordering is
  non-deterministic, SURVEY.md section 7.4).
- pages_from_arrow: in-memory table (tests / small corpora), split into
  blocks so downstream stages parallelize.
"""
from __future__ import annotations

import datetime as _dt

import pyarrow as pa

import ray.data as rd

from ..schema import PAGES_SCHEMA

_EPOCH = _dt.datetime(2025, 1, 1)


def pages_from_parquet(path: str, columns: list[str] | None = None):
    return rd.read_parquet(path, columns=columns)


def pages_from_arrow(tbl: pa.Table, min_rows_per_block: int = 8):
    ds = rd.from_arrow(tbl)
    nblocks = max(2, min(64, tbl.num_rows // min_rows_per_block))
    return ds.repartition(nblocks)


def pages_from_binary_dir(path: str):
    """Directory of raw documents -> pages-shaped Dataset."""

    def to_pages(batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        n = len(paths)
        return pa.table(
            {
                "url": pa.array([f"file://{p}" for p in paths], pa.string()),
                "warc_ts": pa.array([_EPOCH] * n, pa.timestamp("us")),
                "html": pa.array(payloads, pa.large_binary()),
                "text": pa.array([""] * n, pa.string()),
                "lang": pa.array([""] * n, pa.string()),
            },
            schema=PAGES_SCHEMA,
        )

    ds = rd.read_binary_files(path, include_paths=True)
    return ds.map_batches(to_pages, batch_format="pyarrow")

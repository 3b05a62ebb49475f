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
- pages_from_jsonl / pages_from_csv: crawl-dump interchange formats; the
  binary payload column travels base64-encoded (JSON/CSV cannot carry raw
  bytes) and is decoded vectorized on read.
- read_pages: one entry point dispatching on path extension.
"""
from __future__ import annotations

import datetime as _dt

import pyarrow as pa

import ray.data as rd

from ..schema import PAGES_SCHEMA

_EPOCH = _dt.datetime(2025, 1, 1)


def pages_from_parquet(path: str, columns: list[str] | None = None):
    return rd.read_parquet(path, columns=columns)


def pages_from_parquet_evolving(path: str):
    """Schema-evolution-tolerant pages read: a crawl corpus accumulated
    over years has shards written BEFORE newer columns existed (e.g.
    ``lang`` added mid-crawl).  Passing the canonical schema to the parquet
    dataset makes pyarrow project missing columns as nulls per fragment —
    no per-file driver probing — and one vectorized conform pass replaces
    the nulls with the engine's defaults (empty string / fixed epoch) so
    every downstream stage sees the exact PAGES_SCHEMA contract.  Extra
    columns in newer shards are dropped by the same projection."""
    ds = rd.read_parquet(path, schema=PAGES_SCHEMA)

    def conform(batch: pa.Table) -> pa.Table:
        cols = {}
        for f in PAGES_SCHEMA:
            c = batch.column(f.name)
            if f.name == "warc_ts":
                import pyarrow.compute as pc
                c = pc.fill_null(c, pa.scalar(_EPOCH, pa.timestamp("us")))
            elif pa.types.is_string(f.type):
                import pyarrow.compute as pc
                c = pc.fill_null(c, "")
            elif pa.types.is_large_binary(f.type):
                import pyarrow.compute as pc
                c = pc.fill_null(c, b"")
            cols[f.name] = c
        return pa.table(cols, schema=PAGES_SCHEMA)

    return ds.map_batches(conform, batch_format="pyarrow")


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


def _decode_interchange(batch: pa.Table) -> pa.Table:
    """Interchange rows -> pages schema: base64-decode the payload column,
    parse the timestamp column (vectorized Arrow kernels)."""
    import base64

    import pyarrow.compute as pc

    def str_col(name: str):
        # all-empty JSON/CSV columns infer as null type -> pin to string
        if name not in batch.column_names:
            return pa.nulls(batch.num_rows, pa.string())
        col = batch.column(name)
        if pa.types.is_null(col.type):
            return pa.nulls(batch.num_rows, pa.string())
        return pc.cast(col, pa.string())

    b64 = pc.coalesce(str_col("html_b64"), "")
    payload = pa.array([base64.b64decode(v) if v else b""
                        for v in b64.to_pylist()], pa.large_binary())
    ts = batch.column("warc_ts")
    if not pa.types.is_timestamp(ts.type):
        ts = pc.strptime(pc.cast(ts, pa.string()), format="%Y-%m-%dT%H:%M:%S",
                         unit="us")
    else:
        ts = pc.cast(ts, pa.timestamp("us"))
    return pa.table({
        "url": pc.cast(batch.column("url"), pa.string()),
        "warc_ts": ts,
        "html": payload,
        "text": pc.coalesce(str_col("text"), ""),
        "lang": pc.coalesce(str_col("lang"), ""),
    }, schema=PAGES_SCHEMA)


def pages_from_jsonl(path: str):
    """JSON-lines crawl dump (url, warc_ts ISO string, html_b64, text,
    lang) -> pages-shaped Dataset."""
    return rd.read_json(path).map_batches(_decode_interchange,
                                          batch_format="pyarrow")


def pages_from_csv(path: str):
    """CSV crawl dump with the same interchange columns."""
    return rd.read_csv(path).map_batches(_decode_interchange,
                                         batch_format="pyarrow")


def read_pages(path: str):
    """Dispatch on extension: .parquet -> parquet, .jsonl/.json -> JSONL,
    .csv -> CSV, directory -> binary files."""
    import pathlib

    p = pathlib.Path(path)
    if p.is_dir():
        if list(p.glob("*.parquet")):
            return pages_from_parquet(path)
        if list(p.glob("*.warc")) or list(p.glob("*.warc.gz")):
            from .warc import pages_from_warc
            return pages_from_warc(path)
        return pages_from_binary_dir(path)
    suffix = p.suffix.lower()
    if suffix == ".parquet":
        return pages_from_parquet(path)
    if suffix == ".warc" or p.name.lower().endswith(".warc.gz"):
        from .warc import pages_from_warc
        return pages_from_warc(path)
    if suffix in (".jsonl", ".json"):
        return pages_from_jsonl(path)
    if suffix == ".csv":
        return pages_from_csv(path)
    raise ValueError(f"unsupported pages source: {path}")

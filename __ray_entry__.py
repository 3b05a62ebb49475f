"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in ocr_main_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship extraction pipeline on pages synthesized deterministically
    from /root/testdata/sf0.001/documents.parquet (BASELINE.json input_hint
    shape): sniff -> dedup-by-url -> html/pdf_native/OCR extraction."""
    from ocr_main_ray.pipelines.extract import extract_pages_table
    from ocr_main_ray.sources.synth import pages_from_documents

    pages = pages_from_documents("/root/testdata/sf0.001")
    return extract_pages_table(pages)


def queries() -> dict[str, Callable[[str], Any]]:
    from ocr_main_ray.pipelines import queries as q

    return q.QUERIES


def oracle_sql() -> dict[str, str]:
    from ocr_main_ray.pipelines import queries as q

    return q.ORACLE_SQL

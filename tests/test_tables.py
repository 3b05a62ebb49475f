"""Lines-strategy table extraction (A9 extension) + B11 summary artifact."""
import json

import pytest

from ocr_main_ray.config import ConfigurationError, PipelineConfig
from ocr_main_ray.sources.pdfgen import native_pdf, table_pdf
from ocr_main_ray.stages.assemble import render_summary_markdown
from ocr_main_ray.stages.tables import (LinesTableExtractor,
                                        StubTableExtractor,
                                        create_table_extractor)


def test_stub_parity():
    """A9: the default extractor always returns [] (table_simple.py:16-29)."""
    pdf = table_pdf([[["h"], ["v"]]])
    assert StubTableExtractor().extract_tables(pdf) == []
    assert isinstance(create_table_extractor("stub"), StubTableExtractor)


def test_lines_extractor_roundtrip():
    rows = [["name", "qty", "price"], ["ant", "3", "1.50"], ["bee", "7", "0.25"]]
    pdf = table_pdf([rows])
    out = LinesTableExtractor().extract_tables(pdf)
    assert len(out) == 1
    assert out[0]["data"] == rows          # row 0 = header, order preserved
    assert out[0]["confidence"] == 1.0


def test_lines_extractor_multi_page_and_sparse():
    t1 = [["a", "b"], ["1", "2"]]
    t2 = [["x"], [""], ["z"]]              # sparse: one empty cell
    out = LinesTableExtractor().extract_tables(table_pdf([t1, t2]))
    assert [t["data"] for t in out] == [t1, t2]
    assert out[1]["confidence"] == pytest.approx(2 / 3)


def test_lines_extractor_no_grid():
    """A plain text page has no ruled grid -> no tables."""
    assert LinesTableExtractor().extract_tables(native_pdf(["just text"])) == []


def test_unknown_extractor_raises():
    with pytest.raises(ConfigurationError):
        create_table_extractor("pdfplumber")


@pytest.mark.usefixtures("ray_session")
def test_dispatch_table_extraction():
    """config.table_extractor='lines' flows table JSON into tables_json;
    the default stub keeps '[]' byte parity."""
    import datetime as dt

    import pyarrow as pa

    from ocr_main_ray.pipelines.extract import extract_pages_table

    rows = [["h1", "h2"], ["v1", "v2"]]
    payloads = [table_pdf([rows]) + b" " * 1200]   # pad past the 1024 B gate
    pages = pa.table({
        "url": pa.array(["u0"], pa.string()),
        "warc_ts": pa.array([dt.datetime(2025, 1, 1)], pa.timestamp("us")),
        "html": pa.array(payloads, pa.large_binary()),
        "text": pa.array([""], pa.string()),
        "lang": pa.array(["eng"], pa.string()),
    })
    stub_out = extract_pages_table(pages, dedup=False).to_pandas()
    assert stub_out.iloc[0]["tables_json"] == "[]"
    lines_out = extract_pages_table(
        pages, config=PipelineConfig(table_extractor="lines"),
        dedup=False).to_pandas()
    assert json.loads(lines_out.iloc[0]["tables_json"])[0]["data"] == rows


def test_summary_markdown_renders():
    md = render_summary_markdown(
        [{"url": "u1", "n_pages": 2, "confidence": 0.0,
          "processing_time": 1.25, "status": "processed"}],
        total_docs=10, total_pages=23, avg_confidence=0.0, total_time_s=4.5)
    assert md.startswith("# Resumen de Procesamiento OCR")
    assert "**Total de Documentos**: 10" in md
    assert "| u1 | 2 | 0.00% | 1.25s | processed |" in md
    assert "- **Total de Páginas**: 23" in md
    assert "- **Tiempo Total**: 4.50 segundos" in md

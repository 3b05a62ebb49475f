"""End-to-end byte-identity: the Ray pipeline must reproduce the frozen
golden fixtures exactly, per url (the north rule's correctness gate)."""
import pathlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from ocr_main_ray.pipelines.extract import extract_pages_table
from ocr_main_ray.sources.synth import synth_pages

GOLDEN = pathlib.Path(__file__).parent / "goldens" / "extracted_golden.parquet"
GOLDEN_MD5 = pathlib.Path(__file__).parent / "goldens" / "extracted_golden.md5"


@pytest.fixture(scope="module")
def golden():
    assert GOLDEN.exists(), "run tools/make_goldens.py first"
    return pq.read_table(GOLDEN)


@pytest.fixture(scope="module")
def pipeline_out(ray_session, golden):
    from tools.make_goldens import GOLDEN_COLS, GOLDEN_N_DOCS
    pages = synth_pages(GOLDEN_N_DOCS)
    ds = extract_pages_table(pages)
    tbl = pa.Table.from_pylist(ds.take_all())
    idx = pa.compute.sort_indices(tbl, sort_keys=[("url", "ascending")])
    return tbl.take(idx).select(GOLDEN_COLS)


def test_byte_identical_text_per_url(golden, pipeline_out):
    assert pipeline_out.num_rows == golden.num_rows
    g_urls = golden.column("url").to_pylist()
    p_urls = pipeline_out.column("url").to_pylist()
    assert g_urls == p_urls
    g_txt = golden.column("extracted_text").to_pylist()
    p_txt = pipeline_out.column("extracted_text").to_pylist()
    mismatches = [u for u, a, b in zip(g_urls, g_txt, p_txt) if a != b]
    assert mismatches == [], f"text differs for {len(mismatches)} urls: {mismatches[:5]}"


def test_corpus_md5_pinned(pipeline_out):
    from tools.make_goldens import corpus_md5
    assert corpus_md5(pipeline_out) == GOLDEN_MD5.read_text().strip()


def test_all_structured_columns_match(golden, pipeline_out):
    for col in ("content_type", "span_offsets", "confidence", "tables_json",
                "n_pages", "word_count", "text_length", "engine",
                "file_size_mb", "meets_threshold", "high_quality", "error"):
        assert pipeline_out.column(col).to_pylist() == golden.column(col).to_pylist(), col


def test_spans_slice_back_to_pages(golden):
    """span_offsets are [start, end) page slices of extracted_text, joined
    by the two-byte "\\n\\n" separator (A1 contract)."""
    for row in golden.to_pylist():
        text, spans = row["extracted_text"], row["span_offsets"]
        if not spans:
            continue
        pages = [text[s["start"]:s["end"]] for s in spans]
        assert "\n\n".join(pages) == text

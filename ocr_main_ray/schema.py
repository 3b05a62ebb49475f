"""Arrow schemas for the engine's tables (SURVEY.md section 1.4)."""
from __future__ import annotations

import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.large_binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

SPAN_TYPE = pa.list_(
    pa.struct([("page", pa.int32()), ("start", pa.int64()), ("end", pa.int64())])
)

EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("content_type", pa.string()),
        ("extracted_text", pa.large_string()),
        ("span_offsets", SPAN_TYPE),
        ("confidence", pa.float64()),
        ("tables_json", pa.large_string()),
        ("n_pages", pa.int32()),
        ("word_count", pa.int64()),
        ("text_length", pa.int64()),
        ("processing_ms", pa.float64()),
        ("engine", pa.string()),
        # C1/C2 routing metadata (null for non-PDF rows): the 5-class
        # PDFType, the auto-config strategy name, and the config-table dpi
        ("pdf_type", pa.string()),
        ("strategy", pa.string()),
        ("dpi", pa.int32()),
        ("size_bytes", pa.int64()),
        ("size_bucket", pa.int32()),
        ("file_size_mb", pa.float64()),
        ("meets_threshold", pa.bool_()),
        ("high_quality", pa.bool_()),
        ("error", pa.string()),
    ]
)

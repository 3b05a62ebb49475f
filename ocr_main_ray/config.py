"""Pipeline configuration and reference-parity constants.

Mirrors the reference's defaults and quality profiles
(reference: backend/src/domain/constants/__init__.py:1-23 and
backend/src/infrastructure/config/system_config.py:18-34) without copying any
code: the *values* are the public contract (lang "spa", dpi 300, confidence
threshold 60.0, high-quality threshold 80.0, profile dpi ladder 150/300/600).
"""
from __future__ import annotations

from dataclasses import dataclass

# --- reference constants (domain/constants/__init__.py) ---------------------
ENGINE_BASIC = "basic"
ENGINE_OPENCV = "opencv"
DEFAULT_LANG = "spa"
DEFAULT_DPI = 300
MIN_QUALITY_THRESHOLD = 60.0       # use_cases.py:103 meets_threshold
HIGH_QUALITY_THRESHOLD = 80.0      # ocr_result.py:21-24 is_high_quality
MIN_VALID_PDF_BYTES = 1024         # file_utils.py:55-74 validity gate
PDF_MAGIC = b"%PDF-"

# sniffer thresholds
SIZE_SNIFF_SCANNED_BYTES = 5 * 1024 * 1024   # menu_utils.py:123-126 (fallback A)
FIRST_PAGE_TEXT_MIN_CHARS = 50               # routers/files.py:85-96 (fallback B, the real router)

# content_type taxonomy (pdf_analyzer.py:17-23 PDFType + html/empty for the web table)
CT_HTML = "html"
CT_FEED = "feed"                   # RSS/Atom syndication documents
CT_JSON = "json"                   # crawled API payloads
CT_PDF_NATIVE = "pdf_native"
CT_PDF_SCANNED = "pdf_scanned"
CT_MIXED = "mixed"
CT_EMPTY = "empty"

PAGE_JOIN = "\n\n"                 # ocr_adapters.py:73 — the byte-identity contract


@dataclass(frozen=True)
class PipelineConfig:
    """Immutable config broadcast to every stage via constructor args.

    Quality profiles reproduce the reference table
    (system_config.py:18-34): fast=dpi150/thr50, balanced=dpi300/thr60,
    high=dpi600/thr80.
    """

    lang: str = DEFAULT_LANG
    dpi: int = DEFAULT_DPI
    engine_type: str = ENGINE_BASIC
    denoise: bool = True
    enhance_contrast: bool = True
    deskew: bool = True
    min_quality_threshold: float = MIN_QUALITY_THRESHOLD
    # A9: "stub" = reference parity (always []); "lines" = the working
    # lines-strategy extension (stages/tables.py)
    table_extractor: str = "stub"
    # Ray-side knobs (no reference equivalent — the reference is sequential).
    # sniff: batch_size=None -> one batch per input block, never coalesce
    # (coalescing to a fixed batch size collapses small-block inputs into a
    # single task and serializes the whole plan).
    sniff_batch_size: int | None = None
    extract_batch_size: int = 8
    ocr_batch_size: int = 4
    # None -> derive (4, cluster_cpus - 2) at plan time: autoscaling pool
    # that can never reserve every CPU (idle actors hold their slot; a pool
    # spanning the whole node starves the shuffle feeding it).
    ocr_concurrency: tuple | int | None = None
    # web-crawl hygiene stages (default off: golden fixtures pin the
    # reference-parity path; real crawl runs turn these on)
    canonical_urls: bool = False   # dedup on canonicalized url variants
    drop_noindex: bool = False     # honor <meta name=robots noindex>

    @classmethod
    def from_quality_profile(cls, profile: str) -> "PipelineConfig":
        table = {
            "fast": dict(dpi=150, min_quality_threshold=50.0),
            "balanced": dict(dpi=300, min_quality_threshold=60.0),
            "high": dict(dpi=600, min_quality_threshold=80.0),
        }
        if profile not in table:
            raise ConfigurationError(f"unknown quality profile: {profile!r}")
        return cls(**table[profile])


def cluster_cpus(default: int = 8) -> int:
    """CPU count of the live Ray cluster (single definition for every stage
    that sizes pools/buckets off it)."""
    import ray

    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", default))
    return default


class ConfigurationError(ValueError):
    """Unknown engine / profile (parity: adapter_factory.py:35 raises on
    unknown engine_type; domain/exceptions.py taxonomy)."""


class ProcessingError(RuntimeError):
    """Per-document processing failure. In the dataplane this is recorded in
    the nullable ``error`` column instead of raised across blocks
    (SURVEY.md section 4.3.5)."""

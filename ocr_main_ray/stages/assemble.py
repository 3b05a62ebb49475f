"""Formatting / serialization scalar functions (reference section B).

Quirks preserved bug-for-bug because they affect output bytes
(SURVEY.md section 7.3 risk 1):

- B9 heading rule (markdown_generator.py:78-100): a paragraph shorter than
  100 chars that isupper() and does not start with a space becomes
  ``### {p}``; empty paragraphs dropped; re-join with "\n\n" plus a trailing
  "\n\n".
- B10 table markdown (markdown_generator.py:102-136): row 0 is the header,
  pipe table, optional ``*Confianza: {c:.2%}*`` suffix.
- B8 document markdown: header template with filename/pages/confidence
  (``{:.2%}``)/time + footer with the tesseract flags (markdown_generator.py:
  13-28,138-158) — template fields reproduced, static wording ours.
- E1 projection (entities/document.py:57-75): text_length = len(text), etc.

All pure str -> str; applied per row inside map_batches.
"""
from __future__ import annotations

import json


def format_text_structure(text: str) -> str:
    """B9 — the quirky heading formatter, bug-for-bug with the reference's
    _format_text_content (markdown_generator.py:78-100):

    - empty / whitespace-only text -> the literal placeholder;
    - the WHOLE text is stripped once, then split on "\\n\\n";
    - each paragraph is kept if it strips non-empty but is tested and
      emitted UNSTRIPPED — so "  SHORT CAPS" is NOT a heading (leading
      space) and surrounding whitespace counts toward the <100 length."""
    if not text or not text.strip():
        return "*(No se extrajo texto del documento)*\n\n"
    paragraphs = text.strip().split("\n\n")
    out = []
    for p in paragraphs:
        if p.strip():
            if len(p) < 100 and p.isupper() and not p.startswith(" "):
                out.append(f"### {p}")
            else:
                out.append(p)
    return "\n\n".join(out) + "\n\n"


def table_to_markdown(table: dict) -> str:
    """B10 — pipe-table rendering of {data: [[...]], confidence}."""
    data = table.get("data") or []
    if not data:
        return ""
    header = [str(c) for c in data[0]]
    lines = ["| " + " | ".join(header) + " |",
             "| " + " | ".join("---" for _ in header) + " |"]
    for row in data[1:]:
        lines.append("| " + " | ".join(str(c) for c in row) + " |")
    conf = table.get("confidence")
    if conf is not None:
        lines.append("")
        lines.append(f"*Confianza: {conf:.2%}*")
    return "\n".join(lines)


def render_markdown(url: str, extracted_text: str, tables_json: str,
                    confidence: float, n_pages: int, processing_ms: float,
                    engine: str, dpi: int, lang: str) -> str:
    """B8 — per-document markdown (header + formatted body + tables +
    footer).  Timestamps are intentionally absent: a dataplane function must
    be deterministic (the reference stamps datetime.now(), which its own
    golden-MD5 test then has to work around)."""
    parts = [
        f"# Documento: {url}",
        "",
        f"- **Páginas Procesadas**: {n_pages}",
        f"- **Confianza OCR**: {confidence:.2%}",
        f"- **Motor OCR**: {engine}",
        f"- **Tiempo de Proceso (ms)**: {processing_ms:.1f}",
        "",
        "---",
        "",
        format_text_structure(extracted_text).rstrip("\n"),
    ]
    tables = json.loads(tables_json) if tables_json else []
    if tables:
        parts += ["", "## Tablas", ""]
        for t in tables:
            parts.append(table_to_markdown(t))
    parts += [
        "",
        "---",
        f"*Generado con ocr_main_ray (--oem 3 --psm 6, dpi={dpi}, lang={lang})*",
    ]
    return "\n".join(parts)


REFERENCE_HEADER_TEMPLATE = """# {filename}

## Información del Documento

- **Archivo Original**: {filename}
- **Páginas Procesadas**: {total_pages}
- **Confianza OCR**: {confidence_score:.2%}
- **Tiempo de Procesamiento**: {processing_time:.2f} segundos
- **Fecha de Procesamiento**: {processed_date}
- **ID de Documento**: {document_id}

---

## Contenido Extraído

"""

REFERENCE_FOOTER_TEMPLATE = """---

## Información Técnica

- **Motor OCR**: Tesseract
- **Configuración**: {tesseract_config}
- **DPI**: {dpi}
- **Idioma**: {language}

*Documento generado automáticamente por OCR Processing System v2.0.0*
"""


def _format_tables_reference(tables: list[dict]) -> str:
    """The reference's _format_tables (markdown_generator.py:102-136),
    byte-for-byte: numbered '### Tabla i' sections, first data row as the
    pipe header, '|---|'-style separator, '*(Tabla vacía)*' placeholder,
    optional truthy-gated confidence line."""
    if not tables:
        return ""
    out = "## Tablas Extraídas\n\n"
    for i, table in enumerate(tables, 1):
        out += f"### Tabla {i}\n\n"
        data = table.get("data", [])
        if not data:
            out += "*(Tabla vacía)*\n\n"
            continue
        headers = data[0] if data else []
        if headers:
            out += "| " + " | ".join(str(c) for c in headers) + " |\n"
            out += "|" + "---|" * len(headers) + "\n"
            for row in data[1:]:
                out += "| " + " | ".join(str(c) for c in row) + " |\n"
        out += "\n"
        if table.get("confidence"):
            out += f"*Confianza: {table['confidence']:.2%}*\n\n"
    return out


def render_markdown_reference_exact(
        filename: str, extracted_text: str, tables: list[dict] | None,
        total_pages: int, confidence_score: float, processing_time_s: float,
        processed_date: str, document_id: str,
        tesseract_config: str = "--oem 3 --psm 6", dpi: int = 300,
        language: str = "spa") -> str:
    """B8, reference-EXACT mode: the full template from
    markdown_generator.py:13-28 + generate_markdown:60-76, including the
    'Información del Documento' block the default renderer drops for
    determinism.  The two non-deterministic fields are INJECTED
    (``processed_date``, ``document_id``) instead of stamped with
    datetime.now(), so the output is a pure function and golden-testable;
    pass the run's wall time from the driver when reference behavior is
    wanted."""
    md = REFERENCE_HEADER_TEMPLATE.format(
        filename=filename, total_pages=total_pages,
        confidence_score=confidence_score,
        processing_time=processing_time_s,
        processed_date=processed_date, document_id=document_id)
    md += format_text_structure(extracted_text)
    if tables:
        md += _format_tables_reference(tables)
    md += REFERENCE_FOOTER_TEMPLATE.format(
        tesseract_config=tesseract_config, dpi=dpi, language=language)
    return md


def render_summary_markdown(doc_rows: list[dict], total_docs: int,
                            total_pages: int, avg_confidence: float,
                            total_time_s: float) -> str:
    """B11 — the multi-document summary artifact
    (markdown_generator.py:173-217): per-doc pipe table + corpus statistics.
    The generation-date line is intentionally absent (same determinism
    policy as render_markdown); the listed rows are a bounded sample while
    the statistics cover the WHOLE corpus via distributed aggregates."""
    lines = [
        "# Resumen de Procesamiento OCR",
        "",
        f"**Total de Documentos**: {total_docs}",
        "",
        "## Documentos Procesados",
        "",
        "| Documento | Páginas | Confianza | Tiempo | Estado |",
        "|-----------|---------|-----------|--------|--------|",
    ]
    for d in doc_rows:
        lines.append(
            f"| {d.get('url', 'N/A')} | {d.get('n_pages', 0)} "
            f"| {d.get('confidence', 0):.2%} | {d.get('processing_time', 0):.2f}s "
            f"| {d.get('status', 'unknown')} |")
    lines += [
        "",
        "## Estadísticas",
        "",
        f"- **Total de Páginas**: {total_pages}",
        f"- **Confianza Promedio**: {avg_confidence:.2%}",
        f"- **Tiempo Total**: {total_time_s:.2f} segundos",
        "",
        "---",
        "",
        "*Generado con ocr_main_ray*",
    ]
    return "\n".join(lines)


def document_projection(url: str, extracted_text: str, tables_json: str,
                        confidence: float, processing_ms: float) -> dict:
    """E1 — Document -> dict projection."""
    tables = json.loads(tables_json) if tables_json else []
    return {
        "url": url,
        "text_length": len(extracted_text),
        "tables_count": len(tables),
        "confidence": confidence,
        "processing_time": processing_ms / 1000.0,
    }


def word_count(text: str) -> int:
    """G8 (use_cases.py:195): len(text.split())."""
    return len(text.split())

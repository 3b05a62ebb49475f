from ocr_main_ray.stages.assemble import (document_projection,
                                          format_text_structure,
                                          table_to_markdown, word_count)
from ocr_main_ray.stages.ocr import pairwise_average


def test_heading_rule_quirk():
    """B9: < 100 chars AND isupper AND no leading space -> '### '."""
    t = "SHORT HEADING\n\nnormal paragraph body\n\n" + "L" * 100 + "\n\n" \
        + "MIXED Case Not Upper"
    out = format_text_structure(t)
    blocks = out.split("\n\n")
    assert blocks[0] == "### SHORT HEADING"
    assert blocks[1] == "normal paragraph body"
    assert blocks[2] == "L" * 100          # 100 chars: NOT < 100 -> no heading
    assert blocks[3] == "MIXED Case Not Upper"


def _middle(p: str) -> str:
    """Run a paragraph through the formatter in MIDDLE position, where the
    reference's whole-text strip cannot touch it."""
    out = format_text_structure(f"start para\n\n{p}\n\nend para")
    return out.split("\n\n")[1]


def test_heading_rule_truth_table():
    """Truth table transcribing the reference's _format_text_content branch
    conditions (markdown_generator.py:86-100): the paragraph is tested and
    emitted UNSTRIPPED — only the whole text is stripped once."""
    cases = [
        ("CAPS", "### CAPS"),                      # <100, upper, no lead space
        ("  SPACED CAPS", "  SPACED CAPS"),        # leading space -> no heading
        ("X" * 99, "### " + "X" * 99),             # 99 < 100 -> heading
        ("X" * 100, "X" * 100),                    # 100: not < 100
        ("X" * 98 + "  ", "X" * 98 + "  "),        # UNSTRIPPED len 100 -> no
        ("Mixed Case", "Mixed Case"),              # not isupper
        ("CAPS WITH 123", "### CAPS WITH 123"),    # digits don't break isupper
    ]
    for p, expect in cases:
        assert _middle(p) == expect, repr(p)


def test_heading_rule_outer_strip():
    # the reference strips the WHOLE text before splitting, so a single
    # leading-space paragraph IS a heading (the spaces are gone)...
    assert format_text_structure("  SPACED HEADING") == "### SPACED HEADING\n\n"
    # ...but a middle paragraph keeps its spaces and is NOT one
    assert _middle("  SPACED HEADING") == "  SPACED HEADING"


def test_trailing_join_and_placeholder():
    assert format_text_structure("a b c") == "a b c\n\n"
    # empty / whitespace-only -> the reference's literal placeholder
    # (markdown_generator.py:80-81)
    placeholder = "*(No se extrajo texto del documento)*\n\n"
    assert format_text_structure("") == placeholder
    assert format_text_structure("\n\n\n\n") == placeholder
    assert format_text_structure("   ") == placeholder


def test_pairwise_average_quirk():
    """B12: avg=(avg+v)/2 fold — order-dependent, NOT the arithmetic mean."""
    assert pairwise_average([80.0, 40.0]) == 40.0  # ((0+80)/2 + 40)/2
    assert pairwise_average([40.0, 80.0]) == 50.0  # order matters
    assert pairwise_average([]) == 0.0


def test_table_markdown():
    t = {"data": [["h1", "h2"], [1, 2]], "confidence": 0.5}
    md = table_to_markdown(t)
    assert md.splitlines()[0] == "| h1 | h2 |"
    assert md.splitlines()[1] == "| --- | --- |"
    assert md.splitlines()[2] == "| 1 | 2 |"
    assert md.endswith("*Confianza: 50.00%*")
    assert table_to_markdown({"data": []}) == ""


def test_word_count():
    assert word_count("") == 0
    assert word_count("  a   b \n c ") == 3


def test_document_projection():
    d = document_projection("u", "hello world", "[]", 0.0, 1500.0)
    assert d == {"url": "u", "text_length": 11, "tables_count": 0,
                 "confidence": 0.0, "processing_time": 1.5}


def test_reference_exact_markdown_template_bytes():
    """B8 reference-exact mode: full template pinned byte-for-byte against
    the reference's format strings (markdown_generator.py:13-28 header,
    :102-136 tables, :138-150 footer) with injected date/id."""
    from ocr_main_ray.stages.assemble import render_markdown_reference_exact

    md = render_markdown_reference_exact(
        filename="informe.pdf",
        extracted_text="INTRO\n\ncuerpo del documento",
        tables=[{"data": [["a", "b"], [1, 2]], "confidence": 0.5},
                {"data": []}],
        total_pages=3, confidence_score=0.875, processing_time_s=1.5,
        processed_date="2024-05-01 10:20:30", document_id="doc-42")
    want = (
        "# informe.pdf\n"
        "\n"
        "## Información del Documento\n"
        "\n"
        "- **Archivo Original**: informe.pdf\n"
        "- **Páginas Procesadas**: 3\n"
        "- **Confianza OCR**: 87.50%\n"
        "- **Tiempo de Procesamiento**: 1.50 segundos\n"
        "- **Fecha de Procesamiento**: 2024-05-01 10:20:30\n"
        "- **ID de Documento**: doc-42\n"
        "\n"
        "---\n"
        "\n"
        "## Contenido Extraído\n"
        "\n"
        "### INTRO\n"
        "\n"
        "cuerpo del documento\n"
        "\n"
        "## Tablas Extraídas\n"
        "\n"
        "### Tabla 1\n"
        "\n"
        "| a | b |\n"
        "|---|---|\n"
        "| 1 | 2 |\n"
        "\n"
        "*Confianza: 50.00%*\n"
        "\n"
        "### Tabla 2\n"
        "\n"
        "*(Tabla vacía)*\n"
        "\n"
        "---\n"
        "\n"
        "## Información Técnica\n"
        "\n"
        "- **Motor OCR**: Tesseract\n"
        "- **Configuración**: --oem 3 --psm 6\n"
        "- **DPI**: 300\n"
        "- **Idioma**: spa\n"
        "\n"
        "*Documento generado automáticamente por OCR Processing System v2.0.0*\n"
    )
    assert md == want


def test_reference_exact_markdown_empty_text_and_zero_confidence():
    from ocr_main_ray.stages.assemble import render_markdown_reference_exact

    md = render_markdown_reference_exact(
        filename="x.pdf", extracted_text="   ", tables=None, total_pages=0,
        confidence_score=0.0, processing_time_s=0.0,
        processed_date="d", document_id="i")
    assert "*(No se extrajo texto del documento)*\n\n" in md
    assert "- **Confianza OCR**: 0.00%\n" in md
    # falsy table confidence is DROPPED (reference's truthy gate), and a
    # zero-confidence table renders without the confidence line
    md2 = render_markdown_reference_exact(
        filename="x.pdf", extracted_text="t", total_pages=1,
        tables=[{"data": [["h"], ["v"]], "confidence": 0.0}],
        confidence_score=1.0, processing_time_s=2.0,
        processed_date="d", document_id="i")
    assert "*Confianza:" not in md2

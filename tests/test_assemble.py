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


def test_heading_rule_leading_space():
    # paragraphs are stripped first; the startswith-space check then never
    # fires on the stripped text — reference order preserved (strip, test)
    out = format_text_structure("  SPACED HEADING")
    assert out == "### SPACED HEADING\n\n"


def test_trailing_join():
    assert format_text_structure("a b c") == "a b c\n\n"
    assert format_text_structure("") == ""
    assert format_text_structure("\n\n\n\n") == ""


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

"""Property-based tests (hypothesis) for the parsing/rendering cores.

derandomized: the correctness gate must be reproducible — exploratory
(randomized) runs belong in local dev, not the driver's pytest pass."""
import string

from hypothesis import given, settings, strategies as st

settings.register_profile("ci", derandomize=True)
settings.load_profile("ci")

from ocr_main_ray.glyphs import CHARSET, decode_page, normalize_for_scan, render_page
from ocr_main_ray.sources.pdfgen import native_pdf
from ocr_main_ray.stages import pdf_native as P
from ocr_main_ray.stages.assemble import format_text_structure

# printable text without control chars for PDF strings
pdf_text = st.text(
    alphabet=string.ascii_letters + string.digits + " .,:;!?'\"()-\\/%&+=#",
    min_size=0, max_size=120,
)
glyph_line = st.text(alphabet=CHARSET, min_size=0, max_size=40)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(pdf_text, min_size=1, max_size=5), min_size=1, max_size=4),
       st.booleans())
def test_pdf_text_roundtrip(pages_lines, compress):
    pages = ["\n".join(lines) for lines in pages_lines]
    data = native_pdf(pages, compress=compress)
    assert P.extract_page_texts(data) == pages
    assert P.page_count(data) == len(pages)


@settings(max_examples=60, deadline=None)
@given(st.lists(glyph_line, min_size=1, max_size=10))
def test_glyph_roundtrip(lines):
    t = normalize_for_scan("\n".join(lines))
    assert decode_page(render_page(t)) == t


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=300))
def test_formatter_idempotent_shape(text):
    out = format_text_structure(text)
    # output is either empty or ends with exactly one paragraph separator
    assert out == "" or out.endswith("\n\n")
    # no empty paragraphs survive
    if out:
        assert all(p.strip() for p in out[:-2].split("\n\n"))


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_parser_never_crashes_on_garbage(data):
    try:
        P.parse_pdf(b"%PDF-" + data)
    except P.PdfParseError:
        pass  # the only allowed failure mode
    assert P.page_count(b"%PDF-" + data) >= 1

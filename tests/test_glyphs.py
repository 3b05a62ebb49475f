import numpy as np

from ocr_main_ray.glyphs import (CHARSET, FONT, decode_page, normalize_for_scan,
                                 render_page)


def test_font_distinct():
    assert len({b.tobytes() for b in FONT}) == len(CHARSET)


def test_normalize():
    assert normalize_for_scan("Hello, World!") == "HELLO, WORLD!"
    assert normalize_for_scan("a\n\n\nb") == "A\n\n\nB"
    assert normalize_for_scan("\n\n x \n\n") == "X"
    assert normalize_for_scan("tilde~char") == "TILDE?CHAR"


def test_roundtrip_simple():
    t = normalize_for_scan("The quick brown fox 0123456789\nsecond line here")
    assert decode_page(render_page(t)) == t


def test_roundtrip_blank_interior_lines():
    t = normalize_for_scan("Title\n\nBody paragraph one.\n\nBody two.")
    assert decode_page(render_page(t)) == t


def test_decode_ignores_specks():
    t = normalize_for_scan("Stable anchor line of text here")
    img = render_page(t).copy()
    img[-1, -1] = 0  # isolated speck outside the grid
    assert decode_page(img) == t


def test_render_deterministic():
    t = normalize_for_scan("Determinism check 42")
    a, b = render_page(t), render_page(t)
    assert np.array_equal(a, b)

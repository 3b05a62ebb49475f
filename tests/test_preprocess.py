import numpy as np

from ocr_main_ray.glyphs import decode_page, normalize_for_scan, render_page
from ocr_main_ray.stages import preprocess as pp


def _ruled_page():
    page = np.full((400, 600), 255, np.uint8)
    for y in range(50, 350, 40):
        page[y : y + 2, 40:560] = 0
    return page


def test_deskew_angle_recovery():
    page = _ruled_page()
    for angle in (2.0, 5.0, -3.0):
        rot = pp.rotate_replicate(page, -angle)
        est = pp.estimate_skew_angle(rot)
        assert abs(est - angle) < 0.6, (angle, est)


def test_deskew_threshold_semantics():
    """Rotate only if |median angle| > 0.5 deg (ocr_adapters.py:246)."""
    page = _ruled_page()
    small = pp.rotate_replicate(page, -0.2)
    assert np.array_equal(pp.correct_skew(small), small)  # below threshold
    big = pp.rotate_replicate(page, -3.0)
    assert not np.array_equal(pp.correct_skew(big), big)


def test_deskew_exception_fallback():
    bad = np.zeros((0, 0), dtype=np.uint8)
    out = pp.correct_skew(bad)  # silent fallback, no raise (A5 parity)
    assert out.shape == bad.shape


def test_angle_filter_45():
    # vertical lines -> theta=0 -> angle=-90, filtered by |a| < 45 -> 0.0
    page = np.full((400, 600), 255, np.uint8)
    for x in range(50, 550, 40):
        page[40:360, x : x + 2] = 0
    assert pp.estimate_skew_angle(page) == 0.0


def test_adaptive_threshold_binary_output():
    img = render_page(normalize_for_scan("threshold test line of text"))
    out = pp.adaptive_threshold_gaussian(img)
    assert set(np.unique(out)) <= {0, 255}


def test_chain_preserves_text():
    lines = [f"Line {i} deterministic chain content {i * i}" for i in range(10)]
    rule = "-" * 48
    t = normalize_for_scan("\n".join([rule, "HEADER", rule, ""] + lines + ["", rule]))
    img = render_page(t)
    out = pp.preprocess_chain(img)
    assert decode_page(out) == t


def test_chain_order_flags():
    img = render_page(normalize_for_scan("flags test content here okay"))
    # each flag combination must be deterministic and binary-valued
    for dn in (False, True):
        for ct in (False, True):
            a = pp.preprocess_chain(img, denoise=dn, contrast=ct, deskew=False)
            b = pp.preprocess_chain(img, denoise=dn, contrast=ct, deskew=False)
            assert np.array_equal(a, b)


def test_morphology_11_kernel_is_identity():
    """The reference closes/opens with np.ones((1,1)) — a no-op by
    definition; our chain omits the inert steps, so thresholded output IS
    the final output."""
    img = render_page(normalize_for_scan("identity morphology"))
    out = pp.preprocess_chain(img, denoise=False, contrast=False, deskew=False)
    assert np.array_equal(out, pp.adaptive_threshold_gaussian(img))

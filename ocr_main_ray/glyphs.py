"""Deterministic 5x7 glyph font: render text to page rasters and decode back.

This is the hermetic substitute for the render->OCR round trip.  The reference
pipeline shape is  PDF -> page images at dpi -> (preprocess) -> OCR per page ->
"\n\n".join(pages)  (reference: backend/src/infrastructure/adapters/
ocr_adapters.py:49-76).  Tesseract/poppler are unavailable in this sandbox, so
the DeterministicEngine (stages/ocr.py) renders and recognizes a synthetic but
fully deterministic glyph font; byte-identity of extracted text is enforced
against frozen golden fixtures exactly like the reference's own MD5 golden-tree
check (tests/validation_test.py:11-17).

Glyph bitmaps are derived from MD5 bits of the character — distinct, dense and
reproducible; human readability is irrelevant to the contract.  Pure numpy,
no per-pixel Python loops in render/decode hot paths.
"""
from __future__ import annotations

import hashlib

import numpy as np

GLYPH_W, GLYPH_H = 5, 7          # ink box
CELL_W, CELL_H = 6, 8            # glyph + 1px padding right/bottom
MARGIN = 8                       # page margin in px
CHARSET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 .,:;!?'\"()-/%&+=#"
_SPACE_IDX = CHARSET.index(" ")


def _glyph_bitmap(ch: str) -> np.ndarray:
    """35-bit bitmap from md5(ch); space is blank; ink count forced >= 12 so
    glyphs are robustly distinguishable after thresholding."""
    if ch == " ":
        return np.zeros((GLYPH_H, GLYPH_W), dtype=np.uint8)
    digest = hashlib.md5(ch.encode("utf-8")).digest()
    bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))[: GLYPH_H * GLYPH_W]
    bmp = bits.reshape(GLYPH_H, GLYPH_W).astype(np.uint8)
    if bmp.sum() < 12:  # re-hash until dense enough (deterministic chain)
        extra = hashlib.md5(digest).digest()
        more = np.unpackbits(np.frombuffer(extra, dtype=np.uint8))[: GLYPH_H * GLYPH_W]
        bmp = (bmp | more.reshape(GLYPH_H, GLYPH_W)).astype(np.uint8)
    bmp[0, 0] = 1  # anchor pixel: every non-space glyph marks the cell origin
    # connect isolated pixels (deterministically: right, down, left, up):
    # the decoder's speck filter drops ink with zero neighbours, so glyphs
    # must not contain any or sparse glyphs lose their grid anchor
    changed = True
    while changed:
        changed = False
        for y in range(GLYPH_H):
            for x in range(GLYPH_W):
                if not bmp[y, x]:
                    continue
                y0, y1 = max(0, y - 1), min(GLYPH_H, y + 2)
                x0, x1 = max(0, x - 1), min(GLYPH_W, x + 2)
                if bmp[y0:y1, x0:x1].sum() > 1:
                    continue
                for dy, dx in ((0, 1), (1, 0), (0, -1), (-1, 0)):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < GLYPH_H and 0 <= xx < GLYPH_W:
                        bmp[yy, xx] = 1
                        changed = True
                        break
    return bmp


FONT = np.stack([_glyph_bitmap(c) for c in CHARSET])          # (n, 7, 5) in {0,1}
_FONT_FLAT = FONT.reshape(len(CHARSET), -1).astype(np.int16)  # for matching

# sanity: all glyphs pairwise distinct (space is the unique blank)
_keys = {bmp.tobytes() for bmp in FONT}
assert len(_keys) == len(CHARSET), "glyph collision in deterministic font"


def normalize_for_scan(text: str) -> str:
    """Project arbitrary text onto the engine charset: uppercase, unsupported
    chars -> '?', strip each line, drop leading/trailing blank lines.  This is
    the engine's documented recognition limitation (analogous to a Tesseract
    lang pack); goldens are generated after normalization."""
    lines = []
    for ln in text.upper().splitlines():
        ln = "".join(c if c in CHARSET else "?" for c in ln).strip()
        lines.append(ln)
    while lines and not lines[0]:
        lines.pop(0)
    while lines and not lines[-1]:
        lines.pop()
    return "\n".join(lines)


def render_page(text: str, pad_to_multiple: int = 1) -> np.ndarray:
    """Render normalized text to a uint8 grayscale page: 255 background,
    0 ink.  Layout: fixed grid, cell (CELL_H, CELL_W), MARGIN on all sides."""
    lines = text.split("\n") if text else [""]
    ncols = max((len(ln) for ln in lines), default=0)
    ncols = max(ncols, 1)
    h = 2 * MARGIN + len(lines) * CELL_H
    w = 2 * MARGIN + ncols * CELL_W
    if pad_to_multiple > 1:
        h += (-h) % pad_to_multiple
        w += (-w) % pad_to_multiple
    img = np.full((h, w), 255, dtype=np.uint8)
    idx = np.frombuffer(CHARSET.encode("latin-1"), dtype=np.uint8)
    lut = np.zeros(256, dtype=np.int16) - 1
    lut[idx] = np.arange(len(CHARSET))
    for i, ln in enumerate(lines):
        if not ln:
            continue
        codes = lut[np.frombuffer(ln.encode("latin-1"), dtype=np.uint8)]
        y0 = MARGIN + i * CELL_H
        for j, g in enumerate(codes):
            if g < 0 or g == _SPACE_IDX:
                continue
            x0 = MARGIN + j * CELL_W
            cell = img[y0 : y0 + GLYPH_H, x0 : x0 + GLYPH_W]
            cell[FONT[g] == 1] = 0
    return img


def decode_page(img: np.ndarray, ink_threshold: int = 128) -> str:
    """Recover text from a (possibly preprocessed) page raster.

    Grid-anchored at the ink bounding box; per cell, nearest-glyph match by
    bitmap agreement with a +-1 px shift search (tolerates resampling from the
    preprocessing chain).  Deterministic: ties break by CHARSET order.
    """
    ink = (img < ink_threshold)
    # anchor the grid on "structural" ink only: pixels with >= 1 ink
    # neighbour in their 3x3 window (the font contains no isolated pixels
    # by construction).  Isolated specks from the adaptive threshold step
    # must not shift the bounding box.
    nb = np.zeros(ink.shape, dtype=np.int8)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            shifted = np.zeros_like(ink)
            ys0, ys1 = max(dy, 0), ink.shape[0] + min(dy, 0)
            xs0, xs1 = max(dx, 0), ink.shape[1] + min(dx, 0)
            shifted[ys0:ys1, xs0:xs1] = ink[ys0 - dy : ys1 - dy, xs0 - dx : xs1 - dx]
            nb += shifted
    solid = ink & (nb >= 1)
    ys, xs = np.nonzero(solid)
    if ys.size == 0:
        return ""
    y0, x0 = int(ys.min()), int(xs.min())
    y1 = int(ys.max())
    nrows = (y1 - y0) // CELL_H + 1
    h, w = img.shape

    # max columns across the grid (per-line extents trimmed later)
    sxs = np.nonzero(solid[y0 : y0 + nrows * CELL_H, :].any(axis=0))[0]
    ncols_max = (int(sxs.max()) - x0) // CELL_W + 1 if sxs.size else 0
    if ncols_max <= 0:
        return ""

    # gather all (nrows * ncols_max) cells for each of the 9 shifts at once;
    # agreement(cell, glyph) = P - cellsum - glyphsum + 2 * cell @ glyph
    P = GLYPH_H * GLYPH_W
    font_f = _FONT_FLAT.astype(np.float32)                     # (G, 35)
    font_sum = font_f.sum(axis=1)                              # (G,)
    pad = 1
    ink_pad = np.zeros((h + 2 * pad, w + 2 * pad), dtype=np.float32)
    ink_pad[pad : pad + h, pad : pad + w] = ink
    iy = (y0 + pad) + CELL_H * np.arange(nrows)[:, None, None, None] \
        + np.arange(GLYPH_H)[None, None, :, None]              # (R,1,7,1)
    jx = (x0 + pad) + CELL_W * np.arange(ncols_max)[None, :, None, None] \
        + np.arange(GLYPH_W)[None, None, None, :]              # (1,C,1,5)

    best_score = np.full((nrows, ncols_max), -1.0, dtype=np.float32)
    best_g = np.full((nrows, ncols_max), _SPACE_IDX, dtype=np.int64)
    for dy in (0, -1, 1):
        row_ok = ((y0 + CELL_H * np.arange(nrows) + dy) >= 0) & \
                 ((y0 + CELL_H * np.arange(nrows) + dy + GLYPH_H) <= h)
        for dx in (0, -1, 1):
            col_ok = ((x0 + CELL_W * np.arange(ncols_max) + dx) >= 0) & \
                     ((x0 + CELL_W * np.arange(ncols_max) + dx + GLYPH_W) <= w)
            cells = ink_pad[iy + dy, jx + dx].reshape(nrows * ncols_max, P)
            scores = (P - cells.sum(axis=1)[:, None] - font_sum[None, :]
                      + 2.0 * cells @ font_f.T)                # (RC, G)
            g = scores.argmax(axis=1)
            s = scores[np.arange(len(g)), g].reshape(nrows, ncols_max)
            g = g.reshape(nrows, ncols_max)
            valid = row_ok[:, None] & col_ok[None, :]
            better = valid & (s > best_score)
            best_score[better] = s[better]
            best_g[better] = g[better]

    # blank-cell detection on the cleaned ink at shift 0 (space wins there)
    solid_pad = np.zeros((h + 2 * pad, w + 2 * pad), dtype=bool)
    solid_pad[pad : pad + h, pad : pad + w] = solid
    cell_solid = solid_pad[iy, jx].reshape(nrows, ncols_max, P).any(axis=2)
    best_g[~cell_solid] = _SPACE_IDX

    charset_arr = np.frombuffer(CHARSET.encode("latin-1"), dtype=np.uint8)
    lines = []
    for i in range(nrows):
        band = solid[y0 + i * CELL_H : y0 + i * CELL_H + GLYPH_H, :]
        bxs = np.nonzero(band)[1]
        if bxs.size == 0:
            lines.append("")
            continue
        ncols = (int(bxs.max()) - x0) // CELL_W + 1
        lines.append(charset_arr[best_g[i, :ncols]].tobytes().decode("latin-1").rstrip())
    return "\n".join(lines)

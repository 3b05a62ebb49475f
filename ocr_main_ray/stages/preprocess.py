"""Numpy reimplementation of the reference's OpenCV page-preprocessing chain.

Chain order is the semantic contract (reference:
backend/src/infrastructure/adapters/ocr_adapters.py:170-209):

    grayscale -> bilateral(9, 75, 75) if denoise -> CLAHE(2.0, 8x8) if
    contrast -> deskew if enabled -> adaptiveThreshold(255, GAUSSIAN,
    BINARY, 11, 2) -> morphology CLOSE then OPEN with np.ones((1,1))

The (1,1) morphology kernel makes both morphology steps identity ops — a
reference quirk we preserve deliberately (erode/dilate with a 1x1 structuring
element changes nothing).  Deskew (ocr_adapters.py:211-258): edges -> Hough
lines -> first min(10, n) lines -> angle = theta*180/pi - 90, keep |a| < 45 ->
median -> rotate only if |median| > 0.5, silent fallback to the original image
on any exception.

All kernels are vectorized numpy; no OpenCV dependency.
"""
from __future__ import annotations

import numpy as np

DESKEW_MAX_ABS_ANGLE = 45.0
DESKEW_MIN_ROTATE = 0.5
HOUGH_THRESHOLD = 100
HOUGH_MAX_LINES = 10

# Below this pixel count the kernels switch to offset-stacked formulations:
# at OCR-render page sizes (~100x300 px) numpy launch overhead dominates, so
# one big op beats 81 small ones; above it the streaming loops win on cache
# locality.  Every fast path is bit-equal to its loop twin (tests pin it).
_SMALL_PAGE_PX = 1 << 16


def to_grayscale(img: np.ndarray) -> np.ndarray:
    if img.ndim == 3:  # reference: cv2.cvtColor BGR2GRAY; ITU-R 601 weights
        w = np.array([0.114, 0.587, 0.299])  # BGR order like OpenCV
        return np.clip(img.astype(np.float64) @ w, 0, 255).astype(np.uint8)
    return img


def _shifted(img: np.ndarray, dy: int, dx: int) -> np.ndarray:
    """Shift with edge replication (BORDER_REPLICATE):
    ``shifted[y, x] = img[clip(y+dy), clip(x+dx)]``.  pad+slice, not fancy
    indexing — identical values, a fraction of the memory traffic (the
    gather formulation was ~6 s of `np.take` per thousand pages in the
    dispatch profile)."""
    h, w = img.shape
    pad = np.pad(img, ((max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0))),
                 mode="edge")
    y0, x0 = max(dy, 0), max(dx, 0)
    return pad[y0 : y0 + h, x0 : x0 + w]


_BILATERAL_LUT: dict[float, np.ndarray] = {}


def bilateral_filter(img: np.ndarray, d: int = 9, sigma_color: float = 75.0,
                     sigma_space: float = 75.0) -> np.ndarray:
    """Edge-preserving smoothing, vectorized as d*d shifted stacks.

    The color weight exp(-(diff^2)/(2*sigma^2)) is a 256-entry lookup table
    over |intensity difference| (uint8 input), float32 throughout — same
    kernel, ~10x cheaper than per-pixel exp."""
    key = (d, sigma_color, sigma_space)
    if key not in _BILATERAL_LUT:
        diffs = np.arange(256, dtype=np.float32)
        base = np.exp(-(diffs ** 2) / (2.0 * np.float32(sigma_color) ** 2)
                      ).astype(np.float32)
        r_ = d // 2
        # fold the scalar spatial weight into a per-offset scaled LUT:
        # (lut * sw)[v] is the identical float32 product lut[v] * sw, so
        # the per-pixel `cw *= sw` pass disappears bit-exactly
        scaled = {}
        for dy in range(-r_, r_ + 1):
            for dx in range(-r_, r_ + 1):
                sw = np.float32(np.exp(-(dx * dx + dy * dy)
                                       / (2.0 * sigma_space ** 2)))
                scaled[(dy, dx)] = base * sw
        _BILATERAL_LUT[key] = scaled
    luts = _BILATERAL_LUT[key]
    r = d // 2
    u8 = img.astype(np.uint8, copy=False)
    h, w_ = u8.shape
    # in-place accumulation over the d*d offsets keeps the working set a few
    # H*W arrays (L2/L1-resident) — an offset-STACKED (d*d, H, W)
    # formulation was measured 3x slower even at ~100x300 OCR-render pages
    # (40 MB of DRAM temporaries vs 128 KB loop buffers), and collapses
    # further under many-actor concurrency (2.6x inflation at 24 workers)
    pad = np.pad(u8, r, mode="edge")
    pad_f = pad.astype(np.float32)  # float32(uint8) is exact: one-time cast
    num = np.zeros((h, w_), np.float32)
    den = np.zeros((h, w_), np.float32)
    diff = np.empty((h, w_), np.uint8)
    cw = np.empty((h, w_), np.float32)
    tmp = np.empty((h, w_), np.float32)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            nb = pad[r + dy : r + dy + h, r + dx : r + dx + w_]
            np.subtract(np.maximum(nb, u8), np.minimum(nb, u8), out=diff)
            np.take(luts[(dy, dx)], diff, out=cw)
            np.multiply(cw, pad_f[r + dy : r + dy + h, r + dx : r + dx + w_],
                        out=tmp)
            num += tmp
            den += cw
    np.divide(num, den, out=num)
    return np.clip(num, 0, 255).astype(np.uint8)


def clahe(img: np.ndarray, clip_limit: float = 2.0, tiles: tuple[int, int] = (8, 8)) -> np.ndarray:
    """Contrast-limited adaptive histogram equalization with bilinear
    interpolation between tile mapping functions."""
    h, w = img.shape
    ty, tx = tiles
    th, tw = max(1, h // ty), max(1, w // tx)
    ty, tx = (h + th - 1) // th, (w + tw - 1) // tw
    luts = np.zeros((ty, tx, 256), dtype=np.float32)
    for i in range(ty):
        for j in range(tx):
            tile = img[i * th : min((i + 1) * th, h), j * tw : min((j + 1) * tw, w)]
            npix = tile.size
            hist = np.bincount(tile.ravel(), minlength=256).astype(np.float32)
            climit = max(1.0, clip_limit * npix / 256.0)
            excess = np.maximum(hist - climit, 0).sum()
            hist = np.minimum(hist, climit) + excess / 256.0
            cdf = np.cumsum(hist)
            luts[i, j] = np.clip(cdf * 255.0 / max(cdf[-1], 1e-9), 0, 255)
    # bilinear interpolation of tile LUT outputs at each pixel, evaluated
    # per CELL (the run of rows/cols sharing one (y0,y1,x0,x1) tile quad):
    # inside a cell the four source LUTs are constant, so each gather is a
    # 256-entry-table lookup instead of a (H, W) fancy-index into the whole
    # (ty, tx, 256) cube — identical indices and identical elementwise
    # arithmetic per pixel, so the output is bit-equal; the gathers just
    # stop thrashing cache (measured ~2x on the dispatch profile).
    yy = (np.arange(h) + 0.5) / th - 0.5
    xx = (np.arange(w) + 0.5) / tw - 0.5
    y0 = np.clip(np.floor(yy).astype(int), 0, ty - 1)
    x0 = np.clip(np.floor(xx).astype(int), 0, tx - 1)
    y1 = np.clip(y0 + 1, 0, ty - 1)
    x1 = np.clip(x0 + 1, 0, tx - 1)
    if h * w <= _SMALL_PAGE_PX:
        # small-page path: whole-image gathers fit in cache, and the
        # per-cell loop's ~640 numpy launches dominate instead — identical
        # indices and arithmetic, so output is bit-equal to the cell path.
        fyc = np.clip(yy - y0, 0, 1)[:, None].astype(np.float32)
        fxc = np.clip(xx - x0, 0, 1)[None, :].astype(np.float32)
        v = img
        p00 = luts[y0[:, None], x0[None, :], v]
        p01 = luts[y0[:, None], x1[None, :], v]
        p10 = luts[y1[:, None], x0[None, :], v]
        p11 = luts[y1[:, None], x1[None, :], v]
        outw = (p00 * (1 - fyc) * (1 - fxc) + p01 * (1 - fyc) * fxc
                + p10 * fyc * (1 - fxc) + p11 * fyc * fxc)
        return np.clip(outw, 0, 255).astype(np.uint8)
    fy = np.clip(yy - y0, 0, 1).astype(np.float32)
    fx = np.clip(xx - x0, 0, 1).astype(np.float32)
    out = np.empty((h, w), np.float32)
    # cell boundaries: rows where (y0, y1) changes, cols where (x0, x1) does
    rb = np.flatnonzero(np.diff(y0 * ty + y1)) + 1
    cb = np.flatnonzero(np.diff(x0 * tx + x1)) + 1
    row_edges = np.concatenate(([0], rb, [h]))
    col_edges = np.concatenate(([0], cb, [w]))
    for r0, r1 in zip(row_edges[:-1], row_edges[1:]):
        i0, i1 = y0[r0], y1[r0]
        cfy = fy[r0:r1, None]
        for c0, c1 in zip(col_edges[:-1], col_edges[1:]):
            j0, j1 = x0[c0], x1[c0]
            v = img[r0:r1, c0:c1]
            cfx = fx[None, c0:c1]
            p00 = luts[i0, j0][v]
            p01 = luts[i0, j1][v]
            p10 = luts[i1, j0][v]
            p11 = luts[i1, j1][v]
            out[r0:r1, c0:c1] = (
                p00 * (1 - cfy) * (1 - cfx) + p01 * (1 - cfy) * cfx
                + p10 * cfy * (1 - cfx) + p11 * cfy * cfx)
    return np.clip(out, 0, 255).astype(np.uint8)


def _gaussian_kernel1d(ksize: int) -> np.ndarray:
    """OpenCV-compatible: sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    xs = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-(xs ** 2) / (2 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _sep_filter(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable filter with replicate borders."""
    r = len(k) // 2
    f = img.astype(np.float32)
    pad = np.pad(f, ((0, 0), (r, r)), mode="edge")
    tmp = np.zeros_like(f)
    for i, kv in enumerate(k):
        tmp += kv * pad[:, i : i + f.shape[1]]
    pad = np.pad(tmp, ((r, r), (0, 0)), mode="edge")
    out = np.zeros_like(f)
    for i, kv in enumerate(k):
        out += kv * pad[i : i + f.shape[0], :]
    return out


def adaptive_threshold_gaussian(img: np.ndarray, block_size: int = 11, c: float = 2.0) -> np.ndarray:
    """cv2.adaptiveThreshold(..., ADAPTIVE_THRESH_GAUSSIAN_C, THRESH_BINARY,
    block_size, C): pixel > local_gaussian_mean - C -> 255 else 0."""
    mean = _sep_filter(img, _gaussian_kernel1d(block_size))
    return np.where(img.astype(np.float32) > mean - np.float32(c), 255, 0).astype(np.uint8)


def sobel_edges(img: np.ndarray, low: float = 50.0, high: float = 150.0) -> np.ndarray:
    """Canny(50,150)-shaped edge map: Sobel gradients, non-maximum
    suppression along the gradient direction (4 quantized directions), then
    hysteresis-lite (strong edges, plus weak edges adjacent to strong)."""
    f = img.astype(np.float32)
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float32)
    gx = _conv3(f, kx)
    gy = _conv3(f, kx.T)
    mag = gx * gx + gy * gy  # squared magnitude: thresholds compare squared
    # quantize gradient direction into 4 bins without arctan2:
    # 0=E/W (|gy| <= tan22.5*|gx|), 2=N/S (|gy| >= tan67.5*|gx|),
    # else diagonal: 1=NE/SW when gx*gy >= 0 else 3=NW/SE
    adx = np.abs(gx)
    ady = np.abs(gy)
    t1 = np.float32(np.tan(np.deg2rad(22.5)))
    t2 = np.float32(np.tan(np.deg2rad(67.5)))
    bin0 = ady <= t1 * adx
    bin2 = ady >= t2 * adx
    diag_mask = ~(bin0 | bin2)
    same_sign = (gx * gy) >= 0
    offsets = [(bin0, (0, 1)), (diag_mask & same_sign, (-1, 1)),
               (bin2, (-1, 0)), (diag_mask & ~same_sign, (-1, -1))]
    # pad once, slice per offset: same values as per-call _shifted (which
    # pads per invocation), minus 16 of the 17 np.pad launches per page
    h, w = mag.shape
    mpad = np.pad(mag, 1, mode="edge")
    nms = np.zeros_like(mag, dtype=bool)
    for sel, (dy, dx) in offsets:
        n1 = mpad[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
        n2 = mpad[1 - dy:1 - dy + h, 1 - dx:1 - dx + w]
        nms |= sel & (mag >= n1) & (mag >= n2)
    strong = nms & (mag >= high * high)
    weak = nms & (mag >= low * low)
    spad = np.pad(strong, 1, mode="edge")
    grow = strong.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            grow |= spad[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
    return (weak & grow)


def _conv3(f: np.ndarray, k: np.ndarray) -> np.ndarray:
    pad = np.pad(f, 1, mode="edge")
    out = np.zeros_like(f)
    for dy in range(3):
        for dx in range(3):
            out += k[dy, dx] * pad[dy : dy + f.shape[0], dx : dx + f.shape[1]]
    return out


def hough_line_angles(edges: np.ndarray, threshold: int = HOUGH_THRESHOLD,
                      max_lines: int = HOUGH_MAX_LINES) -> np.ndarray:
    """Top Hough lines' thetas (radians), votes-descending, first
    min(max_lines, n) — mirrors the reference taking lines[:10]."""
    ys, xs = np.nonzero(edges)
    if ys.size == 0:
        return np.empty(0)
    thetas = np.deg2rad(np.arange(180))
    cos_t = np.cos(thetas).astype(np.float32)
    sin_t = np.sin(thetas).astype(np.float32)
    diag = int(np.ceil(np.hypot(*edges.shape)))
    # accumulate per theta: rho histogram.  float32 + preallocated buffers:
    # the per-theta temporaries are the hot memory traffic of deskew.
    xs32 = xs.astype(np.float32)
    ys32 = ys.astype(np.float32)
    # per-theta loop with REUSED E-sized buffers: measured faster than a
    # theta-blocked (B, E) vectorization at EVERY tested edge density —
    # at OCR-render page sizes the per-theta buffers (~33 KB) and the
    # ~2k-bin bincount scatter are L1-resident (5.2 vs 10.1 ms on an
    # 8.4k-edge page), and at high density the blocked form pays DRAM
    # traffic on megabyte temporaries (28.2 vs 57.9 ms at 50k edges).
    votes = np.zeros((180, 2 * diag + 1), dtype=np.int32)
    buf = np.empty(xs32.shape, np.float32)
    buf2 = np.empty(xs32.shape, np.float32)
    ibuf = np.empty(xs32.shape, np.int64)
    for ti in range(180):
        np.multiply(xs32, cos_t[ti], out=buf)
        np.multiply(ys32, sin_t[ti], out=buf2)
        buf += buf2
        np.rint(buf, out=buf)
        np.copyto(ibuf, buf, casting="unsafe")
        ibuf += diag
        votes[ti] = np.bincount(ibuf, minlength=2 * diag + 1)
    flat = votes.ravel()
    idx = np.nonzero(flat >= threshold)[0]
    if idx.size == 0:
        return np.empty(0)
    order = idx[np.argsort(-flat[idx], kind="stable")][:max_lines]
    return thetas[order // (2 * diag + 1)]


def rotate_replicate(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """Rotate about the center (like getRotationMatrix2D + warpAffine with
    BORDER_REPLICATE), bilinear sampling."""
    h, w = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    a = np.deg2rad(angle_deg)
    cos_a, sin_a = np.cos(a), np.sin(a)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # inverse map (rotate output coords by -angle)
    xs = cos_a * (xx - cx) - sin_a * (yy - cy) + cx
    ys = sin_a * (xx - cx) + cos_a * (yy - cy) + cy
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    fx = np.clip(xs - x0, 0, 1).astype(np.float32)
    fy = np.clip(ys - y0, 0, 1).astype(np.float32)
    f = img.astype(np.float32)
    out = (f[y0, x0] * (1 - fy) * (1 - fx) + f[y0, x1] * (1 - fy) * fx
           + f[y1, x0] * fy * (1 - fx) + f[y1, x1] * fy * fx)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def estimate_skew_angle(img: np.ndarray) -> float:
    """Median of Hough-line angles, a = theta*180/pi - 90, |a| < 45 kept."""
    edges = sobel_edges(img)
    thetas = hough_line_angles(edges)
    if thetas.size == 0:
        return 0.0
    angles = thetas * 180.0 / np.pi - 90.0
    angles = angles[np.abs(angles) < DESKEW_MAX_ABS_ANGLE]
    if angles.size == 0:
        return 0.0
    return float(np.median(angles))


def correct_skew(img: np.ndarray) -> np.ndarray:
    """A5 contract: rotate only when |median angle| > 0.5 deg; any exception
    silently returns the original image (ocr_adapters.py:254-258)."""
    try:
        angle = estimate_skew_angle(img)
        if abs(angle) > DESKEW_MIN_ROTATE:
            return rotate_replicate(img, angle)
        return img
    except Exception:
        return img


def preprocess_chain(img: np.ndarray, denoise: bool = True, contrast: bool = True,
                     deskew: bool = True) -> np.ndarray:
    """The full A3 chain in reference order."""
    out = to_grayscale(img)
    if denoise:
        out = bilateral_filter(out, 9, 75.0, 75.0)
    if contrast:
        out = clahe(out, 2.0, (8, 8))
    if deskew:
        out = correct_skew(out)
    out = adaptive_threshold_gaussian(out, 11, 2.0)
    # morphology CLOSE then OPEN with np.ones((1,1)) — identity by
    # construction; preserved as the reference's (inert) final steps.
    return out

"""Full quality-metric suite: PSNR, SSIM, FastSSIM (multi-scale), and
PSNR-HVS-M between two I420 videos (raw YUV files or decodable streams).

Parity targets (algorithms re-expressed in vectorized numpy; constants
and rounding follow the originals):
  - PSNR:     libvpx/vpx_dsp/psnr.c   (vpx_sse_to_psnr :17,
              vpx_calc_psnr / vpx_calc_highbd_psnr aggregation)
  - SSIM:     libvpx/vpx_dsp/ssim.c   (vpx_ssim2 :124 — 8x8 windows on
              the 4x4 grid, similarity :74 with cc1/cc2 scaled by
              count^2 >> 12; vpx_calc_ssim :168 — 0.8/0.1/0.1 weights)
  - FastSSIM: libvpx/vpx_dsp/fastssim.c (calc_ssim :455 — 4-level
              pyramid, per-level structure term from 45-degree gradient
              maps with a binomial sliding window, luminance applied at
              the coarsest level only, FS_WEIGHTS exponents,
              convert_ssim_db :447)
  - PSNR-HVS: libvpx/vpx_dsp/psnrhvs.c (calc_psnrhvs :124 — 8x8 blocks
              at step 7, integer vpx_fdct8x8, CSF weighting + contrast
              masking, 0.8/0.1/0.1 aggregate, convert_score_db :112)

The FastSSIM structure window is implemented as a fixed 2-D kernel
extracted from the sliding-column recurrence (the recurrence is linear
in the gradient-energy maps, so it IS a convolution away from the
warm-up region; tests/test_metrics.py verifies the kernel against a
direct transcription of the recurrence, boundaries included).
"""

from __future__ import annotations

import argparse
import math
import sys

import numpy as np

MAX_PSNR = 100.0
MAX_SSIM_DB = 69.0

# ------------------------------------------------------------------ psnr


def sse_to_psnr(samples: float, peak: float, sse: float) -> float:
    """vpx_sse_to_psnr parity (psnr.c:17): capped at 100 dB."""
    if sse > 0.0:
        p = samples * peak * peak / sse
        return min(10.0 * math.log10(p), MAX_PSNR)
    return MAX_PSNR


def plane_sse(a: np.ndarray, b: np.ndarray, shift: int = 0) -> int:
    """get_sse / highbd_get_sse_shift parity: samples are shifted DOWN
    to in_bd before differencing (psnr.c highbd_get_sse_shift)."""
    ai = a.astype(np.int64) >> shift if shift else a.astype(np.int64)
    bi = b.astype(np.int64) >> shift if shift else b.astype(np.int64)
    d = ai - bi
    return int((d * d).sum())


def calc_psnr(planes_a, planes_b, bd: int = 8, in_bd: int = 8) -> dict:
    """vpx_calc_psnr / vpx_calc_highbd_psnr parity: per-plane and
    combined PSNR against peak = 2^in_bd - 1.  Returns {"psnr":
    [all, y, u, v], "sse": [...], "samples": [...]} matching
    PSNR_STATS (psnr.h:27)."""
    shift = bd - in_bd
    peak = float((1 << in_bd) - 1)
    sses, samples = [], []
    for a, b in zip(planes_a, planes_b):
        sses.append(plane_sse(a, b, shift))
        samples.append(a.size)
    tot_sse = sum(sses)
    tot_n = sum(samples)
    out = {
        "sse": [tot_sse] + sses,
        "samples": [tot_n] + samples,
        "psnr": [sse_to_psnr(tot_n, peak, tot_sse)] +
                [sse_to_psnr(n, peak, s) for n, s in zip(samples, sses)],
    }
    return out


# ------------------------------------------------------------------ ssim

# (64^2*(.01*max)^2, (64^2*(.03*max)^2 for max = 255/1023/4095 (ssim.c:66)
_SSIM_CC = {8: (26634, 239708), 10: (428658, 3857925),
            12: (6868593, 61817334)}


def _window_sums_8x8(x: np.ndarray, y: np.ndarray):
    """Sums over 8x8 windows at every 4-px offset via integral images.
    Returns (sx, sy, sxx, syy, sxy) maps of shape [wy, wx]."""
    def integ(a):
        return np.pad(a.astype(np.int64).cumsum(0).cumsum(1),
                      ((1, 0), (1, 0)))

    h, w = x.shape
    wy = (h - 8) // 4 + 1
    wx = (w - 8) // 4 + 1

    def win(ii):
        tl = ii[0:4 * wy:4, 0:4 * wx:4]
        tr = ii[0:4 * wy:4, 8:8 + 4 * wx:4][:, :wx]
        bl = ii[8:8 + 4 * wy:4, 0:4 * wx:4][:wy]
        br = ii[8:8 + 4 * wy:4, 8:8 + 4 * wx:4][:wy, :wx]
        return br - tr - bl + tl

    xi, yi = x.astype(np.int64), y.astype(np.int64)
    return (win(integ(xi)), win(integ(yi)), win(integ(xi * xi)),
            win(integ(yi * yi)), win(integ(xi * yi)))


def ssim2(a: np.ndarray, b: np.ndarray, bd: int = 8,
          shift: int = 0) -> float:
    """vpx_ssim2 / vpx_highbd_ssim2 parity (ssim.c:124,145): mean of
    8x8-window similarities sampled every 4 px."""
    if a.shape[0] < 8 or a.shape[1] < 8:
        return 1.0
    sx, sy, sxx, syy, sxy = _window_sums_8x8(a, b)
    if shift:
        sx >>= shift
        sy >>= shift
        sxx >>= 2 * shift
        syy >>= 2 * shift
        sxy >>= 2 * shift
    cc1, cc2 = _SSIM_CC[bd]
    count = 64
    c1 = (cc1 * count * count) >> 12
    c2 = (cc2 * count * count) >> 12
    sx = sx.astype(np.float64)
    sy = sy.astype(np.float64)
    n = (2.0 * sx * sy + c1) * (2.0 * count * sxy.astype(np.float64)
                                - 2.0 * sx * sy + c2)
    d = (sx * sx + sy * sy + c1) * (count * sxx.astype(np.float64)
                                    - sx * sx
                                    + count * syy.astype(np.float64)
                                    - sy * sy + c2)
    return float((n / d).mean())


def calc_ssim(planes_a, planes_b, bd: int = 8, in_bd: int = 8):
    """vpx_calc_ssim parity (ssim.c:168): 0.8*y + 0.1*u + 0.1*v.
    Returns (ssim_all, weight=1.0)."""
    shift = bd - in_bd
    y = ssim2(planes_a[0], planes_b[0], bd, shift)
    u = ssim2(planes_a[1], planes_b[1], bd, shift)
    v = ssim2(planes_a[2], planes_b[2], bd, shift)
    return 0.8 * y + 0.1 * (u + v), 1.0


# -------------------------------------------------------------- fastssim

_FS_NLEVELS = 4
# Wang's MS-SSIM weights, finest scale dropped, renormalized
# (fastssim.c:428)
_FS_WEIGHTS = (0.2989654541015625, 0.3141326904296875,
               0.2473602294921875, 0.1395416259765625)
_SSIM_C1 = {8: 255 * 255 * 0.01 * 0.01, 10: 1023 * 1023 * 0.01 * 0.01,
            12: 4095 * 4095 * 0.01 * 0.01}
_SSIM_C2 = {8: 255 * 255 * 0.03 * 0.03, 10: 1023 * 1023 * 0.03 * 0.03,
            12: 4095 * 4095 * 0.03 * 0.03}


def _fs_downsample0(a: np.ndarray, shift: int) -> np.ndarray:
    """2x2 box sum with edge clamp (fs_downsample_level0)."""
    if shift:
        a = a >> shift
    h, w = a.shape
    lw, lh = (w + 1) >> 1, (h + 1) >> 1
    i0 = 2 * np.arange(lw)
    i1 = np.minimum(i0 + 1, w - 1)
    j0 = 2 * np.arange(lh)
    j1 = np.minimum(j0 + 1, h - 1)
    a = a.astype(np.int64)
    return (a[np.ix_(j0, i0)] + a[np.ix_(j0, i1)]
            + a[np.ix_(j1, i0)] + a[np.ix_(j1, i1)]).astype(np.uint32)


def _fs_downsample(a: np.ndarray) -> np.ndarray:
    """2x2 box sum of a level image (fs_downsample_level: column clamp
    uses the PARENT level's dims)."""
    h2, w2 = a.shape
    lw, lh = (w2 + 1) >> 1, (h2 + 1) >> 1
    i0 = 2 * np.arange(lw)
    i1 = np.minimum(i0 + 1, w2 - 1)
    j0 = 2 * np.arange(lh)
    j1 = np.minimum(j0 + 1, h2 - 1)
    a64 = a.astype(np.int64)
    return (a64[np.ix_(j0, i0)] + a64[np.ix_(j0, i1)]
            + a64[np.ix_(j1, i0)] + a64[np.ix_(j1, i1)]).astype(np.uint32)


def _fs_gradients(im1: np.ndarray, im2: np.ndarray):
    """45-degree gradient energy maps gx, gy on an (h, w) grid (valid
    region (h-1, w-1); last row/col zero), fastssim.c:349-361."""
    h, w = im1.shape
    gx = np.zeros((h, w), np.int64)
    gy = np.zeros((h, w), np.int64)
    a = im1.astype(np.int64)
    b = im2.astype(np.int64)
    g1 = np.abs(a[1:, 1:] - a[:-1, :-1])
    g2 = np.abs(a[1:, :-1] - a[:-1, 1:])
    gx[:h - 1, :w - 1] = 4 * np.maximum(g1, g2) + np.minimum(g1, g2)
    g1 = np.abs(b[1:, 1:] - b[:-1, :-1])
    g2 = np.abs(b[1:, :-1] - b[:-1, 1:])
    gy[:h - 1, :w - 1] = 4 * np.maximum(g1, g2) + np.minimum(g1, g2)
    return gx, gy


# Direct transcription of the sliding recurrence, used to derive (and in
# tests, to verify) the fixed-kernel fast path below.
def _fs_structure_scalar(gx: np.ndarray, gy: np.ndarray,
                         c2: float) -> np.ndarray:
    h, w = gx.shape
    stride = w + 8
    gx_buf = np.zeros((8, stride))
    gy_buf = np.zeros((8, stride))
    out = np.zeros((h, w))
    col_gx2 = np.zeros(8)
    col_gy2 = np.zeros(8)
    col_gxgy = np.zeros(8)

    def at(buf, joffs, ioffs, j, i):
        return buf[(j + joffs) & 7, i + ioffs]

    for j in range(h + 4):
        if j < h - 1:
            gx_buf[j & 7, 4:4 + w] = 0.0
            gy_buf[j & 7, 4:4 + w] = 0.0
            gx_buf[j & 7, 4:3 + w] = gx[j, :w - 1]
            gy_buf[j & 7, 4:3 + w] = gy[j, :w - 1]
        else:
            gx_buf[j & 7, :] = 0.0
            gy_buf[j & 7, :] = 0.0
        if j >= 4:
            col_gx2[:4] = col_gy2[:4] = col_gxgy[:4] = 0.0

            def cset(col, joffs, ioffs, i):
                a = at(gx_buf, joffs, ioffs, j, i)
                b = at(gy_buf, joffs, ioffs, j, i)
                col_gx2[col] = a * a
                col_gy2[col] = b * b
                col_gxgy[col] = a * b

            def cadd(col, joffs, ioffs, i):
                a = at(gx_buf, joffs, ioffs, j, i)
                b = at(gy_buf, joffs, ioffs, j, i)
                col_gx2[col] += a * a
                col_gy2[col] += b * b
                col_gxgy[col] += a * b

            def cmul(col, col2, f):
                col_gx2[col] = col_gx2[col2] * f
                col_gy2[col] = col_gy2[col2] * f
                col_gxgy[col] = col_gxgy[col2] * f

            for i in range(4, 8):
                cset(i, -1, 0, i)
                cadd(i, 0, 0, i)
                for kk in range(1, 8 - i):
                    cmul(i, i, 2.0)
                    cadd(i, -kk - 1, 0, i)
                    cadd(i, kk, 0, i)
            for i in range(w):
                out[j - 4, i] = ((2 * col_gxgy.sum() + c2)
                                 / (col_gx2.sum() + col_gy2.sum() + c2))
                if i + 1 < w:
                    cset(0, -1, 1, i)
                    cadd(0, 0, 1, i)
                    a = at(gx_buf, -3, 2, j, i)
                    b = at(gy_buf, -3, 2, j, i)
                    col_gx2[2] -= a * a
                    col_gy2[2] -= b * b
                    col_gxgy[2] -= a * b
                    a = at(gx_buf, 2, 2, j, i)
                    b = at(gy_buf, 2, 2, j, i)
                    col_gx2[2] -= a * a
                    col_gy2[2] -= b * b
                    col_gxgy[2] -= a * b
                    cmul(1, 2, 0.5)
                    a = at(gx_buf, -4, 3, j, i)
                    b = at(gy_buf, -4, 3, j, i)
                    col_gx2[3] -= a * a
                    col_gy2[3] -= b * b
                    col_gxgy[3] -= a * b
                    a = at(gx_buf, 3, 3, j, i)
                    b = at(gy_buf, 3, 3, j, i)
                    col_gx2[3] -= a * a
                    col_gy2[3] -= b * b
                    col_gxgy[3] -= a * b
                    cmul(2, 3, 0.5)
                    cmul(3, 4, 1.0)
                    cmul(4, 5, 2.0)
                    cadd(4, -4, 5, i)
                    cadd(4, 3, 5, i)
                    cmul(5, 6, 2.0)
                    cadd(5, -3, 6, i)
                    cadd(5, 2, 6, i)
                    cmul(6, 7, 2.0)
                    cadd(6, -2, 7, i)
                    cadd(6, 1, 7, i)
                    cset(7, -1, 8, i)
                    cadd(7, 0, 8, i)
    return out


_FS_TAPS = None


def _fs_taps():
    """Extract the effective structure window by pushing an impulse
    through the scalar recurrence (which is linear in the energy maps):
    returns a list of (dy, dx, weight) taps such that the window sum at
    output (jo, io) is sum w * g2[jo + dy, io + dx]."""
    global _FS_TAPS
    if _FS_TAPS is None:
        n = 32
        g = np.zeros((n, n), np.int64)
        g[16, 16] = 1         # unit gradient energy (gx=1 -> gx2=1)
        # out = c2 / (wsum + c2)  =>  wsum = c2 * (1 - out) / out
        # (c2 large vs the <=2^5 weights but small enough that 1 - out
        # stays well above double epsilon)
        big = 1e6
        r = _fs_structure_scalar(g, np.zeros_like(g), big)
        w = big * (1.0 - r) / r
        ys, xs = np.nonzero(w > 0.5)
        _FS_TAPS = [(16 - y, 16 - x, float(round(w[y, x])))
                    for y, x in zip(ys, xs)]
        assert len(_FS_TAPS) > 0
    return _FS_TAPS


def _fs_structure(gx: np.ndarray, gy: np.ndarray, c2: float) -> np.ndarray:
    """Vectorized structure pass: fixed-kernel correlation of the
    gradient-energy maps (verified against _fs_structure_scalar in
    tests/test_metrics.py, boundaries included)."""
    h, w = gx.shape
    taps = _fs_taps()
    pad = 8
    gx2 = np.zeros((h + 2 * pad, w + 2 * pad))
    gy2 = np.zeros_like(gx2)
    gxy = np.zeros_like(gx2)
    gx2[pad:pad + h, pad:pad + w] = (gx * gx).astype(np.float64)
    gy2[pad:pad + h, pad:pad + w] = (gy * gy).astype(np.float64)
    gxy[pad:pad + h, pad:pad + w] = (gx * gy).astype(np.float64)
    sx2 = np.zeros((h, w))
    sy2 = np.zeros((h, w))
    sxy = np.zeros((h, w))
    for dy, dx, kv in taps:
        r0, c0 = pad + dy, pad + dx
        sx2 += kv * gx2[r0:r0 + h, c0:c0 + w]
        sy2 += kv * gy2[r0:r0 + h, c0:c0 + w]
        sxy += kv * gxy[r0:r0 + h, c0:c0 + w]
    return (2 * sxy + c2) / (sx2 + sy2 + c2)


def _fs_luminance(im1: np.ndarray, im2: np.ndarray, level: int,
                  c1base: float) -> np.ndarray:
    """fs_apply_luminance parity: 8-row/8-col window with weight 5 on
    the leading edge and boundary clamping.  NOTE: the original's
    horizontal slide updates muy with col_sums_x (fastssim.c:243-244) —
    replicated for numeric parity with upstream."""
    h, w = im1.shape
    c1 = c1base * 4096 * (1 << (4 * level))
    a = im1.astype(np.int64)
    b = im2.astype(np.int64)
    # column sums over rows: weight 5 on clamped row j-? window rows
    # are FS_MINI(j + off, h - 1) for off in {0(x5), 1, 2, 3} sliding
    # down by one row per output row with -= row j-4 ... replicate via
    # direct scalar recurrence (cheap: applied only at the coarsest
    # level, <= (W/16)x(H/16) pixels).
    out = np.ones((h, w))
    col_x = 5.0 * a[0].astype(np.float64)
    col_y = 5.0 * b[0].astype(np.float64)
    for j in range(1, 4):
        j1 = min(j, h - 1)
        col_x = col_x + a[j1]
        col_y = col_y + b[j1]
    for j in range(h):
        mux = 5.0 * col_x[0]
        muy = 5.0 * col_y[0]
        for i in range(1, 4):
            i1 = min(i, w - 1)
            mux += col_x[i1]
            muy += col_y[i1]
        for i in range(w):
            out[j, i] = (2 * mux * muy + c1) / (mux * mux + muy * muy + c1)
            if i + 1 < w:
                i0 = max(0, i - 4)
                i1 = min(i + 4, w - 1)
                mux += col_x[i1] - col_x[i0]
                muy += col_x[i1] - col_x[i0]   # upstream parity (sic)
        if j + 1 < h:
            j0 = max(0, j - 4)
            col_x = col_x - a[j0]
            col_y = col_y - b[j0]
            j1 = min(j + 4, h - 1)
            col_x = col_x + a[j1]
            col_y = col_y + b[j1]
    return out


def _fs_calc_plane(a: np.ndarray, b: np.ndarray, bd: int,
                   shift: int) -> float:
    """calc_ssim parity (fastssim.c:455)."""
    ret = 1.0
    im1 = _fs_downsample0(a, shift)
    im2 = _fs_downsample0(b, shift)
    for level in range(_FS_NLEVELS):
        c2 = _SSIM_C2[bd] * (1 << (4 * level)) * 16 * 104
        gx, gy = _fs_gradients(im1, im2)
        ssim = _fs_structure(gx, gy, c2)
        if level == _FS_NLEVELS - 1:
            ssim = ssim * _fs_luminance(im1, im2, level, _SSIM_C1[bd])
        ret *= ssim.mean() ** _FS_WEIGHTS[level]
        if level < _FS_NLEVELS - 1:
            im1 = _fs_downsample(im1)
            im2 = _fs_downsample(im2)
    return ret


def convert_ssim_db(ssim: float, weight: float) -> float:
    if (weight - ssim) < 1e-10:
        return MAX_SSIM_DB
    return 10 * (math.log10(weight) - math.log10(weight - ssim))


def calc_fastssim(planes_a, planes_b, bd: int = 8, in_bd: int = 8):
    """vpx_calc_fastssim parity: returns (db, y, u, v)."""
    shift = bd - in_bd
    y = _fs_calc_plane(planes_a[0], planes_b[0], in_bd, shift)
    u = _fs_calc_plane(planes_a[1], planes_b[1], in_bd, shift)
    v = _fs_calc_plane(planes_a[2], planes_b[2], in_bd, shift)
    return convert_ssim_db(0.8 * y + 0.1 * (u + v), 1.0), y, u, v


# -------------------------------------------------------------- psnrhvs

# CSF tables (psnrhvs.c:54-110): normalized inverse quantization
# matrices for the 8x8 DCT at the point of transparency (Daala).
_CSF_Y = np.array([
    [1.6193873005, 2.2901594831, 2.08509755623, 1.48366094411,
     1.00227514334, 0.678296995242, 0.466224900598, 0.3265091542],
    [2.2901594831, 1.94321815382, 2.04793073064, 1.68731108984,
     1.2305666963, 0.868920337363, 0.61280991668, 0.436405793551],
    [2.08509755623, 2.04793073064, 1.34329019223, 1.09205635862,
     0.875748795257, 0.670882927016, 0.501731932449, 0.372504254596],
    [1.48366094411, 1.68731108984, 1.09205635862, 0.772819797575,
     0.605636379554, 0.48309405692, 0.380429446972, 0.295774038565],
    [1.00227514334, 1.2305666963, 0.875748795257, 0.605636379554,
     0.448996256676, 0.352889268808, 0.283006984131, 0.226951348204],
    [0.678296995242, 0.868920337363, 0.670882927016, 0.48309405692,
     0.352889268808, 0.27032073436, 0.215017739696, 0.17408067321],
    [0.466224900598, 0.61280991668, 0.501731932449, 0.380429446972,
     0.283006984131, 0.215017739696, 0.168869545842, 0.136153931001],
    [0.3265091542, 0.436405793551, 0.372504254596, 0.295774038565,
     0.226951348204, 0.17408067321, 0.136153931001, 0.109083846276]])
_CSF_CB = np.array([
    [1.91113096927, 2.46074210438, 1.18284184739, 1.14982565193,
     1.05017074788, 0.898018824055, 0.74725392039, 0.615105596242],
    [2.46074210438, 1.58529308355, 1.21363250036, 1.38190029285,
     1.33100189972, 1.17428548929, 0.996404342439, 0.830890433625],
    [1.18284184739, 1.21363250036, 0.978712413627, 1.02624506078,
     1.03145147362, 0.960060382087, 0.849823426169, 0.731221236837],
    [1.14982565193, 1.38190029285, 1.02624506078, 0.861317501629,
     0.801821139099, 0.751437590932, 0.685398513368, 0.608694761374],
    [1.05017074788, 1.33100189972, 1.03145147362, 0.801821139099,
     0.676555426187, 0.605503172737, 0.55002013668, 0.495804539034],
    [0.898018824055, 1.17428548929, 0.960060382087, 0.751437590932,
     0.605503172737, 0.514674450957, 0.454353482512, 0.407050308965],
    [0.74725392039, 0.996404342439, 0.849823426169, 0.685398513368,
     0.55002013668, 0.454353482512, 0.389234902883, 0.342353999733],
    [0.615105596242, 0.830890433625, 0.731221236837, 0.608694761374,
     0.495804539034, 0.407050308965, 0.342353999733, 0.295530605237]])
_CSF_CR = np.array([
    [2.03871978502, 2.62502345193, 1.26180942886, 1.11019789803,
     1.01397751469, 0.867069376285, 0.721500455585, 0.593906509971],
    [2.62502345193, 1.69112867013, 1.17180569821, 1.3342742857,
     1.28513006198, 1.13381474809, 0.962064122248, 0.802254508198],
    [1.26180942886, 1.17180569821, 0.944981930573, 0.990876405848,
     0.995903384143, 0.926972725286, 0.820534991409, 0.706020324706],
    [1.11019789803, 1.3342742857, 0.990876405848, 0.831632933426,
     0.77418706195, 0.725539939514, 0.661776842059, 0.587716619023],
    [1.01397751469, 1.28513006198, 0.995903384143, 0.77418706195,
     0.653238524286, 0.584635025748, 0.531064164893, 0.478717061273],
    [0.867069376285, 1.13381474809, 0.926972725286, 0.725539939514,
     0.584635025748, 0.496936637883, 0.438694579826, 0.393021669543],
    [0.721500455585, 0.962064122248, 0.820534991409, 0.661776842059,
     0.531064164893, 0.438694579826, 0.375820256136, 0.330555063063],
    [0.593906509971, 0.802254508198, 0.706020324706, 0.587716619023,
     0.478717061273, 0.393021669543, 0.330555063063, 0.285345396658]])


def _fdct8x8(blocks: np.ndarray) -> np.ndarray:
    """Integer vpx_fdct8x8_c parity, batched [N, 8, 8] -> [N, 8, 8]
    (vpx_dsp/fwd_txfm.c:90; the highbd variant is the same function)."""
    from ..ops.ref.transforms import COSPI

    def rs(x):  # fdct_round_shift: ROUND_POWER_OF_TWO with DCT_BITS=14
        return (x + 8192) >> 14

    def pass1d(inp, scale):
        # inp [..., 8] along last axis
        s = [None] * 8
        for k in range(4):
            s[k] = (inp[..., k] + inp[..., 7 - k]) * scale
            s[7 - k] = (inp[..., k] - inp[..., 7 - k]) * scale
        x0 = s[0] + s[3]
        x1 = s[1] + s[2]
        x2 = s[1] - s[2]
        x3 = s[0] - s[3]
        o = [None] * 8
        o[0] = rs((x0 + x1) * COSPI[16])
        o[4] = rs((x0 - x1) * COSPI[16])
        o[2] = rs(x2 * COSPI[24] + x3 * COSPI[8])
        o[6] = rs(-x2 * COSPI[8] + x3 * COSPI[24])
        t2 = rs((s[6] - s[5]) * COSPI[16])
        t3 = rs((s[6] + s[5]) * COSPI[16])
        y0 = s[4] + t2
        y1 = s[4] - t2
        y2 = s[7] - t3
        y3 = s[7] + t3
        o[1] = rs(y0 * COSPI[28] + y3 * COSPI[4])
        o[5] = rs(y1 * COSPI[12] + y2 * COSPI[20])
        o[3] = rs(y2 * COSPI[12] - y1 * COSPI[20])
        o[7] = rs(y3 * COSPI[28] - y0 * COSPI[4])
        return np.stack(o, axis=-1)

    x = blocks.astype(np.int64)
    # pass 1 over columns (inputs x4), then pass 2 over rows of the
    # transposed intermediate
    inter = pass1d(x.transpose(0, 2, 1), 4)      # [N, col, vfreq]
    out = pass1d(inter.transpose(0, 2, 1), 1)    # [N, vfreq, hfreq]
    # final /= 2 truncates toward zero in C
    neg_odd = (out < 0) & ((out & 1) != 0)
    return (out >> 1) + neg_odd


def _psnrhvs_plane(a: np.ndarray, b: np.ndarray, csf: np.ndarray,
                   bd: int, shift: int) -> float:
    """calc_psnrhvs parity (8x8 blocks at step 7)."""
    h, w = a.shape
    step = 7
    ys = np.arange(0, h - 7, step)
    xs = np.arange(0, w - 7, step)
    if len(ys) == 0 or len(xs) == 0:
        return 0.0
    mask = (csf / csf[1, 0]) ** 2
    av = (a.astype(np.int64) >> shift) if shift else a.astype(np.int64)
    bv = (b.astype(np.int64) >> shift) if shift else b.astype(np.int64)
    # gather all blocks [N, 8, 8]
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    yy = yy.reshape(-1)
    xx = xx.reshape(-1)
    ri = yy[:, None, None] + np.arange(8)[None, :, None]
    ci = xx[:, None, None] + np.arange(8)[None, None, :]
    sb = av[ri, ci].astype(np.float64)
    db = bv[ri, ci].astype(np.float64)
    # 4x4 quadrant index per pixel (psnrhvs.c:189)
    i8 = np.arange(8)
    sub = ((i8[:, None] & 12) >> 2) + ((i8[None, :] & 12) >> 1)
    s_gmean = sb.mean(axis=(1, 2))
    d_gmean = db.mean(axis=(1, 2))
    f63 = np.float32(np.float32(1.0) / np.float32(63.0)) * np.float32(64.0)
    f15 = np.float32(np.float32(1.0) / np.float32(15.0)) * np.float32(16.0)
    s_gvar = ((sb - s_gmean[:, None, None]) ** 2).sum(axis=(1, 2)) \
        * np.float64(f63)
    d_gvar = ((db - d_gmean[:, None, None]) ** 2).sum(axis=(1, 2)) \
        * np.float64(f63)
    s_vars = np.zeros((sb.shape[0], 4))
    d_vars = np.zeros((sb.shape[0], 4))
    for q in range(4):
        m = sub == q
        sm = sb[:, m].mean(axis=1)
        dm = db[:, m].mean(axis=1)
        s_vars[:, q] = ((sb[:, m] - sm[:, None]) ** 2).sum(axis=1) \
            * np.float64(f15)
        d_vars[:, q] = ((db[:, m] - dm[:, None]) ** 2).sum(axis=1) \
            * np.float64(f15)
    with np.errstate(divide="ignore", invalid="ignore"):
        s_gv = np.where(s_gvar > 0, s_vars.sum(axis=1) / s_gvar, s_gvar)
        d_gv = np.where(d_gvar > 0, d_vars.sum(axis=1) / d_gvar, d_gvar)
    sc = _fdct8x8(av[ri, ci])
    dc = _fdct8x8(bv[ri, ci])
    # od_bin_fdct8x8's (y + 4) >> 3 downscale
    sc = (sc + 4) >> 3
    dc = (dc + 4) >> 3
    scf = sc.astype(np.float64)
    dcf = dc.astype(np.float64)
    wm = np.ones((8, 8), bool)
    wm[0, 0] = False  # DC excluded from the masking energy
    s_mask = (scf[:, wm] ** 2 * mask[wm][None]).sum(axis=1)
    d_mask = (dcf[:, wm] ** 2 * mask[wm][None]).sum(axis=1)
    s_mask = np.sqrt(s_mask * s_gv) / np.float64(np.float32(32.0))
    d_mask = np.sqrt(d_mask * d_gv) / np.float64(np.float32(32.0))
    s_mask = np.maximum(s_mask, d_mask)
    err = np.abs(scf - dcf)
    thr = s_mask[:, None, None] / mask[None]
    err_ac = np.maximum(err - thr, 0.0)
    err = np.where(wm[None], err_ac, err)
    ret = ((err * csf[None]) ** 2).sum()
    return float(ret / (err.size))


def convert_score_db(score: float, weight: float, bit_depth: int) -> float:
    pix_max = {8: 255, 10: 1023, 12: 4095}[bit_depth]
    if weight * score < pix_max * pix_max * 1e-10:
        return MAX_PSNR
    return 10 * (math.log10(pix_max * pix_max) - math.log10(weight * score))


def psnrhvs(planes_a, planes_b, bd: int = 8, in_bd: int = 8):
    """vpx_psnrhvs parity: returns (db, y, u, v)."""
    shift = bd - in_bd
    y = _psnrhvs_plane(planes_a[0], planes_b[0], _CSF_Y, bd, shift)
    u = _psnrhvs_plane(planes_a[1], planes_b[1], _CSF_CB, bd, shift)
    v = _psnrhvs_plane(planes_a[2], planes_b[2], _CSF_CR, bd, shift)
    return convert_score_db(0.8 * y + 0.1 * (u + v), 1.0, in_bd), y, u, v


# ------------------------------------------------------------------- CLI


def _read_frames(path: str, w: int, h: int, bd: int = 8):
    """Yield (y, u, v) planes from a raw I420 file or a decodable
    stream (.ivf/.webm)."""
    if path.endswith((".ivf", ".webm")):
        from ..containers import open_video
        from ..decoder.frame import NativeVp9Decoder
        dec = NativeVp9Decoder()
        with open_video(path) as r:
            for data, _pts in r:
                dec.decode(data)
                for fr in dec.frames():
                    yield fr.visible_planes()
        return
    dt = np.uint8 if bd == 8 else np.uint16
    ps = 1 if bd == 8 else 2
    fsz = (w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2)) * ps
    cw, ch = (w + 1) // 2, (h + 1) // 2
    with open(path, "rb") as f:
        while True:
            buf = f.read(fsz)
            if len(buf) < fsz:
                return
            a = np.frombuffer(buf, dt)
            y = a[:w * h].reshape(h, w)
            u = a[w * h:w * h + cw * ch].reshape(ch, cw)
            v = a[w * h + cw * ch:].reshape(ch, cw)
            yield (y, u, v)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="PSNR / SSIM / FastSSIM / PSNR-HVS between two "
                    "I420 inputs (raw .yuv or decodable streams)")
    p.add_argument("a")
    p.add_argument("b")
    p.add_argument("size", nargs="?", help="WxH (required for raw yuv)")
    p.add_argument("--bit-depth", type=int, default=8,
                   choices=(8, 10, 12))
    p.add_argument("--frames", type=int, default=0,
                   help="limit the number of frames compared")
    p.add_argument("--metrics", default="psnr,ssim,fastssim,psnrhvs")
    args = p.parse_args(argv)
    w = h = 0
    if args.size:
        w, h = (int(v) for v in args.size.split("x"))
    bd = args.bit_depth
    which = args.metrics.split(",")
    n = 0
    acc = {"psnr_sse": 0, "psnr_n": 0, "ssim": 0.0, "fastssim": 0.0,
           "psnrhvs": 0.0}
    for fa, fb in zip(_read_frames(args.a, w, h, bd),
                      _read_frames(args.b, w, h, bd)):
        row = [f"frame {n}:"]
        if "psnr" in which:
            st = calc_psnr(fa, fb, bd, bd)
            acc["psnr_sse"] += st["sse"][0]
            acc["psnr_n"] += st["samples"][0]
            row.append(f"psnr {st['psnr'][0]:.4f}")
        if "ssim" in which:
            s, _ = calc_ssim(fa, fb, bd, bd)
            acc["ssim"] += s
            row.append(f"ssim {s:.5f}")
        if "fastssim" in which:
            s = calc_fastssim(fa, fb, bd, bd)[0]
            acc["fastssim"] += s
            row.append(f"fastssim {s:.4f}")
        if "psnrhvs" in which:
            s = psnrhvs(fa, fb, bd, bd)[0]
            acc["psnrhvs"] += s
            row.append(f"psnrhvs {s:.4f}")
        print("  ".join(row))
        n += 1
        if args.frames and n >= args.frames:
            break
    if not n:
        print("no frames", file=sys.stderr)
        return 1
    peak = float((1 << bd) - 1)
    out = ["overall:"]
    if "psnr" in which:
        out.append(f"psnr {sse_to_psnr(acc['psnr_n'], peak, acc['psnr_sse']):.4f}")
    for k in ("ssim", "fastssim", "psnrhvs"):
        if k in which:
            out.append(f"{k} {acc[k] / n:.5f}")
    print("  ".join(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

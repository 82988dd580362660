"""Quality-metric suite tests (tools/metrics.py).

Parity model: the vectorized implementations are checked against direct
scalar transcriptions of the reference algorithms
(libvpx/vpx_dsp/{psnr,ssim,fastssim,psnrhvs}.c) plus analytic
invariants (identical inputs give the capped maxima; known-SSE PSNR).
"""

import math

import numpy as np
import pytest

from cuda_vp9_tpu.tools import metrics as mx


def _rand_planes(rng, w=64, h=48, bd=8):
    mx_v = (1 << bd) - 1
    dt = np.uint8 if bd == 8 else np.uint16
    y = rng.integers(0, mx_v + 1, (h, w)).astype(dt)
    u = rng.integers(0, mx_v + 1, (h // 2, w // 2)).astype(dt)
    v = rng.integers(0, mx_v + 1, (h // 2, w // 2)).astype(dt)
    return [y, u, v]


def _perturb(planes, rng, mag=8):
    out = []
    for p in planes:
        d = rng.integers(-mag, mag + 1, p.shape)
        out.append(np.clip(p.astype(np.int64) + d, 0,
                           255).astype(p.dtype))
    return out


# ------------------------------------------------------------------ psnr


def test_psnr_identical_capped():
    rng = np.random.default_rng(0)
    a = _rand_planes(rng)
    st = mx.calc_psnr(a, a)
    assert st["psnr"] == [mx.MAX_PSNR] * 4
    assert st["sse"] == [0] * 4


def test_psnr_known_sse():
    a = [np.zeros((16, 16), np.uint8), np.zeros((8, 8), np.uint8),
         np.zeros((8, 8), np.uint8)]
    b = [p.copy() for p in a]
    b[0][0, 0] = 16  # sse 256 over 384 samples
    st = mx.calc_psnr(a, b)
    want = 10 * math.log10(384 * 255 * 255 / 256)
    assert abs(st["psnr"][0] - want) < 1e-12
    assert st["sse"][1] == 256 and st["samples"][0] == 384


def test_psnr_highbd_shift():
    """bd=12 samples compared at in_bd=10: samples shift down 2 first
    (vpx_calc_highbd_psnr + highbd_get_sse_shift)."""
    rng = np.random.default_rng(1)
    a = _rand_planes(rng, bd=12)
    b = [(p ^ 3).astype(p.dtype) for p in a]  # differs only in low bits
    st = mx.calc_psnr(a, b, bd=12, in_bd=10)
    # shifting down 2 bits keeps only diffs >= 4: x^3 changes bits 0-1
    sse_direct = sum(int((((p.astype(np.int64) >> 2)
                           - (q.astype(np.int64) >> 2)) ** 2).sum())
                     for p, q in zip(a, b))
    assert st["sse"][0] == sse_direct


# ------------------------------------------------------------------ ssim


def _ssim8x8_scalar(a, b, bd=8):
    """Direct transcription of ssim_8x8/similarity (ssim.c:74-110)."""
    s = a.astype(np.int64)
    r = b.astype(np.int64)
    sum_s, sum_r = s.sum(), r.sum()
    sum_sq_s, sum_sq_r = (s * s).sum(), (r * r).sum()
    sum_sxr = (s * r).sum()
    cc1, cc2 = mx._SSIM_CC[bd]
    count = 64
    c1 = (cc1 * count * count) >> 12
    c2 = (cc2 * count * count) >> 12
    n = (2.0 * sum_s * sum_r + c1) * (2.0 * count * sum_sxr
                                      - 2.0 * sum_s * sum_r + c2)
    d = (float(sum_s * sum_s + sum_r * sum_r + c1)
         * float(count * sum_sq_s - sum_s * sum_s
                 + count * sum_sq_r - sum_r * sum_r + c2))
    return n / d


def test_ssim2_matches_scalar_windows():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, (24, 28)).astype(np.uint8)
    b = rng.integers(0, 256, (24, 28)).astype(np.uint8)
    want = []
    for i in range(0, 24 - 7, 4):
        for j in range(0, 28 - 7, 4):
            want.append(_ssim8x8_scalar(a[i:i + 8, j:j + 8],
                                        b[i:i + 8, j:j + 8]))
    got = mx.ssim2(a, b)
    assert abs(got - np.mean(want)) < 1e-12


def test_calc_ssim_weights():
    rng = np.random.default_rng(3)
    a = _rand_planes(rng)
    b = _perturb(a, rng)
    y = mx.ssim2(a[0], b[0])
    u = mx.ssim2(a[1], b[1])
    v = mx.ssim2(a[2], b[2])
    s, w = mx.calc_ssim(a, b)
    assert abs(s - (0.8 * y + 0.1 * (u + v))) < 1e-15 and w == 1.0


# -------------------------------------------------------------- fastssim


@pytest.mark.parametrize("shape", [(16, 16), (21, 17), (40, 56)])
def test_fs_structure_kernel_matches_scalar(shape):
    """The fixed-kernel correlation must equal the sliding-column
    recurrence everywhere, including warm-up/boundary columns."""
    rng = np.random.default_rng(4)
    h, w = shape
    gx = rng.integers(0, 1000, (h, w)).astype(np.int64)
    gy = rng.integers(0, 1000, (h, w)).astype(np.int64)
    gx[-1] = gx[:, -1] = 0  # gradient maps have zero last row/col
    gy[-1] = gy[:, -1] = 0
    c2 = 58246.8
    want = mx._fs_structure_scalar(gx, gy, c2)
    got = mx._fs_structure(gx, gy, c2)
    assert np.allclose(got, want, rtol=1e-12, atol=1e-12), \
        np.argwhere(~np.isclose(got, want))[:5]


def test_fastssim_identical_is_max_db():
    rng = np.random.default_rng(5)
    a = _rand_planes(rng, 48, 32)
    db, y, u, v = mx.calc_fastssim(a, a)
    assert db == mx.MAX_SSIM_DB
    assert y == pytest.approx(1.0) and u == pytest.approx(1.0)


def test_fastssim_orders_degradation():
    rng = np.random.default_rng(6)
    a = _rand_planes(rng, 64, 64)
    slight = _perturb(a, rng, 2)
    heavy = _perturb(a, rng, 60)
    d1 = mx.calc_fastssim(a, slight)[0]
    d2 = mx.calc_fastssim(a, heavy)[0]
    assert d1 > d2 > 0


# -------------------------------------------------------------- psnrhvs


def _fdct8x8_scalar(block):
    """Direct transcription of vpx_fdct8x8_c (fwd_txfm.c:90)."""
    from cuda_vp9_tpu.ops.ref.transforms import COSPI

    def rs(x):
        return (x + 8192) >> 14

    x = block.astype(np.int64)
    inter = np.zeros((8, 8), np.int64)
    out = np.zeros((8, 8), np.int64)
    for p in range(2):
        src = x.T if p == 0 else inter.T
        dst = inter if p == 0 else out
        for i in range(8):
            v = src[i] * (4 if p == 0 else 1)
            # s0..s3 = in_k + in_{7-k}; s4..s7 = in_{7-k} - in_k
            # (fwd_txfm.c:106-113: s4 = in3 - in4 ... s7 = in0 - in7)
            s = [v[k] + v[7 - k] for k in range(4)] + \
                [v[3 - k] - v[4 + k] for k in range(4)]
            x0, x1 = s[0] + s[3], s[1] + s[2]
            x2, x3 = s[1] - s[2], s[0] - s[3]
            o = [0] * 8
            o[0] = rs((x0 + x1) * COSPI[16])
            o[4] = rs((x0 - x1) * COSPI[16])
            o[2] = rs(x2 * COSPI[24] + x3 * COSPI[8])
            o[6] = rs(-x2 * COSPI[8] + x3 * COSPI[24])
            t2 = rs((s[6] - s[5]) * COSPI[16])
            t3 = rs((s[6] + s[5]) * COSPI[16])
            y0, y1 = s[4] + t2, s[4] - t2
            y2, y3 = s[7] - t3, s[7] + t3
            o[1] = rs(y0 * COSPI[28] + y3 * COSPI[4])
            o[5] = rs(y1 * COSPI[12] + y2 * COSPI[20])
            o[3] = rs(y2 * COSPI[12] - y1 * COSPI[20])
            o[7] = rs(y3 * COSPI[28] - y0 * COSPI[4])
            dst[i] = o
    out = out  # [vfreq rows? see below]
    # C writes pass-2 outputs row-major: row i = second-pass batch index
    res = np.zeros((8, 8), np.int64)
    for i in range(8):
        for j in range(8):
            v = out[i, j]
            res[i, j] = v // 2 if v >= 0 else -((-v) // 2)
    return res


def test_fdct8x8_matches_scalar():
    rng = np.random.default_rng(7)
    blocks = rng.integers(0, 256, (20, 8, 8)).astype(np.int64)
    got = mx._fdct8x8(blocks)
    for k in range(20):
        want = _fdct8x8_scalar(blocks[k])
        assert np.array_equal(got[k], want), k


def test_fdct8x8_dc():
    """Flat block: all energy in DC; DC = sum * 8 / 8 scaling chain."""
    b = np.full((1, 8, 8), 100, np.int64)
    c = mx._fdct8x8(b)
    assert c[0, 0, 0] != 0
    assert np.count_nonzero(c[0]) == 1


def test_psnrhvs_identical_capped():
    rng = np.random.default_rng(8)
    a = _rand_planes(rng, 32, 32)
    db, y, u, v = mx.psnrhvs(a, a)
    assert db == mx.MAX_PSNR and y == 0.0


def test_psnrhvs_orders_degradation():
    rng = np.random.default_rng(9)
    a = _rand_planes(rng, 64, 64)
    slight = _perturb(a, rng, 2)
    heavy = _perturb(a, rng, 40)
    assert mx.psnrhvs(a, slight)[0] > mx.psnrhvs(a, heavy)[0] > 0


# ------------------------------------------------------------------- CLI


def test_cli_yuv(tmp_path, capsys):
    rng = np.random.default_rng(10)
    w, h = 32, 24
    fa = tmp_path / "a.yuv"
    fb = tmp_path / "b.yuv"
    pa = _rand_planes(rng, w, h)
    pb = _perturb(pa, rng, 4)
    for path, planes in ((fa, pa), (fb, pb)):
        with open(path, "wb") as f:
            for p in planes:
                f.write(p.tobytes())
    rc = mx.main([str(fa), str(fb), f"{w}x{h}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "overall:" in out and "psnrhvs" in out and "fastssim" in out

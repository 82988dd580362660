"""Pallas loop-filter kernel vs the NumPy oracle (bit-exact).

Drives both from the same random per-cell metadata: the oracle side
applies ops/ref/loopfilter._apply_vertical/_apply_horizontal in the
normative SB raster order (vp9_loopfilter.c filter_selectively_*); the
kernel side runs ops/pallas/loopfilter.lf_frame in interpret mode on the
CPU backend (the same code path that compiles for TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cuda_vp9_tpu.ops.pallas import loopfilter as plf
from cuda_vp9_tpu.ops.ref.loopfilter import (_apply_horizontal,
                                             _apply_vertical,
                                             make_thresholds)


def _rand_cells(rng, R, C, interior_frac=0.4):
    """Random one-hot (m16, m8, m4) + interior mask + levels."""
    kind = rng.integers(0, 4, (R, C))           # 0=none 1=m16 2=m8 3=m4
    m16 = kind == 1
    m8 = kind == 2
    m4 = kind == 3
    m4i = (rng.random((R, C)) < interior_frac) & ~m16
    lvl = rng.integers(0, 64, (R, C))
    # frame-edge suppressions the real metadata guarantees
    m16[:, 0] = m8[:, 0] = m4[:, 0] = False
    return lvl, (m16, m8, m4, m4i)


def _ref_filter(planes, meta_y, meta_uv, thr, bd):
    """Normative-order application via the oracle window filters."""
    mb_t, lm_t, hv_t = thr
    (lvl_y, vy, hy) = meta_y
    (lvl_uv, vuv, huv) = meta_uv
    SBR = planes[0].shape[0] // 64
    SBC = planes[0].shape[1] // 64
    for sbr in range(SBR):
        for sbc in range(SBC):
            specs = [(0, lvl_y, vy, hy, 8), (1, lvl_uv, vuv, huv, 4),
                     (2, lvl_uv, vuv, huv, 4)]
            for pi, lvl, (m16, m8, m4, m4i), (h16, h8, h4, h4i), g in specs:
                plane = planes[pi]
                for r in range(g):
                    for i in range(g):
                        cr, cc = sbr * g + r, sbc * g + i
                        if cr >= lvl.shape[0] or cc >= lvl.shape[1]:
                            continue
                        lv = int(lvl[cr, cc])
                        args = (int(mb_t[lv]), int(lm_t[lv]),
                                int(hv_t[lv]))
                        y, x = cr * 8, cc * 8
                        if m16[cr, cc]:
                            _apply_vertical(plane, y, x, 16, *args, bd)
                        elif m8[cr, cc]:
                            _apply_vertical(plane, y, x, 8, *args, bd)
                        elif m4[cr, cc]:
                            _apply_vertical(plane, y, x, 4, *args, bd)
                        if m4i[cr, cc]:
                            _apply_vertical(plane, y, x + 4, 4, *args, bd)
                for r in range(g):
                    for i in range(g):
                        cr, cc = sbr * g + r, sbc * g + i
                        if cr >= lvl.shape[0] or cc >= lvl.shape[1]:
                            continue
                        lv = int(lvl[cr, cc])
                        args = (int(mb_t[lv]), int(lm_t[lv]),
                                int(hv_t[lv]))
                        y, x = cr * 8, cc * 8
                        if h16[cr, cc]:
                            _apply_horizontal(plane, y, x, 16, *args, bd)
                        elif h8[cr, cc]:
                            _apply_horizontal(plane, y, x, 8, *args, bd)
                            if h4i[cr, cc]:
                                _apply_horizontal(plane, y + 4, x, 4,
                                                  *args, bd)
                        elif h4[cr, cc]:
                            _apply_horizontal(plane, y, x, 4, *args, bd)
                            if h4i[cr, cc]:
                                _apply_horizontal(plane, y + 4, x, 4,
                                                  *args, bd)
                        elif h4i[cr, cc]:
                            _apply_horizontal(plane, y + 4, x, 4,
                                              *args, bd)


@pytest.mark.parametrize("sbr,sbc,bd,seed", [
    (1, 1, 8, 0),
    pytest.param(2, 3, 8, 1, marks=pytest.mark.slow),
    # exercises a second K=4 row-band group
    pytest.param(5, 2, 8, 2, marks=pytest.mark.slow),
    (2, 2, 10, 3),     # high bit depth thresholds
])
def test_pallas_lf_matches_oracle(sbr, sbc, bd, seed):
    rng = np.random.default_rng(seed)
    ha, wa = sbr * 64, sbc * 64
    mi_rows = ha // 8 - rng.integers(0, 2)   # sometimes ragged mi grid
    mi_cols = wa // 8 - rng.integers(0, 2)
    hc, wc = ha // 2, wa // 2
    maxv = (1 << bd) - 1
    F = np.zeros((3, ha, wa), np.int32)
    F[0] = rng.integers(0, maxv + 1, (ha, wa))
    F[1, :hc, :wc] = rng.integers(0, maxv + 1, (hc, wc))
    F[2, :hc, :wc] = rng.integers(0, maxv + 1, (hc, wc))

    R, C = mi_rows, mi_cols
    R2, C2 = (R + 1) // 2, (C + 1) // 2
    lvl_y, vy = _rand_cells(rng, R, C)
    _, hy = _rand_cells(rng, R, C)
    hy[0][0, :] = hy[1][0, :] = hy[2][0, :] = False   # frame top
    hy = (hy[0], hy[1], hy[2], hy[3] & ~hy[0])        # h4i never with h16
    lvl_uv, vuv = _rand_cells(rng, R2, C2)
    _, huv = _rand_cells(rng, R2, C2)
    huv[0][0, :] = huv[1][0, :] = huv[2][0, :] = False
    huv = (huv[0], huv[1], huv[2], huv[3] & ~huv[0])
    thr = make_thresholds(rng.integers(0, 8))

    # oracle
    planes = [F[0].astype(np.int64),
              F[1, :hc, :wc].astype(np.int64),
              F[2, :hc, :wc].astype(np.int64)]
    _ref_filter(planes, (lvl_y, vy, hy), (lvl_uv, vuv, huv), thr, bd)

    # kernel (interpret mode on CPU)
    lfm = plf.pack_lfm_fields(lvl_y, vy, hy, lvl_uv, vuv, huv,
                              mi_rows, mi_cols)
    thr_t = plf.pack_lf_thresholds(thr)
    out = np.asarray(plf.lf_frame(
        jnp.asarray(F), jnp.asarray(lfm), jnp.asarray(thr_t), jnp.int32(1),
        mi_rows=mi_rows, mi_cols=mi_cols, bd=bd, interpret=True))

    assert np.array_equal(out[0], planes[0]), "luma mismatch"
    assert np.array_equal(out[1, :hc, :wc], planes[1]), "U mismatch"
    assert np.array_equal(out[2, :hc, :wc], planes[2]), "V mismatch"


def test_pallas_lf_off_is_identity():
    rng = np.random.default_rng(7)
    F = rng.integers(0, 256, (3, 64, 128)).astype(np.int32)
    lfm = np.zeros((plf.K * 2, 2, 128), np.int16)
    thr_t = np.zeros((64, 4), np.int16)
    out = np.asarray(plf.lf_frame(
        jnp.asarray(F), jnp.asarray(lfm), jnp.asarray(thr_t), jnp.int32(0),
        mi_rows=8, mi_cols=16, bd=8, interpret=True))
    assert np.array_equal(out[0], F[0])
    assert np.array_equal(out[1, :32, :64], F[1, :32, :64])

"""Randomized DSP-level test of the device MC kernels vs the NumPy
normative oracle — the direct analog of the reference's convolve_test.cc
("C function as oracle" over random inputs, SURVEY.md §4).

The fused step's motion compensation is a 3-stage MXU matmul
formulation (runtime/fused.py _mc_chunk_compute / _mcs_chunk_compute)
whose bit-exactness is otherwise only exercised through whole-stream
golden MD5s; this sweeps random (position x subpel x filter x crop x
bit-depth x scale-step) combinations, including tiles entirely outside
the reference crop, against ops/ref/inter.convolve_block
(build_mc_border + vpx_convolve8 parity).
"""

import numpy as np
import pytest

import jax

from cuda_vp9_tpu import models as M
from cuda_vp9_tpu.ops.ref.inter import convolve_block
from cuda_vp9_tpu.runtime import fused

KERNELS = np.asarray(M.FILTER_KERNELS, np.int32)   # [4 filters, 16, 8]


def _random_pool(rng, pha, pwa, bd):
    maxv = (1 << bd) - 1
    return rng.integers(0, maxv + 1, (8, 3, pha, pwa), dtype=np.int64) \
        .astype(np.int32)


@pytest.mark.parametrize("bd", [8, 10, 12])
@pytest.mark.parametrize("w", [4, 8, 16])
def test_mc_chunk_matches_convolve_oracle(w, bd):
    """Unscaled tile class (xs = ys = 16)."""
    rng = np.random.default_rng(1000 + w + bd)
    h = w
    pha = pwa = 64
    br = min(160, pha)
    CH = 96
    slot, plane = 5, 1
    pool = _random_pool(rng, pha, pwa, bd)
    cw = int(rng.integers(pwa - 7, pwa + 1))
    chh = int(rng.integers(pha - 7, pha + 1))
    # positions include fully out-of-crop tiles (normative edge clamp)
    x0 = rng.integers(-12, cw + 12, CH)
    y0 = rng.integers(-12, chh + 12, CH)
    spx = rng.integers(0, 16, CH)
    spy = rng.integers(0, 16, CH)
    filt = rng.integers(0, 4, CH)
    # destination grid (w-aligned, in-canvas) — the wire encodes the
    # source as a delta against it: 4-int16 records
    # (dx | filt<<13, dy+1, sr, sc), runtime/pack.py build_layout
    per_row = pwa // w
    dx = (np.arange(CH) % per_row) * w
    dy = ((np.arange(CH) // per_row) * h) % pha
    u = np.zeros((CH, 4), np.int32)
    u[:, 0] = dx | (filt << 13)
    u[:, 1] = dy + 1
    u[:, 2] = ((y0 - dy) << 4) | spy
    u[:, 3] = ((x0 - dx) << 4) | spx
    hd = np.array([slot, plane, 0, cw, chh, 0, 0, 0], np.int32)

    fn = jax.jit(lambda p, k, hd, u: fused._mc_chunk_compute(
        p, k, hd, u, w, h, br, bd))
    got = np.asarray(fn(pool, KERNELS, hd, u))

    ref_plane = pool[slot, plane]
    for n in range(CH):
        want = convolve_block(
            ref_plane, cw, chh, int(x0[n]), int(y0[n]),
            int(spx[n]), int(spy[n]), 16, 16, w, h,
            KERNELS[filt[n]], bd, None)
        assert np.array_equal(got[n], want), \
            f"tile {n}: x0={x0[n]} y0={y0[n]} sp=({spx[n]},{spy[n]})" \
            f" filt={filt[n]} crop=({cw},{chh})"


@pytest.mark.parametrize("bd", [8, 10])
def test_mcs_chunk_matches_convolve_oracle(bd):
    """Scaled-reference 4x4 class: per-column/row q4 stepping
    (vpx_scaled_2d parity), steps covering up- and down-scaling."""
    rng = np.random.default_rng(77 + bd)
    pha = pwa = 64
    br = min(160, pha)
    CH = 96
    slot, plane = 2, 0
    pool = _random_pool(rng, pha, pwa, bd)
    cw = int(rng.integers(pwa - 7, pwa + 1))
    chh = int(rng.integers(pha - 7, pha + 1))
    u = np.zeros((CH, 16), np.int32)
    u[:, 4] = rng.integers(-12, cw + 12, CH)      # x0
    u[:, 5] = rng.integers(-12, chh + 12, CH)     # y0
    u[:, 6] = rng.integers(0, 16, CH)             # base phase x
    u[:, 7] = rng.integers(0, 16, CH)             # base phase y
    u[:, 8] = rng.integers(0, 4, CH)              # filter bank
    u[:, 9] = cw
    u[:, 10] = chh
    u[:, 12] = rng.integers(8, 33, CH)            # x_step_q4 (<= 2x down)
    u[:, 13] = rng.integers(8, 33, CH)            # y_step_q4
    hd = np.array([slot, plane, 0], np.int32)

    fn = jax.jit(lambda p, k, hd, u: fused._mcs_chunk_compute(
        p, k, hd, u, br, bd))
    got = np.asarray(fn(pool, KERNELS, hd, u))

    ref_plane = pool[slot, plane]
    for n in range(CH):
        want = convolve_block(
            ref_plane, cw, chh, int(u[n, 4]), int(u[n, 5]),
            int(u[n, 6]), int(u[n, 7]), int(u[n, 12]), int(u[n, 13]),
            4, 4, KERNELS[u[n, 8]], bd, None)
        assert np.array_equal(got[n], want), \
            f"tile {n}: x0={u[n,4]} y0={u[n,5]} sp=({u[n,6]},{u[n,7]})" \
            f" step=({u[n,12]},{u[n,13]}) filt={u[n,8]} crop=({cw},{chh})"

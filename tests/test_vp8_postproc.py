"""VP8 post-processing (vp8/common/postproc.c + vpx_dsp/deblock.c
parity): filter math on hand-checked cases and invariants, plus the
codec-API surface (VPX_CODEC_USE_POSTPROC init flag, VP8_SET_POSTPROC
control, reference defaults)."""

import numpy as np
import pytest

from cuda_vp9_tpu.codec import (CodecCtx, DecCfg, FrameIter, PostProcCfg,
                                VP8D_ADDNOISE, VP8D_DEBLOCK,
                                VP8D_DEMACROBLOCK, VP8D_NOFILTERING,
                                VP8_SET_POSTPROC, VPX_CODEC_INCAPABLE,
                                VPX_CODEC_OK, VPX_CODEC_USE_POSTPROC,
                                vp8_dx, vp9_dx, vpx_codec_control,
                                vpx_codec_dec_init, vpx_codec_decode,
                                vpx_codec_get_frame)
from cuda_vp9_tpu.vp8 import postproc as pp

from conftest import fixture_streams


def test_flat_plane_is_fixed_point():
    """Constant planes pass through every filter unchanged (the 5-tap
    averages and the 15-tap box mean of a constant are the constant)."""
    y = np.full((64, 48), 117, np.int64)
    lim = np.full((64, 48), 7, np.int64)
    assert np.array_equal(pp._down_across(y, lim), y)
    assert np.array_equal(pp.de_mblock(y, 40), y)


def test_down_across_hand_case():
    """One column with a small step: the conditional 5-tap must fire
    exactly where all four neighbor deltas are under the limit."""
    col = np.array([100, 100, 104, 100, 100], np.int64)
    y = np.tile(col[:, None], (1, 8))
    lim = np.full(y.shape, 5, np.int64)
    out = pp._down_across(y, lim)
    # row 2 (v=104): deltas 4,4,4,4 < 5 -> k1=k2=100, k3=100,
    # v'=(100+104+1)>>1=102.  rows 0/1/3/4 see one 4-delta (|100-104|)
    # and zeros elsewhere -> filtered toward the step:
    # k1=100, k2=(104+100+1)>>1=102 -> k3=(100+102+1)>>1=101,
    # v'=(101+100+1)>>1=101
    assert out[2, 0] == 102
    assert out[0, 0] == 101 and out[4, 0] == 101
    assert out[1, 0] == 101 and out[3, 0] == 101
    # a step larger than the limit is left alone
    y2 = np.tile(np.array([100, 100, 110, 100, 100], np.int64)[:, None],
                 (1, 8))
    assert np.array_equal(pp._down_across(y2, lim), y2)


def test_q2mbl_matches_reference_samples():
    # postproc.c:48 with C truncation: x<20 -> 20
    assert pp._q2mbl(0) == pp._q2mbl(20)
    assert pp._q2mbl(20) == ((50 + ((20 - 50) * 10) // -8 * -1) ** 2) // 3
    assert pp._q2mbl(63) == ((50 + ((63 - 50) * 10) // 8) ** 2) // 3


def _decode_all(ivf, flags=0, ppcfg=None):
    from cuda_vp9_tpu.containers import IvfReader
    ctx = CodecCtx()
    assert vpx_codec_dec_init(ctx, vp8_dx(), DecCfg(), flags) \
        == VPX_CODEC_OK
    if ppcfg is not None:
        assert vpx_codec_control(ctx, VP8_SET_POSTPROC, ppcfg) \
            == VPX_CODEC_OK
    out = []
    with IvfReader(str(ivf)) as r:
        for d, _ in r:
            assert vpx_codec_decode(ctx, d) == VPX_CODEC_OK
            it = FrameIter()
            while (img := vpx_codec_get_frame(ctx, it)) is not None:
                out.append([np.asarray(p).copy() for p in img.planes])
    return out


def _blockiness(y):
    """Mean absolute step across 16-aligned column boundaries."""
    cols = np.arange(16, y.shape[1] - 1, 16)
    return float(np.abs(y[:, cols].astype(np.int64)
                        - y[:, cols - 1].astype(np.int64)).mean())


def test_postproc_end_to_end_smooths_blocks():
    streams = {s[0]: s for s in fixture_streams(codec="vp8")}
    _, ivf, _ = streams["v8in03_176x144_lowq"]   # low q: visible blocks
    plain = _decode_all(ivf)
    post = _decode_all(ivf, flags=VPX_CODEC_USE_POSTPROC)
    assert len(plain) == len(post)
    changed = 0
    for a, b in zip(plain, post):
        for p in range(3):
            assert a[p].shape == b[p].shape
        if any(not np.array_equal(a[p], b[p]) for p in range(3)):
            changed += 1
            assert _blockiness(b[0]) <= _blockiness(a[0])
    assert changed > 0, "postproc never modified any frame"


def test_postproc_flag_combinations():
    streams = {s[0]: s for s in fixture_streams(codec="vp8")}
    _, ivf, _ = streams["v8in01_176x144"]
    plain = _decode_all(ivf)
    # NOFILTERING config: output identical to a plain decode
    off = _decode_all(ivf, flags=VPX_CODEC_USE_POSTPROC,
                      ppcfg=PostProcCfg(VP8D_NOFILTERING))
    for a, b in zip(plain, off):
        for p in range(3):
            assert np.array_equal(a[p], b[p])
    # DEBLOCK-only differs from DEBLOCK|DEMACROBLOCK on some frame
    d1 = _decode_all(ivf, flags=VPX_CODEC_USE_POSTPROC,
                     ppcfg=PostProcCfg(VP8D_DEBLOCK))
    d2 = _decode_all(ivf, flags=VPX_CODEC_USE_POSTPROC,
                     ppcfg=PostProcCfg(VP8D_DEBLOCK | VP8D_DEMACROBLOCK))
    assert any(not np.array_equal(a[0], b[0]) for a, b in zip(d1, d2))
    # ADDNOISE perturbs luma, bounded by the clamp
    dn = _decode_all(ivf, flags=VPX_CODEC_USE_POSTPROC,
                     ppcfg=PostProcCfg(VP8D_ADDNOISE, noise_level=4))
    diffs = [int(np.abs(a[0].astype(np.int64)
                        - b[0].astype(np.int64)).max())
             for a, b in zip(plain, dn)]
    assert max(diffs) > 0


def test_postproc_vp9_incapable():
    ctx = CodecCtx()
    assert vpx_codec_dec_init(ctx, vp9_dx(), DecCfg(),
                              VPX_CODEC_USE_POSTPROC) \
        == VPX_CODEC_INCAPABLE
    ctx2 = CodecCtx()
    assert vpx_codec_dec_init(ctx2, vp9_dx(), DecCfg()) == VPX_CODEC_OK
    assert vpx_codec_control(ctx2, VP8_SET_POSTPROC, PostProcCfg(1)) \
        == VPX_CODEC_INCAPABLE

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


# ------------------------------------------------------------------ MFQE


def _mfqe_block_scalar(bs, qcurr, qprev, y, u, v, yd, ud, vd):
    """Direct transcription of multiframe_quality_enhance_block
    (mfqe.c:108, USE_SSD variant).  y/u/v = current, yd/ud/vd =
    previous (dest); returns the blended (yd, ud, vd)."""
    def var(b):
        n = b.size
        s = int(b.sum())
        sse = int((b.astype(np.int64) ** 2).sum())
        return sse - ((s * s) >> int(np.log2(n)))

    def ssd(a, b):
        return int(((a.astype(np.int64) - b.astype(np.int64)) ** 2).sum())

    qdiff = qcurr - qprev
    if bs == 16:
        actd = (var(yd) + 128) >> 8
        act = (var(y) + 128) >> 8
        sad = (ssd(y, yd) + 128) >> 8
        usad = (ssd(u, ud) + 32) >> 6
        vsad = (ssd(v, vd) + 32) >> 6
    else:
        actd = (var(yd) + 32) >> 6
        act = (var(y) + 32) >> 6
        sad = (ssd(y, yd) + 32) >> 6
        usad = (ssd(u, ud) + 8) >> 4
        vsad = (ssd(v, vd) + 8) >> 4
    actrisk = actd > act * 5
    thr = qdiff >> 4
    a = actd
    while a >> 1:
        a >>= 1
        thr += 1
    qp = qprev
    while qp >> 2:
        qp >>= 2
        thr += 1
    thrsq = thr * thr
    if sad < thrsq and 4 * usad < thrsq and 4 * vsad < thrsq \
            and not actrisk:
        g = 0
        x = sad
        p = 1
        yv = x
        while yv >> 1:
            yv >>= 1
            p += 1
        p >>= 1
        while p >= 0:
            g |= 1 << p
            if x < g * g:
                g -= 1 << p
            p -= 1
        g += g * g + g + 1 <= x
        ifactor = (g << 4) // thr
        ifactor >>= qdiff >> 5
        if ifactor:
            w, dw = ifactor, 16 - ifactor
            blend = lambda s, d: ((s.astype(np.int64) * w
                                   + d.astype(np.int64) * dw + 8) >> 4)
            return blend(y, yd), blend(u, ud), blend(v, vd)
        return yd.copy(), ud.copy(), vd.copy()
    return y.copy(), u.copy(), v.copy()


def test_mfqe_matches_scalar_blocks():
    """Vectorized MFQE vs per-MB scalar transcription on a keyframe
    (every MB qualifies -> all 16x16 blocks exercised) with a mix of
    similar and dissimilar content."""
    rng = np.random.default_rng(11)
    mr, mc = 4, 6
    H, W = mr * 16, mc * 16
    cur_y = rng.integers(0, 256, (H, W)).astype(np.uint8)
    # previous frame: half the MBs nearly identical (blend candidates),
    # half random (rejected by the sad/thr test)
    prev_y = cur_y.copy()
    prev_y[:, W // 2:] = rng.integers(0, 256, (H, W // 2))
    jitter = rng.integers(-2, 3, (H, W // 2))
    prev_y[:, :W // 2] = np.clip(
        cur_y[:, :W // 2].astype(int) + jitter, 0, 255)
    cur_u = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
    cur_v = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
    prev_u = np.clip(cur_u.astype(int)
                     + rng.integers(-2, 3, cur_u.shape), 0,
                     255).astype(np.uint8)
    prev_v = np.clip(cur_v.astype(int)
                     + rng.integers(-2, 3, cur_v.shape), 0,
                     255).astype(np.uint8)
    qcurr, qprev = 80, 40
    mode = np.zeros((mr, mc), np.int64)
    mvs = np.zeros((mr, mc, 2), np.int64)
    bmvs = np.zeros((mr, mc, 16, 2), np.int64)
    skip = np.zeros((mr, mc), bool)
    got = pp.multiframe_quality_enhance(
        [cur_y, cur_u, cur_v], [prev_y, prev_u, prev_v],
        mode, mvs, bmvs, skip, qcurr, qprev, frame_type=0)
    blended = copied = 0
    for r in range(mr):
        for c in range(mc):
            wy, wu, wv = _mfqe_block_scalar(
                16, qcurr, qprev,
                cur_y[r * 16:r * 16 + 16, c * 16:c * 16 + 16],
                cur_u[r * 8:r * 8 + 8, c * 8:c * 8 + 8],
                cur_v[r * 8:r * 8 + 8, c * 8:c * 8 + 8],
                prev_y[r * 16:r * 16 + 16, c * 16:c * 16 + 16],
                prev_u[r * 8:r * 8 + 8, c * 8:c * 8 + 8],
                prev_v[r * 8:r * 8 + 8, c * 8:c * 8 + 8])
            assert np.array_equal(
                got[0][r * 16:r * 16 + 16, c * 16:c * 16 + 16], wy), (r, c)
            assert np.array_equal(
                got[1][r * 8:r * 8 + 8, c * 8:c * 8 + 8], wu), (r, c)
            assert np.array_equal(
                got[2][r * 8:r * 8 + 8, c * 8:c * 8 + 8], wv), (r, c)
            if not np.array_equal(
                    wy, cur_y[r * 16:r * 16 + 16, c * 16:c * 16 + 16]):
                blended += 1
            else:
                copied += 1
    assert blended > 0 and copied > 0  # both paths exercised


def test_mfqe_inter_qualification():
    """Inter frames: only low-motion inter MBs (or skipped MBs) blend;
    intra and high-motion MBs copy the current frame."""
    rng = np.random.default_rng(12)
    mr, mc = 2, 4
    H, W = mr * 16, mc * 16
    cur = [rng.integers(0, 256, (H, W)).astype(np.uint8),
           rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8),
           rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)]
    # previous nearly identical everywhere -> qualification decides
    prev = [np.clip(p.astype(int) + rng.integers(-1, 2, p.shape),
                    0, 255).astype(np.uint8) for p in cur]
    mode = np.zeros((mr, mc), np.int64)
    mvs = np.zeros((mr, mc, 2), np.int64)
    bmvs = np.zeros((mr, mc, 16, 2), np.int64)
    skip = np.zeros((mr, mc), bool)
    mode[:] = 0          # intra (DC_PRED) -> copy
    mode[0, 1] = 7       # ZEROMV, zero motion -> qualifies
    mode[0, 2] = 8       # NEWMV with big motion -> copy
    mvs[0, 2] = (40, 40)
    skip[0, 3] = True    # skipped -> qualifies regardless of mode
    got = pp.multiframe_quality_enhance(cur, prev, mode, mvs, bmvs,
                                        skip, 80, 40, frame_type=1)

    def mb(p, r, c, bs):
        return p[r * bs:(r + 1) * bs, c * bs:(c + 1) * bs]

    # intra + high motion MBs: copy current exactly
    for c in (0, 2):
        assert np.array_equal(mb(got[0], 0, c, 16), mb(cur[0], 0, c, 16))
    # zero-motion + skip MBs: blended toward previous (differ from cur)
    for c in (1, 3):
        assert not np.array_equal(mb(got[0], 0, c, 16),
                                  mb(cur[0], 0, c, 16))


def test_mfqe_stream_gating():
    """Vp8StreamDecoder applies MFQE only after >10 frames, from a
    good-quality trail (last q < 60), on a >= 20 q jump."""
    from cuda_vp9_tpu.vp8 import Vp8StreamDecoder

    class FakeDec:
        pass

    rng = np.random.default_rng(13)
    H, W = 32, 48
    sd = Vp8StreamDecoder.__new__(Vp8StreamDecoder)
    sd._out = []
    sd.use_postproc = True
    sd.postproc_cfg = (pp.VP8D_MFQE, 4, 0)
    sd._noise = None
    sd._pp_prev = None
    sd._pp_last_q = 40
    sd._pp_last_valid = True
    sd._pp_frames = 20
    d = FakeDec()
    d.pp_planes = (rng.integers(0, 256, (H, W)).astype(np.uint8),
                   rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8),
                   rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8))
    d.pp_skip = np.ones((H // 16, W // 16), bool)
    d.pp_filter_level = 20
    d.pp_mode = np.zeros((H // 16, W // 16), np.int64)
    d.pp_mvs = np.zeros((H // 16, W // 16, 2), np.int64)
    d.pp_bmvs = np.zeros((H // 16, W // 16, 16, 2), np.int64)
    d.pp_base_qindex = 80
    d.pp_frame_type = 1
    sd._dec = d

    class Hdr:
        width, height = W, H

    # no previous displayed frame yet -> MFQE skipped, q trail resets
    out1 = sd._postproc(Hdr, None)
    assert sd._pp_last_q == 80 and sd._pp_prev is not None
    # now a quality drop from a good trail on slightly-changed content:
    # MFQE engages and blends toward the previous displayed frame
    cur2 = tuple(np.clip(p.astype(int)
                         + rng.integers(-2, 3, p.shape), 0,
                         255).astype(np.uint8) for p in d.pp_planes)
    d.pp_planes = cur2
    sd._pp_last_q = 30
    out2 = sd._postproc(Hdr, None)
    # blended q trail moves partially toward current (3*30+80)>>2 = 42
    assert sd._pp_last_q == (3 * 30 + 80) >> 2
    # output is neither the raw current frame (blend happened) nor the
    # previous frame (unless weight 0 everywhere)
    assert not np.array_equal(out2[0], cur2[0][:H, :W])

"""VP8_SET_REFERENCE / VP8_COPY_REFERENCE / VP9_GET_REFERENCE decoder
controls (vp9_dx_iface.c:675-697, vp9_decoder.c:258-330, vp8_dx_iface).

The set-reference round-trip mirrors examples/vp9cx_set_ref.c: the SAME
reference overwrite applied to encoder and decoder must keep them in
sync (no drift)."""

import numpy as np

from cuda_vp9_tpu.codec import (CodecCtx, DecCfg, FrameIter, RefFrame,
                                VP8_COPY_REFERENCE, VP8_GOLD_FRAME,
                                VP8_LAST_FRAME, VP8_SET_REFERENCE,
                                VP9_GET_REFERENCE, VPX_CODEC_OK, vp8_dx,
                                vp9_dx, vpx_codec_control,
                                vpx_codec_dec_init, vpx_codec_decode,
                                vpx_codec_get_frame)
from cuda_vp9_tpu.encoder import Vp9Encoder

from conftest import fixture_streams

W, H = 176, 144


def _synth(n, seed=5):
    rng = np.random.default_rng(seed)
    cw, ch = W // 2, H // 2
    for _ in range(n):
        y = rng.integers(40, 216, (H, W), dtype=np.uint8)
        y[: H // 2] = np.linspace(60, 200, W, dtype=np.uint8)[None, :]
        u = rng.integers(100, 156, (ch, cw), dtype=np.uint8)
        v = rng.integers(100, 156, (ch, cw), dtype=np.uint8)
        yield [y, u, v]


def _drain(ctx):
    out = []
    it = FrameIter()
    while (img := vpx_codec_get_frame(ctx, it)) is not None:
        out.append([np.asarray(p).copy() for p in img.planes])
    return out


def test_vp9_set_reference_encoder_decoder_sync():
    """vp9cx_set_ref.c semantics: overwrite the LAST reference on BOTH
    sides mid-stream; encoder recon and decoder output must match on
    every subsequent frame."""
    frames = list(_synth(6))
    enc = Vp9Encoder(W, H, base_qindex=80, gop=9999)
    ctx = CodecCtx()
    assert vpx_codec_dec_init(ctx, vp9_dx(), DecCfg()) == VPX_CODEC_OK

    update_at = 3
    recons, outs = [], []
    for i, planes in enumerate(frames):
        if i == update_at:
            # the modified reference: the previous recon, dimmed
            mod = [(p.astype(np.int64) * 3 // 4).astype(np.uint16)
                   for p in enc._ref_recon]
            crop = [mod[0][:H, :W], mod[1][:H // 2, :W // 2],
                    mod[2][:H // 2, :W // 2]]
            enc.set_reference([c.copy() for c in crop], (W, H))
            rf = RefFrame(VP8_LAST_FRAME, [c.copy() for c in crop])
            assert vpx_codec_control(ctx, VP8_SET_REFERENCE, rf) \
                == VPX_CODEC_OK
        payload = enc.encode_frame(planes)
        recons.append([p.copy() for p in enc._last_recon])
        assert vpx_codec_decode(ctx, payload) == VPX_CODEC_OK
        outs.extend(_drain(ctx))
    assert len(outs) == len(frames)
    for i, (rec, out) in enumerate(zip(recons, outs)):
        got = [np.asarray(out[0])[:H, :W], np.asarray(out[1])[:H // 2, :W // 2],
               np.asarray(out[2])[:H // 2, :W // 2]]
        for p in range(3):
            assert np.array_equal(rec[p][:got[p].shape[0], :got[p].shape[1]]
                                  .astype(np.int64),
                                  got[p].astype(np.int64)), \
                f"frame {i} plane {p}: encoder/decoder drift"


def test_vp9_set_reference_bad_dims_rejected():
    streams = {s[0]: s for s in fixture_streams()}
    _, ivf, _ = streams["in01_176x144"]
    from cuda_vp9_tpu.containers import IvfReader
    ctx = CodecCtx()
    assert vpx_codec_dec_init(ctx, vp9_dx(), DecCfg()) == VPX_CODEC_OK
    with IvfReader(str(ivf)) as r:
        pkts = [d for d, _ in r]
    vpx_codec_decode(ctx, pkts[0])
    _drain(ctx)
    bad = RefFrame(VP8_LAST_FRAME, [np.zeros((64, 64), np.uint8),
                                    np.zeros((32, 32), np.uint8),
                                    np.zeros((32, 32), np.uint8)])
    assert vpx_codec_control(ctx, VP8_SET_REFERENCE, bad) != VPX_CODEC_OK


def test_vp9_copy_and_get_reference():
    streams = {s[0]: s for s in fixture_streams()}
    _, ivf, _ = streams["in01_176x144"]
    from cuda_vp9_tpu.containers import IvfReader
    ctx = CodecCtx()
    assert vpx_codec_dec_init(ctx, vp9_dx(), DecCfg()) == VPX_CODEC_OK
    with IvfReader(str(ivf)) as r:
        pkts = [d for d, _ in r]
    # before any inter frame: no 'last' reference (reference errors too)
    rf = RefFrame(VP8_LAST_FRAME)
    assert vpx_codec_control(ctx, VP8_COPY_REFERENCE, rf) != VPX_CODEC_OK
    shown = []
    for p in pkts[:3]:
        assert vpx_codec_decode(ctx, p) == VPX_CODEC_OK
        shown.extend(_drain(ctx))
    # COPY_REFERENCE(LAST) = frame_refs[0] of the newest frame: with
    # this fixture's refresh pattern that is the previous decoded frame
    rf = RefFrame(VP8_LAST_FRAME)
    assert vpx_codec_control(ctx, VP8_COPY_REFERENCE, rf) == VPX_CODEC_OK
    for p in range(3):
        assert np.array_equal(np.asarray(rf.planes[p]),
                              np.asarray(shown[-2][p]))
    # only LAST is copyable (vp9_copy_reference_dec)
    rf2 = RefFrame(VP8_GOLD_FRAME)
    assert vpx_codec_control(ctx, VP8_COPY_REFERENCE, rf2) != VPX_CODEC_OK
    # GET_REFERENCE: the last SHOWN frame
    rf3 = RefFrame()
    assert vpx_codec_control(ctx, VP9_GET_REFERENCE, rf3) == VPX_CODEC_OK
    for p in range(3):
        assert np.array_equal(np.asarray(rf3.planes[p]),
                              np.asarray(shown[-1][p]))


def test_vp8_set_and_copy_reference():
    streams = {s[0]: s for s in fixture_streams(codec="vp8")}
    _, ivf, _ = streams["v8in01_176x144"]
    from cuda_vp9_tpu.containers import IvfReader
    ctx = CodecCtx()
    assert vpx_codec_dec_init(ctx, vp8_dx(), DecCfg()) == VPX_CODEC_OK
    with IvfReader(str(ivf)) as r:
        pkts = [d for d, _ in r]
    shown = []
    for p in pkts[:2]:
        assert vpx_codec_decode(ctx, p) == VPX_CODEC_OK
        shown.extend(_drain(ctx))
    rf = RefFrame(VP8_LAST_FRAME)
    assert vpx_codec_control(ctx, VP8_COPY_REFERENCE, rf) == VPX_CODEC_OK
    for p in range(3):
        assert np.array_equal(np.asarray(rf.planes[p]),
                              np.asarray(shown[-1][p]))
    # SET then COPY round-trips the new pixels
    w, h = W, H
    newref = [np.full((h, w), 99, np.uint8),
              np.full((h // 2, w // 2), 50, np.uint8),
              np.full((h // 2, w // 2), 200, np.uint8)]
    assert vpx_codec_control(ctx, VP8_SET_REFERENCE,
                             RefFrame(VP8_LAST_FRAME, newref)) \
        == VPX_CODEC_OK
    rf = RefFrame(VP8_LAST_FRAME)
    assert vpx_codec_control(ctx, VP8_COPY_REFERENCE, rf) == VPX_CODEC_OK
    for p in range(3):
        assert np.array_equal(np.asarray(rf.planes[p]), newref[p])

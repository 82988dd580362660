"""VP8 encoder round-trip tests.

The bar mirrors the VP9 encoder's: spec-valid output — our own
normative decoder reproduces the encoder's in-loop reconstruction
bit-exactly, with a PSNR floor vs the source.  Reference counterparts:
vp8/encoder/onyx_if.c, bitstream.c (the libvpx encoder has no unit
tests of its own beyond round-trip either).
"""

import numpy as np
import pytest

from cuda_vp9_tpu.vp8.decoder import BC, BY, LAST, Vp8Decoder
from cuda_vp9_tpu.vp8.encoder import Vp8Encoder, fdct4x4, fwalsh4x4
from cuda_vp9_tpu.vp8 import recon as R


def _psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64))
                  ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _frames(w, h, n, seed=3, noise=4.0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        y = ((128 + 64 * np.sin((xx + 3 * t) / 17.0)
              + 48 * np.cos((yy + 2 * t) / 11.0))
             + rng.normal(0, noise, (h, w))).clip(0, 255).astype(np.uint8)
        u = ((128 + 40 * np.sin(xx[::2, ::2] / 23.0 + t / 5))
             ).clip(0, 255).astype(np.uint8)
        v = ((128 + 40 * np.cos(yy[::2, ::2] / 19.0 - t / 7))
             ).clip(0, 255).astype(np.uint8)
        out.append((y, u, v))
    return out


def _roundtrip(enc, dec, frames, min_psnr):
    """Encode + decode each frame; assert in-loop == decoder output
    bit-exactly and a PSNR floor."""
    w, h = enc.W, enc.H
    ch, cw = (h + 1) // 2, (w + 1) // 2
    for t, (y, u, v) in enumerate(frames):
        payload = enc.encode((y, u, v))
        hdr, (dy, du, dv) = dec.decode(payload)
        eY, eU, eV = enc.refs[LAST]
        assert np.array_equal(dy, eY[BY:BY + h, BY:BY + w]), \
            f"frame {t}: Y in-loop mismatch"
        assert np.array_equal(du, eU[BC:BC + ch, BC:BC + cw]), \
            f"frame {t}: U in-loop mismatch"
        assert np.array_equal(dv, eV[BC:BC + ch, BC:BC + cw]), \
            f"frame {t}: V in-loop mismatch"
        p = _psnr(y, dy)
        assert p >= min_psnr, f"frame {t}: Y PSNR {p:.2f} < {min_psnr}"


def test_forward_transforms_invert():
    rng = np.random.default_rng(0)
    for _ in range(100):
        x = rng.integers(-255, 256, (4, 4)).astype(np.int64)
        back = np.asarray(R.idct4x4(fdct4x4(x).astype(np.int64)))
        assert np.abs(back - x).max() <= 1
        d = rng.integers(-2040, 2041, 16).astype(np.int64)
        w = fwalsh4x4(d)
        back = np.asarray(R.iwalsh4x4(w.astype(np.int64))).reshape(-1)
        assert np.abs(back - d).max() <= 1


@pytest.mark.parametrize("w,h,q", [(176, 144, 20), (96, 80, 52),
                                   (210, 122, 36)])
def test_vp8_keyframe_roundtrip(w, h, q):
    enc = Vp8Encoder(w, h, qindex=q, kf_interval=1)
    _roundtrip(enc, Vp8Decoder(), _frames(w, h, 2),
               min_psnr=30 if q > 40 else 34)


def test_vp8_inter_roundtrip():
    enc = Vp8Encoder(176, 144, qindex=24)
    dec = Vp8Decoder()
    _roundtrip(enc, dec, _frames(176, 144, 5, noise=0), min_psnr=38)
    assert enc._frame_idx == 5


def test_vp8_inter_with_loop_filter():
    enc = Vp8Encoder(176, 144, qindex=40, filter_level=24)
    _roundtrip(enc, Vp8Decoder(), _frames(176, 144, 4), min_psnr=30)


def test_vp8_static_scene_skips():
    """A static scene after the keyframe codes (almost) all-skip
    P-frames that are tiny."""
    y, u, v = _frames(176, 144, 1, noise=0)[0]
    enc = Vp8Encoder(176, 144, qindex=24)
    dec = Vp8Decoder()
    first = enc.encode((y, u, v))
    dec.decode(first)
    p = enc.encode((y, u, v))
    hdr, (dy, _, _) = dec.decode(p)
    # all-skip P-frame: mode bits + the fixed header fields only
    assert len(p) < max(len(first) // 4, 200), (len(first), len(p))
    assert _psnr(y, dy) >= 38


def test_vp8_newmv_beats_zeromv():
    """Panning content: the diamond search must engage (NEWMV coded)
    and beat a ZEROMV/NEAR-only encode by a wide bitrate margin, while
    staying bit-exact in-loop."""
    rng = np.random.default_rng(9)
    w, h, pad = 176, 144, 40
    base = rng.integers(0, 256, (h + pad, w + pad)).astype(np.uint8)
    base = ((base.astype(np.int32) + np.roll(base, 1, 0)
             + np.roll(base, 1, 1) + np.roll(base, -1, 0)) // 4
            ).astype(np.uint8)

    def mk(t, dx=3, dy=2):
        y = base[t * dy:t * dy + h, t * dx:t * dx + w].copy()
        u = np.full(((h + 1) // 2, (w + 1) // 2), 120, np.uint8)
        v = np.full(((h + 1) // 2, (w + 1) // 2), 130, np.uint8)
        return y, u, v

    def run(search):
        enc = Vp8Encoder(w, h, qindex=24)
        if not search:
            enc._search_newmv = lambda *a, **k: ((0, 0), 1 << 40)
        dec = Vp8Decoder()
        sizes = []
        for t in range(4):
            yy, uu, vv = mk(t)
            p = enc.encode((yy, uu, vv))
            dy, _, _ = dec.decode(p)[1]
            eY = enc.refs[LAST][0]
            assert np.array_equal(dy, eY[BY:BY + h, BY:BY + w])
            sizes.append(len(p))
        return sizes

    s_mv, s_zmv = run(True), run(False)
    assert sum(s_mv[1:]) < 0.7 * sum(s_zmv[1:]), (s_mv, s_zmv)


def test_vp8_rate_control_converges():
    enc = Vp8Encoder(176, 144, qindex=60, bitrate_kbps=200, fps=30,
                     filter_level=10)
    dec = Vp8Decoder()
    sizes = []
    for (y, u, v) in _frames(176, 144, 12, noise=6.0):
        payload = enc.encode((y, u, v))
        dec.decode(payload)
        sizes.append(len(payload))
    target = 200_000 / 8 / 30
    tail = np.mean(sizes[-4:])
    assert 0.4 * target <= tail <= 2.5 * target, (sizes, target)


def test_vp8_encoder_via_vpxenc_cli(tmp_path):
    """vpxenc --codec=vp8 writes a VP80 IVF our codec API decodes."""
    from cuda_vp9_tpu.codec import (CodecCtx, DecCfg, FrameIter, vp8_dx,
                                    vpx_codec_dec_init, vpx_codec_decode,
                                    vpx_codec_get_frame, VPX_CODEC_OK)
    from cuda_vp9_tpu.containers import IvfReader
    from cuda_vp9_tpu.tools import vpxenc as vpxenc_mod

    w, h, n = 96, 80, 4
    raw = tmp_path / "in.yuv"
    with open(raw, "wb") as f:
        for (y, u, v) in _frames(w, h, n):
            f.write(y.tobytes() + u.tobytes() + v.tobytes())
    out = tmp_path / "out.ivf"
    rc = vpxenc_mod.main([str(raw), "-o", str(out), "--codec", "vp8",
                          "--width", str(w), "--height", str(h),
                          "--qindex", "24", "--kf-max-dist", "4"])
    assert rc == 0
    with IvfReader(str(out)) as r:
        assert r.fourcc == b"VP80"
        pkts = [d for d, _ in r]
    assert len(pkts) == n
    ctx = CodecCtx()
    assert vpx_codec_dec_init(ctx, vp8_dx(), DecCfg()) == VPX_CODEC_OK
    shown = 0
    for pkt in pkts:
        assert vpx_codec_decode(ctx, pkt) == VPX_CODEC_OK
        it = FrameIter()
        while (img := vpx_codec_get_frame(ctx, it)) is not None:
            assert (img.d_w, img.d_h) == (w, h)
            shown += 1
    assert shown == n

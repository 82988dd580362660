"""VP9 encoder round-trip tests.

The bar for the intra-only encoder slice: its output must be spec-valid
VP9.  Each case encodes synthetic frames and asserts (a) this repo's own
decoder and the normative libavcodec vp9 decoder produce IDENTICAL
per-frame MD5s, and (b) reconstruction quality clears a PSNR floor
(exactness for lossless).  Mirrors the reference's encode-then-decode
test pattern (libvpx/test/encode_test_driver.cc + end_to_end_test.cc).
"""

import subprocess

import numpy as np
import pytest

from cuda_vp9_tpu.containers.ivf import IvfWriter
from cuda_vp9_tpu.containers.y4m import Y4mReader, open_raw_video
from cuda_vp9_tpu.decoder import constants as C
from cuda_vp9_tpu.decoder.frame import decode_stream_md5
from cuda_vp9_tpu.encoder import Vp9Encoder
from cuda_vp9_tpu.encoder.bitwriter import BoolEncoder, BitWriter
from cuda_vp9_tpu.decoder.bitreader import BoolDecoder, BitReader

from conftest import ORACLE_BIN, build_oracle_or_skip


def _make_frames(w, h, n, bd=8, seed=5, noise=8):
    rng = np.random.default_rng(seed)
    mx = (1 << bd) - 1
    mid = 1 << (bd - 1)
    amp = mx // 4
    dt = np.uint16 if bd > 8 else np.uint8
    cw, ch = (w + 1) >> 1, (h + 1) >> 1
    yy, xx = np.mgrid[0:h, 0:w]
    cyy, cxx = np.mgrid[0:ch, 0:cw]
    out = []
    for t in range(n):
        y = ((mid + amp * np.sin(xx / 17.0 + t) * np.cos(yy / 11.0))
             + rng.integers(-noise, noise + 1, (h, w))).clip(0, mx)
        u = (mid + amp * np.sin(cxx / 23.0 + t)).clip(0, mx)
        v = (mid + amp * np.cos(cyy / 19.0 - t)).clip(0, mx)
        out.append([y.astype(dt), u.astype(dt), v.astype(dt)])
    return out


def _encode_ivf(path, frames, **kw):
    w = frames[0][0].shape[1]
    h = frames[0][0].shape[0]
    enc = Vp9Encoder(w, h, **kw)
    with open(path, "wb") as f:
        wtr = IvfWriter(f, b"VP90", w, h)
        for i, fr in enumerate(frames):
            wtr.write_frame(enc.encode_frame(fr), i)
        wtr.close()
    return enc


def _normative_md5(tmp_path, ivf, raw_out=None):
    build_oracle_or_skip()
    md5 = tmp_path / "norm.md5"
    cmd = [ORACLE_BIN, "decode", str(ivf), str(md5)]
    if raw_out:
        cmd.append(str(raw_out))
    r = subprocess.run(cmd, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return [line.split()[0] for line in md5.read_text().splitlines()]


def _own_md5(ivf):
    return [digest for _, digest in decode_stream_md5(str(ivf))]


@pytest.mark.parametrize("w,h,q,bs", [
    (176, 144, 60, C.BLOCK_16X16),
    (176, 144, 20, C.BLOCK_8X8),
    (176, 144, 150, C.BLOCK_32X32),
    (210, 122, 60, C.BLOCK_16X16),   # odd dims: forced edge splits
    (98, 66, 80, C.BLOCK_64X64),
])
def test_encode_roundtrip(tmp_path, w, h, q, bs):
    ivf = tmp_path / "enc.ivf"
    frames = _make_frames(w, h, 2)
    _encode_ivf(ivf, frames, base_qindex=q, block_size=bs)
    own = _own_md5(ivf)
    norm = _normative_md5(tmp_path, ivf)
    assert len(own) == 2
    assert own == norm


@pytest.mark.parametrize("w,h,q", [
    (176, 144, 60),
    (210, 122, 90),   # odd dims: edge-clamped ZEROMV prediction
])
def test_encode_inter_roundtrip(tmp_path, w, h, q):
    """gop > 1: ZEROMV/LAST inter frames with intra fallback must be
    spec-valid (own decoder == normative decoder, per frame)."""
    ivf = tmp_path / "enc_p.ivf"
    frames = _make_frames(w, h, 6)
    _encode_ivf(ivf, frames, base_qindex=q, gop=6)
    own = _own_md5(ivf)
    norm = _normative_md5(tmp_path, ivf)
    assert len(own) == 6
    assert own == norm


def _make_panning_frames(w, h, n, seed=9, dx=3, dy=2):
    """Textured scene panning (dx, dy) px/frame: ZEROMV codes a full
    residual, motion search should land on (or near) the true shift."""
    rng = np.random.default_rng(seed)
    pad = 8 * n
    base = rng.integers(0, 256, (h + pad, w + pad), np.uint8)
    # smooth it a little so subpel interpolation can win
    base = ((base.astype(np.int32)
             + np.roll(base, 1, 0) + np.roll(base, 1, 1)
             + np.roll(base, -1, 0)) // 4).astype(np.uint8)
    cw, ch = (w + 1) >> 1, (h + 1) >> 1
    out = []
    for t in range(n):
        y = base[t * dy:t * dy + h, t * dx:t * dx + w]
        u = np.full((ch, cw), 120, np.uint8)
        v = np.full((ch, cw), 130, np.uint8)
        out.append([y.copy(), u, v])
    return out


def test_encode_newmv_roundtrip(tmp_path):
    """Motion search (NEWMV + NEAREST/NEAR from the decoder's mv-ref
    machinery) on panning content: spec-valid output AND the search must
    actually pick NEWMV, AND motion coding must beat ZEROMV-style full
    residuals by a wide bitrate margin."""
    ivf = tmp_path / "enc_mv.ivf"
    frames = _make_panning_frames(176, 144, 5)
    enc = _encode_ivf(ivf, frames, base_qindex=60, gop=5)
    own = _own_md5(ivf)
    norm = _normative_md5(tmp_path, ivf)
    assert len(own) == 5
    assert own == norm
    assert enc.mode_counts[C.NEWMV] > 0, enc.mode_counts
    # whole-frame pans: nearly every inter block should be motion-coded
    inter_total = sum(enc.mode_counts[m] for m in
                     (C.ZEROMV, C.NEARESTMV, C.NEARMV, C.NEWMV))
    moved = (enc.mode_counts[C.NEWMV] + enc.mode_counts[C.NEARESTMV]
             + enc.mode_counts[C.NEARMV])
    assert moved > inter_total // 2, enc.mode_counts


def test_encode_rate_control(tmp_path):
    """One-pass rate control: 30 noisy frames at a byte target the
    starting QP badly misses; the controller must converge the stream
    to within 35% of target AND stay spec-valid."""
    ivf = tmp_path / "rc.ivf"
    frames = _make_frames(176, 144, 30, noise=24)
    kbps, fps = 220, 30.0
    enc = _encode_ivf(ivf, frames, base_qindex=40, gop=10,
                      target_bitrate_kbps=kbps, fps=fps)
    assert _own_md5(ivf) == _normative_md5(tmp_path, ivf)
    payload = sum(len(p) for p, _ in IvfReaderList(ivf))
    target_total = kbps * 1000 / 8 / fps * 30
    assert 0.65 * target_total < payload < 1.35 * target_total, \
        (payload, target_total, enc._rc_q)


def IvfReaderList(path):
    from cuda_vp9_tpu.containers import IvfReader
    with IvfReader(str(path)) as r:
        return [(d, pts) for d, pts in r]


def test_encode_inter_static_skips(tmp_path):
    """Static content through gop-coding: inter frames should be nearly
    all skip blocks — tiny packets and a large all-intra ratio."""
    ivf_p = tmp_path / "p.ivf"
    ivf_i = tmp_path / "i.ivf"
    frames = _make_frames(176, 144, 1) * 6
    _encode_ivf(ivf_p, frames, base_qindex=60, gop=6)
    _encode_ivf(ivf_i, frames, base_qindex=60, gop=1)
    assert _own_md5(ivf_p) == _normative_md5(tmp_path, ivf_p)
    szp = ivf_p.stat().st_size
    szi = ivf_i.stat().st_size
    assert szp * 3 < szi, f"gop stream {szp} B not <1/3 of all-intra {szi} B"


def test_encode_lossless_exact(tmp_path):
    """Lossless must reproduce the source planes bit-exactly — even on
    pure noise (the exact forward WHT inverts the normative inverse)."""
    rng = np.random.default_rng(9)
    w, h = 176, 144
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    ivf = tmp_path / "ll.ivf"
    _encode_ivf(ivf, [[y, u, v]], lossless=True, block_size=C.BLOCK_8X8,
                mode_search=False)
    raw = tmp_path / "ll.yuv"
    norm = _normative_md5(tmp_path, ivf, raw_out=raw)
    assert _own_md5(ivf) == norm
    data = raw.read_bytes()
    yd = np.frombuffer(data[:w * h], np.uint8).reshape(h, w)
    ud = np.frombuffer(data[w * h:w * h + (w // 2) * (h // 2)],
                       np.uint8).reshape(h // 2, w // 2)
    assert np.array_equal(yd, y)
    assert np.array_equal(ud, u)


def test_encode_10bit_roundtrip(tmp_path):
    ivf = tmp_path / "p2.ivf"
    frames = _make_frames(176, 144, 2, bd=10)
    _encode_ivf(ivf, frames, base_qindex=60, bit_depth=10)
    assert _own_md5(ivf) == _normative_md5(tmp_path, ivf)


def test_encode_psnr_floor(tmp_path):
    """Reconstruction quality: q=60 on a smooth source clears 35 dB."""
    w, h = 176, 144
    frames = _make_frames(w, h, 1, noise=4)
    ivf = tmp_path / "q.ivf"
    _encode_ivf(ivf, frames, base_qindex=60)
    raw = tmp_path / "q.yuv"
    _normative_md5(tmp_path, ivf, raw_out=raw)
    yd = np.frombuffer(raw.read_bytes()[:w * h], np.uint8).reshape(h, w)
    d = yd.astype(np.float64) - frames[0][0].astype(np.float64)
    psnr = 10 * np.log10(255.0 ** 2 / (d * d).mean())
    assert psnr > 35.0, psnr


def test_mode_search_beats_dc(tmp_path):
    """Directional content: mode search must cost fewer bits than DC-only."""
    w, h = 176, 144
    yy, xx = np.mgrid[0:h, 0:w]
    y = (128 + 90 * np.sign(np.sin(xx / 6.0))).clip(0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 100, np.uint8)
    v = np.full((h // 2, w // 2), 160, np.uint8)
    sizes = {}
    for ms in (True, False):
        ivf = tmp_path / f"ms{int(ms)}.ivf"
        _encode_ivf(ivf, [[y, u, v]], base_qindex=80, mode_search=ms)
        sizes[ms] = ivf.stat().st_size
        assert _own_md5(ivf) == _normative_md5(tmp_path, ivf)
    assert sizes[True] < sizes[False]


def test_vpxenc_cli_y4m(tmp_path):
    """vpxenc CLI: y4m in, IVF out, decodable by the public vpxdec API."""
    from cuda_vp9_tpu.tools import vpxenc
    w, h = 112, 80
    y4m = tmp_path / "in.y4m"
    frames = _make_frames(w, h, 2)
    with open(y4m, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F30:1 Ip A1:1 C420jpeg\n".encode())
        for fr in frames:
            f.write(b"FRAME\n")
            for p in fr:
                f.write(p.tobytes())
    out = tmp_path / "out.ivf"
    rc = vpxenc.main([str(y4m), "-o", str(out), "--qindex", "70"])
    assert rc == 0
    assert _own_md5(out) == _normative_md5(tmp_path, out)


def test_y4m_reader_variants(tmp_path):
    p = tmp_path / "v.y4m"
    w, h = 32, 24
    with open(p, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420mpeg2\n".encode())
        f.write(b"FRAME\n")
        f.write(bytes(w * h) + bytes((w // 2) * (h // 2)) * 2)
    r = Y4mReader(str(p))
    assert (r.width, r.height, r.fps) == (w, h, (25, 1))
    fr = r.read_frame()
    assert fr[0].shape == (h, w) and fr[1].shape == (h // 2, w // 2)
    assert r.read_frame() is None
    # raw fallback via open_raw_video
    raw = tmp_path / "v.yuv"
    raw.write_bytes(bytes(w * h + 2 * (w // 2) * (h // 2)))
    rr = open_raw_video(str(raw), w, h)
    assert rr.read_frame()[0].shape == (h, w)


def test_inter_zeromv_scaled_roundtrip(tmp_path):
    """Synthetic ZEROMV/skip inter frames at non-reference sizes: the
    decoded frames are the scaled MC predictions and must match the
    normative decoder bit-exactly (scaled-reference path,
    vp9/common/vp9_scale.c)."""
    from cuda_vp9_tpu.encoder.interframe import write_inter_zeromv_frame
    w, h = 176, 144
    frames = _make_frames(w, h, 1)
    enc = Vp9Encoder(w, h, base_qindex=60)
    ivf = tmp_path / "sc.ivf"
    with open(ivf, "wb") as f:
        wtr = IvfWriter(f, b"VP90", w, h)
        wtr.write_frame(enc.encode_frame(frames[0]), 0)
        # same size, down 2x, fractional, up 2x, resize-with-refresh
        for i, (sw, sh, rf) in enumerate([(176, 144, 0), (88, 72, 0),
                                          (130, 110, 0), (352, 288, 0),
                                          (88, 72, 0xFF), (176, 144, 0)]):
            wtr.write_frame(write_inter_zeromv_frame(sw, sh,
                                                     refresh_flags=rf),
                            i + 1)
        wtr.close()
    own = _own_md5(ivf)
    norm = _normative_md5(tmp_path, ivf)
    assert len(own) == 7
    assert own == norm


def test_bool_encoder_roundtrip():
    import random
    rng = random.Random(7)
    for _ in range(50):
        seq = [(rng.randrange(2), rng.randrange(1, 256))
               for _ in range(rng.randrange(1, 300))]
        enc = BoolEncoder()
        for bit, p in seq:
            enc.write(bit, p)
        dec = BoolDecoder(enc.stop())
        assert not dec.marker_bad
        assert [dec.read(p) for _, p in seq] == [b for b, _ in seq]


def test_bit_writer_roundtrip():
    w = BitWriter()
    w.f(0x2, 2)
    w.f(12345, 16)
    w.sf(-13, 6)
    r = BitReader(w.data())
    assert r.f(2) == 0x2
    assert r.f(16) == 12345
    assert r.sf(6) == -13


def test_two_pass_scene_cut_and_budget(tmp_path):
    """vpxenc --passes=2: first-pass stats place keyframes at scene
    cuts and allocate per-frame bits within the budget
    (vp9_firstpass.c analog)."""
    from cuda_vp9_tpu.decoder.headers import parse_uncompressed_header
    from cuda_vp9_tpu.tools import vpxenc as vpxenc_mod

    w, h, n = 176, 144, 12
    yy, xx = np.mgrid[0:h, 0:w]
    raw = tmp_path / "in.yuv"
    with open(raw, "wb") as f:
        for t in range(n):
            if t < 6:
                y = ((128 + 60 * np.sin((xx + 2 * t) / 15.0))
                     ).clip(0, 255).astype(np.uint8)
            else:   # hard cut at t=6
                y = ((100 + 80 * np.cos((yy + 3 * (t - 6)) / 9.0))
                     ).clip(0, 255).astype(np.uint8)
            u = np.full(((h + 1) // 2, (w + 1) // 2), 120, np.uint8)
            v = np.full(((h + 1) // 2, (w + 1) // 2), 135, np.uint8)
            f.write(y.tobytes() + u.tobytes() + v.tobytes())
    out = tmp_path / "o2.ivf"
    rc = vpxenc_mod.main([str(raw), "-o", str(out), "--width", str(w),
                          "--height", str(h), "--passes", "2",
                          "--target-bitrate", "150", "--fps", "30"])
    assert rc == 0
    pkts = [p for p, _ in IvfReaderList(str(out))]
    keys = [parse_uncompressed_header(
        p, ref_sizes=lambda i: (w, h)).frame_type == 0 for p in pkts]
    assert keys[0] and keys[6], keys       # scene cut detected
    assert sum(keys) <= 3
    total = sum(len(p) for p in pkts)
    budget = 150_000 / 8 * n / 30
    assert total <= 1.6 * budget, (total, budget)
    # spec-valid: own decoder == normative decoder
    own = _own_md5(out)
    norm = _normative_md5(tmp_path, out)
    assert own == norm and len(own) == n


def test_encode_segmentation_roundtrip(tmp_path):
    """SEG_LVL_ALT_Q segmentation (ROI): spec-valid, bit-exact in both
    decoders, quality boosted inside the ROI, and map updates / clears
    mid-stream (keyframe + inter + update_map every frame)."""
    w, h, n = 176, 144, 6
    frames = _make_frames(w, h, n, noise=10)
    enc = Vp9Encoder(w, h, base_qindex=110, gop=9999)
    seg = np.zeros((enc.mi_rows, enc.mi_cols), np.int32)
    seg[4:12, 5:15] = 1            # ROI: boost
    seg[:3, :] = 2                 # top band: relax
    ivf = tmp_path / "seg.ivf"
    roi = (slice(4 * 8, 12 * 8), slice(5 * 8, 15 * 8))
    band = (slice(0, 3 * 8), slice(0, w))
    mses = []
    with open(ivf, "wb") as f:
        wtr = IvfWriter(f, b"VP90", w, h)
        for i, fr in enumerate(frames):
            if i == 0:
                enc.set_segmentation(seg, [0, -70, 40])
            elif i == n - 2:
                enc.set_segmentation(seg, [0, -80, 60])  # update deltas
            elif i == n - 1:
                enc.set_segmentation(None, None)         # clear
            wtr.write_frame(enc.encode_frame(fr), i)
            rec = enc._last_recon[0][:h, :w].astype(np.int64)
            src = np.asarray(fr[0], np.int64)
            mses.append((float(((rec[roi] - src[roi]) ** 2).mean()),
                         float(((rec[band] - src[band]) ** 2).mean())))
    assert _own_md5(ivf) == _normative_md5(tmp_path, ivf)
    # ROI must be visibly better than the relaxed band while seg is on
    for i in range(n - 1):
        assert mses[i][0] < mses[i][1], f"frame {i}: ROI not boosted"


def test_encode_segmentation_validation():
    enc = Vp9Encoder(64, 64, base_qindex=60)
    with pytest.raises(ValueError):
        enc.set_segmentation(np.zeros((3, 3), np.int32), [0])
    with pytest.raises(ValueError):
        enc.set_segmentation(
            np.full((enc.mi_rows, enc.mi_cols), 9, np.int32), [0])
    ll = Vp9Encoder(64, 64, lossless=True)
    with pytest.raises(ValueError):
        ll.set_segmentation(
            np.zeros((ll.mi_rows, ll.mi_cols), np.int32), [0])


def test_vpxenc_aq_mode(tmp_path):
    """--aq-mode 1 produces spec-valid output with per-frame seg maps."""
    import sys as _sys
    w, h, n = 96, 80, 4
    frames = _make_frames(w, h, n, noise=14)
    yuv = tmp_path / "src.yuv"
    with open(yuv, "wb") as f:
        for fr in frames:
            for p in fr:
                f.write(np.asarray(p, np.uint8).tobytes())
    ivf = tmp_path / "aq.ivf"
    from cuda_vp9_tpu.tools import vpxenc as vpxenc_mod
    rc = vpxenc_mod.main([str(yuv), "-o", str(ivf), "--width", str(w),
                          "--height", str(h), "--aq-mode", "1",
                          "--kf-max-dist", "4", "--qindex", "100"])
    assert rc == 0
    assert _own_md5(ivf) == _normative_md5(tmp_path, ivf)

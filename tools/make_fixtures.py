#!/usr/bin/env python3
"""Generate VP9 test fixtures (IVF streams + golden per-frame MD5s).

Builds tools/oracle/oracle.c against the system libavcodec, synthesizes raw
video designed to exercise a wide range of VP9 coding tools (smooth gradients
for directional intra, translating texture for sub-pel inter MC, static areas
for skip, noise for dense coefficients), encodes it with libvpx-vp9 under
several configurations, and produces golden MD5 ground truth with the
normative native VP9 decoder.  Both the `vp9` and `libvpx-vp9` decoders are
run and must agree, guarding against oracle bugs.

The resulting small .ivf/.md5 pairs are checked into tests/fixtures/ so the
test suite is hermetic.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE_SRC = os.path.join(ROOT, "tools", "oracle", "oracle.c")
ORACLE_BIN = os.path.join(ROOT, "tools", "oracle", "oracle")
FIXDIR = os.path.join(ROOT, "tests", "fixtures")


def build_oracle():
    if (os.path.exists(ORACLE_BIN)
            and os.path.getmtime(ORACLE_BIN) > os.path.getmtime(ORACLE_SRC)):
        return
    subprocess.check_call(
        ["gcc", "-O2", "-o", ORACLE_BIN, ORACLE_SRC, "-lavcodec", "-lavutil"])


def synth_video(w: int, h: int, n: int, bitdepth: int = 8, seed: int = 7) -> bytes:
    """Synthetic I420 content with gradients, motion, edges, noise, static areas."""
    rng = np.random.default_rng(seed)
    maxval = (1 << bitdepth) - 1
    dt = np.uint16 if bitdepth > 8 else np.uint8
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # a fixed noise texture that translates over time (sub-pel-friendly content)
    tex = rng.normal(0, 1, (h * 2, w * 2)).astype(np.float32)
    # smooth big blobs
    out = bytearray()
    cw, ch = (w + 1) // 2, (h + 1) // 2
    cyy, cxx = np.mgrid[0:ch, 0:cw].astype(np.float32)
    for t in range(n):
        # moving diagonal gradient + moving sinusoid + translating texture window
        g = 0.35 * (xx + 1.7 * yy) / (w + h) + 0.2 * np.sin(
            (xx * 0.05 + t * 0.37)) * np.cos(yy * 0.043 - t * 0.21)
        dx = (t * 2.5) % w
        dy = (t * 1.25) % h
        ix = (np.arange(w) + int(dx)) % (2 * w - w)
        iy = (np.arange(h) + int(dy)) % (2 * h - h)
        window = tex[np.ix_(iy, ix)]
        y = 0.55 + 0.3 * g + 0.05 * window
        # sharp moving square (forces intra refresh / edges)
        sx = int((t * 7) % max(1, w - 24))
        sy = int((t * 5) % max(1, h - 24))
        y[sy:sy + 24, sx:sx + 24] = 0.15 + 0.02 * window[:24, :24]
        # static high-detail corner (skip blocks once coded)
        y[: h // 4, : w // 4] = 0.5 + 0.12 * tex[: h // 4, : w // 4]
        yq = np.clip(y * maxval, 0, maxval).astype(dt)
        u = 0.5 + 0.2 * np.sin(cxx * 0.07 + t * 0.11)
        v = 0.5 + 0.2 * np.cos(cyy * 0.09 - t * 0.07)
        uq = np.clip(u * maxval, 0, maxval).astype(dt)
        vq = np.clip(v * maxval, 0, maxval).astype(dt)
        for p in (yq, uq, vq):
            out += (p.astype("<u2") if bitdepth > 8 else p).tobytes()
    return bytes(out)


def synth_video2(w: int, h: int, n: int, seed: int = 19) -> bytes:
    """Second-family synthetic content (screen/production-style), built
    from different primitives than synth_video so the corpus isn't a
    single-generator monoculture: hard-edged UI glyph blocks that
    scroll (screen content: H/V intra, 4x4 splits), occluding moving
    discs over a detailed background (revealed-area intra in inter
    frames), a global luma fade (forces per-frame requantization and
    non-zero DC everywhere), and sensor-style temporal noise in one
    band (dense small coefficients, low skip rate)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    bg = rng.normal(0, 1, (h, w)).astype(np.float32)
    # "text": random hard 2x6 glyph cells on a 8x8 grid in the top band
    glyphs = (rng.random((h // 4, w)) > 0.82).astype(np.float32)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    cyy, cxx = np.mgrid[0:ch, 0:cw].astype(np.float32)
    out = bytearray()
    for t in range(n):
        fade = 0.35 + 0.3 * (t / max(1, n - 1))          # global fade
        y = fade + 0.08 * bg
        # scrolling glyph band (integer scroll: screen-content motion)
        off = (3 * t) % w
        band = np.roll(glyphs, -off, axis=1)
        y[: h // 4] = 0.15 + 0.75 * band
        # two occluding discs on cycloid paths
        for k, (rx, ry, rad) in enumerate(((0.31, 0.43, h / 7),
                                           (0.17, 0.29, h / 10))):
            cx = w * (0.5 + 0.35 * np.sin(rx * t + k))
            cy = h * (0.55 + 0.3 * np.cos(ry * t - k))
            m = (xx - cx) ** 2 + (yy - cy) ** 2 < rad ** 2
            y[m] = 0.25 + 0.5 * k
        # sensor noise strip (changes every frame: dense coefficients)
        y[-h // 6:] += 0.1 * rng.normal(0, 1, (h // 6, w))
        yq = np.clip(y * 255, 0, 255).astype(np.uint8)
        u = 0.5 + 0.25 * np.sin(cxx * 0.02 + 2.0 * np.sin(0.13 * t))
        v = 0.5 - 0.25 * np.cos(cyy * 0.025 - 0.09 * t)
        uq = np.clip(u * 255, 0, 255).astype(np.uint8)
        vq = np.clip(v * 255, 0, 255).astype(np.uint8)
        for p in (yq, uq, vq):
            out += p.tobytes()
    return bytes(out)


def run(args):
    subprocess.check_call(args)


def gen(name: str, w: int, h: int, n: int, enc_opts: list[str],
        bitdepth: int = 8, seed: int = 7, family: int = 1):
    os.makedirs(FIXDIR, exist_ok=True)
    yuv = os.path.join("/tmp", f"fix_{name}.yuv")
    with open(yuv, "wb") as f:
        if family == 2:
            f.write(synth_video2(w, h, n, seed=seed))
        else:
            f.write(synth_video(w, h, n, bitdepth=bitdepth, seed=seed))
    ivf = os.path.join(FIXDIR, f"{name}.ivf")
    md5 = os.path.join(FIXDIR, f"{name}.md5")
    md5b = os.path.join("/tmp", f"fix_{name}.libvpx.md5")
    run([ORACLE_BIN, "encode", str(w), str(h), yuv, ivf] + enc_opts)
    run([ORACLE_BIN, "decode", ivf, md5, "codec=vp9"])
    run([ORACLE_BIN, "decode", ivf, md5b, "codec=libvpx-vp9"])
    a = open(md5).read()
    b = open(md5b).read()
    assert a == b, f"oracle decoders disagree on {name}!"
    print(f"  {name}: {len(open(ivf,'rb').read())} bytes, {a.count(chr(10))} frames")
    os.unlink(yuv)


def main():
    build_oracle()
    # --- profile 0, 8-bit ---
    gen("kf01_64x64", 64, 64, 3, ["gop=1", "crf=30", "cpu_used=2"])
    gen("kf02_176x144", 176, 144, 5, ["gop=1", "crf=24", "cpu_used=1"])
    gen("kf03_odd_98x66", 98, 66, 3, ["gop=1", "crf=28", "cpu_used=2"])
    gen("in01_176x144", 176, 144, 20, ["gop=10", "crf=30", "cpu_used=1"])
    gen("in02_352x288", 352, 288, 20, ["gop=9999", "crf=34", "cpu_used=2"])
    gen("in03_odd_210x122", 210, 122, 12, ["gop=8", "crf=30", "cpu_used=2"])
    gen("tl01_640x360_t2", 640, 360, 10, ["gop=9999", "crf=36", "cpu_used=3",
                                          "tile_cols=1"])
    gen("tl02_1280x720_t4", 1280, 720, 6, ["gop=9999", "crf=40",
                                           "cpu_used=5", "tile_cols=2"])
    gen("hd01_1920x1080_t4", 1920, 1080, 4, ["gop=9999", "crf=42",
                                             "cpu_used=5", "tile_cols=2"])
    gen("ll01_176x144_lossless", 176, 144, 6, ["gop=4", "lossless=1", "crf=0",
                                               "cpu_used=2"])
    gen("br01_352x288_lowq", 352, 288, 15, ["gop=9999", "crf=50", "cpu_used=4"])
    # --- error-resilient mode: every frame codes with default contexts,
    # sign biases forced to 0 (vp9_setup_past_independence), no backward
    # adaptation ---
    gen("er01_176x144_resil", 176, 144, 12,
        ["gop=6", "crf=32", "cpu_used=1", "error_resilient=1"])
    gen("hq01_176x144_hiq", 176, 144, 10, ["gop=9999", "crf=10", "cpu_used=0"])
    # --- max-density stream: pure noise at near-min q, every block coded
    # (exercises the wide-tier escalation + bounded host fallback) ---
    gen_dense("dn01_176x144_dense", 176, 144, 4)
    # --- scaled references (mid-stream resize; no reachable encoder
    # emits these, so the repo's own synthetic inter-frame writer does:
    # every block ZEROMV/skip => the frame IS the scaled prediction) ---
    gen_scaled("sc01_352x288_scaled", 352, 288,
               [(176, 144, 0), (256, 224, 0), (330, 270, 0),
                (704, 576, 0), (176, 144, 0xFF), (330, 270, 0),
                (352, 288, 0)])
    # --- compound prediction (mixed sign bias; synthetic writer:
    # libvpx 1-pass CRF never emits alt-refs here) ---
    gen_compound("cp01_352x288_compound", 352, 288)
    # --- hidden intra-only frames + show_existing (repo's own encoder;
    # ER and non-ER reset_frame_context variants) ---
    gen_io("io01_176x144_intraonly", 176, 144)
    # --- spatial SVC superframes from the repo's own SVC encoder
    # (2 layers, inter-layer scaled prediction, non-shown base frames);
    # golden MD5s from the normative libvpx decoder ---
    gen_svc("svc01_352x288_2l", 352, 288, 8)
    # --- profile 2, 10-bit / 12-bit ---
    gen("p2_01_176x144_10b", 176, 144, 8, ["gop=4", "crf=30", "cpu_used=2",
                                           "bitdepth=10", "profile=2"],
        bitdepth=10)
    gen("p2_02_176x144_12b", 176, 144, 8, ["gop=4", "crf=28", "cpu_used=2",
                                           "bitdepth=12", "profile=2"],
        bitdepth=12)
    # --- profile 1 (4:4:4 / 4:2:2) ---
    gen_ss("p1_01_176x144_444", 176, 144, 6, 444,
           ["gop=3", "crf=30", "cpu_used=2"])
    gen_ss("p1_02_176x144_422", 176, 144, 6, 422,
           ["gop=3", "crf=30", "cpu_used=2"])
    # --- profile 3 (4:4:4 10-bit) ---
    gen_ss("p3_01_176x144_444_10b", 176, 144, 6, 444,
           ["gop=3", "crf=30", "cpu_used=2"], bitdepth=10, profile=3)
    # --- VP8 (keyframe-only; golden MD5s from the normative `vp8`
    # libavcodec decoder) ---
    gen_vp8("v8kf01_176x144", 176, 144, 4, ["gop=1", "crf=30", "cpu_used=2"])
    gen_vp8("v8kf02_320x240", 320, 240, 3, ["gop=1", "crf=30", "cpu_used=2"])
    # inter frames: NEAREST/NEAR/ZERO/NEW/SPLIT MVs, golden refreshes
    gen_vp8("v8in01_176x144", 176, 144, 12,
            ["gop=9999", "crf=30", "cpu_used=1"])
    gen_vp8("v8in02_320x240", 320, 240, 10,
            ["gop=6", "crf=24", "cpu_used=0"])
    # low-quality / high-motion: dense residuals + skip + big MVs
    gen_vp8("v8in03_176x144_lowq", 176, 144, 10,
            ["gop=9999", "crf=45", "cpu_used=2"], seed=11)
    print("fixtures written to", FIXDIR)


def gen_ss(name: str, w: int, h: int, n: int, ss: int, enc_opts: list[str],
           seed: int = 7, bitdepth: int = 8, profile: int = 1):
    """Profile-1/3 fixture at 4:2:2 (ss=422) or 4:4:4 (ss=444): luma from
    synth_video, chroma upsampled to the target subsampling."""
    import numpy as np
    os.makedirs(FIXDIR, exist_ok=True)
    dt = np.dtype("<u2") if bitdepth > 8 else np.dtype(np.uint8)
    i420 = np.frombuffer(synth_video(w, h, n, bitdepth=bitdepth, seed=seed),
                         dt)
    fsz = w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2)
    cw = w if ss == 444 else (w + 1) // 2
    ch = h if ss != 420 else (h + 1) // 2
    out = bytearray()
    for i in range(n):
        f = i420[i * fsz:(i + 1) * fsz]
        csz = ((w + 1) // 2) * ((h + 1) // 2)
        y = f[:w * h].reshape(h, w)
        u = f[w * h:w * h + csz].reshape((h + 1) // 2, (w + 1) // 2)
        v = f[w * h + csz:].reshape((h + 1) // 2, (w + 1) // 2)
        ur = np.kron(u, np.ones((2, 2), dt))[:ch, :cw]
        vr = np.kron(v, np.ones((2, 2), dt))[:ch, :cw]
        out += y.tobytes() + ur.astype(dt).tobytes() + vr.astype(dt).tobytes()
    yuv = os.path.join("/tmp", f"fix_{name}.yuv")
    with open(yuv, "wb") as fo:
        fo.write(bytes(out))
    ivf = os.path.join(FIXDIR, f"{name}.ivf")
    md5 = os.path.join(FIXDIR, f"{name}.md5")
    run([ORACLE_BIN, "encode", str(w), str(h), yuv, ivf,
         f"pixfmt={ss}", f"profile={profile}", f"bitdepth={bitdepth}"]
        + enc_opts)
    run([ORACLE_BIN, "decode", ivf, md5, "codec=vp9"])


def gen_dense(name: str, w: int, h: int, n: int, seed: int = 123):
    """Pure-noise frames at near-minimum q: maximal coefficient density,
    the worst case for the device packing capacities."""
    import numpy as np
    rng = np.random.default_rng(seed)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    out = bytearray()
    for _ in range(n):
        out += rng.integers(0, 256, h * w, dtype=np.uint8).tobytes()
        out += rng.integers(0, 256, ch * cw * 2, dtype=np.uint8).tobytes()
    yuv = os.path.join("/tmp", f"fix_{name}.yuv")
    with open(yuv, "wb") as f:
        f.write(bytes(out))
    ivf = os.path.join(FIXDIR, f"{name}.ivf")
    md5 = os.path.join(FIXDIR, f"{name}.md5")
    run([ORACLE_BIN, "encode", str(w), str(h), yuv, ivf,
         "gop=2", "crf=6", "cpu_used=4"])
    run([ORACLE_BIN, "decode", ivf, md5, "codec=vp9"])
    os.unlink(yuv)


def gen_scaled(name: str, w: int, h: int, frames: list, seed: int = 7):
    """Scaled-reference fixture: keyframe from the repo's own encoder,
    then ZEROMV/skip inter frames at the given (w, h, refresh_flags)
    sizes — each decodes to the scaled MC prediction of its reference
    (vp9/common/vp9_scale.c path).  Golden MD5s from the normative
    libavcodec vp9 decoder."""
    import numpy as np
    sys.path.insert(0, os.path.join(ROOT))
    from cuda_vp9_tpu.containers.ivf import IvfWriter
    from cuda_vp9_tpu.encoder import Vp9Encoder
    from cuda_vp9_tpu.encoder.interframe import write_inter_zeromv_frame
    os.makedirs(FIXDIR, exist_ok=True)
    raw = np.frombuffer(synth_video(w, h, 1, seed=seed), np.uint8)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    y = raw[:w * h].reshape(h, w)
    u = raw[w * h:w * h + cw * ch].reshape(ch, cw)
    v = raw[w * h + cw * ch:].reshape(ch, cw)
    enc = Vp9Encoder(w, h, base_qindex=50)
    ivf = os.path.join(FIXDIR, f"{name}.ivf")
    md5 = os.path.join(FIXDIR, f"{name}.md5")
    with open(ivf, "wb") as f:
        wtr = IvfWriter(f, b"VP90", w, h)
        wtr.write_frame(enc.encode_frame([y, u, v]), 0)
        for i, (sw, sh, refresh) in enumerate(frames):
            wtr.write_frame(
                write_inter_zeromv_frame(sw, sh, refresh_flags=refresh),
                i + 1)
        wtr.close()
    run([ORACLE_BIN, "decode", ivf, md5, "codec=vp9"])
    print(f"  {name}: {len(open(ivf,'rb').read())} bytes, "
          f"{open(md5).read().count(chr(10))} frames")


def gen_compound(name: str, w: int, h: int, seed: int = 11):
    """Compound-prediction (sign-bias) fixture via the synthetic writer:
    no reachable encoder emits compound refs, so flip the ALTREF sign
    bias and write COMPOUND ZEROMV frames.  Distinct same-size
    references come from different scaling chains of the keyframe
    (direct 2x-down vs fractional-then-down), so the compound average is
    non-trivial.  Covers: pure unscaled compound, and compound whose
    fixed ref is scaled.  Golden MD5s from the normative libavcodec
    decoder."""
    import numpy as np
    sys.path.insert(0, os.path.join(ROOT))
    from cuda_vp9_tpu.containers.ivf import IvfWriter
    from cuda_vp9_tpu.encoder import Vp9Encoder
    from cuda_vp9_tpu.encoder.interframe import write_inter_zeromv_frame
    os.makedirs(FIXDIR, exist_ok=True)
    raw = np.frombuffer(synth_video(w, h, 1, seed=seed), np.uint8)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    y = raw[:w * h].reshape(h, w)
    u = raw[w * h:w * h + cw * ch].reshape(ch, cw)
    v = raw[w * h + cw * ch:].reshape(ch, cw)
    hw, hh = w // 2, h // 2
    fw, fh = (w * 2) // 3, (h * 2) // 3     # fractional intermediate
    enc = Vp9Encoder(w, h, base_qindex=50)
    ivf = os.path.join(FIXDIR, f"{name}.ivf")
    md5 = os.path.join(FIXDIR, f"{name}.md5")
    with open(ivf, "wb") as f:
        wtr = IvfWriter(f, b"VP90", w, h)
        pts = 0
        wtr.write_frame(enc.encode_frame([y, u, v]), pts)  # all slots = A
        for payload in (
            # slot1 = direct downscale of A
            write_inter_zeromv_frame(hw, hh, ref_slot=0,
                                     refresh_flags=1 << 1),
            # slot2 = fractional then down (differs from slot1)
            write_inter_zeromv_frame(fw, fh, ref_slot=0,
                                     refresh_flags=1 << 2),
            write_inter_zeromv_frame(hw, hh, ref_slot=2,
                                     refresh_flags=1 << 2),
            # size-breaker before each compound frame: compound frames
            # are non-error-resilient, and a same-size predecessor
            # would arm use_prev_frame_mvs (which the writer's contexts
            # do not model)
            write_inter_zeromv_frame(fw, fh, ref_slot=2),
            # UNSCALED compound: var=slot1, fixed=slot2 (both hw x hh)
            write_inter_zeromv_frame(hw, hh, compound_slots=(1, 2)),
            write_inter_zeromv_frame(fw, fh, ref_slot=2),
            # compound with a SCALED fixed ref: var=slot1, fixed=slot0
            write_inter_zeromv_frame(hw, hh, compound_slots=(1, 0)),
        ):
            pts += 1
            wtr.write_frame(payload, pts)
        wtr.close()
    run([ORACLE_BIN, "decode", ivf, md5, "codec=vp9"])
    print(f"  {name}: {len(open(ivf,'rb').read())} bytes, "
          f"{open(md5).read().count(chr(10))} frames")


def gen_io(name: str, w: int, h: int, seed: int = 7):
    """Intra-only-frame fixture: hidden intra-only frames displayed via
    show_existing_frame packets (no reachable encoder emits intra-only
    frames, so the repo's own encoder writes them).  Covers the
    error-resilient variant AND a non-ER variant with
    reset_frame_context=2 / frame_context_idx=1 — the frame must then
    decode with SAVED context 0, exercising the
    vp9_setup_past_independence reset semantics
    (vp9_entropymode.c:440-469).  Golden MD5s from the normative
    libavcodec decoder."""
    import numpy as np
    sys.path.insert(0, os.path.join(ROOT))
    from cuda_vp9_tpu.containers.ivf import IvfWriter
    from cuda_vp9_tpu.encoder import Vp9Encoder
    os.makedirs(FIXDIR, exist_ok=True)
    n = 6
    raw = np.frombuffer(synth_video(w, h, n, seed=seed), np.uint8)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    fsz = w * h + 2 * cw * ch

    def planes(i):
        f = raw[i * fsz:(i + 1) * fsz]
        return [f[:w * h].reshape(h, w),
                f[w * h:w * h + cw * ch].reshape(ch, cw),
                f[w * h + cw * ch:].reshape(ch, cw)]

    enc = Vp9Encoder(w, h, base_qindex=70, gop=9999)
    ivf = os.path.join(FIXDIR, f"{name}.ivf")
    md5 = os.path.join(FIXDIR, f"{name}.md5")
    with open(ivf, "wb") as f:
        wtr = IvfWriter(f, b"VP90", w, h)
        pts = 0
        for payload in (
            enc.encode_frame(planes(0)),               # keyframe
            enc.encode_frame(planes(1)),               # inter
            # hidden ER intra-only refreshing all slots, then shown
            enc.encode_intra_only_frame(planes(2)),
            enc.write_show_existing(0),
            enc.encode_frame(planes(3)),               # inter from io recon
            # non-ER intra-only: reset ctx 1 to defaults, decode with
            # saved ctx 0 (forced by setup_past_independence)
            enc.encode_intra_only_frame(planes(4), refresh_flags=0x01,
                                        error_resilient=False,
                                        reset_frame_context=2,
                                        frame_context_idx=1),
            enc.write_show_existing(0),
            enc.encode_frame(planes(5)),               # inter
        ):
            wtr.write_frame(payload, pts)
            pts += 1
        wtr.close()
    run([ORACLE_BIN, "decode", ivf, md5, "codec=vp9"])
    md5b = os.path.join("/tmp", f"fix_{name}.libvpx.md5")
    run([ORACLE_BIN, "decode", ivf, md5b, "codec=libvpx-vp9"])
    assert open(md5).read() == open(md5b).read(), \
        f"oracle decoders disagree on {name}!"
    print(f"  {name}: {os.path.getsize(ivf)} bytes, "
          f"{open(md5).read().count(chr(10))} shown frames")


def gen_svc(name: str, w: int, h: int, n: int, seed: int = 7):
    """Spatial-SVC fixture from the repo's own SVC encoder: superframes
    of 2 layers, base layer non-shown, the top layer predicting
    inter-layer from the scaled base reconstruction.  Golden MD5s from
    the normative libavcodec decoder (which sees only shown frames)."""
    import numpy as np
    sys.path.insert(0, os.path.join(ROOT))
    from cuda_vp9_tpu.containers.ivf import IvfWriter
    from cuda_vp9_tpu.encoder.svc import Vp9SvcEncoder
    os.makedirs(FIXDIR, exist_ok=True)
    raw = np.frombuffer(synth_video(w, h, n, seed=seed), np.uint8)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    fsz = w * h + 2 * cw * ch
    enc = Vp9SvcEncoder(w, h, n_layers=2, base_qindex=90, gop=4)
    ivf = os.path.join(FIXDIR, f"{name}.ivf")
    md5 = os.path.join(FIXDIR, f"{name}.md5")
    with open(ivf, "wb") as f:
        wr = IvfWriter(f, b"VP90", w, h, 30, 1)
        for i in range(n):
            off = i * fsz
            y = raw[off:off + w * h].reshape(h, w)
            u = raw[off + w * h:off + w * h + cw * ch].reshape(ch, cw)
            v = raw[off + w * h + cw * ch:off + fsz].reshape(ch, cw)
            wr.write_frame(enc.encode_frame([y, u, v]), i)
        wr.close()
    run([ORACLE_BIN, "decode", ivf, md5, "codec=vp9"])
    sz = os.path.getsize(ivf)
    print(f"  {name}: {sz} bytes, {n} superframes x 2 layers")


def gen_vp8(name: str, w: int, h: int, n: int, enc_opts: list[str],
            seed: int = 7):
    os.makedirs(FIXDIR, exist_ok=True)
    yuv = os.path.join("/tmp", f"fix_{name}.yuv")
    with open(yuv, "wb") as f:
        f.write(synth_video(w, h, n, seed=seed))
    ivf = os.path.join(FIXDIR, f"{name}.ivf")
    md5 = os.path.join(FIXDIR, f"{name}.md5")
    run([ORACLE_BIN, "encode", str(w), str(h), yuv, ivf, "codec=libvpx"]
        + enc_opts)
    run([ORACLE_BIN, "decode", ivf, md5, "codec=vp8"])



def gen_extmv(name: str, w: int, h: int, seed: int = 7):
    """Extreme border MVs: keyframe, then NEWMV/skip frames whose edge
    blocks point far outside the frame — every prediction pixel comes
    from the reference's border clamp (the reference's GPU path leaned
    on X_Fuel for this; the TPU build clamps in-kernel).  Golden MD5s
    from the normative libavcodec decoder."""
    import numpy as np
    sys.path.insert(0, os.path.join(ROOT))
    from cuda_vp9_tpu.containers.ivf import IvfWriter
    from cuda_vp9_tpu.encoder import Vp9Encoder
    from cuda_vp9_tpu.encoder.interframe import write_inter_zeromv_frame
    os.makedirs(FIXDIR, exist_ok=True)
    raw = np.frombuffer(synth_video(w, h, 1, seed=seed), np.uint8)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    y = raw[:w * h].reshape(h, w)
    u = raw[w * h:w * h + cw * ch].reshape(ch, cw)
    v = raw[w * h + cw * ch:].reshape(ch, cw)
    enc = Vp9Encoder(w, h, base_qindex=60)
    mr8 = (h + 7) // 8

    def corners(mag):
        def mv_fn(mi_row, mi_col):
            r = -mag if mi_row < mr8 // 2 else mag
            c = -mag if mi_col < ((w + 7) // 8) // 2 else mag
            return (r, c)
        return mv_fn

    def diag(step):
        def mv_fn(mi_row, mi_col):
            return (((mi_row * step) & ~1) - 800,
                    ((mi_col * step) & ~1) - 800)
        return mv_fn

    ivf = os.path.join(FIXDIR, f"{name}.ivf")
    md5 = os.path.join(FIXDIR, f"{name}.md5")
    with open(ivf, "wb") as f:
        wtr = IvfWriter(f, b"VP90", w, h)
        wtr.write_frame(enc.encode_frame([y, u, v]), 0)
        # far outside every border; then sub-pel diagonal sweep; then a
        # moderate mix that lands partially inside
        for i, mv_fn in enumerate((corners(1600), diag(52),
                                   corners(118))):
            wtr.write_frame(
                write_inter_zeromv_frame(w, h, mv_fn=mv_fn), i + 1)
        wtr.close()
    run([ORACLE_BIN, "decode", ivf, md5, "codec=vp9"])
    print(f"  {name}: {os.path.getsize(ivf)} bytes")


def gen_superframe(name: str, w: int, h: int, seed: int = 7):
    """>2-frame superframes: each packet is [hidden inter (refresh 1),
    hidden inter (refresh 2), shown inter referencing the hidden ones]
    — exceeds the 2-frame superframes the SVC fixtures exercise
    (vp9_parse_superframe_index handles up to 8)."""
    import numpy as np
    sys.path.insert(0, os.path.join(ROOT))
    from cuda_vp9_tpu.containers.ivf import IvfWriter
    from cuda_vp9_tpu.encoder import Vp9Encoder
    from cuda_vp9_tpu.encoder.interframe import write_inter_zeromv_frame
    from cuda_vp9_tpu.encoder.svc import pack_superframe
    os.makedirs(FIXDIR, exist_ok=True)
    raw = np.frombuffer(synth_video(w, h, 1, seed=seed), np.uint8)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    y = raw[:w * h].reshape(h, w)
    u = raw[w * h:w * h + cw * ch].reshape(ch, cw)
    v = raw[w * h + cw * ch:].reshape(ch, cw)
    enc = Vp9Encoder(w, h, base_qindex=60)
    ivf = os.path.join(FIXDIR, f"{name}.ivf")
    md5 = os.path.join(FIXDIR, f"{name}.md5")
    hw, hh = (w // 2) & ~1, (h // 2) & ~1
    with open(ivf, "wb") as f:
        wtr = IvfWriter(f, b"VP90", w, h)
        wtr.write_frame(enc.encode_frame([y, u, v]), 0)
        for i in range(3):
            # hidden downscaled + hidden re-upscaled + shown mix
            sf = pack_superframe([
                write_inter_zeromv_frame(hw, hh, ref_slot=0,
                                         refresh_flags=1 << 1,
                                         show_frame=0),
                write_inter_zeromv_frame(w, h, ref_slot=1,
                                         refresh_flags=1 << 2,
                                         show_frame=0),
                write_inter_zeromv_frame(w, h, ref_slot=2),
            ])
            wtr.write_frame(sf, i + 1)
        wtr.close()
    run([ORACLE_BIN, "decode", ivf, md5, "codec=vp9"])
    print(f"  {name}: {os.path.getsize(ivf)} bytes, 3-frame superframes")


def gen_resize_chain(name: str, w: int, h: int, seed: int = 7):
    """Per-frame dynamic resize chain: EVERY inter frame changes size
    (libvpx/test/resize_test.cc analog), each refreshing slot 0 so the
    next frame scales from the previous one."""
    import numpy as np
    sys.path.insert(0, os.path.join(ROOT))
    from cuda_vp9_tpu.containers.ivf import IvfWriter
    from cuda_vp9_tpu.encoder import Vp9Encoder
    from cuda_vp9_tpu.encoder.interframe import write_inter_zeromv_frame
    os.makedirs(FIXDIR, exist_ok=True)
    raw = np.frombuffer(synth_video(w, h, 1, seed=seed), np.uint8)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    y = raw[:w * h].reshape(h, w)
    u = raw[w * h:w * h + cw * ch].reshape(ch, cw)
    v = raw[w * h + cw * ch:].reshape(ch, cw)
    enc = Vp9Encoder(w, h, base_qindex=60)
    sizes = []
    sw, sh = w, h
    rng = np.random.default_rng(seed)
    for i in range(10):
        # alternate shrink/grow within the 2x-down/16x-up legal range
        if i % 2 == 0:
            sw, sh = max(66, int(sw * 0.6)), max(50, int(sh * 0.6))
        else:
            sw, sh = min(w * 2, int(sw * 1.7)), min(h * 2, int(sh * 1.7))
        sizes.append((sw | 1 if i == 4 else sw, sh))  # one odd width
    ivf = os.path.join(FIXDIR, f"{name}.ivf")
    md5 = os.path.join(FIXDIR, f"{name}.md5")
    with open(ivf, "wb") as f:
        wtr = IvfWriter(f, b"VP90", w, h)
        wtr.write_frame(enc.encode_frame([y, u, v]), 0)
        for i, (sw, sh) in enumerate(sizes):
            wtr.write_frame(
                write_inter_zeromv_frame(sw, sh, refresh_flags=1), i + 1)
        wtr.close()
    run([ORACLE_BIN, "decode", ivf, md5, "codec=vp9"])
    print(f"  {name}: {os.path.getsize(ivf)} bytes, resize every frame")


def main_round4():
    """Round-4 corpus expansion (libvpx/test/test_vectors.cc breadth:
    VERDICT r3 item 5)."""
    build_oracle()
    # adaptation-on stream decoded with frame-parallel mode OFF is
    # already covered; this is the frame_parallel=1 bitstream flag
    gen("fp01_176x144_fpar", 176, 144, 12,
        ["gop=6", "crf=32", "cpu_used=1", "frame_parallel=1"])
    # real alt-ref / hidden frames from libvpx (lag + auto-alt-ref)
    gen("ar02_352x288_lag", 352, 288, 16,
        ["gop=8", "crf=34", "cpu_used=2", "lag=8", "auto_alt_ref=1"])
    # tile rows x cols
    gen("tr01_640x360_r2c2", 640, 360, 6,
        ["gop=9999", "crf=38", "cpu_used=4", "tile_cols=1", "tile_rows=1"])
    gen("tr02_1280x720_r4", 1280, 720, 4,
        ["gop=9999", "crf=40", "cpu_used=5", "tile_cols=2", "tile_rows=2"])
    # minimum / tiny frame sizes
    gen("mn01_16x16", 16, 16, 6, ["gop=3", "crf=30", "cpu_used=2"])
    gen("mn02_32x24", 32, 24, 6, ["gop=3", "crf=30", "cpu_used=2"])
    gen("mn03_odd_18x10", 18, 10, 6, ["gop=3", "crf=30", "cpu_used=2"])
    # extreme MVs at frame borders (synthetic NEWMV writer)
    gen_extmv("mv01_176x144_extmv", 176, 144)
    gen_extmv("mv02_odd_98x66_extmv", 98, 66)
    # >2-frame superframes (hidden + shown mix)
    gen_superframe("sf01_176x144_super3", 176, 144)
    # 3-layer spatial SVC: 3-frame superframes from the SVC encoder
    gen_svc3("svc02_352x288_3l", 352, 288, 6)
    # per-frame resize chain
    gen_resize_chain("rs01_352x288_resize", 352, 288)
    # breadth: more geometries / modes
    gen("in04_640x480", 640, 480, 10, ["gop=5", "crf=34", "cpu_used=3"])
    gen("in05_864x480_odd_862", 862, 480, 8,
        ["gop=9999", "crf=38", "cpu_used=4"])
    gen("kf04_320x180", 320, 180, 4, ["gop=1", "crf=26", "cpu_used=2"])
    gen("br02_352x288_vbr", 352, 288, 12,
        ["gop=6", "bitrate=250000", "cpu_used=2"])
    gen("aq03_352x288_cyclic", 352, 288, 10,
        ["gop=9999", "crf=36", "cpu_used=3", "aq_mode=3"])
    gen("er02_176x144_fpar_resil", 176, 144, 10,
        ["gop=5", "crf=32", "cpu_used=1", "error_resilient=1",
         "frame_parallel=1"])
    gen("p2_03_352x288_10b", 352, 288, 6,
        ["gop=3", "crf=32", "cpu_used=3", "bitdepth=10", "profile=2"],
        bitdepth=10)
    gen_ss("p1_03_320x240_444", 320, 240, 5, 444,
           ["gop=3", "crf=32", "cpu_used=3"])
    # VP8 breadth
    gen_vp8("v8in04_640x480", 640, 480, 8,
            ["gop=5", "crf=30", "cpu_used=1"])
    gen_vp8("v8kf03_odd_98x66", 98, 66, 3, ["gop=1", "crf=28",
                                            "cpu_used=2"])
    main_round4b()
    print("round-4 fixtures written to", FIXDIR)


def main_round4b():
    """Second round-4 batch: remaining test_vectors.cc-style breadth
    (sharp/smooth interp filters via cpu-used extremes, 12-bit inter,
    long-gop low-delay, tiny tiles, static scenes, more VP8)."""
    build_oracle()
    gen("in06_176x144_static", 176, 144, 15,
        ["gop=9999", "crf=30", "cpu_used=1", "fps=10"], seed=3)
    gen("in07_352x288_himotion", 352, 288, 12,
        ["gop=9999", "crf=40", "cpu_used=0"], seed=21)
    gen("br03_176x144_vlowbr", 176, 144, 15,
        ["gop=9999", "bitrate=30000", "cpu_used=2"])
    gen("p2_04_176x144_12b_inter", 176, 144, 10,
        ["gop=9999", "crf=30", "cpu_used=2", "bitdepth=12", "profile=2"],
        bitdepth=12)
    gen("ll02_96x64_lossless_inter", 96, 64, 8,
        ["gop=9999", "lossless=1", "crf=0", "cpu_used=2"])
    gen("tl03_640x360_t4", 640, 360, 6,
        ["gop=9999", "crf=38", "cpu_used=4", "tile_cols=2"])
    gen_ss("p1_04_176x144_422_long", 176, 144, 10, 422,
           ["gop=9999", "crf=32", "cpu_used=2"])
    gen_vp8("v8in05_352x288_static", 352, 288, 10,
            ["gop=9999", "crf=28", "cpu_used=1"], seed=3)
    gen_vp8("v8br01_176x144_vbr", 176, 144, 10,
            ["gop=6", "bitrate=80000", "cpu_used=1"])
    print("round-4b fixtures written to", FIXDIR)


def gen_svc3(name: str, w: int, h: int, n: int, seed: int = 7):
    """3-layer spatial SVC: every superframe carries 3 frames."""
    import numpy as np
    sys.path.insert(0, os.path.join(ROOT))
    from cuda_vp9_tpu.containers.ivf import IvfWriter
    from cuda_vp9_tpu.encoder.svc import Vp9SvcEncoder
    os.makedirs(FIXDIR, exist_ok=True)
    raw = np.frombuffer(synth_video(w, h, n, seed=seed), np.uint8)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    fsz = w * h + 2 * cw * ch
    enc = Vp9SvcEncoder(w, h, n_layers=3, base_qindex=90, gop=3)
    ivf = os.path.join(FIXDIR, f"{name}.ivf")
    md5 = os.path.join(FIXDIR, f"{name}.md5")
    with open(ivf, "wb") as f:
        wr = IvfWriter(f, b"VP90", w, h, 30, 1)
        for i in range(n):
            off = i * fsz
            y = raw[off:off + w * h].reshape(h, w)
            u = raw[off + w * h:off + w * h + cw * ch].reshape(ch, cw)
            v = raw[off + w * h + cw * ch:off + fsz].reshape(ch, cw)
            wr.write_frame(enc.encode_frame([y, u, v]), i)
        wr.close()
    run([ORACLE_BIN, "decode", ivf, md5, "codec=vp9"])
    print(f"  {name}: {os.path.getsize(ivf)} bytes, {n} superframes x 3")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "round4":
        sys.exit(main_round4())
    if len(sys.argv) > 1 and sys.argv[1] == "round4b":
        sys.exit(main_round4b())
    sys.exit(main())

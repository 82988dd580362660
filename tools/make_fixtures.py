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


def run(args):
    subprocess.check_call(args)


def gen(name: str, w: int, h: int, n: int, enc_opts: list[str],
        bitdepth: int = 8, seed: int = 7):
    os.makedirs(FIXDIR, exist_ok=True)
    yuv = os.path.join("/tmp", f"fix_{name}.yuv")
    with open(yuv, "wb") as f:
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


if __name__ == "__main__":
    sys.exit(main())

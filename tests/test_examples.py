"""End-to-end drives of the examples/ suite (libvpx examples parity:
simple_decoder.c, simple_encoder.c, vp9_lossless_encoder.c,
decode_with_drops.c, vpx_temporal_svc_encoder.c)."""

import hashlib
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from cuda_vp9_tpu.containers import IvfReader
from cuda_vp9_tpu.decoder.frame import NativeVp9Decoder

from conftest import FIXTURES, ORACLE_BIN, build_oracle_or_skip

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"


def _run(script, *args):
    # Examples inherit the suite's CPU-backend policy (conftest.py):
    # without this a down axon tunnel hangs jax device init inside the
    # subprocess until the 900 s timeout.
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, str(EXAMPLES / script),
                        *map(str, args)], capture_output=True, text=True,
                       timeout=900, env=env)
    assert r.returncode == 0, f"{script}: {r.stderr[-2000:]}"
    return r.stderr


def _make_yuv(tmp_path, w, h, n, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    path = tmp_path / "src.yuv"
    frames = []
    with open(path, "wb") as f:
        for t in range(n):
            y = ((128 + 60 * np.sin((xx + 2 * t) / 15.0)
                  + 40 * np.cos(yy / 9.0))).clip(0, 255).astype(np.uint8)
            u = np.full(((h + 1) // 2, (w + 1) // 2), 120, np.uint8)
            v = np.full(((h + 1) // 2, (w + 1) // 2), 135, np.uint8)
            f.write(y.tobytes() + u.tobytes() + v.tobytes())
            frames.append((y, u, v))
    return path, frames


def test_simple_decoder_matches_golden(tmp_path):
    ivf = FIXTURES / "in01_176x144.ivf"
    out = tmp_path / "out.yuv"
    _run("simple_decoder.py", ivf, out)
    golden = [line.split()[0] for line in
              (FIXTURES / "in01_176x144.md5").read_text().splitlines()]
    data = out.read_bytes()
    fsz = 176 * 144 + 2 * 88 * 72
    assert len(data) == fsz * len(golden)
    for i in range(len(golden)):
        assert hashlib.md5(data[i * fsz:(i + 1) * fsz]).hexdigest() \
            == golden[i], f"frame {i}"


def test_simple_encoder_roundtrip(tmp_path):
    w, h, n = 96, 80, 4
    yuv, _ = _make_yuv(tmp_path, w, h, n)
    ivf = tmp_path / "enc.ivf"
    _run("simple_encoder.py", w, h, yuv, ivf, 40)
    build_oracle_or_skip()
    md5 = tmp_path / "n.md5"
    r = subprocess.run([ORACLE_BIN, "decode", str(ivf), str(md5)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert len(md5.read_text().splitlines()) == n


def test_lossless_encoder_is_lossless(tmp_path):
    w, h, n = 64, 48, 2
    yuv, frames = _make_yuv(tmp_path, w, h, n)
    ivf = tmp_path / "ll.ivf"
    _run("vp9_lossless_encoder.py", w, h, yuv, ivf)
    dec = NativeVp9Decoder()
    got = []
    with IvfReader(str(ivf)) as r:
        for pkt, _ in r:
            dec.decode(pkt)
            got.extend(dec.frames())
    assert len(got) == n
    for t, fr in enumerate(got):
        pl = fr.visible_planes()
        for a, b in zip(pl, frames[t]):
            assert np.array_equal(np.asarray(a, np.uint8), b), \
                f"frame {t} not lossless"


def test_temporal_svc_and_drops(tmp_path):
    """TL1 frames refresh nothing: dropping every odd packet must
    decode cleanly and reproduce the SAME pixels for TL0 frames."""
    w, h, n = 96, 80, 8
    yuv, _ = _make_yuv(tmp_path, w, h, n)
    ivf = tmp_path / "tsvc.ivf"
    _run("vpx_temporal_svc_encoder.py", w, h, yuv, ivf)
    with IvfReader(str(ivf)) as r:
        pkts = [d for d, _ in r]
    assert len(pkts) == n

    def decode(packets):
        dec = NativeVp9Decoder()
        out = []
        for p in packets:
            dec.decode(p)
            for fr in dec.frames():
                m = hashlib.md5()
                for x in fr.visible_planes():
                    m.update(np.ascontiguousarray(x)
                             .astype(np.uint8).tobytes())
                out.append(m.hexdigest())
        return out

    full = decode(pkts)
    base_only = decode(pkts[0::2])     # drop all TL1 packets
    assert len(full) == n and len(base_only) == n // 2
    assert base_only == full[0::2], "TL0 frames changed when TL1 dropped"
    # the normative decoder agrees on the full stream
    build_oracle_or_skip()
    md5 = tmp_path / "n.md5"
    r = subprocess.run([ORACLE_BIN, "decode", str(ivf), str(md5)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    norm = [line.split()[0] for line in md5.read_text().splitlines()]
    assert full == norm


def test_decode_with_drops_cli(tmp_path):
    ivf = FIXTURES / "kf02_176x144.ivf"   # all-keyframe: drops are safe
    out = tmp_path / "out.yuv"
    _run("decode_with_drops.py", ivf, out, "2-3")
    fsz = 176 * 144 + 2 * 88 * 72
    assert len(out.read_bytes()) == 3 * fsz   # 5 frames - 2 dropped


def test_twopass_encoder(tmp_path):
    """Two-pass example: spec-valid output at roughly the asked rate."""
    w, h, n = 96, 80, 10
    yuv, _ = _make_yuv(tmp_path, w, h, n)
    ivf = tmp_path / "tp.ivf"
    err = _run("twopass_encoder.py", w, h, yuv, ivf, 200)
    assert "first pass" in err and "second pass" in err
    build_oracle_or_skip()
    md5 = tmp_path / "n.md5"
    r = subprocess.run([ORACLE_BIN, "decode", str(ivf), str(md5)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert len(md5.read_text().splitlines()) == n


def test_vp9cx_set_ref(tmp_path):
    """set_ref example verifies encoder/decoder sync itself; the output
    stream must also decode with the normative oracle (the overwritten
    reference changes pixels but not spec validity)."""
    w, h, n = 96, 80, 6
    yuv, _ = _make_yuv(tmp_path, w, h, n)
    ivf = tmp_path / "sr.ivf"
    err = _run("vp9cx_set_ref.py", w, h, yuv, ivf, 3)
    assert "verified" in err
    build_oracle_or_skip()
    md5 = tmp_path / "n.md5"
    r = subprocess.run([ORACLE_BIN, "decode", str(ivf), str(md5)],
                       capture_output=True, text=True)
    # the oracle decoder has no set_reference applied, so pixels after
    # the update frame differ — but the STREAM must still parse clean
    assert r.returncode == 0, r.stderr
    assert len(md5.read_text().splitlines()) == n


def test_set_maps(tmp_path):
    """ROI segmentation example: maps set, updated and cleared
    mid-stream; stream is spec-valid for the normative decoder."""
    w, h, n = 96, 80, 8
    yuv, _ = _make_yuv(tmp_path, w, h, n)
    ivf = tmp_path / "sm.ivf"
    err = _run("set_maps.py", w, h, yuv, ivf)
    assert "ROI map set" in err and "maps cleared" in err
    build_oracle_or_skip()
    md5 = tmp_path / "n.md5"
    r = subprocess.run([ORACLE_BIN, "decode", str(ivf), str(md5)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert len(md5.read_text().splitlines()) == n


def test_resize_util(tmp_path):
    w, h, n = 96, 80, 3
    yuv, frames = _make_yuv(tmp_path, w, h, n)
    out = tmp_path / "half.yuv"
    err = _run("resize_util.py", yuv, f"{w}x{h}", out, "48x40")
    assert "resized 3 frames" in err
    dsz = 48 * 40 + 2 * 24 * 20
    data = out.read_bytes()
    assert len(data) == dsz * n
    # downscale preserves the mean (gradient content, 8-tap DC gain 128)
    y0 = np.frombuffer(data, np.uint8, 48 * 40).reshape(40, 48)
    assert abs(float(y0.mean()) - float(frames[0][0].mean())) < 3.0
    # round-trip upscale must also run (1:2 in both axes)
    out2 = tmp_path / "double.yuv"
    _run("resize_util.py", out, "48x40", out2, "96x80")
    assert len(out2.read_bytes()) == (w * h + 2 * 48 * 40) * n


def test_postproc_example(tmp_path):
    ivf = FIXTURES / "v8in01_176x144.ivf"
    out = tmp_path / "pp.yuv"
    err = _run("postproc.py", ivf, out)
    assert "decoded 12 frames with postproc" in err
    fsz = 176 * 144 + 2 * 88 * 72
    assert len(out.read_bytes()) == 12 * fsz


def test_vp8_multi_resolution_encoder(tmp_path):
    """Simulcast ladder: three spec-valid VP8 streams at 1x/2x/4x down."""
    w, h, n = 128, 96, 4
    yuv, _ = _make_yuv(tmp_path, w, h, n)
    outs = [tmp_path / f"mre{i}.ivf" for i in range(3)]
    err = _run("vp8_multi_resolution_encoder.py", w, h, yuv, *outs)
    assert "4 frames x 3 resolutions" in err
    build_oracle_or_skip()
    for i, (dw, dh) in enumerate([(128, 96), (64, 48), (32, 24)]):
        md5 = tmp_path / f"mre{i}.md5"
        r = subprocess.run([ORACLE_BIN, "decode", str(outs[i]), str(md5),
                            "codec=vp8"], capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        lines = md5.read_text().splitlines()
        assert len(lines) == n and f"img-{dw}x{dh}" in lines[0]

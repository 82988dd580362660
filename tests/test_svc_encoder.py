"""VP9 spatial SVC encoder round-trip tests.

Spec-validity bar: our own decoder AND the normative libvpx decoder
produce identical shown frames from the SVC superframes (reference:
examples/vp9_spatial_svc_encoder.c; inter-layer scaled prediction
vp9_scale.c).
"""

import hashlib
import subprocess

import numpy as np
import pytest

from cuda_vp9_tpu.containers.ivf import IvfWriter
from cuda_vp9_tpu.decoder.bitreader import parse_superframe_index
from cuda_vp9_tpu.decoder.frame import NativeVp9Decoder
from cuda_vp9_tpu.encoder.svc import Vp9SvcEncoder, downsample2x

from conftest import ORACLE_BIN, build_oracle_or_skip


def _frames(w, h, n, seed=4):
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        y = ((128 + 64 * np.sin((xx + 2 * t) / 19.0)
              + 40 * np.cos((yy + t) / 13.0))).clip(0, 255).astype(np.uint8)
        u = ((128 + 40 * np.sin(xx[::2, ::2] / 23.0))
             ).clip(0, 255).astype(np.uint8)
        v = ((128 + 40 * np.cos(yy[::2, ::2] / 29.0))
             ).clip(0, 255).astype(np.uint8)
        out.append([y, u, v])
    return out


def _own_shown_md5(payloads):
    dec = NativeVp9Decoder()
    out = []
    for p in payloads:
        dec.decode(p)
        for fr in dec.frames():
            m = hashlib.md5()
            for x in fr.visible_planes():
                m.update(np.ascontiguousarray(x).astype(np.uint8)
                         .tobytes())
            out.append(m.hexdigest())
    return out


def _norm_md5(tmp_path, payloads, w, h):
    build_oracle_or_skip()
    ivf = tmp_path / "svc.ivf"
    with open(ivf, "wb") as f:
        wr = IvfWriter(f, b"VP90", w, h, 30, 1)
        for i, p in enumerate(payloads):
            wr.write_frame(p, i)
        wr.close()
    md5 = tmp_path / "svc.md5"
    r = subprocess.run([ORACLE_BIN, "decode", str(ivf), str(md5)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return [line.split()[0] for line in md5.read_text().splitlines()]


@pytest.mark.parametrize("layers,w,h,gop", [(2, 352, 288, 4),
                                            (3, 352, 288, 3)])
def test_svc_roundtrip(tmp_path, layers, w, h, gop):
    enc = Vp9SvcEncoder(w, h, n_layers=layers, base_qindex=100, gop=gop)
    frames = _frames(w, h, 2 * gop)
    payloads = [enc.encode_frame(f) for f in frames]
    # every payload is a superframe of `layers` sub-frames
    for p in payloads:
        assert len(parse_superframe_index(p)) == layers
    own = _own_shown_md5(payloads)
    assert len(own) == len(frames)      # only the top layer is shown
    norm = _norm_md5(tmp_path, payloads, w, h)
    assert own == norm


def test_svc_top_layer_quality(tmp_path):
    """Inter-layer prediction must carry detail: top-layer PSNR beats
    a naive upsample of the base layer."""
    w, h = 352, 288
    enc = Vp9SvcEncoder(w, h, n_layers=2, base_qindex=80, gop=4)
    frames = _frames(w, h, 4)
    payloads = [enc.encode_frame(f) for f in frames]
    dec = NativeVp9Decoder()
    got = []
    for p in payloads:
        dec.decode(p)
        got.extend(dec.frames())
    y_src = frames[-1][0].astype(np.float64)
    y_dec = np.asarray(got[-1].visible_planes()[0], np.float64)
    mse = np.mean((y_src - y_dec) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    # base layer alone, upsampled, sits around ~28 dB on this content
    assert psnr >= 32, psnr


def test_downsample2x_shapes():
    y = np.arange(37 * 51, dtype=np.uint8).reshape(37, 51)
    d = downsample2x([y])[0]
    assert d.shape == (19, 26)


def test_svc_cli(tmp_path):
    from cuda_vp9_tpu.tools import vp9_spatial_svc_encoder as cli
    w, h, n = 96, 80, 3
    raw = tmp_path / "in.yuv"
    with open(raw, "wb") as f:
        for (y, u, v) in _frames(w, h, n):
            f.write(y.tobytes() + u.tobytes() + v.tobytes())
    out = tmp_path / "svc.ivf"
    rc = cli.main([str(raw), "-o", str(out), "--width", str(w),
                   "--height", str(h), "--layers", "2", "--gop", "2"])
    assert rc == 0
    from cuda_vp9_tpu.containers import IvfReader
    with IvfReader(str(out)) as r:
        pkts = [d for d, _ in r]
    assert len(pkts) == n
    assert _own_shown_md5(pkts)  # decodes cleanly, top layer shown

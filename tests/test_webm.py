"""WebM demux: EBML parse + SimpleBlock iteration (webmdec.cc parity)."""

import hashlib

from cuda_vp9_tpu.containers import IvfReader
from cuda_vp9_tpu.containers.webm import WebmReader
from cuda_vp9_tpu.decoder.frame import Vp9Decoder
from cuda_vp9_tpu.utils.md5 import frame_md5

from conftest import fixture_streams
from util_webm import mux_webm

FIX = {s[0]: s for s in fixture_streams()}


def test_webm_roundtrip_decode(tmp_path):
    name, ivf, md5 = FIX["kf02_176x144"]
    golden = [line.split()[0] for line in md5.read_text().splitlines()]
    with IvfReader(str(ivf)) as r:
        w, h = r.width, r.height
        frames = [d for d, _ in r]
    webm = tmp_path / "t.webm"
    webm.write_bytes(mux_webm(frames, w, h))

    rd = WebmReader(str(webm))
    assert rd.codec_id == "V_VP9"
    assert (rd.width, rd.height) == (w, h)
    dec = Vp9Decoder()
    n = 0
    for payload, _pts in rd:
        dec.decode(payload)
        for f in dec.frames():
            assert frame_md5(f.visible_planes()) == golden[n]
            n += 1
    rd.close()
    assert n == len(golden)


def test_webm_mux_roundtrip(tmp_path):
    """WebmWriter -> WebmReader round-trip: payloads, dims, codec id,
    cluster-per-keyframe structure (vpxenc --webm parity)."""
    import io
    from cuda_vp9_tpu.containers.webm import WebmReader, WebmWriter
    buf = io.BytesIO()
    w = WebmWriter(buf, "vp9", 320, 180, 25, 1)
    frames = [bytes([i]) * (40 + 7 * i) for i in range(9)]
    for i, p in enumerate(frames):
        w.write_frame(p, i, keyframe=(i % 4 == 0))
    w.close()
    buf.seek(0)
    r = WebmReader(buf)
    assert (r.codec_id, r.width, r.height) == ("V_VP9", 320, 180)
    got = list(r)
    assert [p for p, _ in got] == frames
    # 25 fps -> 40 ms per frame
    assert [t // 1_000_000 for _, t in got] == [40 * i for i in range(9)]


def test_vpxenc_webm_output(tmp_path):
    """vpxenc writing .webm decodes identically to its .ivf output."""
    import hashlib
    import numpy as np
    from cuda_vp9_tpu.containers import open_video
    from cuda_vp9_tpu.decoder.frame import NativeVp9Decoder
    from cuda_vp9_tpu.tools import vpxenc as V

    w, h, n = 96, 80, 4
    yy, xx = np.mgrid[0:h, 0:w]
    raw = tmp_path / "in.yuv"
    with open(raw, "wb") as f:
        for t in range(n):
            y = ((128 + 60 * np.sin((xx + 2 * t) / 15.0))
                 ).clip(0, 255).astype(np.uint8)
            u = np.full(((h + 1) // 2, (w + 1) // 2), 120, np.uint8)
            v = np.full(((h + 1) // 2, (w + 1) // 2), 135, np.uint8)
            f.write(y.tobytes() + u.tobytes() + v.tobytes())

    def md5s(path):
        dec = NativeVp9Decoder()
        out = []
        for p, _ in open_video(str(path)):
            dec.decode(p)
            for fr in dec.frames():
                m = hashlib.md5()
                for x in fr.visible_planes():
                    m.update(np.ascontiguousarray(x)
                             .astype(np.uint8).tobytes())
                out.append(m.hexdigest())
        return out

    outs = {}
    for ext in ("ivf", "webm"):
        out = tmp_path / f"o.{ext}"
        rc = V.main([str(raw), "-o", str(out), "--width", str(w),
                     "--height", str(h), "--qindex", "40",
                     "--kf-max-dist", "2"])
        assert rc == 0
        outs[ext] = md5s(out)
    assert outs["ivf"] == outs["webm"] and len(outs["ivf"]) == n

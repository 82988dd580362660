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

"""VP8 keyframe decode conformance: per-frame MD5 against golden files
produced by libavcodec's normative `vp8` decoder (the reference's
capability S18; RFC 6386)."""

import numpy as np
import pytest

from cuda_vp9_tpu.containers import IvfReader
from cuda_vp9_tpu.utils.md5 import frame_md5
from cuda_vp9_tpu.vp8 import Vp8Error, Vp8KeyframeDecoder

from conftest import fixture_streams

VP8_FIX = fixture_streams(codec="vp8")


@pytest.mark.parametrize("name,ivf,md5", VP8_FIX,
                         ids=[s[0] for s in VP8_FIX])
def test_vp8_md5_match(name, ivf, md5):
    want = [l.split()[0] for l in md5.read_text().splitlines()]
    dec = Vp8KeyframeDecoder()
    got = []
    with IvfReader(str(ivf)) as r:
        for data, _pts in r:
            hdr, planes = dec.decode(data)
            got.append(frame_md5(planes))
    assert got == want


def test_vp8_via_codec_api():
    """VP80 streams route through the same public codec API as VP9."""
    from cuda_vp9_tpu.codec import (CodecCtx, DecCfg, FrameIter, vp8_dx,
                                    vpx_codec_dec_init, vpx_codec_decode,
                                    vpx_codec_get_frame)
    name, ivf, md5 = VP8_FIX[0]
    want = [l.split()[0] for l in md5.read_text().splitlines()]
    ctx = CodecCtx()
    assert vpx_codec_dec_init(ctx, vp8_dx(), DecCfg()) == 0
    got = []
    with IvfReader(str(ivf)) as r:
        for data, _pts in r:
            assert vpx_codec_decode(ctx, data) == 0
            it = FrameIter()
            while (img := vpx_codec_get_frame(ctx, it)) is not None:
                got.append(frame_md5([np.asarray(img.planes[i])
                                      for i in range(3)]))
    assert got == want


def test_vp8_corrupt_raises():
    name, ivf, _ = VP8_FIX[0]
    with IvfReader(str(ivf)) as r:
        data = next(iter(r))[0]
    dec = Vp8KeyframeDecoder()
    with pytest.raises(Vp8Error):
        dec.decode(data[:8])           # truncated tag
    with pytest.raises(Vp8Error):
        bad = bytearray(data)
        bad[3] = 0                     # bad start code
        dec.decode(bytes(bad))
    with pytest.raises(Vp8Error):
        # first-partition size points past the end
        bad = bytearray(data)
        bad[2] = 0xFF
        dec.decode(bytes(bad))

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


# ------------------------------------------------- error concealment

def _psnr(a, b):
    d = a.astype(np.int64) - b.astype(np.int64)
    mse = float((d * d).mean())
    if mse == 0:
        return 99.0
    import math
    return 10.0 * math.log10(255.0 * 255.0 / mse)


def _clean_decode(ivf):
    from cuda_vp9_tpu.vp8 import Vp8Decoder
    dec = Vp8Decoder()
    out = []
    with IvfReader(str(ivf)) as r:
        for data, _pts in r:
            hdr, planes = dec.decode(data)
            out.append(planes)
    return out


@pytest.mark.parametrize("cut", [0.5, 0.85])
def test_vp8_ec_token_truncation(cut):
    """--enable-error-concealment parity (error_concealment.c): with EC
    on, a frame whose token data is truncated decodes WITHOUT raising,
    is flagged corrupt, conceals to something close to the clean frame,
    and the stream keeps decoding."""
    from cuda_vp9_tpu.vp8 import Vp8Decoder
    name, ivf, _ = [s for s in VP8_FIX if "in01" in s[0]][0]
    with IvfReader(str(ivf)) as r:
        pkts = [d for d, _ in r]
    assert len(pkts) >= 4
    clean = _clean_decode(ivf)
    k = 2                       # truncate an inter frame
    bad = pkts[k][: int(len(pkts[k]) * cut)]

    # without EC: clean error
    dec0 = Vp8Decoder()
    dec0.decode(pkts[0])
    dec0.decode(pkts[1])
    with pytest.raises((Vp8Error, ValueError, IndexError)):
        dec0.decode(bad)

    dec = Vp8Decoder(ec_enabled=True)
    dec.decode(pkts[0])
    dec.decode(pkts[1])
    assert not dec.frame_corrupt
    hdr, planes = dec.decode(bad)    # concealed, no exception
    assert dec.frame_corrupt
    assert planes[0].shape == clean[k][0].shape
    # concealment quality: interpolated motion from LAST must stay in
    # the neighborhood of the real frame (garbage would be ~9 dB)
    assert _psnr(planes[0], clean[k][0]) > 18.0
    # stream continues; un-corrupted later frames still decode
    for j in range(k + 1, len(pkts)):
        hdr, planes = dec.decode(pkts[j])
        assert planes[0].shape == clean[j][0].shape


def test_vp8_ec_mode_partition_loss():
    """First (mode/MV) partition truncation: estimate_missing_mvs path
    — MVs projected from the previous frame's MV field."""
    from cuda_vp9_tpu.vp8 import Vp8Decoder
    name, ivf, _ = [s for s in VP8_FIX if "in01" in s[0]][0]
    with IvfReader(str(ivf)) as r:
        pkts = [d for d, _ in r]
    clean = _clean_decode(ivf)
    k = 2
    # keep only the 3-byte tag + a few bytes of partition 0
    bad = pkts[k][:10]
    dec = Vp8Decoder(ec_enabled=True)
    dec.decode(pkts[0])
    dec.decode(pkts[1])
    hdr, planes = dec.decode(bad)
    assert dec.frame_corrupt
    assert planes[0].shape == clean[k][0].shape
    assert _psnr(planes[0], clean[k][0]) > 15.0
    # corrupt frame must not have refreshed golden/altref
    assert hdr.refresh_golden == 0 and hdr.refresh_alt == 0
    assert hdr.refresh_last == 1


def test_vp8_ec_via_codec_api():
    """VPX_CODEC_USE_ERROR_CONCEALMENT init flag + corrupt-flag control."""
    from cuda_vp9_tpu.codec import (
        CodecCtx, DecCfg, FrameIter, vp8_dx, vpx_codec_dec_init,
        vpx_codec_decode, vpx_codec_get_frame, vpx_codec_control,
        VP8D_GET_FRAME_CORRUPTED, VPX_CODEC_USE_ERROR_CONCEALMENT)
    name, ivf, _ = [s for s in VP8_FIX if "in01" in s[0]][0]
    with IvfReader(str(ivf)) as r:
        pkts = [d for d, _ in r]
    ctx = CodecCtx()
    assert vpx_codec_dec_init(ctx, vp8_dx(), DecCfg(),
                              VPX_CODEC_USE_ERROR_CONCEALMENT) == 0
    assert vpx_codec_decode(ctx, pkts[0]) == 0
    assert vpx_codec_decode(ctx, pkts[1]) == 0
    assert vpx_codec_control(ctx, VP8D_GET_FRAME_CORRUPTED) == 0
    bad = pkts[2][: len(pkts[2]) // 2]
    assert vpx_codec_decode(ctx, bad) == 0   # concealed, NOT an error
    assert vpx_codec_control(ctx, VP8D_GET_FRAME_CORRUPTED) == 1
    it = FrameIter()
    n = 0
    while vpx_codec_get_frame(ctx, it) is not None:
        n += 1
    assert n == 3

"""Decoder robustness: corrupt/truncated input must raise clean errors
(BitstreamError / codec error codes), never crash or hang — the analog of
the reference's invalid-file tests (libvpx test/invalid_file_test.cc)."""

import pytest

from cuda_vp9_tpu.codec import (CodecCtx, DecCfg, VPX_CODEC_OK, vp9_dx,
                                vpx_codec_dec_init, vpx_codec_decode)
from cuda_vp9_tpu.containers import IvfReader
from cuda_vp9_tpu.decoder.frame import Vp9Decoder, NativeVp9Decoder
from cuda_vp9_tpu.decoder.headers import BitstreamError

from conftest import fixture_streams

FIX = {s[0]: s for s in fixture_streams()}


def _packets(name):
    _, ivf, _ = FIX[name]
    with IvfReader(str(ivf)) as r:
        return [d for d, _ in r]


@pytest.mark.parametrize("mutate", [
    lambda d: d[:1],                       # truncated to 1 byte
    lambda d: d[: len(d) // 2],            # truncated half
    lambda d: b"\xff" + d[1:],             # corrupt frame marker
    lambda d: d[:8] + b"\x00" * (len(d) - 8),   # zeroed payload
])
def test_corrupt_first_frame_raises(mutate):
    pkts = _packets("kf02_176x144")
    for dec_cls in (Vp9Decoder, NativeVp9Decoder):
        dec = dec_cls()
        try:
            dec.decode(mutate(pkts[0]))
        except (BitstreamError, ValueError):
            pass  # clean error is the contract
        else:
            # some corruptions still parse; output (if any) must be sane
            for f in dec.frames():
                assert f.width > 0 and f.height > 0


@pytest.mark.parametrize("dec_cls", [Vp9Decoder, NativeVp9Decoder])
def test_same_instance_keyframe_resync(dec_cls):
    """need_resync parity (vp9_decoder.c:416-429): after a corrupt frame
    the SAME decoder instance refuses inter frames, then resumes bit-exact
    at the next keyframe.  in01 has keyframes at frames 0 and 10."""
    from cuda_vp9_tpu.utils.md5 import frame_md5
    name, ivf, md5 = FIX["in01_176x144"]
    golden = [line.split()[0] for line in md5.read_text().splitlines()]
    pkts = _packets(name)
    assert len(pkts) == len(golden) == 20

    dec = dec_cls()
    out = {}

    def drain(i):
        for f in dec.frames():
            out[i] = frame_md5(f.visible_planes())

    dec.decode(pkts[0])
    drain(0)
    dec.decode(pkts[1])
    drain(1)
    # corrupt frame 2: truncated payload must raise a clean error
    with pytest.raises((BitstreamError, ValueError)):
        dec.decode(pkts[2][: len(pkts[2]) // 3])
    assert dec.need_resync == 1
    # inter frames 3..9 are refused while resyncing (keyframe required)
    for i in range(3, 10):
        with pytest.raises((BitstreamError, ValueError)):
            dec.decode(pkts[i])
    # frame 10 is a keyframe: the same instance resumes, bit-exact
    for i in range(10, 20):
        dec.decode(pkts[i])
        drain(i)
    assert dec.need_resync == 0
    assert out[0] == golden[0] and out[1] == golden[1]
    for i in range(10, 20):
        assert out[i] == golden[i], f"post-resync frame {i}"


def test_codec_api_same_instance_resync():
    """The public API surface of the same contract: vpx_codec_decode
    returns VPX_CODEC_CORRUPT_FRAME while resyncing, then recovers."""
    from cuda_vp9_tpu.codec import (FrameIter, vpx_codec_get_frame,
                                    VPX_CODEC_CORRUPT_FRAME)
    name, ivf, md5 = FIX["in01_176x144"]
    pkts = _packets(name)
    ctx = CodecCtx()
    assert vpx_codec_dec_init(ctx, vp9_dx(), DecCfg()) == VPX_CODEC_OK
    assert vpx_codec_decode(ctx, pkts[0]) == VPX_CODEC_OK
    assert vpx_codec_decode(ctx, pkts[1][:9]) == VPX_CODEC_CORRUPT_FRAME
    assert vpx_codec_decode(ctx, pkts[2]) == VPX_CODEC_CORRUPT_FRAME
    assert vpx_codec_decode(ctx, pkts[10]) == VPX_CODEC_OK  # keyframe
    assert vpx_codec_decode(ctx, pkts[11]) == VPX_CODEC_OK
    it = FrameIter()
    shown = 0
    while vpx_codec_get_frame(ctx, it) is not None:
        shown += 1
    assert shown >= 3  # frames 0, 10, 11


def test_codec_api_error_code_on_garbage():
    ctx = CodecCtx()
    assert vpx_codec_dec_init(ctx, vp9_dx(), DecCfg()) == VPX_CODEC_OK
    assert vpx_codec_decode(ctx, b"\x12\x34\x56") != VPX_CODEC_OK


def test_show_existing_of_empty_slot_is_error():
    # a show_existing_frame header referencing an unpopulated slot
    # (frame marker 2, profile 0, show_existing=1, slot 0) -> 0x88 0x00
    dec = Vp9Decoder()
    with pytest.raises((BitstreamError, ValueError)):
        dec.decode(bytes([0x88, 0x00]))


@pytest.mark.parametrize("codec", ["vp9", "vp8"])
def test_bitflip_sweep_never_crashes(codec):
    """decode_corrupted.cc / invalid_file_test.cc analog: single-bit
    flips at positions across every packet of a real stream must either
    decode (possibly to different pixels) or raise a clean codec error —
    never crash, hang, or corrupt the process.  The same decoder
    instance keeps accepting input afterwards (need_resync semantics)."""
    from cuda_vp9_tpu.codec import vp8_dx, vpx_codec_get_frame, FrameIter
    name = "in01_176x144" if codec == "vp9" else None
    if codec == "vp8":
        from conftest import fixture_streams
        name = fixture_streams(codec="vp8")[2][0]   # an inter stream
        pkts_all = None
    _, ivf, _ = (FIX[name] if codec == "vp9" else
                 {s[0]: s for s in fixture_streams(codec="vp8")}[name])
    with IvfReader(str(ivf)) as r:
        pkts = [d for d, _ in r][:6]
    iface = vp9_dx() if codec == "vp9" else vp8_dx()
    rng_positions = [0, 1, 2, 5, 9]
    for pi in range(len(pkts)):
        for pos_frac in rng_positions:
            ctx = CodecCtx()
            assert vpx_codec_dec_init(ctx, iface, DecCfg()) == VPX_CODEC_OK
            for i, p in enumerate(pkts):
                if i == pi:
                    pos = min(len(p) - 1,
                              pos_frac * max(1, len(p) // 10))
                    p = p[:pos] + bytes([p[pos] ^ 0x40]) + p[pos + 1:]
                vpx_codec_decode(ctx, p)      # any status is fine
                it = FrameIter()
                while vpx_codec_get_frame(ctx, it) is not None:
                    pass
            # the instance must still accept a clean keyframe restart
            assert vpx_codec_decode(ctx, pkts[0]) in (
                VPX_CODEC_OK, 7)   # OK or CORRUPT_FRAME(7) post-damage

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


def test_corrupt_mid_stream_then_keyframe_recovers():
    pkts = _packets("in01_176x144")
    dec = NativeVp9Decoder()
    dec.decode(pkts[0])
    list(dec.frames())
    try:
        dec.decode(pkts[1][: len(pkts[1]) // 3])
    except (BitstreamError, ValueError):
        pass
    list(dec.frames())
    # a fresh decoder on the same stream still works (stateless recovery
    # at the application level, matching vpx_codec re-init semantics)
    dec2 = NativeVp9Decoder()
    dec2.decode(pkts[0])
    assert len(list(dec2.frames())) >= 0


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

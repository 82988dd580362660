"""Tile-parallel host entropy parse (DecCfg.threads -> decode_tiles_mt
parity, vp9/decoder/vp9_decodeframe.c:2919): threaded parse must be
bit-exact with the serial walk on multi-tile and single-tile streams."""

import numpy as np
import pytest

from cuda_vp9_tpu.codec import (CodecCtx, DecCfg, FrameIter, VPX_CODEC_OK,
                                vp9_dx, vpx_codec_dec_init, vpx_codec_decode,
                                vpx_codec_get_frame)
from cuda_vp9_tpu.containers import IvfReader
from cuda_vp9_tpu.decoder.frame import NativeVp9Decoder
from cuda_vp9_tpu.utils.md5 import frame_md5

from conftest import fixture_streams

FIX = {s[0]: s for s in fixture_streams()}


def _golden(name):
    return [line.split()[0]
            for line in FIX[name][2].read_text().splitlines()]


def _decode_md5s(name, threads, max_frames=4):
    dec = NativeVp9Decoder(threads=threads)
    out = []
    with IvfReader(str(FIX[name][1])) as r:
        for data, _ in r:
            dec.decode(data)
            for f in dec.frames():
                out.append(frame_md5(f.visible_planes()))
                if len(out) >= max_frames:
                    return out
    return out


@pytest.mark.parametrize("name", ["tl02_1280x720_t4", "tl01_640x360_t2"])
@pytest.mark.parametrize("threads", [2, 4])
def test_threaded_tile_parse_bit_exact(name, threads):
    golden = _golden(name)
    got = _decode_md5s(name, threads)
    assert got == golden[: len(got)]
    assert len(got) > 0


def test_threads_on_single_tile_stream():
    """threads > tile count must be a safe no-op (tile_cols == 1)."""
    got = _decode_md5s("in01_176x144", 4)
    assert got == _golden("in01_176x144")[: len(got)]


def test_codec_api_honors_threads():
    """DecCfg.threads reaches the native parser through the public API."""
    name = "tl02_1280x720_t4"
    golden = _golden(name)
    ctx = CodecCtx()
    assert vpx_codec_dec_init(ctx, vp9_dx(), DecCfg(threads=4)) \
        == VPX_CODEC_OK
    with IvfReader(str(FIX[name][1])) as r:
        data, _ = next(iter(r))
    assert vpx_codec_decode(ctx, data) == VPX_CODEC_OK
    it = FrameIter()
    img = vpx_codec_get_frame(ctx, it)
    assert img is not None
    m = __import__("hashlib").md5()
    for p in img.planes:
        m.update(np.ascontiguousarray(p).tobytes())
    assert m.hexdigest() == golden[0]

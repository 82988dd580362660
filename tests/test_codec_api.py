"""Codec API layer: vpx_codec_* call-shape parity tests
(the analog of the reference's vpx/ API contract)."""

import hashlib

import pytest

from cuda_vp9_tpu.codec import (CodecCtx, DecCfg, FrameIter, StreamInfo,
                                VP8D_GET_FRAME_CORRUPTED,
                                VP9D_GET_BIT_DEPTH, VPX_CODEC_OK,
                                vp9_dx, vpx_codec_control,
                                vpx_codec_dec_init, vpx_codec_decode,
                                vpx_codec_destroy, vpx_codec_get_frame,
                                vpx_codec_peek_stream_info)
from cuda_vp9_tpu.containers import IvfReader

from conftest import fixture_streams

FIX = {s[0]: s for s in fixture_streams()}


def _host_iface():
    base = vp9_dx()

    class _HostIface:
        name = base.name

        def make_decoder(self, cfg, use_device):
            return base.make_decoder(cfg, False)
    return _HostIface()


def test_init_decode_get_frame_md5():
    name, ivf, md5 = FIX["kf01_64x64"]
    golden = [line.split()[0] for line in md5.read_text().splitlines()]
    ctx = CodecCtx()
    assert vpx_codec_dec_init(ctx, _host_iface(), DecCfg()) == VPX_CODEC_OK
    n = 0
    with IvfReader(str(ivf)) as r:
        for data, _ in r:
            assert vpx_codec_decode(ctx, data) == VPX_CODEC_OK
            it = FrameIter()
            while (img := vpx_codec_get_frame(ctx, it)) is not None:
                m = hashlib.md5()
                for p in img.planes:
                    m.update(p.tobytes())
                assert m.hexdigest() == golden[n]
                n += 1
    assert n == len(golden)
    assert vpx_codec_control(ctx, VP9D_GET_BIT_DEPTH) == 8
    assert vpx_codec_control(ctx, VP8D_GET_FRAME_CORRUPTED) == 0
    assert vpx_codec_destroy(ctx) == VPX_CODEC_OK


def test_peek_stream_info():
    name, ivf, _ = FIX["kf02_176x144"]
    with IvfReader(str(ivf)) as r:
        data = next(iter(r))[0]
    si = StreamInfo()
    assert vpx_codec_peek_stream_info(vp9_dx(), data, si) == VPX_CODEC_OK
    assert (si.w, si.h, si.is_kf) == (176, 144, 1)


def test_decode_corrupt_reports_error():
    ctx = CodecCtx()
    vpx_codec_dec_init(ctx, _host_iface(), DecCfg())
    rc = vpx_codec_decode(ctx, b"\x00\x01\x02\x03")
    assert rc != VPX_CODEC_OK
    assert vpx_codec_control(ctx, VP8D_GET_FRAME_CORRUPTED) == 1


def test_decoder_controls():
    """vp8dx.h control-id surface: last quantizer / ref updates, frame
    header info, skip-loop-filter, byte alignment, decryptor."""
    from cuda_vp9_tpu.codec import (
        VPXD_GET_LAST_QUANTIZER, VP8D_GET_LAST_REF_UPDATES,
        VP9D_GET_FRAME_HEADER_INFO, VP9_SET_BYTE_ALIGNMENT,
        VP9_SET_SKIP_LOOP_FILTER, VPXD_SET_DECRYPTOR,
        VPX_CODEC_INVALID_PARAM)
    name, ivf, md5 = FIX["in01_176x144"]
    golden = [line.split()[0] for line in md5.read_text().splitlines()]
    ctx = CodecCtx()
    vpx_codec_dec_init(ctx, _host_iface(), DecCfg())
    # byte alignment validation (legal: 0 or pow2 in [32, 1024])
    assert vpx_codec_control(ctx, VP9_SET_BYTE_ALIGNMENT, 64) \
        == VPX_CODEC_OK
    assert vpx_codec_control(ctx, VP9_SET_BYTE_ALIGNMENT, 48) \
        == VPX_CODEC_INVALID_PARAM
    # identity "decryptor" must not change the decode
    assert vpx_codec_control(ctx, VPXD_SET_DECRYPTOR,
                             lambda state, buf: buf, None) == VPX_CODEC_OK
    n = 0
    with IvfReader(str(ivf)) as r:
        for data, _ in r:
            assert vpx_codec_decode(ctx, data) == VPX_CODEC_OK
            it = FrameIter()
            while (img := vpx_codec_get_frame(ctx, it)) is not None:
                m = hashlib.md5()
                for p in img.planes:
                    m.update(p.tobytes())
                assert m.hexdigest() == golden[n]
                n += 1
    assert n == len(golden)
    assert vpx_codec_control(ctx, VPXD_GET_LAST_QUANTIZER) > 0
    assert vpx_codec_control(ctx, VP8D_GET_LAST_REF_UPDATES) >= 0
    unc, comp = vpx_codec_control(ctx, VP9D_GET_FRAME_HEADER_INFO)
    assert unc > 0 and comp > 0
    vpx_codec_destroy(ctx)

    # VP9_SET_SKIP_LOOP_FILTER changes output on a filtered stream
    ctx2 = CodecCtx()
    vpx_codec_dec_init(ctx2, _host_iface(), DecCfg())
    assert vpx_codec_control(ctx2, VP9_SET_SKIP_LOOP_FILTER, 1) \
        == VPX_CODEC_OK
    got = []
    with IvfReader(str(ivf)) as r:
        for data, _ in r:
            vpx_codec_decode(ctx2, data)
            it = FrameIter()
            while (img := vpx_codec_get_frame(ctx2, it)) is not None:
                m = hashlib.md5()
                for p in img.planes:
                    m.update(p.tobytes())
                got.append(m.hexdigest())
    assert len(got) == len(golden) and got != golden
    vpx_codec_destroy(ctx2)


def test_external_frame_buffers():
    """vpx_codec_set_frame_buffer_functions parity: decoded frames land
    in user-provided buffers (vpx/vpx_frame_buffer.h; exercised by the
    reference's vpxdec --frame-buffers)."""
    import numpy as np
    from cuda_vp9_tpu.codec import (CodecCtx, DecCfg, FrameIter, vp9_dx,
                                    vpx_codec_dec_init, vpx_codec_decode,
                                    vpx_codec_get_frame,
                                    vpx_codec_release_frame_buffers,
                                    vpx_codec_set_frame_buffer_functions,
                                    VPX_CODEC_OK, VPX_CODEC_INVALID_PARAM)
    from cuda_vp9_tpu.containers import IvfReader
    from cuda_vp9_tpu.utils.md5 import frame_md5
    from conftest import FIXTURES

    got_calls = []
    released = []

    def cb_get(priv, min_size, fb):
        fb.data = bytearray(min_size)
        fb.size = min_size
        fb.priv = len(got_calls)
        got_calls.append(min_size)
        return 0

    def cb_release(priv, fb):
        released.append(fb.priv)
        return 0

    ivf = FIXTURES / "kf02_176x144.ivf"
    want = [l.split()[0] for l in
            (FIXTURES / "kf02_176x144.md5").read_text().splitlines()]
    ctx = CodecCtx()
    assert vpx_codec_dec_init(ctx, vp9_dx(), DecCfg()) == 0
    assert vpx_codec_set_frame_buffer_functions(
        ctx, cb_get, cb_release, None) == VPX_CODEC_OK
    assert vpx_codec_set_frame_buffer_functions(
        ctx, None, cb_release) == VPX_CODEC_INVALID_PARAM
    got = []
    with IvfReader(str(ivf)) as r:
        for data, _pts in r:
            assert vpx_codec_decode(ctx, data) == 0
            it = FrameIter()
            while (img := vpx_codec_get_frame(ctx, it)) is not None:
                assert img.fb_priv == len(got)   # user priv round-trips
                got.append(frame_md5([np.asarray(p) for p in img.planes]))
    assert got == want[:len(got)] and len(got) > 0
    assert len(got_calls) == len(got)
    vpx_codec_release_frame_buffers(ctx)
    assert sorted(released) == list(range(len(got)))


def test_get_tile_data_control():
    """VP9D_GET_TILE_DATA returns per-tile (offset, size) spans that
    tile the frame payload after the headers (tl01 has 2 tile cols)."""
    from cuda_vp9_tpu.codec import (VP9D_GET_TILE_DATA,
                                    VP9D_GET_FRAME_HEADER_INFO,
                                    VPX_CODEC_INCAPABLE)
    name, ivf, _ = FIX["tl01_640x360_t2"]
    ctx = CodecCtx()
    assert vpx_codec_dec_init(ctx, _host_iface(), DecCfg()) == VPX_CODEC_OK
    with IvfReader(str(ivf)) as r:
        for data, _ in r:
            assert vpx_codec_decode(ctx, data) == VPX_CODEC_OK
            spans = vpx_codec_control(ctx, VP9D_GET_TILE_DATA)
            assert spans is not None and spans != VPX_CODEC_INCAPABLE
            assert len(spans) == 2  # 2 tile columns x 1 row
            unc, comp = vpx_codec_control(ctx, VP9D_GET_FRAME_HEADER_INFO)
            # first tile starts right after the headers (+4-byte size
            # field for every tile but the last)
            assert spans[0][0] in (unc + comp, unc + comp + 4)
            # spans are in-bounds, ordered, non-overlapping
            end = 0
            for pos, size in spans:
                assert pos >= end and size > 0
                assert pos + size <= len(data)
                end = pos + size
            assert end == len(data)  # last tile runs to payload end
            break
    vpx_codec_destroy(ctx)

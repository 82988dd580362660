import numpy as np
import pytest

from cuda_vp9_tpu.containers import IvfReader
from cuda_vp9_tpu.decoder.bitreader import (BoolDecoder,
                                            parse_superframe_index)
from cuda_vp9_tpu.decoder.headers import parse_uncompressed_header
from cuda_vp9_tpu.decoder import constants as C

from conftest import fixture_streams


def test_bool_decoder_roundtrip_known():
    # A stream of 0x00 bytes: value stays 0 so every read(prob) yields 0.
    bd = BoolDecoder(bytes(16))
    assert all(bd.read(p) == 0 for p in (1, 128, 254, 200, 50))
    # All-ones input decodes 1 for small probs.
    bd = BoolDecoder(b"\xff" * 16)
    assert bd.read(128) == 1


def _iter_frames(path):
    with IvfReader(str(path)) as r:
        for data, _pts in r:
            for off, sz in parse_superframe_index(data):
                yield data[off:off + sz]


@pytest.mark.parametrize("name,ivf,md5", fixture_streams(),
                         ids=[s[0] for s in fixture_streams()])
def test_parse_all_fixture_headers(name, ivf, md5):
    n_md5 = len(md5.read_text().splitlines())
    with IvfReader(str(ivf)) as r:
        cw, ch = r.width, r.height
    shown = 0
    n_frames = 0
    ref_size = [(0, 0)] * 8
    for payload in _iter_frames(ivf):
        hdr = parse_uncompressed_header(
            payload, ref_sizes=lambda i: ref_size[i])
        n_frames += 1
        if hdr.show_existing_frame:
            shown += 1
            continue
        if ("scaled" in name or "compound" in name or "svc" in name
                or "resize" in name or "super" in name):
            # mid-stream-resize / layered / superframe fixtures:
            # per-frame sizes differ from the container by design (2x
            # down, fractional, 2x up; SVC base layers and hidden
            # superframe members at sub-resolutions)
            assert 0 < hdr.width <= 2 * cw and 0 < hdr.height <= 2 * ch
        else:
            assert (hdr.width, hdr.height) == (cw, ch)
        # bit depth / colorspace are sticky decoder state: only key and
        # intra-only frames re-code them (vp9_decodeframe.c:3054)
        want_profile = (3 if name.startswith("p3_") else
                        2 if name.startswith("p2_") else
                        1 if name.startswith("p1_") else 0)
        assert hdr.profile == want_profile
        # bit depth / subsampling are sticky decoder state: only key and
        # intra-only frames re-code them (vp9_decodeframe.c:3054)
        if hdr.frame_is_intra_only:
            assert hdr.bit_depth == (10 if "10b" in name else
                                     12 if "12b" in name else 8)
            if "444" in name:
                assert hdr.subsampling_x == 0 and hdr.subsampling_y == 0
            elif "422" in name:
                assert hdr.subsampling_x == 1 and hdr.subsampling_y == 0
            else:
                assert hdr.subsampling_x == 1 and hdr.subsampling_y == 1
        if "_t2" in name:
            assert hdr.log2_tile_cols == 1
        if "lossless" in name:
            assert hdr.lossless
        assert 0 < hdr.header_size_in_bytes < len(payload)
        total_hdr = hdr.uncompressed_header_size_in_bytes + \
            hdr.header_size_in_bytes
        assert total_hdr <= len(payload)
        for i in range(8):
            if hdr.refresh_frame_flags & (1 << i):
                ref_size[i] = (hdr.width, hdr.height)
        if hdr.show_frame:
            shown += 1
    assert shown == n_md5

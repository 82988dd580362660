"""Fused device-recon conformance: native parse + TpuReconFused vs golden
MD5s (the TPU fast path end-to-end, on the CPU backend in CI).

Marked slow: the fused frame step is a large XLA program; first run per
geometry compiles for minutes (then cached in .jax_cache).
"""

import pytest

from cuda_vp9_tpu.decoder.frame import native_decode_stream_md5
from cuda_vp9_tpu.runtime.pipeline import TpuReconFused

from conftest import fixture_streams

STREAMS = [s for s in fixture_streams()
           if s[0] in ("kf01_64x64", "in01_176x144", "aq01_176x144_seg")]


@pytest.mark.slow
@pytest.mark.parametrize("name,ivf,md5", STREAMS,
                         ids=[s[0] for s in STREAMS])
def test_fused_md5(name, ivf, md5):
    golden = [line.split()[0] for line in md5.read_text().splitlines()]
    recon = TpuReconFused()
    n = 0
    for i, digest in native_decode_stream_md5(str(ivf), max_frames=6,
                                              recon_fn=recon):
        assert digest == golden[i], f"{name} frame {i} MD5 mismatch"
        n += 1
    assert n > 0
    assert recon.frames_on_device > 0, "fused path never ran on device"

"""Fused device-recon conformance: native parse + TpuReconFused vs golden
MD5s (the TPU fast path end-to-end, on the CPU backend in CI).

Marked slow: the fused frame step is a large XLA program; first run per
geometry compiles for minutes (then cached in .jax_cache).
"""

import pytest

from cuda_vp9_tpu.decoder.frame import native_decode_stream_md5
from cuda_vp9_tpu.runtime.pipeline import TpuReconFused

from conftest import fixture_streams

# fast tier: the smallest geometries (first run compiles ~2 min each,
# cached in .jax_cache afterwards) -- the default gate MUST cover the
# production device path, not just the host oracle
FAST = [s for s in fixture_streams()
        if s[0] in ("kf01_64x64", "in01_176x144")]
# slow tier: the rest of the corpus through the fused path
SLOW = [s for s in fixture_streams() if s not in FAST]


def _check_fused(name, ivf, md5):
    golden = [line.split()[0] for line in md5.read_text().splitlines()]
    recon = TpuReconFused()
    n = 0
    for i, digest in native_decode_stream_md5(str(ivf), max_frames=6,
                                              recon_fn=recon):
        assert digest == golden[i], f"{name} frame {i} MD5 mismatch"
        n += 1
    assert n > 0
    # 4:2:2/4:4:4 and scaled-ref frames legitimately run on the host
    if not name.startswith("p1_"):
        assert recon.frames_on_device > 0, "fused path never ran on device"


@pytest.mark.parametrize("name,ivf,md5", FAST, ids=[s[0] for s in FAST])
def test_fused_md5(name, ivf, md5):
    _check_fused(name, ivf, md5)


@pytest.mark.slow
@pytest.mark.parametrize("name,ivf,md5", SLOW, ids=[s[0] for s in SLOW])
def test_fused_md5_full(name, ivf, md5):
    _check_fused(name, ivf, md5)

"""Fused device-recon conformance: native parse + TpuReconFused vs golden
MD5s (the TPU fast path end-to-end, on the CPU backend in CI).

Marked slow: the fused frame step is a large XLA program; first run per
geometry compiles for minutes (then cached in .jax_cache).
"""

import os

import pytest

from cuda_vp9_tpu.decoder.frame import native_decode_stream_md5
from cuda_vp9_tpu.runtime.pipeline import TpuReconFused

from conftest import fixture_streams

# fast tier: the smallest geometries (first run compiles ~2 min each,
# cached in .jax_cache afterwards) -- the default gate MUST cover the
# production device path, not just the host oracle, and every device-path
# code branch: 8-bit inter, lossless (WHT + int32 coeff split), 10-bit
# (hi/lo packed coefficients)
FAST = [s for s in fixture_streams()
        if s[0] in ("kf01_64x64", "in01_176x144",
                    "ll01_176x144_lossless", "p2_01_176x144_10b",
                    "dn01_176x144_dense", "p1_01_176x144_444",
                    "p1_02_176x144_422")]
# slow tier: the rest of the corpus through the fused path.  HD
# geometries only run on a real accelerator — the XLA:CPU compile of a
# 1080p fused step takes tens of minutes and validates nothing the TPU
# run doesn't.  (config read, not jax.default_backend(): backend init
# at collection time hangs if the device tunnel is down)
import jax

_CPU = "cpu" in str(getattr(jax.config, "jax_platforms", None) or
                    os.environ.get("JAX_PLATFORMS", ""))
SLOW = [s for s in fixture_streams() if s not in FAST
        and not (s[0].startswith(("hd", "xl")) and _CPU)]


def _check_fused(name, ivf, md5):
    golden = [line.split()[0] for line in md5.read_text().splitlines()]
    recon = TpuReconFused()
    n = 0
    for i, digest in native_decode_stream_md5(str(ivf), max_frames=6,
                                              recon_fn=recon):
        assert digest == golden[i], f"{name} frame {i} MD5 mismatch"
        n += 1
    assert n > 0
    assert recon.frames_on_device > 0, "fused path never ran on device"


@pytest.mark.parametrize("name,ivf,md5", FAST, ids=[s[0] for s in FAST])
def test_fused_md5(name, ivf, md5):
    _check_fused(name, ivf, md5)


@pytest.mark.slow
@pytest.mark.parametrize("name,ivf,md5", SLOW, ids=[s[0] for s in SLOW])
def test_fused_md5_full(name, ivf, md5):
    _check_fused(name, ivf, md5)


@pytest.mark.skipif("CUDA_VP9_TPU_SCALED_INNER" not in os.environ,
                    reason="run via the subprocess wrapper below")
def test_fused_scaled_on_device_inner():
    """Scaled-reference MC (mid-stream resize / SVC inter-layer,
    vp9_scale.c) must run ON DEVICE via the mcs tile class — zero host
    fallbacks across the whole scaled fixture."""
    entry = [s for s in fixture_streams() if "scaled" in s[0]][0]
    name, ivf, md5 = entry
    golden = [line.split()[0] for line in md5.read_text().splitlines()]
    recon = TpuReconFused()
    n = 0
    for i, digest in native_decode_stream_md5(str(ivf), recon_fn=recon):
        assert digest == golden[i], f"{name} frame {i} MD5 mismatch"
        n += 1
    assert n == len(golden)
    assert recon.frames_on_host == 0, \
        f"{recon.frames_on_host} scaled frames fell back to the host"
    assert recon.frames_on_device == n


def test_fused_scaled_on_device():
    """Subprocess wrapper for the test above.  XLA:CPU executable
    (de)serialization of the large scaled-tier program segfaults inside
    jaxlib (jax 0.9.0, compilation_cache put/get -> serialize) when the
    process already holds many compiled executables; the identical test
    is stable in a fresh process.  Isolating it keeps the device scaled
    path in the default gate without tripping the jaxlib bug."""
    import subprocess
    import sys
    env = dict(os.environ, CUDA_VP9_TPU_SCALED_INNER="1")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-x", "-q",
         f"{__file__}::test_fused_scaled_on_device_inner"],
        env=env, capture_output=True, text=True, timeout=2400)
    assert r.returncode == 0, (r.stdout[-3000:] + "\n" + r.stderr[-2000:])

"""Decode-performance regression gate (libvpx test/decode_perf_test.cc
:87-106 analog): decode fixture streams on the real device, print
per-stream fps JSON, and FAIL when throughput drops more than the
allowed margin below the checked-in floor.

Runs in the `-m tpu` tier only (needs the real device; timings on the
CPU backend are meaningless).  Floors are deliberately conservative —
the tunneled dev link's bandwidth varies ~3x run to run, so the gate
catches structural regressions (a stage falling off the device path,
an upload-size blowup, a lost overlap), not noise.  Frames are decoded
without blitting output inside the timed loop (decode_perf_test
semantics; see bench.py).
"""

import json
import os
import time

import pytest

pytestmark = pytest.mark.tpu

# (fixture, fps floor): ~1/4 of the round-4 measured rates, leaving
# headroom for tunnel-bandwidth variance
PERF_FLOORS = [
    ("tl01_640x360_t2", 12.0),
    ("in02_352x288", 20.0),
]


def _decode_fps(ivf_path):
    from cuda_vp9_tpu.containers import IvfReader
    from cuda_vp9_tpu.decoder.frame import NativeVp9Decoder
    from cuda_vp9_tpu.runtime.pipeline import TpuReconFused

    with IvfReader(ivf_path) as r:
        packets = [d for d, _ in r]

    def run():
        recon = TpuReconFused(defer_output=True)
        dec = NativeVp9Decoder(recon_fn=recon)
        n = 0
        for p in packets:
            dec.decode(p)
            n += len(list(dec.frames()))
        recon.sync()
        return n, recon

    run()                      # warmup: compiles
    t0 = time.time()
    n, recon = run()
    dt = time.time() - t0
    assert recon.frames_on_host == 0, "frames fell off the device path"
    return n / dt


@pytest.mark.parametrize("name,floor", PERF_FLOORS,
                         ids=[f[0] for f in PERF_FLOORS])
def test_decode_perf_floor(name, floor):
    fix = os.path.join(os.path.dirname(__file__), "fixtures",
                       f"{name}.ivf")
    fps = _decode_fps(fix)
    print(json.dumps({"stream": name, "framesPerSecond": round(fps, 2)}))
    assert fps >= floor, (
        f"{name}: {fps:.1f} fps is below the {floor} fps floor "
        f"(>20% structural regression, decode_perf_test.cc analog)")

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


@pytest.mark.tpu
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


# ---- deterministic gates (no device, no tunnel variance) ----------------
#
# The absolute fps floors above are weather-bound (the tunneled link's
# bandwidth swings ~3x run to run), so they are set low and only catch
# catastrophic regressions.  The gates below are exact and run in normal
# CI: upload bytes per frame (the decode's dominant cost on any link) and
# the packed-work shape.  A wire-format or packer regression fails here
# deterministically long before it would trip an fps floor.

# (fixture, max mean KB/frame after page compaction).  Calibrated
# 2026-08-20 on the round-5 wire format (see PERFORMANCE.md): measured
# means were in01 17.4, in02 32.7, tl01 33.9, hd01 192 KB/frame; caps
# allow ~35% headroom for content drift when fixtures regenerate.
UPLOAD_CAPS = [
    ("in01_176x144", 24.0),
    ("in02_352x288", 45.0),
    ("tl01_640x360_t2", 46.0),
    ("hd01_1920x1080_t4", 260.0),
]


@pytest.mark.parametrize("name,cap_kb", UPLOAD_CAPS,
                         ids=[f[0] for f in UPLOAD_CAPS])
def test_upload_bytes_per_frame(name, cap_kb):
    """Mean compacted upload bytes/frame must not regress (exact gate)."""
    import numpy as np

    from cuda_vp9_tpu.containers import IvfReader
    from cuda_vp9_tpu.native import NativeParser, native_count_pages
    from cuda_vp9_tpu.ops.ref.recon import RefBuffer, reconstruct_frame
    from cuda_vp9_tpu.runtime import pack

    fix = os.path.join(os.path.dirname(__file__), "fixtures",
                       f"{name}.ivf")
    with IvfReader(fix) as r:
        packets = [d for d, _ in r][:12]
    parser = NativeParser()
    slots = [None] * 8
    total_kb = 0.0
    nframes = 0
    for p in packets:
        plan = parser.parse(p)
        hdr = plan.hdr
        if getattr(plan, "show_existing", False):
            continue
        refs = ({1 + i: slots[hdr.ref_frame_idx[i]] for i in range(3)}
                if not hdr.frame_is_intra_only else {})
        tier = "full" if hdr.frame_is_intra_only else "tight"
        caps = pack.compute_caps(hdr.mi_rows, hdr.mi_cols, tier,
                                 bool(hdr.lossless))
        layout = pack.build_layout(caps, hdr.mi_rows, hdr.mi_cols,
                                   bool(hdr.lossless), hdr.bit_depth)
        flat = plan.native_parser.pack(plan, refs, caps, layout,
                                       ring_slot=0)
        assert flat is not None, f"{name}: tight-tier overflow"
        K = flat.size // pack.PAGE
        nz = native_count_pages(flat, K)
        total_kb += nz * pack.PAGE * 2 / 1024.0
        nframes += 1
        planes = reconstruct_frame(plan, refs)
        rb = RefBuffer(planes, hdr.width, hdr.height, hdr.bit_depth,
                       hdr.subsampling_x, hdr.subsampling_y)
        for i in range(8):
            if hdr.refresh_frame_flags & (1 << i):
                slots[i] = rb
    mean_kb = total_kb / nframes
    print(json.dumps({"stream": name, "mean_upload_kb": round(mean_kb, 1)}))
    assert mean_kb <= cap_kb, (
        f"{name}: {mean_kb:.1f} KB/frame exceeds the {cap_kb} KB gate — "
        f"the wire format or packer regressed")

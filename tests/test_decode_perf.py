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

# (fixture, max keyframe KB, max mean inter KB/frame) after page
# compaction.  Keyframes gate separately — they are 10-30x an inter
# frame (full-tier caps + dense intra), so a single mean would hide
# inter-path regressions.  Calibrated 2026-08-21 on the round-5 wire
# format v3 (4-int16 intra records, mc32 tile class; printed by this
# test); caps allow ~35% headroom for content drift when fixtures
# regenerate.
# measured: in01 (175, 40.9), in02 (526, 59.2), tl01 (950, 77.4),
# hd01 (7490, 293)
UPLOAD_CAPS = [
    ("in01_176x144", 240.0, 55.0),
    ("in02_352x288", 710.0, 80.0),
    ("tl01_640x360_t2", 1280.0, 105.0),
    ("hd01_1920x1080_t4", 10100.0, 400.0),
]


@pytest.mark.parametrize("name,key_cap_kb,inter_cap_kb", UPLOAD_CAPS,
                         ids=[f[0] for f in UPLOAD_CAPS])
def test_upload_bytes_per_frame(name, key_cap_kb, inter_cap_kb):
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
    key_kb = 0.0
    inter_kb = 0.0
    n_inter = 0
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
        kb = nz * pack.PAGE * 2 / 1024.0
        if hdr.frame_is_intra_only:
            key_kb = max(key_kb, kb)
        else:
            inter_kb += kb
            n_inter += 1
        planes = reconstruct_frame(plan, refs)
        rb = RefBuffer(planes, hdr.width, hdr.height, hdr.bit_depth,
                       hdr.subsampling_x, hdr.subsampling_y)
        for i in range(8):
            if hdr.refresh_frame_flags & (1 << i):
                slots[i] = rb
    mean_inter = inter_kb / max(1, n_inter)
    print(json.dumps({"stream": name, "key_kb": round(key_kb, 1),
                      "mean_inter_kb": round(mean_inter, 1)}))
    assert key_kb <= key_cap_kb, (
        f"{name}: keyframe {key_kb:.1f} KB exceeds the {key_cap_kb} KB "
        f"gate — the wire format or packer regressed")
    assert mean_inter <= inter_cap_kb, (
        f"{name}: {mean_inter:.1f} KB/inter-frame exceeds the "
        f"{inter_cap_kb} KB gate — the wire format or packer regressed")

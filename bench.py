#!/usr/bin/env python3
"""Decode throughput benchmark (driver entry point).

Decodes a VP9 stream end-to-end (native C++ host entropy decode + fused
single-dispatch device reconstruction) on the default JAX device and
prints one JSON line:

  {"metric": "decode_fps_WxH", "value": N, "unit": "frames/sec",
   "vs_baseline": r}

vs_baseline normalizes against the BASELINE.md north star of 2x realtime
4K60 per chip (120 fps at 3840x2176), scaled by pixel rate to the
benchmarked resolution.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BENCH_DIR = os.path.join(REPO, ".bench")
NORTH_STAR_PIXRATE = 120.0 * 3840 * 2176  # pixels/sec


def _gen_stream(w, h, frames):
    """Generate a cached benchmark stream with the oracle tool if possible."""
    os.makedirs(BENCH_DIR, exist_ok=True)
    ivf = os.path.join(BENCH_DIR, f"bench_{w}x{h}_{frames}f.ivf")
    if os.path.exists(ivf):
        return ivf
    try:
        import subprocess
        sys.path.insert(0, os.path.join(REPO, "tools"))
        import make_fixtures
        make_fixtures.build_oracle()
        yuv = os.path.join(BENCH_DIR, "bench.yuv")
        with open(yuv, "wb") as f:
            f.write(make_fixtures.synth_video(w, h, frames))
        subprocess.check_call(
            [make_fixtures.ORACLE_BIN, "encode", str(w), str(h), yuv, ivf,
             "gop=9999", "crf=34", "cpu_used=2"])
        os.unlink(yuv)
        return ivf
    except Exception:
        return None


def _device_watchdog(
        patience_s: float = float(os.environ.get("BENCH_DEVICE_PATIENCE",
                                                 "900"))) -> bool:
    """The axon TPU tunnel initializes inside jax device init with no
    timeout; when the remote pool is unreachable the whole process
    hangs.  Probe device init in a subprocess with a deadline so the
    bench either runs on the real device or reports the outage
    honestly instead of hanging the driver."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('up')"],
            capture_output=True, text=True, timeout=patience_s)
        return "up" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def bench_one(bw, bh, frames, blit):
    """Decode-throughput measurement for one stream geometry.

    Metric semantics follow the reference's decode_perf_test.cc:87-106
    (and `vpxdec --summary` without -o): frames are fully decoded on
    the device (output rows written to the HBM ring) but not blitted to
    the host inside the timed loop; the end-of-run barrier is an 8-byte
    output-ring checksum fetch that is data-dependent on every frame.
    blit=True adds the device->host output transfer of every frame to
    the timed path (on the tunneled dev link at ~35 MB/s that measures
    the link, not the decode).  Pixel correctness is covered by the MD5
    conformance suite; a post-clock frame materialization here is the
    liveness check."""
    import numpy as np

    stream = _gen_stream(bw, bh, frames)
    if stream is None:
        stream = os.path.join(REPO, "tests", "fixtures",
                              "tl01_640x360_t2.ivf")

    from cuda_vp9_tpu.containers import IvfReader
    from cuda_vp9_tpu.decoder.frame import NativeVp9Decoder
    from cuda_vp9_tpu.runtime.pipeline import TpuReconFused

    with IvfReader(stream) as r:
        w, h = r.width, r.height
        packets = [d for d, _ in r]

    def decode_all(profile=False):
        from collections import deque
        recon = TpuReconFused(defer_output=not blit)
        recon.profile = profile
        dec = NativeVp9Decoder(recon_fn=recon)
        n = 0
        last = None
        q = deque()
        for p in packets:
            dec.decode(p)
            for fr in dec.frames():
                if blit:
                    q.append(fr)
                last = fr
                n += 1
            while len(q) > 32:
                q.popleft().visible_planes()  # materialize output pixels
        if blit:
            recon.flush()
            while q:
                q.popleft().visible_planes()
        else:
            recon.sync()   # real device barrier (8-byte checksum fetch)
        return n, recon, last

    decode_all()                 # warmup: jit compiles
    t0 = time.time()
    n, recon, last = decode_all(
        profile=os.environ.get("BENCH_PROFILE") == "1")
    dt = time.time() - t0
    fps = n / dt
    if not blit and last is not None:
        # liveness: materialize the final frame (post-clock)
        assert np.asarray(last.visible_planes()[0]).size > 0
    if recon.profile:
        print(f"# {w}x{h}: frames={n} dev={recon.frames_on_device} "
              f"host={recon.frames_on_host} total={dt:.2f}s "
              f"h2d={recon._t_h2d:.2f}s step={recon._t_step:.2f}s",
              file=sys.stderr)
    if os.environ.get("BENCH_TIMERS") == "1":
        # async wall timers (no forced syncs): where host-side time went
        tw = {k: round(v, 3) for k, v in recon._tw.items()}
        print(f"# {w}x{h}: frames={n} dev={recon.frames_on_device} "
              f"host={recon.frames_on_host} total={dt:.2f}s tw={tw}",
              file=sys.stderr)
    return w, h, fps


def main():
    if os.environ.get("PALLAS_AXON_POOL_IPS") and not _device_watchdog():
        # tunnel down: re-exec without the axon sitecustomize hook (it
        # already registered at interpreter start) so the run still
        # terminates on the CPU backend; the metric name marks the
        # outage
        print("# axon tunnel unreachable: benching on the CPU backend",
              file=sys.stderr)
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["_BENCH_TUNNEL_DOWN"] = "1"
        os.execve(sys.executable,
                  [sys.executable, os.path.abspath(__file__)], env)

    # BENCH_SIZES: comma-separated geometries, benched in order; each
    # prints its own JSON line and the LAST is the primary driver
    # metric.  1080p first records BASELINE.md's actual metric
    # (frames/sec/chip at 1080p); BENCH_SIZE=WxH narrows to one.
    sizes = os.environ.get("BENCH_SIZE") \
        or os.environ.get("BENCH_SIZES", "1920x1080,640x360")
    frames = int(os.environ.get("BENCH_FRAMES", "150"))
    blit = os.environ.get("BENCH_BLIT") == "1"
    suffix = "_TUNNEL_DOWN_cpu" if os.environ.get("_BENCH_TUNNEL_DOWN") \
        else ""
    for size in sizes.split(","):
        bw, bh = (int(v) for v in size.split("x"))
        # HD+ geometries: fewer frames (per-frame cost is ~9x SD; the
        # steady-state rate converges well before 150 frames)
        nf = min(frames, 60) if bw * bh >= 1.9e6 else frames
        try:
            w, h, fps = bench_one(bw, bh, nf, blit)
        except Exception as e:  # one geometry failing must not kill the
            print(f"# bench {size} failed: {e!r}", file=sys.stderr)
            continue            # primary metric
        target = NORTH_STAR_PIXRATE / (w * h)
        print(json.dumps({
            "metric": f"decode_fps_{w}x{h}{suffix}",
            "value": round(fps, 3),
            "unit": "frames/sec",
            "vs_baseline": round(fps / target, 5),
        }), flush=True)


if __name__ == "__main__":
    main()

"""Aggregate-throughput comparison for N same-geometry streams
(BASELINE config 5): BatchedFusedDecoder (ONE vmapped dispatch/round)
vs MultiStreamDecoder (round-robin async) vs N sequential decodes.

Usage: python tools/profiling/multistream_bench.py [N] [WxH] [frames]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SIZE = sys.argv[2] if len(sys.argv) > 2 else "640x360"
FRAMES = int(sys.argv[3]) if len(sys.argv) > 3 else 50
W, H = (int(v) for v in SIZE.split("x"))

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, os.path.join(REPO, "tools"))
import make_fixtures  # noqa: E402
import numpy as np  # noqa: E402

from cuda_vp9_tpu.containers import IvfReader  # noqa: E402
from cuda_vp9_tpu.decoder.frame import NativeVp9Decoder  # noqa: E402
from cuda_vp9_tpu.runtime.pipeline import TpuReconFused  # noqa: E402
from cuda_vp9_tpu.runtime.multistream import (  # noqa: E402
    BatchedFusedDecoder, MultiStreamDecoder)


def _stream(seed):
    os.makedirs("/tmp/msb", exist_ok=True)
    ivf = f"/tmp/msb/s{W}x{H}_{FRAMES}_{seed}.ivf"
    if not os.path.exists(ivf):
        make_fixtures.build_oracle()
        yuv = "/tmp/msb/in.yuv"
        with open(yuv, "wb") as f:
            f.write(make_fixtures.synth_video(W, H, FRAMES, seed=seed))
        import subprocess
        subprocess.check_call(
            [make_fixtures.ORACLE_BIN, "encode", str(W), str(H), yuv, ivf,
             "gop=9999", "crf=34", "cpu_used=2"])
    with IvfReader(ivf) as r:
        return [d for d, _ in r]


streams = [_stream(s) for s in range(N)]
nf = min(len(p) for p in streams)
print(f"{N} streams {W}x{H}, {nf} packets each", flush=True)


NOBLIT = os.environ.get("NOBLIT", "1") == "1"   # decode_perf semantics


def run_batched():
    dec = BatchedFusedDecoder(N, defer_output=NOBLIT)
    for i in range(nf):
        dec.decode_round([p[i] for p in streams])
    if os.environ.get("MSB_TIMERS"):
        tw = {k: (round(v, 2) if isinstance(v, float) else v)
              for k, v in dec._tw.items()}
        print("batched tw:", tw, flush=True)
    n = 0
    for _s, fr in dec.drain():
        if not NOBLIT:
            fr.visible_planes()
        n += 1
    if NOBLIT:
        dec.sync()
    return n


def run_roundrobin():
    msd = MultiStreamDecoder(N)
    n = 0
    for i in range(nf):
        for s in range(N):
            msd.put(s, streams[s][i])
        for _s, fr in msd.ready():
            fr.visible_planes()
            n += 1
    for _s, fr in msd.flush():
        fr.visible_planes()
        n += 1
    return n


def run_sequential():
    n = 0
    for s in range(N):
        recon = TpuReconFused(defer_output=NOBLIT)
        dec = NativeVp9Decoder(recon_fn=recon)
        q = []
        for p in streams[s]:
            dec.decode(p)
            q.extend(dec.frames())
        if NOBLIT:
            n += len(q)
            recon.sync()
        else:
            for fr in q:
                fr.visible_planes()
                n += 1
    return n


for name, fn in [("batched", run_batched), ("roundrobin", run_roundrobin),
                 ("sequential", run_sequential)]:
    if os.environ.get("ONLY") and os.environ["ONLY"] != name:
        continue
    fn()  # warmup (compiles)
    t0 = time.time()
    n = fn()
    dt = time.time() - t0
    print(f"{name}: {n} frames in {dt:.2f}s = {n / dt:.1f} fps aggregate",
          flush=True)

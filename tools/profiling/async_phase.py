"""Async-mode phase breakdown: where does host wall time go per frame?

Times dec.decode (parse+pack+enqueue) and output consumption separately,
and prints the recon's non-blocking wall counters (stack/dispatch/fetch/
wait/pack).  Run on the real TPU:   python tools/profiling/async_phase.py
fixtures/foo.ivf
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))
from collections import deque
from cuda_vp9_tpu.containers import IvfReader
from cuda_vp9_tpu.decoder.frame import NativeVp9Decoder
from cuda_vp9_tpu.runtime.pipeline import TpuReconFused

ivf = sys.argv[1]
with IvfReader(ivf) as r:
    packets = [d for d, _ in r]


def run():
    recon = TpuReconFused()
    dec = NativeVp9Decoder(recon_fn=recon)
    q = deque()
    n = 0
    t_dec = 0.0
    t_out = 0.0
    t0 = time.time()
    for p in packets:
        t1 = time.time()
        dec.decode(p)
        q.extend(dec.frames())
        t_dec += time.time() - t1
        while len(q) > 32:
            t1 = time.time()
            q.popleft().visible_planes()
            t_out += time.time() - t1
            n += 1
    while q:
        t1 = time.time()
        q.popleft().visible_planes()
        t_out += time.time() - t1
        n += 1
    return n, time.time() - t0, t_dec, t_out, recon


run()  # warmup/compile
n, dt, t_dec, t_out, recon = run()
print(f"{n} frames {dt:.2f}s = {n/dt:.2f} fps")
print(f"  decode(parse+pack+enqueue)={t_dec:.2f}s  consume={t_out:.2f}s  "
      f"other={dt-t_dec-t_out:.2f}s")
tw = recon._tw
print(f"  recon wall: pack={tw['pack']:.2f} stack(h2d)={tw['stack']:.2f} "
      f"dispatch={tw['dispatch']:.2f} fetch={tw['fetch']:.2f} "
      f"wait(d2h)={tw['wait']:.2f}")
print(f"  parse-only ~= decode - pack - stack - dispatch - fetch = "
      f"{t_dec - tw['pack'] - tw['stack'] - tw['dispatch'] - tw['fetch']:.2f}s")
print(f"  dev={recon.frames_on_device} host={recon.frames_on_host}")
print(f"  h2d_bytes={recon._tw['h2d_bytes']/1e6:.1f} MB "
      f"({recon._tw['h2d_bytes']/1e6/n:.2f} MB/frame)")

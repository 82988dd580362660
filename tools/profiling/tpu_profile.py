import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
from collections import deque
import numpy as np
from cuda_vp9_tpu.containers import IvfReader
from cuda_vp9_tpu.decoder.frame import NativeVp9Decoder
from cuda_vp9_tpu.runtime.pipeline import TpuReconFused

ivf = sys.argv[1]
with IvfReader(ivf) as r:
    packets = [d for d, _ in r]

def run(profile):
    recon = TpuReconFused()
    recon.profile = profile
    dec = NativeVp9Decoder(recon_fn=recon)
    q = deque()
    n = 0
    t0 = time.time()
    for p in packets:
        dec.decode(p)
        q.extend(dec.frames())
        while len(q) > 32:
            q.popleft().visible_planes()
            n += 1
    while q:
        q.popleft().visible_planes()
        n += 1
    return n, time.time()-t0, recon

n, dt, _ = run(False)   # warmup/compile
print(f"warmup: {n} frames {dt:.1f}s", flush=True)
n, dt, _ = run(False)
print(f"async timed: {n} frames {dt:.2f}s = {n/dt:.2f} fps", flush=True)
n, dt, recon = run(True)
print(f"timed: {n} frames {dt:.2f}s = {n/dt:.2f} fps")
print(f"  h2d={recon._t_h2d:.2f} step={recon._t_step:.2f} d2h={recon._t_d2h:.2f} other={dt-recon._t_h2d-recon._t_step-recon._t_d2h:.2f}")
print(f"  dev={recon.frames_on_device} host={recon.frames_on_host}")

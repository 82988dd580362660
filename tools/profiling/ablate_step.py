"""Ablate fused-step phases by zeroing misc trip counts (same compiled
program; fori trip counts are traced)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import numpy as np
from cuda_vp9_tpu.containers import IvfReader
from cuda_vp9_tpu.native import NativeParser
from cuda_vp9_tpu.runtime.pipeline import TpuReconFused
from cuda_vp9_tpu.ops.ref.recon import RefBuffer
import cuda_vp9_tpu.runtime.pack as pack
import jax.numpy as jnp

ivf = sys.argv[1]
TARGET = int(sys.argv[2]) if len(sys.argv) > 2 else 8
with IvfReader(ivf) as r:
    packets = [d for d, _ in r]
recon = TpuReconFused()
parser = NativeParser()
slots = [None] * 8
flat0 = None
for fi, p in enumerate(packets[:TARGET + 1]):
    plan = parser.parse(p)
    hdr = plan.hdr
    refs = {1+i: slots[hdr.ref_frame_idx[i]] for i in range(3)} if not hdr.frame_is_intra_only else {}
    if fi == TARGET:
        tier = "full" if hdr.frame_is_intra_only else "tight"
        planes = recon(plan, refs)
        recon.flush()
        step, caps, layout = recon.fused.get_frame_step(hdr.mi_rows, hdr.mi_cols, tier, bool(hdr.lossless))
        flat0 = pack.pack_frame(plan, refs, caps, layout)
        print("target frame", fi, "lf", hdr.lf.filter_level, flush=True)
        break
    planes = recon(plan, refs)
    rb = RefBuffer(planes, hdr.width, hdr.height, hdr.bit_depth, hdr.subsampling_x, hdr.subsampling_y)
    for i in range(8):
        if hdr.refresh_frame_flags & (1 << i):
            slots[i] = rb
recon.flush()
pool = recon._pool
ring = recon._ring

def run(tag, mods):
    global pool, ring
    flat = flat0.copy()
    misc = layout.view(flat, "misc")
    misc[5:13] = 0  # no pool refresh (keeps the loop re-runnable)
    for k, v in mods.items():
        misc[k] = v
    fd = jnp.asarray(flat); fd.block_until_ready()
    ts = []
    for _ in range(6):
        t0 = time.time()
        pool, ring = step(pool, ring, recon.kernels, fd)
        _ = np.asarray(ring[0, 0])
        ts.append(time.time()-t0)
    print(f"{tag}: min {1e3*min(ts):.1f} ms", flush=True)

print("misc:", list(layout.view(flat0, "misc")))
# residual trips: 16-22 dense buckets, 26-29 sparse, 30/31 coo, 32 tx1m
NORES = {k: 0 for k in [*range(16, 23), *range(26, 33)]}
run("full", {})
run("no-lf", {4: 0})
run("no-intra", {3: 0})
run("no-mc", {0: 0, 1: 0, 2: 0})
run("no-resid", dict(NORES))
run("nothing", {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, **NORES})

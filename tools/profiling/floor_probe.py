"""Isolate the fused step's fixed-cost floor at a given geometry:
 1. no-op donated jit on pool/ring shapes  -> dispatch+sync floor
 2. residual passes only                   -> capacity-proportional tx cost
 3. mask+refresh+ring write only           -> elementwise frame cost
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))
import numpy as np
import jax
import jax.numpy as jnp
from cuda_vp9_tpu.runtime import fused, pack
from cuda_vp9_tpu import models as M

mi_rows, mi_cols = (int(sys.argv[1]), int(sys.argv[2])) \
    if len(sys.argv) > 2 else (45, 80)
I32 = jnp.int32
ha = ((mi_rows + 7) & ~7) * 8
wa = ((mi_cols + 7) & ~7) * 8
caps = pack.compute_caps(mi_rows, mi_cols, "tight", False)
layout = pack.build_layout(caps, mi_rows, mi_cols, False)
K = (layout.size + pack.PAGE - 1) // pack.PAGE
nout = ha * wa + 2 * ((ha >> 1) * (wa >> 1))
pool = jnp.zeros((8, 3, ha, wa), I32)
ring = jnp.zeros((32, nout), jnp.uint8)
kernels = jnp.asarray(M.FILTER_KERNELS.astype(np.int32))
flat = jnp.zeros((K * pack.PAGE,), jnp.int16)
flat.block_until_ready()


def timeit(tag, fn, *args, donate=()):
    global pool, ring
    f = jax.jit(fn, donate_argnums=donate)
    out = f(*args)           # compile
    jax.block_until_ready(out)
    ts = []
    for _ in range(8):
        t0 = time.time()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"{tag}: min {1e3*min(ts):.2f} ms", flush=True)
    return out


# 1. dispatch floor
timeit("noop (pool+1)", lambda p: p + 1, pool)
timeit("noop tiny", lambda x: x + 1, jnp.zeros((8, 128), I32))

# 2. residuals only
def resid_only(flat):
    def seg(name, dtype=I32):
        off, shape = layout.segs[name]
        n = int(np.prod(shape))
        a = jax.lax.slice(flat, (off,), (off + n,)).reshape(shape)
        return a.astype(dtype)
    R = jnp.zeros((3, ha, wa), I32)
    for name, tx, ncoef in pack.COEFF_BUCKETS:
        cm = seg(f"coeff_{name}")
        pos = seg(f"cpos_{name}")
        n2 = (4 << tx) * (4 << tx)
        if ncoef < n2:
            scan = jnp.asarray(np.stack(
                [np.asarray(M.SCAN_ORDERS[tx][t].scan[:ncoef], np.int32)
                 for t in range(4)]))
            idx = scan[pos[:, 3]]
            full = jnp.zeros((cm.shape[0], n2), I32)
            cap_i = jnp.arange(cm.shape[0], dtype=I32)[:, None]
            cm = full.at[cap_i, idx].set(cm)
        R = fused._residual_pass(R, cm, pos, tx, False, 8)
    return R

timeit("residuals-all", resid_only, flat)

# per-bucket cost
for bname, btx, bncoef in pack.COEFF_BUCKETS:
    def one(flat, name=bname, tx=btx, ncoef=bncoef):
        def seg(n2ame, dtype=I32):
            off, shape = layout.segs[n2ame]
            n = int(np.prod(shape))
            return jax.lax.slice(flat, (off,), (off + n,)) \
                .reshape(shape).astype(dtype)
        R = jnp.zeros((3, ha, wa), I32)
        cm = seg(f"coeff_{name}")
        pos = seg(f"cpos_{name}")
        n2 = (4 << tx) * (4 << tx)
        if ncoef < n2:
            scan = jnp.asarray(np.stack(
                [np.asarray(M.SCAN_ORDERS[tx][t].scan[:ncoef], np.int32)
                 for t in range(4)]))
            idx = scan[pos[:, 3]]
            full = jnp.zeros((cm.shape[0], n2), I32)
            cap_i = jnp.arange(cm.shape[0], dtype=I32)[:, None]
            cm = full.at[cap_i, idx].set(cm)
        return fused._residual_pass(R, cm, pos, tx, False, 8)
    timeit(f"residual {bname} cap={caps[bname]}", one, flat)

# 3. elementwise tail: mask add + refresh + ring write
def tail(flat, pool, ring):
    def seg(name, dtype=I32):
        off, shape = layout.segs[name]
        n = int(np.prod(shape))
        return jax.lax.slice(flat, (off,), (off + n,)) \
            .reshape(shape).astype(dtype)
    misc = seg("misc")
    F = jnp.zeros((3, ha, wa), I32)
    R = jnp.zeros((3, ha, wa), I32)
    m = seg("mi_mask")
    mask = jnp.zeros((3, ha, wa), jnp.bool_)
    y8 = jnp.repeat(jnp.repeat(m, 8, axis=0), 8, axis=1) != 0
    mask = mask.at[0, :mi_rows * 8, :mi_cols * 8].set(y8)
    c4 = jnp.repeat(jnp.repeat(m, 4, axis=0), 4, axis=1) != 0
    mask = mask.at[1, :mi_rows * 4, :mi_cols * 4].set(c4)
    mask = mask.at[2, :mi_rows * 4, :mi_cols * 4].set(c4)
    F = jnp.where(mask, jnp.clip(F + R, 0, 255), F)
    refresh = misc[5:13]
    pool = jnp.where(refresh[:, None, None, None] > 0, F[None], pool)
    hc, wc = ha >> 1, wa >> 1
    out = jnp.concatenate(
        [F[0].reshape(-1), F[1, :hc, :wc].reshape(-1),
         F[2, :hc, :wc].reshape(-1)]).astype(jnp.uint8)
    ring = jax.lax.dynamic_update_index_in_dim(ring, out, misc[13], 0)
    return pool, ring

pool, ring = timeit("elementwise-tail", tail, flat, pool, ring,
                    donate=(1, 2))

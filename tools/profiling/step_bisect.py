"""Bisect the fused step's zero-work floor by rebuilding it with pieces
disabled (same geometry, zero payload, zero trip counts)."""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))
import numpy as np
import jax
import jax.numpy as jnp
from cuda_vp9_tpu.runtime import fused, pack
from cuda_vp9_tpu import models as M

I32 = jnp.int32
mi_rows, mi_cols = (int(sys.argv[1]), int(sys.argv[2])) \
    if len(sys.argv) > 2 else (45, 80)
ha = ((mi_rows + 7) & ~7) * 8
wa = ((mi_cols + 7) & ~7) * 8
caps = pack.compute_caps(mi_rows, mi_cols, "tight", False)
layout = pack.build_layout(caps, mi_rows, mi_cols, False)
K = (layout.size + pack.PAGE - 1) // pack.PAGE
nout = ha * wa + 2 * ((ha >> 1) * (wa >> 1))
kernels = jnp.asarray(M.FILTER_KERNELS.astype(np.int32))
flat = jnp.zeros((K * pack.PAGE,), jnp.int16)
flat.block_until_ready()
print(f"flat {K*pack.PAGE*2/1e6:.1f} MB  pool {8*3*ha*wa*4/1e6:.1f} MB  "
      f"ring {32*nout/1e6:.1f} MB", flush=True)


def build(with_resid, with_mc, with_intra, with_lf, with_tail):
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(pool, ring, kernels, flat):
        def seg(name, dtype=I32):
            off, shape = layout.segs[name]
            n = int(np.prod(shape))
            return jax.lax.slice(flat, (off,), (off + n,)) \
                .reshape(shape).astype(dtype)
        misc = seg("misc")
        F = jnp.zeros((3, ha, wa), I32)
        R = jnp.zeros((3, ha, wa), I32)
        if with_resid:
            for name, tx, ncoef in pack.COEFF_BUCKETS:
                cm = seg(f"coeff_{name}")
                pos = seg(f"cpos_{name}")
                n2 = (4 << tx) * (4 << tx)
                if ncoef < n2:
                    scan = jnp.asarray(np.stack(
                        [np.asarray(M.SCAN_ORDERS[tx][t].scan[:ncoef],
                                    np.int32) for t in range(4)]))
                    idx = scan[pos[:, 3]]
                    full = jnp.zeros((cm.shape[0], n2), I32)
                    ci = jnp.arange(cm.shape[0], dtype=I32)[:, None]
                    cm = full.at[ci, idx].set(cm)
                R = fused._residual_pass(R, cm, pos, tx, False, 8)
        if with_mc:
            br = min(160, ha)
            F = fused._mc_pass(F, pool, kernels, seg("mc4"), seg("mc4h"),
                               misc[0], misc[23], 4, 4, br, 8)
            F = fused._mc_pass(F, pool, kernels, seg("mc8"), seg("mc8h"),
                               misc[1], misc[24], 8, 8, br, 8)
            F = fused._mc_pass(F, pool, kernels, seg("mc16"), seg("mc16h"),
                               misc[2], misc[25], 16, 16, br, 8)
        if with_intra:
            F = fused._intra_pass(F, R, seg("intra"), seg("chunk_bs"),
                                  misc[3], 8)
        if with_lf:
            from cuda_vp9_tpu.ops.pallas.loopfilter import lf_frame
            F = lf_frame(F, seg("lfm", jnp.int16), seg("lf_thr", jnp.int16), misc[4],
                         mi_rows=mi_rows, mi_cols=mi_cols, bd=8,
                         interpret=jax.default_backend() == "cpu")
        if with_tail:
            refresh = misc[5:13]
            pool = jnp.where(refresh[:, None, None, None] > 0, F[None], pool)
            hc, wc = ha >> 1, wa >> 1
            out = jnp.concatenate(
                [F[0].reshape(-1), F[1, :hc, :wc].reshape(-1),
                 F[2, :hc, :wc].reshape(-1)]).astype(jnp.uint8)
            ring = jax.lax.dynamic_update_index_in_dim(ring, out,
                                                       misc[13], 0)
        else:
            ring = ring + F[0, 0, :1].astype(jnp.uint8)
        return pool, ring
    return step


fetch = jax.jit(lambda r: r[0, :1])


def timeit(tag, step):
    # block_until_ready is unreliable on the axon tunnel: amortize N
    # dispatches behind ONE tiny jitted-fetch sync and subtract its RTT.
    pool = jnp.zeros((8, 3, ha, wa), I32)
    ring = jnp.zeros((32, nout), jnp.uint8)
    pool, ring = step(pool, ring, kernels, flat)
    _ = np.asarray(fetch(ring))
    ts = []
    for _ in range(6):
        t0 = time.time()
        _ = np.asarray(fetch(ring))
        ts.append(time.time() - t0)
    rtt = min(ts)
    N = 8
    ts = []
    for _ in range(4):
        t0 = time.time()
        for _ in range(N):
            pool, ring = step(pool, ring, kernels, flat)
        _ = np.asarray(fetch(ring))
        ts.append(time.time() - t0)
    print(f"{tag}: per-step {1e3*(min(ts)-rtt)/N:.2f} ms "
          f"(rtt {1e3*rtt:.1f})", flush=True)


timeit("all", build(1, 1, 1, 1, 1))
timeit("no-resid", build(0, 1, 1, 1, 1))
timeit("no-mc", build(1, 0, 1, 1, 1))
timeit("no-intra", build(1, 1, 0, 1, 1))
timeit("no-lf", build(1, 1, 1, 0, 1))
timeit("no-tail", build(1, 1, 1, 1, 0))
timeit("none", build(0, 0, 0, 0, 0))
timeit("only-resid", build(1, 0, 0, 0, 0))
timeit("only-mc", build(0, 1, 0, 0, 0))
timeit("only-intra", build(0, 0, 1, 0, 0))
timeit("only-lf", build(0, 0, 0, 1, 0))
timeit("only-tail", build(0, 0, 0, 0, 1))

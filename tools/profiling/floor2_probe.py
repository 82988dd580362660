"""Decompose the REAL fused step's zero-trip floor: replicates
make_frame_step's body with per-piece toggles for the unconditional
work (pages gather, seg conversions, zero-trip chunk loops, mi-mask
residual add, intra loop, loop filter, pool refresh, ring write)."""
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
    if len(sys.argv) > 2 else (90, 160)
PAGES_TIER = int(sys.argv[3]) if len(sys.argv) > 3 else 256
ha = ((mi_rows + 7) & ~7) * 8
wa = ((mi_cols + 7) & ~7) * 8
caps = pack.compute_caps(mi_rows, mi_cols, "tight", False)
layout = pack.build_layout(caps, mi_rows, mi_cols, False)
K = (layout.size + pack.PAGE - 1) // pack.PAGE
nout = ha * wa + 2 * ((ha >> 1) * (wa >> 1))
kernels = jnp.asarray(M.FILTER_KERNELS.astype(np.int32))
cdiv = fused.cdiv
hr = cdiv(K, pack.PAGE)
print(f"geom {mi_rows}x{mi_cols} ha/wa {ha}x{wa} K={K} pages_tier={PAGES_TIER}",
      flush=True)


def build(gather, loops, mask, intra, lf, refresh, tail):
    def step(pool, ring, kernels, flat):
        if gather:
            g = flat[:hr].reshape(-1)[:K].astype(I32)
            full = jnp.take(flat[hr:], g, axis=0).reshape(-1)
        else:
            full = jnp.zeros((K * pack.PAGE,), jnp.int16)

        def seg(name, dtype=I32):
            off, shape = layout.segs[name]
            n = int(np.prod(shape))
            a = jax.lax.slice(full, (off,), (off + n,)).reshape(shape)
            return a.astype(dtype)

        misc = seg("misc")
        F = jnp.zeros((3, ha, wa), I32)
        R = jnp.zeros((3, ha, wa), I32)
        if loops:
            cdt = jnp.int16
            for bi, (name, tx, ncoef) in enumerate(pack.COEFF_BUCKETS):
                cm_all = seg(f"coeff_{name}", cdt)
                pos_all = seg(f"cpos_{name}")
                CH = pack.COEFF_CHUNK[name]
                n2 = (4 << tx) * (4 << tx)
                scan = None
                if ncoef < n2:
                    scan = jnp.asarray(np.stack(
                        [np.asarray(M.SCAN_ORDERS[tx][t].scan[:ncoef],
                                    np.int32) for t in range(4)]))

                def body(i, R, cm_all=cm_all, pos_all=pos_all, CH=CH, tx=tx,
                         ncoef=ncoef, n2=n2, scan=scan):
                    cm = jax.lax.dynamic_slice(cm_all, (i * CH, 0),
                                               (CH, ncoef))
                    pos = jax.lax.dynamic_slice(pos_all, (i * CH, 0),
                                                (CH, 4))
                    if scan is not None:
                        idx = scan[pos[:, 3]]
                        fullc = jnp.zeros((CH, n2), cm.dtype)
                        ci = jnp.arange(CH, dtype=I32)[:, None]
                        cm = fullc.at[ci, idx].set(cm)
                    return fused._residual_pass(R, cm, pos, tx, False, 8)

                R = jax.lax.fori_loop(0, misc[16 + bi], body, R)
            br = min(160, ha)
            F = fused._mc_pass(F, pool, kernels, seg("mc4"), seg("mc4h"),
                               misc[0], misc[23], 4, 4, br, 8)
            F = fused._mc_pass(F, pool, kernels, seg("mc8"), seg("mc8h"),
                               misc[1], misc[24], 8, 8, br, 8)
            F = fused._mc_pass(F, pool, kernels, seg("mc16"), seg("mc16h"),
                               misc[2], misc[25], 16, 16, br, 8)
        if mask:
            m = seg("mi_mask")
            maskv = jnp.zeros((3, ha, wa), jnp.bool_)
            y8 = jnp.repeat(jnp.repeat(m, 8, axis=0), 8, axis=1) != 0
            maskv = maskv.at[0, :mi_rows * 8, :mi_cols * 8].set(y8)
            c4 = jnp.repeat(jnp.repeat(m, 4, axis=0), 4, axis=1) != 0
            maskv = maskv.at[1, :mi_rows * 4, :mi_cols * 4].set(c4)
            maskv = maskv.at[2, :mi_rows * 4, :mi_cols * 4].set(c4)
            F = jnp.where(maskv, jnp.clip(F + R, 0, 255), F)
        if intra:
            F = fused._intra_pass(F, R, seg("intra"), seg("chunk_bs"),
                                  misc[3], 8)
        if lf:
            from cuda_vp9_tpu.ops.pallas.loopfilter import lf_frame
            F = lf_frame(F, seg("lfm", jnp.int16), seg("lf_thr", jnp.int16), misc[4],
                         mi_rows=mi_rows, mi_cols=mi_cols, bd=8,
                         interpret=jax.default_backend() == "cpu")
        if refresh:
            rf = misc[5:13]
            pool = jnp.where(rf[:, None, None, None] > 0, F[None], pool)
        if tail:
            hc, wc = ha >> 1, wa >> 1
            out = jnp.concatenate(
                [F[0].reshape(-1), F[1, :hc, :wc].reshape(-1),
                 F[2, :hc, :wc].reshape(-1)]).astype(jnp.uint8)
            ring = jax.lax.dynamic_update_index_in_dim(ring, out,
                                                       misc[13], 0)
        else:
            ring = ring.at[0, 0].add(F[0, 0, 0].astype(jnp.uint8))
        return pool, ring
    return jax.jit(step, donate_argnums=(0, 1))


fetch = jax.jit(lambda r: r[0, :1])
flat = jnp.zeros(((hr + 1 + PAGES_TIER) * pack.PAGE,), jnp.int16)
flat.block_until_ready()


def timeit(tag, step):
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
    print(f"{tag}: per-step {1e3*(min(ts)-rtt)/N:.2f} ms (rtt {1e3*rtt:.1f})",
          flush=True)


#       gather loops mask intra lf refresh tail
timeit("all", build(1, 1, 1, 1, 1, 1, 1))
timeit("no-gather", build(0, 1, 1, 1, 1, 1, 1))
timeit("no-loops", build(1, 0, 1, 1, 1, 1, 1))
timeit("no-mask", build(1, 1, 0, 1, 1, 1, 1))
timeit("no-intra", build(1, 1, 1, 0, 1, 1, 1))
timeit("no-lf", build(1, 1, 1, 1, 0, 1, 1))
timeit("no-refresh", build(1, 1, 1, 1, 1, 0, 1))
timeit("no-tail", build(1, 1, 1, 1, 1, 1, 0))
timeit("none", build(0, 0, 0, 0, 0, 0, 0))

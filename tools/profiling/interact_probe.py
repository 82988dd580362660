"""Isolate why resid+intra together cost ~7ms when each alone is ~0.2ms
(zero trip counts, 640x360)."""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))
import numpy as np
import jax
import jax.numpy as jnp
from cuda_vp9_tpu.runtime import fused, pack
from cuda_vp9_tpu import models as M

I32 = jnp.int32
mi_rows, mi_cols = 45, 80
ha = ((mi_rows + 7) & ~7) * 8
wa = ((mi_cols + 7) & ~7) * 8
caps = pack.compute_caps(mi_rows, mi_cols, "tight", False)
layout = pack.build_layout(caps, mi_rows, mi_cols, False)
K = (layout.size + pack.PAGE - 1) // pack.PAGE
nout = ha * wa + 2 * ((ha >> 1) * (wa >> 1))
kernels = jnp.asarray(M.FILTER_KERNELS.astype(np.int32))
flat = jnp.zeros((K * pack.PAGE,), jnp.int16)
fetch = jax.jit(lambda r: r[0, :1])


def seg_of(flat, name, dtype=I32):
    off, shape = layout.segs[name]
    n = int(np.prod(shape))
    return jax.lax.slice(flat, (off,), (off + n,)) \
        .reshape(shape).astype(dtype)


def resid_all(flat):
    R = jnp.zeros((3, ha, wa), I32)
    for name, tx, ncoef in pack.COEFF_BUCKETS:
        cm = seg_of(flat, f"coeff_{name}")
        pos = seg_of(flat, f"cpos_{name}")
        n2 = (4 << tx) * (4 << tx)
        if ncoef < n2:
            scan = jnp.asarray(np.stack(
                [np.asarray(M.SCAN_ORDERS[tx][t].scan[:ncoef], np.int32)
                 for t in range(4)]))
            idx = scan[pos[:, 3]]
            full = jnp.zeros((cm.shape[0], n2), I32)
            ci = jnp.arange(cm.shape[0], dtype=I32)[:, None]
            cm = full.at[ci, idx].set(cm)
        R = fused._residual_pass(R, cm, pos, tx, False, 8)
    return R


def timeit(tag, fn):
    f = jax.jit(fn, donate_argnums=(0,))
    ring = jnp.zeros((32, nout), jnp.uint8)
    ring = f(ring, flat)
    _ = np.asarray(fetch(ring))
    ts = []
    for _ in range(6):
        t0 = time.time()
        _ = np.asarray(fetch(ring))
        ts.append(time.time() - t0)
    rtt = min(ts)
    ts = []
    for _ in range(4):
        t0 = time.time()
        for _ in range(8):
            ring = f(ring, flat)
        _ = np.asarray(fetch(ring))
        ts.append(time.time() - t0)
    print(f"{tag}: per-step {1e3*(min(ts)-rtt)/8:.2f} ms", flush=True)


def mk(intra_src, n_branches=4):
    """intra_src: 'resid' -> loop consumes computed R; 'zeros' -> loop
    consumes fresh zeros; resid always live via direct add."""
    def fn(ring, flat):
        misc = seg_of(flat, "misc")
        F = jnp.zeros((3, ha, wa), I32)
        R = resid_all(flat)
        F = F + R  # keep resid live regardless
        Rl = R if intra_src == "resid" else jnp.zeros((3, ha, wa), I32)
        if n_branches == 4:
            F = fused._intra_pass(F, Rl, seg_of(flat, "intra"),
                                  seg_of(flat, "chunk_bs"), misc[3], 8)
        elif n_branches == 1:
            def body(i, F):
                u = jax.lax.dynamic_index_in_dim(
                    seg_of(flat, "intra"), i, axis=0, keepdims=False)
                return fused._intra_chunk(F, Rl, u, 4, 8)
            F = jax.lax.fori_loop(0, misc[3], body, F)
        elif n_branches == 0:
            def body(i, F):
                return F + Rl[:, :1, :1]
            F = jax.lax.fori_loop(0, misc[3], body, F)
        out = F[0, 0, :nout].astype(jnp.uint8)
        return ring.at[0, :].set(jnp.pad(
            F.reshape(-1)[:nout], (0, 0)).astype(jnp.uint8))
    return fn


timeit("resid+intra(R) switch4", mk("resid", 4))
timeit("resid+intra(zeros) switch4", mk("zeros", 4))
timeit("resid+intra(R) single-bs4", mk("resid", 1))
timeit("resid+trivial-loop(R)", mk("resid", 0))

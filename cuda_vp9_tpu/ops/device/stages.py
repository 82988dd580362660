"""JAX device stages of the frame reconstruction pipeline.

The TPU-native re-design of the reference's CUDA reconstruction
(vpx-master/inter_cuda_kernel.cu, intra_cuda_kernel.cu): batched,
fixed-shape, integer-exact stages that XLA compiles onto the TPU —
wavefront-batched intra prediction with closed-form directional
predictors, consumed by the fused frame step (runtime/fused.py).  The
residual and inter-MC stages live directly in runtime/fused.py (banded
segment-window MXU matmuls + gather landing).

All arithmetic is int32 (sufficient for the 8-bit profile; the 16-bit
WRAPLOW points bound every product below 2^30).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------- intra

def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _predictors(bs: int, A, tl, L, have_up, have_left, bd: int):
    """All 10 intra predictors for a batch.  A: [N, 2bs] int32 (already
    availability-replicated/filled), tl: [N], L: [N, bs].
    Returns [N, 10, bs, bs]."""
    N = A.shape[0]
    ri = jnp.arange(bs, dtype=jnp.int32)
    base = 128 << (bd - 8)
    maxval = (1 << bd) - 1
    outs = []

    # DC (mode 0)
    sum_a = jnp.sum(A[:, :bs], axis=1)
    sum_l = jnp.sum(L, axis=1)
    log2bs = bs.bit_length() - 1
    dc_both = (sum_a + sum_l + bs) >> (log2bs + 1)
    dc_top = (sum_a + (bs >> 1)) >> log2bs
    dc_left = (sum_l + (bs >> 1)) >> log2bs
    dc = jnp.where(have_up & have_left, dc_both,
                   jnp.where(have_up, dc_top,
                             jnp.where(have_left, dc_left, base)))
    outs.append(jnp.broadcast_to(dc[:, None, None], (N, bs, bs)))

    # V (1)
    outs.append(jnp.broadcast_to(A[:, None, :bs], (N, bs, bs)))
    # H (2)
    outs.append(jnp.broadcast_to(L[:, :, None], (N, bs, bs)))

    # D45 (3)
    idx = (ri[:, None] + ri[None, :])
    Ap = jnp.concatenate([A, A[:, -1:], A[:, -1:]], axis=1)
    vals = _avg3(Ap[:, idx], Ap[:, idx + 1], Ap[:, idx + 2])
    if bs == 4:
        d45 = jnp.where(idx[None] < 6, vals, A[:, 7, None, None])
    else:
        d45 = jnp.where(idx[None] < bs - 1, vals, A[:, bs - 1, None, None])
    outs.append(d45)

    # D135 (4): sliding AVG3 over [L[bs-1..0], tl, A[0..bs-1]], diagonal read
    S = jnp.concatenate([L[:, ::-1], tl[:, None], A[:, :bs]], axis=1)
    border = _avg3(S[:, :-2], S[:, 1:-1], S[:, 2:])   # [N, 2bs-1]
    didx = (bs - 1) - ri[:, None] + ri[None, :]
    outs.append(border[:, didx])

    # D117 (5)
    t = jnp.minimum(ri[:, None] >> 1, ri[None, :])
    rp = ri[:, None] - 2 * t
    cp = ri[None, :] - t
    Am1 = jnp.concatenate([tl[:, None], A[:, :bs]], axis=1)  # Am1[k]=A[k-1]
    row0 = _avg2(Am1[:, cp], Am1[:, cp + 1])
    # row1: cp==0 -> AVG3(L0, tl, A0); else AVG3(A[cp-2], A[cp-1], A[cp])
    Am2 = jnp.concatenate([tl[:, None], Am1], axis=1)        # Am2[k]=A[k-2]
    row1 = jnp.where(cp == 0,
                     _avg3(L[:, 0, None, None], tl[:, None, None],
                           A[:, 0, None, None]),
                     _avg3(Am2[:, jnp.maximum(cp, 1)],
                           Am1[:, jnp.maximum(cp, 1)],
                           A[:, jnp.maximum(cp, 1)]))
    # col0 r'>=2: r'==2 -> AVG3(tl, L0, L1); else AVG3(L[r'-3..r'-1])
    Lm = jnp.concatenate([tl[:, None], L], axis=1)           # Lm[k]=L[k-1]
    rp3 = jnp.maximum(rp - 3, -1)
    col0 = jnp.where(rp == 2,
                     _avg3(tl[:, None, None], L[:, 0, None, None],
                           L[:, 1, None, None]),
                     _avg3(Lm[:, rp3 + 1], Lm[:, jnp.maximum(rp - 2, 0) + 1],
                           Lm[:, jnp.maximum(rp - 1, 0) + 1]))
    d117 = jnp.where(rp == 0, row0, jnp.where(rp == 1, row1, col0))
    outs.append(d117)

    # D153 (6)
    t = jnp.minimum(ri[:, None], ri[None, :] >> 1)
    rp = ri[:, None] - t
    cp = ri[None, :] - 2 * t
    # col0: rp==0 -> AVG2(tl, L0); rp>=1 -> AVG2(L[rp-1], L[rp])
    col0 = jnp.where(rp == 0, _avg2(tl[:, None, None], L[:, 0, None, None]),
                     _avg2(L[:, jnp.maximum(rp - 1, 0)],
                           L[:, jnp.minimum(jnp.maximum(rp, 1), bs - 1)]))
    col1 = jnp.where(
        rp == 0, _avg3(L[:, 0, None, None], tl[:, None, None],
                       A[:, 0, None, None]),
        jnp.where(rp == 1, _avg3(tl[:, None, None], L[:, 0, None, None],
                                 L[:, 1, None, None]),
                  _avg3(L[:, jnp.maximum(rp - 2, 0)],
                        L[:, jnp.maximum(rp - 1, 0)],
                        L[:, jnp.minimum(jnp.maximum(rp, 2), bs - 1)])))
    # row0 c'>=2: AVG3(A[c'-3], A[c'-2], A[c'-1]) with A[-1] = tl
    row0 = _avg3(Am1[:, jnp.maximum(cp - 3, -1) + 1],
                 Am1[:, jnp.maximum(cp - 2, -1) + 1],
                 Am1[:, jnp.maximum(cp - 1, -1) + 1])
    d153 = jnp.where(cp == 0, col0, jnp.where(cp == 1, col1, row0))
    outs.append(d153)

    # D207 (7)
    v = ri[:, None] + (ri[None, :] >> 1)
    Lp = jnp.concatenate(
        [L, jnp.repeat(L[:, -1:], bs + 2, axis=1)], axis=1)
    a2 = _avg2(Lp[:, v], Lp[:, v + 1])
    a3 = _avg3(Lp[:, v], Lp[:, v + 1], Lp[:, v + 2])
    even = (ri[None, :] & 1) == 0
    last = L[:, bs - 1, None, None]
    d207 = jnp.where(even[None],
                     jnp.where(v[None] < bs - 1, a2, last),
                     jnp.where(v[None] < bs - 1, a3, last))
    outs.append(d207)

    # D63 (8)
    idx63 = ri[None, :] + (ri[:, None] >> 1)
    Ap2 = jnp.concatenate([A, jnp.repeat(A[:, -1:], 2, axis=1)], axis=1)
    a2 = _avg2(Ap2[:, idx63], Ap2[:, idx63 + 1])
    a3 = _avg3(Ap2[:, idx63], Ap2[:, idx63 + 1], Ap2[:, idx63 + 2])
    odd = (ri[:, None] & 1) == 1
    vals = jnp.where(odd[None], a3, a2)
    if bs == 4:
        d63 = vals
    else:
        fill = (ri[:, None] >= 2) & (idx63 > bs - 2)
        d63 = jnp.where(fill[None], A[:, bs - 1, None, None], vals)
    outs.append(d63)

    # TM (9)
    tm = jnp.clip(L[:, :, None] + A[:, None, :bs] - tl[:, None, None],
                  0, maxval)
    outs.append(tm)

    return jnp.stack(outs, axis=1)  # [N, 10, bs, bs]


@functools.partial(jax.jit, static_argnames=("bs", "bd"))
def intra_wave(F, R, plane, x0, y0, mode, n_above, n_left, tl_mode,
               have_up, have_left, bs: int, bd: int):
    """Predict + add residual + clip for one wave's bs-sized units.

    n_above: valid above pixels (0 => base-1 fill); indices beyond
    replicate the last valid one.  n_left likewise with base+1 fill.
    tl_mode: 0 = read frame, 1 = base+1, 2 = base-1.
    Padded units carry y0 = -32768 (dropped at scatter).
    """
    base = 128 << (bd - 8)
    maxval = (1 << bd) - 1
    i2 = jnp.arange(2 * bs, dtype=jnp.int32)
    i1 = jnp.arange(bs, dtype=jnp.int32)
    ys = jnp.maximum(y0, 0)
    xs = jnp.maximum(x0, 0)
    a_idx = xs[:, None] + jnp.minimum(i2[None, :],
                                      jnp.maximum(n_above - 1, 0)[:, None])
    A = F[plane[:, None], jnp.maximum(ys - 1, 0)[:, None], a_idx]
    A = jnp.where((n_above > 0)[:, None], A, base - 1)
    l_idx = ys[:, None] + jnp.minimum(i1[None, :],
                                      jnp.maximum(n_left - 1, 0)[:, None])
    L = F[plane[:, None], l_idx, jnp.maximum(xs - 1, 0)[:, None]]
    L = jnp.where((n_left > 0)[:, None], L, base + 1)
    tl_frame = F[plane, jnp.maximum(ys - 1, 0), jnp.maximum(xs - 1, 0)]
    tl = jnp.where(tl_mode == 0, tl_frame,
                   jnp.where(tl_mode == 1, base + 1, base - 1))

    preds = _predictors(bs, A, tl, L, have_up > 0, have_left > 0, bd)
    sel = jnp.take_along_axis(
        preds, mode[:, None, None, None].astype(jnp.int32), axis=1)[:, 0]

    rows = ys[:, None, None] + i1[None, :, None]
    cols = xs[:, None, None] + i1[None, None, :]
    resid = R[plane[:, None, None], rows, cols]
    out = jnp.clip(sel + resid, 0, maxval)
    rows_o = y0[:, None, None] + i1[None, :, None]
    return F.at[plane[:, None, None], rows_o, cols].set(out, mode="drop")

"""Fused per-frame device reconstruction: ONE jitted call per frame.

All stage shapes are static functions of the frame geometry (capacities
derived from frame area, padded work dropped at scatter), so a stream
compiles exactly once and every frame is a single device dispatch:

  residual transforms -> inter MC (chunked fori_loop over 4x4/8x8 tiles)
  -> inter residual add -> intra wavefront (chunked fori_loop, per-chunk
  block size via lax.switch) -> loop filter (fori_loop over the superblock
  anti-diagonal wavefront, masks precomputed on host).

This is the TPU answer to the reference's per-frame kernel-launch storm
(one launch per intra wave, intra_cuda_kernel.cu:1351) and per-frame
cudaMalloc/Memcpy churn: the reference pool stays HBM-resident and the
whole frame is one XLA program.
"""

from __future__ import annotations

import functools
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.ref import transforms as T
from ..ops.device import stages

I32 = jnp.int32
CHUNK_INTRA = 64
CHUNK_MC = 1024


def cdiv(a, b):
    return (a + b - 1) // b


# ----------------------------------------------------------------- residual


def _residual_pass(R, coeffs, pos, tx_size, lossless, bd):
    """coeffs [CAP, n*n], pos [CAP, 4] = (plane, y, x, tx_type)."""
    n = 4 << tx_size
    if lossless:
        resid = T.inv_wht2d(coeffs, bd, xp=jnp, work_dtype=I32)
    elif tx_size == 3:
        resid = T.inv_txfm2d(coeffs, 3, 0, bd, xp=jnp, work_dtype=I32)
    else:
        # per-unit tx_type: run DCT and ADST row/col passes, select per unit
        r_d = T.inv_txfm2d(coeffs, tx_size, 0, bd, xp=jnp, work_dtype=I32)
        r_a = T.inv_txfm2d(coeffs, tx_size, 1, bd, xp=jnp, work_dtype=I32)
        r_h = T.inv_txfm2d(coeffs, tx_size, 2, bd, xp=jnp, work_dtype=I32)
        r_b = T.inv_txfm2d(coeffs, tx_size, 3, bd, xp=jnp, work_dtype=I32)
        tt = pos[:, 3][:, None, None]
        resid = jnp.where(tt == 0, r_d,
                          jnp.where(tt == 1, r_a,
                                    jnp.where(tt == 2, r_h, r_b)))
    rows = pos[:, 1][:, None, None] + jnp.arange(n, dtype=I32)[None, :, None]
    cols = pos[:, 2][:, None, None] + jnp.arange(n, dtype=I32)[None, None, :]
    return R.at[pos[:, 0][:, None, None], rows, cols].set(
        resid.astype(I32), mode="drop")


# ----------------------------------------------------------------- inter


def _mc_chunk(F, pool, kernels, u, w, h, bd):
    """Apply one chunk of MC tiles.  u: [CHUNK, 12]."""
    plane, dx, dy, slot = u[:, 0], u[:, 1], u[:, 2], u[:, 3]
    x0, y0, spx, spy = u[:, 4], u[:, 5], u[:, 6], u[:, 7]
    filt, cw, chh, avg = u[:, 8], u[:, 9], u[:, 10], u[:, 11]
    ih = h + 7
    rows = jnp.clip(y0[:, None] - 3 + jnp.arange(ih, dtype=I32)[None, :],
                    0, chh[:, None] - 1)
    tap = jnp.arange(8, dtype=I32)
    cols = jnp.clip((x0 + (spx >> 4))[:, None, None] - 3
                    + jnp.arange(w, dtype=I32)[None, :, None]
                    + tap[None, None, :], 0, cw[:, None, None] - 1)
    g = pool[slot[:, None, None, None], plane[:, None, None, None],
             rows[:, :, None, None], cols[:, None, :, :]]
    fx = kernels[filt, spx & 15]
    maxv = (1 << bd) - 1
    temp = jnp.clip((jnp.sum(g * fx[:, None, None, :], axis=3) + 64) >> 7,
                    0, maxv)
    fy = kernels[filt, spy & 15]
    idx_v = jnp.arange(h, dtype=I32)[:, None] + tap[None, :]
    out = jnp.clip((jnp.sum(temp[:, idx_v] * fy[:, None, :, None], axis=2)
                    + 64) >> 7, 0, maxv)
    rows_o = dy[:, None, None] + jnp.arange(h, dtype=I32)[None, :, None]
    cols_o = dx[:, None, None] + jnp.arange(w, dtype=I32)[None, None, :]
    cur = F[plane[:, None, None], rows_o, cols_o]
    out = jnp.where(avg[:, None, None] > 0, (cur + out + 1) >> 1, out)
    return F.at[plane[:, None, None], rows_o, cols_o].set(out, mode="drop")


def _mc_pass(F, pool, kernels, mc_units, n_chunks, w, h, bd):
    """mc_units [MAXC, CHUNK_MC, 12]; sequential chunks (avg ordering)."""
    def body(i, F):
        u = jax.lax.dynamic_index_in_dim(mc_units, i, axis=0,
                                         keepdims=False)
        return _mc_chunk(F, pool, kernels, u, w, h, bd)
    return jax.lax.fori_loop(0, n_chunks, body, F)


# ----------------------------------------------------------------- intra


def _intra_chunk(F, R, u, bs, bd):
    """u: [CHUNK, 9] = plane,x0,y0,mode,n_above,n_left,tl_mode,hup,hleft."""
    return stages.intra_wave.__wrapped__(
        F, R, u[:, 0], u[:, 1], u[:, 2], u[:, 3], u[:, 4], u[:, 5],
        u[:, 6], u[:, 7], u[:, 8], bs=bs, bd=bd)


def _intra_pass(F, R, chunks, chunk_bs, n_chunks, bd):
    def body(i, F):
        u = jax.lax.dynamic_index_in_dim(chunks, i, axis=0, keepdims=False)
        bsi = chunk_bs[i]
        return jax.lax.switch(
            bsi, [lambda F, u: _intra_chunk(F, R, u, 4, bd),
                  lambda F, u: _intra_chunk(F, R, u, 8, bd),
                  lambda F, u: _intra_chunk(F, R, u, 16, bd),
                  lambda F, u: _intra_chunk(F, R, u, 32, bd)], F, u)
    return jax.lax.fori_loop(0, n_chunks, body, F)


# ----------------------------------------------------------------- loop filter

def _lf_masks_w(W, lim, blim, hevt, bd):
    p3, p2, p1, p0 = W[..., 4], W[..., 5], W[..., 6], W[..., 7]
    q0, q1, q2, q3 = W[..., 8], W[..., 9], W[..., 10], W[..., 11]
    sh = bd - 8
    limit = lim << sh
    blimit = blim << sh
    mask = ~((jnp.abs(p3 - p2) > limit) | (jnp.abs(p2 - p1) > limit)
             | (jnp.abs(p1 - p0) > limit) | (jnp.abs(q1 - q0) > limit)
             | (jnp.abs(q2 - q1) > limit) | (jnp.abs(q3 - q2) > limit)
             | (jnp.abs(p0 - q0) * 2 + (jnp.abs(p1 - q1) >> 1) > blimit))
    hev = (jnp.abs(p1 - p0) > (hevt << sh)) | \
        (jnp.abs(q1 - q0) > (hevt << sh))
    ft = 1 << sh
    flat = ~((jnp.abs(p1 - p0) > ft) | (jnp.abs(q1 - q0) > ft)
             | (jnp.abs(p2 - p0) > ft) | (jnp.abs(q2 - q0) > ft)
             | (jnp.abs(p3 - p0) > ft) | (jnp.abs(q3 - q0) > ft))
    return mask, hev, flat


def _lf_flat2(W, bd):
    p0, q0 = W[..., 7], W[..., 8]
    ft = 1 << (bd - 8)
    f = jnp.zeros(p0.shape, bool)
    for k in range(4):
        f = f | (jnp.abs(W[..., k] - p0) > ft) \
              | (jnp.abs(W[..., 15 - k] - q0) > ft)
    return ~f


def _filter4_vals(W, mask, hev, bd):
    off = 0x80 << (bd - 8)
    lo, hi = -off, off - 1
    ps1, ps0 = W[..., 6] - off, W[..., 7] - off
    qs0, qs1 = W[..., 8] - off, W[..., 9] - off
    f = jnp.clip(ps1 - qs1, lo, hi)
    f = jnp.where(hev, f, 0)
    f = jnp.where(mask, jnp.clip(f + 3 * (qs0 - ps0), lo, hi), 0)
    f1 = jnp.clip(f + 4, lo, hi) >> 3
    f2 = jnp.clip(f + 3, lo, hi) >> 3
    oq0 = jnp.clip(qs0 - f1, lo, hi) + off
    op0 = jnp.clip(ps0 + f2, lo, hi) + off
    fo = jnp.where(hev, 0, (f1 + 1) >> 1)
    oq1 = jnp.clip(qs1 - fo, lo, hi) + off
    op1 = jnp.clip(ps1 + fo, lo, hi) + off
    return op1, op0, oq0, oq1


def _filter_window(W, kind16, kind8, kind4, lim, blim, hevt, bd):
    """Filter a [..., 16] window across the edge (at index 8) given
    per-row one-hot filter-kind flags.  Returns the new window."""
    mask, hev, flat = _lf_masks_w(W, lim, blim, hevt, bd)
    anyk = kind16 | kind8 | kind4
    mask = mask & anyk
    # filter4 values
    op1, op0, oq0, oq1 = _filter4_vals(W, mask, hev, bd)
    out = W
    out = out.at[..., 6].set(jnp.where(mask, op1, W[..., 6]))
    out = out.at[..., 7].set(jnp.where(mask, op0, W[..., 7]))
    out = out.at[..., 8].set(jnp.where(mask, oq0, W[..., 8]))
    out = out.at[..., 9].set(jnp.where(mask, oq1, W[..., 9]))
    # filter8 (7-tap) on flat & mask & (kind8|kind16)
    sel8 = flat & mask & (kind8 | kind16)
    p3, p2, p1, p0 = W[..., 4], W[..., 5], W[..., 6], W[..., 7]
    q0, q1, q2, q3 = W[..., 8], W[..., 9], W[..., 10], W[..., 11]
    vals8 = [
        (p3 + p3 + p3 + 2 * p2 + p1 + p0 + q0 + 4) >> 3,
        (p3 + p3 + p2 + 2 * p1 + p0 + q0 + q1 + 4) >> 3,
        (p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2 + 4) >> 3,
        (p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3 + 4) >> 3,
        (p1 + p0 + q0 + 2 * q1 + q2 + q3 + q3 + 4) >> 3,
        (p0 + q0 + q1 + 2 * q2 + q3 + q3 + q3 + 4) >> 3,
    ]
    for k, v in zip(range(5, 11), vals8):
        out = out.at[..., k].set(jnp.where(sel8, v, out[..., k]))
    # filter16 (15-tap) on flat2 & flat & mask & kind16
    flat2 = _lf_flat2(W, bd)
    sel16 = flat2 & flat & mask & kind16
    p = [W[..., 7 - k] for k in range(8)]
    q = [W[..., 8 + k] for k in range(8)]
    for i in range(7):
        s = p[7] * (i + 1) + p[i] * 2
        for k in range(7):
            if k != i:
                s = s + p[k]
        for k in range(7 - i):
            s = s + q[k]
        out = out.at[..., 7 - i].set(
            jnp.where(sel16, (s + 8) >> 4, out[..., 7 - i]))
        s = q[7] * (i + 1) + q[i] * 2
        for k in range(7):
            if k != i:
                s = s + q[k]
        for k in range(7 - i):
            s = s + p[k]
        out = out.at[..., 8 + i].set(
            jnp.where(sel16, (s + 8) >> 4, out[..., 8 + i]))
    return out


def _lf_edge(F, plane_idx, sbr, sbc, edge_i, meta, thr, groups, horiz, bd):
    """Filter one edge line (vertical column or horizontal row) of a batch
    of superblocks, including the interior 4x4 edge 4px after it.

    sbr/sbc: [N] SB coords (padded entries = -32768, dropped at scatter).
    meta = (lfl, m16, m8, m4, m4i) mask planes in 8px cell units;
    groups = cells per SB side (8 for Y, 4 for chroma).
    """
    lfl, m16, m8, m4, m4i = meta
    N = sbr.shape[0]
    g = groups
    # mask cells along the edge: for vertical edges the cells run down the
    # SB (rows), for horizontal edges across it (cols)
    if horiz:
        cell_r = sbr[:, None] * g + edge_i
        cell_c = sbc[:, None] * g + jnp.arange(g, dtype=I32)[None, :]
    else:
        cell_r = sbr[:, None] * g + jnp.arange(g, dtype=I32)[None, :]
        cell_c = sbc[:, None] * g + edge_i
    rc = jnp.clip(cell_r, 0, lfl.shape[0] - 1)
    cc = jnp.clip(cell_c, 0, lfl.shape[1] - 1)
    valid = (cell_r >= 0) & (cell_r < lfl.shape[0]) \
        & (cell_c >= 0) & (cell_c < lfl.shape[1])
    lv = lfl[rc, cc]
    k16 = m16[rc, cc] & valid
    k8 = m8[rc, cc] & valid
    k4 = m4[rc, cc] & valid
    k4i = m4i[rc, cc] & valid
    mblim, lim, hevt = thr[0][lv], thr[1][lv], thr[2][lv]

    npx = g * 8
    if horiz:
        # edge at row y = (sbr*g + edge_i)*8; samples run along columns
        y = (sbr * g + edge_i) * 8
        x0 = sbc * g * 8
        along = x0[:, None] + jnp.arange(npx, dtype=I32)[None, :]
        across = y[:, None] + jnp.arange(-8, 8, dtype=I32)[None, :]
        W = F[plane_idx, jnp.clip(across, 0, F.shape[1] - 1)[:, None, :],
              jnp.clip(along, 0, F.shape[2] - 1)[:, :, None]]
    else:
        x = (sbc * g + edge_i) * 8
        y0 = sbr * g * 8
        along = y0[:, None] + jnp.arange(npx, dtype=I32)[None, :]
        across = x[:, None] + jnp.arange(-8, 8, dtype=I32)[None, :]
        W = F[plane_idx, jnp.clip(along, 0, F.shape[1] - 1)[:, :, None],
              jnp.clip(across, 0, F.shape[2] - 1)[:, None, :]]
    W = W.reshape(N, g, 8, 16)
    ex = lambda a: a[:, :, None]
    Wf = _filter_window(W, ex(k16), ex(k8), ex(k4), ex(lim), ex(mblim),
                        ex(hevt), bd)
    # interior 4x4 edge at +4: its 8-wide neighborhood is Wf[..., 8:16]
    Wi = jnp.zeros((N, g, 8, 16), I32)
    Wi = Wi.at[..., 4:12].set(Wf[..., 8:16])
    zero = jnp.zeros_like(ex(k4i))
    Wif = _filter_window(Wi, zero, zero, ex(k4i), ex(lim), ex(mblim),
                         ex(hevt), bd)
    Wf = Wf.at[..., 10:14].set(Wif[..., 6:10])
    Wm = Wf.reshape(N, npx, 16)
    # jnp scatter follows numpy negative-index wrapping; push small negative
    # window coordinates (frame edge) far out of range so "drop" applies
    BIG = jnp.int32(-(1 << 30))
    along_s = jnp.where(along < 0, BIG, along)
    across_s = jnp.where(across < 0, BIG, across)
    if horiz:
        return F.at[plane_idx, across_s[:, None, :],
                    along_s[:, :, None]].set(Wm, mode="drop")
    return F.at[plane_idx, along_s[:, :, None],
                across_s[:, None, :]].set(Wm, mode="drop")


def _lf_pass(F, wave_sbs, n_waves, meta_vy, meta_hy, meta_vuv, meta_huv,
             thr, bd):
    """fori_loop over SB anti-diagonal waves; per plane all vertical edges
    then all horizontal edges (normative order)."""
    def body(w, F):
        sbs = jax.lax.dynamic_index_in_dim(wave_sbs, w, axis=0,
                                           keepdims=False)
        sbr, sbc = sbs[:, 0], sbs[:, 1]
        for i in range(8):
            F = _lf_edge(F, 0, sbr, sbc, i, meta_vy, thr, 8, False, bd)
        for i in range(8):
            F = _lf_edge(F, 0, sbr, sbc, i, meta_hy, thr, 8, True, bd)
        for p in (1, 2):
            for i in range(4):
                F = _lf_edge(F, p, sbr, sbc, i, meta_vuv, thr, 4, False, bd)
            for i in range(4):
                F = _lf_edge(F, p, sbr, sbc, i, meta_huv, thr, 4, True, bd)
        return F
    return jax.lax.fori_loop(0, n_waves, body, F)


# ----------------------------------------------------------------- frame step


def make_frame_step(mi_rows: int, mi_cols: int, caps: Dict[str, int],
                    lossless: bool, bd: int = 8):
    """Build the jitted fused step for one frame geometry."""
    ha = ((mi_rows + 7) & ~7) * 8
    wa = ((mi_cols + 7) & ~7) * 8

    @jax.jit
    def step(pool, kernels, coeff, cpos, mc4, n_mc4, mc8, n_mc8,
             inter_mask, intra_chunks, chunk_bs, n_chunks,
             lf_vy, lf_hy, lf_vuv, lf_huv, lf_waves, thr, lf_on):
        F = jnp.zeros((3, ha, wa), I32)
        R = jnp.zeros((3, ha, wa), I32)
        for tx in range(4):
            if lossless and tx > 0:
                continue  # lossless forces ONLY_4X4: other buckets empty
            if caps[f"tx{tx}"]:
                R = _residual_pass(R, coeff[tx], cpos[tx], tx, lossless, bd)
        F = _mc_pass(F, pool, kernels, mc4, n_mc4, 4, 4, bd)
        F = _mc_pass(F, pool, kernels, mc8, n_mc8, 8, 8, bd)
        F = jnp.where(inter_mask, jnp.clip(F + R, 0, (1 << bd) - 1), F)
        F = _intra_pass(F, R, intra_chunks, chunk_bs, n_chunks, bd)
        F = _lf_pass(F, lf_waves, lf_on * lf_waves.shape[0],
                     tuple(lf_vy), tuple(lf_hy), tuple(lf_vuv),
                     tuple(lf_huv), thr, bd)
        return F

    return step

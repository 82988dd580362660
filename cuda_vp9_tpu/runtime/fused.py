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

from .. import models as M
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
    # bd=8 runs the butterflies in native int16 (WRAPLOW is free: int16
    # adds wrap natively) -- ~3x fewer ops than the masked emulation
    wd = jnp.int16 if bd == 8 else I32
    if lossless:
        resid = T.inv_wht2d(coeffs, bd, xp=jnp, work_dtype=I32)
    elif tx_size == 3:
        resid = T.inv_txfm2d(coeffs, 3, 0, bd, xp=jnp, work_dtype=wd)
    else:
        # per-unit tx_type, selected at the 1-D pass level (4 passes total)
        resid = T.inv_txfm2d_select(coeffs, tx_size, pos[:, 3], bd,
                                    xp=jnp, work_dtype=wd)
    # y stored +1: zero entries are padding (zero-page elision)
    y0 = jnp.where(pos[:, 1] == 0, -(1 << 20), pos[:, 1] - 1)
    rows = y0[:, None, None] + jnp.arange(n, dtype=I32)[None, :, None]
    cols = pos[:, 2][:, None, None] + jnp.arange(n, dtype=I32)[None, None, :]
    return R.at[pos[:, 0][:, None, None], rows, cols].set(
        resid.astype(I32), mode="drop")


# ----------------------------------------------------------------- inter


def _mc_chunk_compute(pool, kernels, hd, u, w, h, br, bd):
    """Predict one chunk of MC tiles via segment-window MXU matmuls.

    u [CHUNK, 4] tile params (dx | filt<<13, dy+1, sr, sc) where
    sr/sc = ((src - dst) << 4) | subpel_q4 — the only per-tile payload
    (everything else is chunk-constant; dx < 2^13 and filt < 4 share a
    word, so a tile costs 8 wire bytes); hd [8] = (slot, plane, srow,
    cw, chh, ...): the whole chunk reads one [br, wa] row band of one
    reference plane (pack groups chunks that way).  Three-stage
    formulation, all integer-exact:
      1. a tiny one-hot over 8-column segments gathers a WW-wide window
         per tile from the band (one MXU matmul) — WW = 32 for tile
         classes <= 16 and 48 for the 32x32 class (>= w + 7 taps + 7
         intra-segment offset either way);
      2. a 0/1 row-selection matmul applies the normative vertical edge
         clamp (h + 7 rows of the window);
      3. a per-tile [WW, w] banded filter matrix applies the horizontal
         8 taps WITH the in-window edge clamp (one MXU matmul).
    The vertical 8-tap is static-slice multiply-adds in int32.  bf16
    products are exact for 8-bit pixels x taps (f32 accumulate); high
    bit depth uses f32 (exact to 2^24).  ~5x cheaper than a full-width
    [wa, w] banded matrix: the filter operand is WW wide, not wa."""
    N = u.shape[0]
    wa = pool.shape[3]
    # window segments: 4 (32-wide window) covers w + 7 taps + 7 offset
    # for w <= 16; the 32-wide tile class needs 46 -> 6 segments (48)
    nw = 6 if w == 32 else 4
    WW = 8 * nw
    dx = u[:, 0] & 0x1FFF
    filt = u[:, 0] >> 13
    dy = u[:, 1] - 1
    x0 = dx + (u[:, 3] >> 4)
    y0 = dy + (u[:, 2] >> 4)
    spx = u[:, 3] & 15
    spy = u[:, 2] & 15
    cw = jnp.full((N,), hd[3], I32)
    chh = jnp.full((N,), hd[4], I32)
    ih = h + 7
    maxv = (1 << bd) - 1
    S = wa // 8 + nw                         # segments incl. zero pad

    # band read as a WIDE-ROW GATHER over the flattened pool: a
    # dynamic_slice here is equivalent single-stream, but under vmap
    # (batched multi-stream) a batched-start dynamic_slice lowers to an
    # elementwise gather (~6 ns/elem — it alone made the batched step
    # ~20x slower than N single-stream steps); full-row gathers stay on
    # the fast path both ways
    pha = pool.shape[2]
    pool_rows = pool.reshape(pool.shape[0] * pool.shape[1] * pha, wa)
    row0 = (hd[0] * 3 + hd[1]) * pha + hd[2]
    band = jnp.take(pool_rows, row0 + jnp.arange(br, dtype=I32), axis=0)
    band_r = jnp.pad(band, ((0, 0), (0, WW))).reshape(br, S, 8)
    fx = kernels[filt, spx & 15]             # [N, 8]
    fy = kernels[filt, spy & 15]
    xs = x0 + (spx >> 4) - 3
    lo = jnp.clip(xs, 0, cw - 1)
    q = jnp.minimum(lo >> 3, S - nw)         # window start segment
    mdt = jnp.bfloat16 if bd == 8 else jnp.float32
    prec = None if bd == 8 else jax.lax.Precision.HIGHEST
    # window select: OH [N, nw, S] x band_r [br, S, 8] -> W [N, br, WW]
    segs = jnp.arange(S, dtype=I32)[None, None, :]
    t4 = jnp.arange(nw, dtype=I32)[None, :, None]
    oh = (segs == (q[:, None, None] + t4)).astype(mdt)
    W4 = jax.lax.dot_general(
        oh, band_r.astype(mdt), (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    W = W4.transpose(0, 2, 1, 3).reshape(N, br, WW)
    # source-row selection (normative vertical edge clamp) as 0/1 matmul
    rr = jnp.clip(y0[:, None] - 3 + jnp.arange(ih, dtype=I32)[None, :],
                  0, chh[:, None] - 1) - hd[2]
    oh_r = (rr[:, :, None] == jnp.arange(br, dtype=I32)[None, None, :]
            ).astype(mdt)
    Wr = jax.lax.dot_general(
        oh_r, W.astype(mdt), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)  # [N, ih, 32]
    # banded horizontal filter matrix Mf [N, WW, w] with in-window clamp:
    #   Mf[n, j, c] = sum_k fx[n, k] * [clip(xs+c+k, 0, cw-1) - 8q == j]
    c_idx = jnp.arange(w, dtype=I32)[None, :]
    jj = jnp.arange(WW, dtype=I32)[None, :, None]
    Mf = jnp.zeros((N, WW, w), jnp.float32)
    for k in range(8):
        tgt = jnp.clip(xs[:, None] + c_idx + k, 0, cw[:, None] - 1) \
            - (q[:, None] << 3)
        Mf = Mf + fx[:, k, None, None] * (tgt[:, None, :] == jj)
    winh = jax.lax.dot_general(
        Wr.astype(mdt), Mf.astype(mdt), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)  # [N, ih, w]
    temp = jnp.clip((winh.astype(I32) + 64) >> 7, 0, maxv)
    acc = jnp.zeros((N, h, w), I32)
    for k in range(8):
        acc = acc + fy[:, k, None, None] * temp[:, k:k + h, :]
    return jnp.clip((acc + 64) >> 7, 0, maxv)


def _mc_pass(F, pool, kernels, mc_units, mc_hdrs, n_chunks, n_ref0,
             w, h, br, bd, trip=None):
    """Apply one MC tile class.  mc_units [CAPC, CHUNK, 4]; chunks
    [0, n_ref0) are first-reference predictions (unique destinations),
    chunks [n_ref0, n_chunks) are compound second predictions that
    average into the first pass's output.

    trip: loop trip count — defaults to n_chunks.  The batched
    multi-stream path passes the round-max here as an UNBATCHED scalar
    (shared across the vmapped stream axis) so the fori_loop keeps a
    shared trip under vmap: a per-stream trip would lower to a
    predicated while_loop whose every iteration selects over the whole
    [N, ...] carry (measured ~20x the cost of N single-stream steps).
    Chunks in [n_chunks, trip) are zero-padded and drop at landing.
    In shared-trip mode the 4x4 class runs ONE masked loop (packers
    align n_ref0 up to a G multiple so no scatter group mixes a ref0
    tile with an avg tile of the same stream).

    Landing strategy (measured on v5e, tools/profiling/scatter_floor.py):
    XLA tile scatter costs ~6 ns/element regardless of shape, so scatter
    landing is the bottleneck for large classes.  8x8/16x16 tiles land
    via GATHER instead: all chunks stage into one [CAPC*CH, h*w] buffer
    inside the fori_loop (contiguous dynamic_update_slice), a tiny
    scalar scatter builds a per-tile-cell map [3, ha/h, wa/w] (tiles of
    class h are h-aligned — partition geometry guarantees it), and one
    row-gather of the staging by the map + mask-combine lands the whole
    class (256-elem rows gather at ~90-150 GB/s; 27x faster than tile
    scatter on a dense 4K frame).  4x4 tiles (16-elem rows gather at
    only 3-10 GB/s) instead stage G chunks and pay ONE tile scatter per
    group, bounding scatter count by actual coded tiles."""
    CAPC, CH = mc_units.shape[0], mc_units.shape[1]
    ha, wa = F.shape[1], F.shape[2]
    shared = trip is not None
    if trip is None:
        trip = n_chunks

    if w >= 8:
        stage = jnp.zeros((CAPC * CH, h * w), I32)

        def body(ci, stage):
            u = jax.lax.dynamic_index_in_dim(mc_units, ci, 0, False)
            hd = jax.lax.dynamic_index_in_dim(mc_hdrs, ci, 0, False)
            out = _mc_chunk_compute(pool, kernels, hd, u, w, h, br, bd)
            return jax.lax.dynamic_update_slice(
                stage, out.reshape(CH, h * w), (ci * CH, 0))

        stage = jax.lax.fori_loop(0, trip, body, stage)
        uu = mc_units.reshape(CAPC * CH, 4)
        plane = jnp.repeat(mc_hdrs[:, 1], CH)
        dx = uu[:, 0] & 0x1FFF
        # dy stored +1: zero entries are padding (zero-page elision)
        dy = jnp.where(uu[:, 1] == 0, -(1 << 20), uu[:, 1] - 1)
        cidx = jnp.arange(CAPC * CH, dtype=I32) // CH
        TY, TX = ha // h, wa // w

        def land(F, lo, hi, is_avg):
            seldy = jnp.where((cidx >= lo) & (cidx < hi), dy, -(1 << 20))
            tmap = jnp.full((3, TY, TX), -1, I32).at[
                plane, seldy // h, dx // w].set(
                jnp.arange(CAPC * CH, dtype=I32), mode="drop")
            g = jnp.take(stage, tmap.reshape(-1).clip(0), axis=0)
            g = g.reshape(3, TY, TX, h, w).transpose(0, 1, 3, 2, 4)
            g = g.reshape(3, ha, wa)
            cov = jnp.repeat(jnp.repeat(tmap >= 0, h, axis=1), w, axis=2)
            return jnp.where(cov, (F + g + 1) >> 1 if is_avg else g, F)

        F = land(F, 0, n_ref0, False)
        return land(F, n_ref0, n_chunks, True)

    # ---- 4x4 class: group-staged scatter
    G = 4

    if shared:
        # ONE loop over G-chunk groups with a per-tile is_avg select.
        # Packers align each stream's n_ref0 up to a G multiple (empty
        # pad chunks), so within one stream a scatter group never mixes
        # a ref0 tile with an avg tile reading the same destination —
        # the avg read below always sees its ref0 prediction from an
        # earlier group.
        def group_m(g, F):
            stage = jnp.zeros((G * CH, h, w), I32)
            us = []
            pls = []
            cis = []
            for j in range(G):
                ci = g * G + j
                u = jax.lax.dynamic_index_in_dim(mc_units, ci, 0, False)
                hd = jax.lax.dynamic_index_in_dim(mc_hdrs, ci, 0, False)
                out = _mc_chunk_compute(pool, kernels, hd, u, w, h, br, bd)
                stage = jax.lax.dynamic_update_slice(stage, out,
                                                     (j * CH, 0, 0))
                us.append(u)
                pls.append(jnp.full((CH,), hd[1], I32))
                cis.append(jnp.full((CH,), ci, I32))
            uu = jnp.concatenate(us)
            plane = jnp.concatenate(pls)
            cidx = jnp.concatenate(cis)
            dx = uu[:, 0] & 0x1FFF
            dy = jnp.where(uu[:, 1] == 0, -(1 << 20), uu[:, 1] - 1)
            dy = jnp.where(cidx < n_chunks, dy, -(1 << 20))
            rows_o = dy[:, None, None] \
                + jnp.arange(h, dtype=I32)[None, :, None]
            cols_o = dx[:, None, None] \
                + jnp.arange(w, dtype=I32)[None, None, :]
            cur = F[plane[:, None, None], rows_o, cols_o]
            avg = (cur + stage + 1) >> 1
            stage = jnp.where((cidx >= n_ref0)[:, None, None], avg, stage)
            return F.at[plane[:, None, None], rows_o, cols_o].set(
                stage, mode="drop")

        return jax.lax.fori_loop(0, (trip + G - 1) // G, group_m, F)

    def group(base, limit, is_avg, F):
        stage = jnp.zeros((G * CH, h, w), I32)
        us = []
        pls = []
        valid = []
        for j in range(G):
            ci = base + j
            u = jax.lax.dynamic_index_in_dim(mc_units, ci, 0, False)
            hd = jax.lax.dynamic_index_in_dim(mc_hdrs, ci, 0, False)
            out = _mc_chunk_compute(pool, kernels, hd, u, w, h, br, bd)
            stage = jax.lax.dynamic_update_slice(stage, out, (j * CH, 0, 0))
            us.append(u)
            pls.append(jnp.full((CH,), hd[1], I32))
            valid.append(jnp.full((CH,), ci < limit))
        uu = jnp.concatenate(us)
        plane = jnp.concatenate(pls)
        vv = jnp.concatenate(valid)
        dx = uu[:, 0] & 0x1FFF
        dy = jnp.where(uu[:, 1] == 0, -(1 << 20), uu[:, 1] - 1)
        dy = jnp.where(vv, dy, -(1 << 20))
        rows_o = dy[:, None, None] + jnp.arange(h, dtype=I32)[None, :, None]
        cols_o = dx[:, None, None] + jnp.arange(w, dtype=I32)[None, None, :]
        if is_avg:
            cur = F[plane[:, None, None], rows_o, cols_o]
            stage = (cur + stage + 1) >> 1
        return F.at[plane[:, None, None], rows_o, cols_o].set(
            stage, mode="drop")

    F = jax.lax.fori_loop(
        0, (n_ref0 + G - 1) // G,
        lambda g, F: group(g * G, n_ref0, False, F), F)
    return jax.lax.fori_loop(
        0, (n_chunks - n_ref0 + G - 1) // G,
        lambda g, F: group(n_ref0 + g * G, n_chunks, True, F), F)


def _mcs_chunk_compute(pool, kernels, hd, u, br, bd):
    """Predict one chunk of SCALED-reference 4x4 tiles (vpx_scaled_2d
    parity: per-output-column/row q4 position stepping,
    vp9/common/vp9_scale.c).  u [CH, 16]: the 12 classic fields plus
    (xs, ys) = per-ref step_q4 (16 = unscaled; <=32 by the spec's 2x
    downscale limit).  Same 3-stage MXU formulation as the unscaled
    kernel, generalized: a 24-wide window covers the worst-case source
    span (x0-3 .. x0+10 for xs<=32), the horizontal banded matrix gets
    per-column taps/offsets, and the vertical 8-tap becomes a selection
    matmul with per-row phases over 14 intermediate rows."""
    N = u.shape[0]
    pwa = pool.shape[3]
    x0, y0, spx, spy = u[:, 4], u[:, 5], u[:, 6], u[:, 7]
    filt, cw, chh = u[:, 8], u[:, 9], u[:, 10]
    xs, ys = u[:, 12], u[:, 13]
    IH = 14            # ((3*32 + 15) >> 4) + 8: max intermediate rows
    WW = 24            # window width (3 segments)
    maxv = (1 << bd) - 1
    S = (pwa + WW + 8) // 8
    mdt = jnp.bfloat16 if bd == 8 else jnp.float32
    prec = None if bd == 8 else jax.lax.Precision.HIGHEST

    # wide-row gather (not dynamic_slice): see _mc_chunk_compute
    pha = pool.shape[2]
    pool_rows = pool.reshape(pool.shape[0] * pool.shape[1] * pha, pwa)
    row0 = (hd[0] * 3 + hd[1]) * pha + hd[2]
    band = jnp.take(pool_rows, row0 + jnp.arange(br, dtype=I32), axis=0)
    band_r = jnp.pad(band, ((0, 0), (0, S * 8 - pwa))).reshape(br, S, 8)
    cidx = jnp.arange(4, dtype=I32)[None, :]
    xq4 = spx[:, None] + cidx * xs[:, None]          # [N, 4]
    src_x = x0[:, None] + (xq4 >> 4)
    fxk = kernels[filt[:, None], xq4 & 15]           # [N, 4, 8]
    lo = jnp.clip(x0 - 3, 0, cw - 1)
    q = jnp.minimum(lo >> 3, S - 3)
    # window select: OH [N, 3, S] x band_r [br, S, 8] -> W [N, br, 24]
    segs = jnp.arange(S, dtype=I32)[None, None, :]
    t3 = jnp.arange(3, dtype=I32)[None, :, None]
    oh = (segs == (q[:, None, None] + t3)).astype(mdt)
    W3 = jax.lax.dot_general(
        oh, band_r.astype(mdt), (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    W = W3.transpose(0, 2, 1, 3).reshape(N, br, WW)
    # source-row selection (normative edge clamp into [0, chh-1])
    rr = jnp.clip(y0[:, None] - 3 + jnp.arange(IH, dtype=I32)[None, :],
                  0, chh[:, None] - 1) - hd[2]
    oh_r = (rr[:, :, None] == jnp.arange(br, dtype=I32)[None, None, :]
            ).astype(mdt)
    Wr = jax.lax.dot_general(
        oh_r, W.astype(mdt), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)  # [N, IH, 24]
    # horizontal banded matrix with PER-COLUMN taps and offsets:
    #   Mf[n, j, c] = sum_k fx[n, c, k] * [clip(src_x[n,c]+k-3, 0, cw-1)
    #                                      - 8q == j]
    jj = jnp.arange(WW, dtype=I32)[None, :, None]
    Mf = jnp.zeros((N, WW, 4), jnp.float32)
    for k in range(8):
        tgt = jnp.clip(src_x + k - 3, 0, cw[:, None] - 1) \
            - (q[:, None] << 3)                       # [N, 4]
        Mf = Mf + fxk[:, :, k][:, None, :] * (tgt[:, None, :] == jj)
    temp = jax.lax.dot_general(
        Wr.astype(mdt), Mf.astype(mdt), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)  # [N, IH, 4]
    temp = jnp.clip((temp.astype(I32) + 64) >> 7, 0, maxv)
    # vertical: per-row phase selection matmul over the IH temp rows
    yq4 = spy[:, None] + cidx * ys[:, None]          # [N, 4]
    ty = yq4 >> 4
    fyk = kernels[filt[:, None], yq4 & 15]           # [N, 4, 8]
    tt = jnp.arange(IH, dtype=I32)[None, None, :]
    Mv = jnp.zeros((N, 4, IH), jnp.float32)
    for k in range(8):
        Mv = Mv + fyk[:, :, k][:, :, None] * ((ty[:, :, None] + k) == tt)
    out = jax.lax.dot_general(
        Mv.astype(mdt), temp.astype(mdt), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)  # [N, 4, 4]
    return jnp.clip((out.astype(I32) + 64) >> 7, 0, maxv)


def _mcs_pass(F, pool, kernels, mc_units, mc_hdrs, n_chunks, n_ref0,
              br, bd):
    """Land the scaled-reference 4x4 class: group-staged scatter
    (same landing as the unscaled 4x4 class; this pass runs LAST so a
    compound average with a scaled ref0 sees its first prediction)."""
    CAPC, CH = mc_units.shape[0], mc_units.shape[1]
    G = 4
    h = w = 4

    def group(base, limit, is_avg, F):
        stage = jnp.zeros((G * CH, h, w), I32)
        us = []
        valid = []
        for j in range(G):
            ci = base + j
            u = jax.lax.dynamic_index_in_dim(mc_units, ci, 0, False)
            hd = jax.lax.dynamic_index_in_dim(mc_hdrs, ci, 0, False)
            out = _mcs_chunk_compute(pool, kernels, hd, u, br, bd)
            stage = jax.lax.dynamic_update_slice(stage, out, (j * CH, 0, 0))
            us.append(u)
            valid.append(jnp.full((CH,), ci < limit))
        uu = jnp.concatenate(us)
        vv = jnp.concatenate(valid)
        plane, dx = uu[:, 0], uu[:, 1]
        dy = jnp.where(uu[:, 2] == 0, -(1 << 20), uu[:, 2] - 1)
        dy = jnp.where(vv, dy, -(1 << 20))
        rows_o = dy[:, None, None] + jnp.arange(h, dtype=I32)[None, :, None]
        cols_o = dx[:, None, None] + jnp.arange(w, dtype=I32)[None, None, :]
        if is_avg:
            cur = F[plane[:, None, None], rows_o, cols_o]
            stage = (cur + stage + 1) >> 1
        return F.at[plane[:, None, None], rows_o, cols_o].set(
            stage, mode="drop")

    F = jax.lax.fori_loop(
        0, (n_ref0 + G - 1) // G,
        lambda g, F: group(g * G, n_ref0, False, F), F)
    return jax.lax.fori_loop(
        0, (n_chunks - n_ref0 + G - 1) // G,
        lambda g, F: group(n_ref0 + g * G, n_chunks, True, F), F)


# ----------------------------------------------------------------- intra


def _intra_chunk(F, R, u, bs, bd):
    """u: [CHUNK, 4] bit-packed int16 words (sign-extended to int32 by
    seg(); 50 bits of fields in 8 wire bytes):
      w0 = x0/4 | plane<<14          (x0/y0 are 4-aligned; /4 fits 14
      w1 = (y0/4 + 1) | have_up<<15   bits at the spec's 65536 max dim;
      w2 = mode | n_above<<4 | n_left<<10   y0 stored +1: an all-zero
      w3 = tl_mode | have_left<<2           record is padding)"""
    w0 = u[:, 0] & 0xFFFF
    w1 = u[:, 1] & 0xFFFF
    w2 = u[:, 2] & 0xFFFF
    w3 = u[:, 3]
    y0q = w1 & 0x7FFF
    y0 = jnp.where(y0q == 0, jnp.int32(-32768), (y0q - 1) << 2)
    return stages.intra_wave.__wrapped__(
        F, R, w0 >> 14, (w0 & 0x3FFF) << 2, y0, w2 & 15,
        (w2 >> 4) & 63, (w2 >> 10) & 63, w3 & 3, w1 >> 15,
        (w3 >> 2) & 1, bs=bs, bd=bd)


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
# The deblocking pass is a Pallas TPU kernel (ops/pallas/loopfilter.py):
# sequential row-band groups resident in VMEM, batched anti-diagonal steps,
# masks expanded cell->pixel via one-hot MXU matmuls.  Interpret mode keeps
# the identical code path running under the CPU backend for CI.


# ----------------------------------------------------------------- frame step


def make_frame_step(mi_rows: int, mi_cols: int, caps: Dict[str, int],
                    layout, lossless: bool, bd: int = 8,
                    pages_tier: int = 0, jit_wrap: bool = True,
                    pool_geom=None, ss=(1, 1), shared_trips: bool = False):
    """Build the jitted fused step for one frame geometry.

    step(pool, ring, kernels, flat_or_pages) -> (new_pool, new_ring)
      pool    [8, 3, pha, pwa] int32 device-resident reference pool
              (donated).  pool_geom=(pha, pwa) >= the frame canvas —
              references can be LARGER than the frame when scaled
              prediction (mid-stream resize / SVC) is in play; each
              pool slot holds its frame in the top-left corner and MC
              tiles clamp reads to the per-ref crop dims.
      ring    [RING, nout_ring] uint8 output ring (donated; slot =
              misc[13]); nout_ring is the POOL-geometry frame size, the
              frame's planes occupy the row prefix
      flat    [K*PAGE] int16 packed frame (pack.pack_frame), OR — when
              pages_tier > 0 — a compacted [hdr_rows + 1 + tier, PAGE]
              int16 upload whose zero pages were elided (header rows
              carry the g[K] page map; see pipeline._compact)
    The reference-pool refresh (refresh_frame_flags) and the page
    expansion happen in-step so a frame is exactly one dispatch and one
    H2D transfer (plus one batched D2H per RING frames).

    shared_trips: the step takes a 5th argument `trips` (int32 [32],
    misc-indexed) supplying every fori_loop trip count and the output
    ring slot.  The batched multi-stream path vmaps the body with
    trips UNBATCHED (the elementwise max over the round's streams), so
    all loops keep shared trip counts under vmap — see _mc_pass.
    """
    from .pack import PAGE
    ssx, ssy = ss
    ha = ((mi_rows + 7) & ~7) * 8
    wa = ((mi_cols + 7) & ~7) * 8
    pha, pwa = pool_geom if pool_geom is not None else (ha, wa)
    K = cdiv(layout.size, PAGE)

    def step(pool, ring, kernels, flat, trips=None):
        assert (trips is not None) == shared_trips
        if pages_tier:
            # gather expansion: g[K] page map (0 = the shared zero page
            # at data row 0) -> one 1 KB-row gather rebuilds the layout
            hr = cdiv(K, PAGE)
            g = flat[:hr].reshape(-1)[:K].astype(I32)
            flat = jnp.take(flat[hr:], g, axis=0).reshape(-1)

        def seg(name, dtype=I32):
            off, shape = layout.segs[name]
            n = int(np.prod(shape))
            a = jax.lax.slice(flat, (off,), (off + n,)).reshape(shape)
            return a.astype(dtype)

        misc = seg("misc")
        # trip counts: shared (unbatched round max) in batched mode,
        # per-frame misc otherwise; data bounds always come from misc
        tr = (lambda i: trips[i]) if shared_trips else (lambda i: misc[i])
        F = jnp.zeros((3, ha, wa), I32)
        R = jnp.zeros((3, ha, wa), I32)
        from .pack import COEFF_BUCKETS, COEFF_CHUNK, MISC_TRIP
        # residual transforms: fori_loop over fixed-size chunks with a
        # TRACED trip count (misc[MISC_TRIP[bucket]]) so per-frame
        # transform cost tracks actual coded content, not the bucket
        # capacity (typical frames fill 10-25% of the caps; the
        # butterfly chains are bandwidth-bound so capacity work is pure
        # waste)
        cdt = jnp.int16 if bd == 8 else I32
        for bi, (name, tx, ncoef) in enumerate(COEFF_BUCKETS):
            if lossless and name != "tx0":
                continue
            cm_all = seg(f"coeff_{name}", cdt)
            cmh_all = seg(f"coeffh_{name}") if bd > 8 else None
            pos_all = seg(f"cpos_{name}")
            CH = COEFF_CHUNK[name]
            n2 = (4 << tx) * (4 << tx)
            scan = None
            if ncoef < n2:
                scan = jnp.asarray(np.stack(
                    [np.asarray(M.SCAN_ORDERS[tx][t].scan[:ncoef],
                                np.int32) for t in range(4)]))

            def body(i, R, cm_all=cm_all, cmh_all=cmh_all, pos_all=pos_all,
                     CH=CH, tx=tx, ncoef=ncoef, n2=n2, scan=scan):
                cm = jax.lax.dynamic_slice(cm_all, (i * CH, 0), (CH, ncoef))
                if cmh_all is not None:
                    # hi/lo split (HBD coefficients exceed int16)
                    hi = jax.lax.dynamic_slice(cmh_all, (i * CH, 0),
                                               (CH, ncoef))
                    cm = (hi << 15) + cm
                pos = jax.lax.dynamic_slice(pos_all, (i * CH, 0), (CH, 4))
                if scan is not None:
                    # sparse: first-ncoef scan coefficients -> raster
                    idx = scan[pos[:, 3]]
                    full = jnp.zeros((CH, n2), cm.dtype)
                    ci = jnp.arange(CH, dtype=I32)[:, None]
                    cm = full.at[ci, idx].set(cm)
                return _residual_pass(R, cm, pos, tx, lossless, bd)

            R = jax.lax.fori_loop(0, tr(MISC_TRIP[name]), body, R)
        if "coeff_tx3c" in layout.segs:
            # 32x32 coo buckets: (raster_idx, value) pairs per unit
            # (pack.COO_PAIRS / COO16_PAIRS); pad pairs are (0, 0) and
            # redirect to an out-of-range index so they drop at the
            # scatter instead of clobbering a real DC at index 0
            from .pack import (CHUNK_TX3C, CHUNK_TX3CS, MISC_TRIP_TX3C,
                               MISC_TRIP_TX3CS)
            for segname, CH3, npairs, trip_slot in (
                    ("coeff_tx3c", CHUNK_TX3C, 64, MISC_TRIP_TX3C),
                    ("coeff_tx3cs", CHUNK_TX3CS, 16, MISC_TRIP_TX3CS)):
                if segname not in layout.segs:
                    continue
                c3_all = seg(segname, jnp.int16)
                p3_all = seg("cpos_" + segname[6:])

                def body3(i, R, c3_all=c3_all, p3_all=p3_all, CH3=CH3,
                          npairs=npairs):
                    cm = jax.lax.dynamic_slice(
                        c3_all, (i * CH3, 0), (CH3, 2 * npairs))
                    pos = jax.lax.dynamic_slice(
                        p3_all, (i * CH3, 0), (CH3, 4))
                    idx = cm[:, 0::2].astype(I32)
                    val = cm[:, 1::2].astype(jnp.int16)
                    idx = jnp.where((idx == 0) & (val == 0), 1024, idx)
                    ci = jnp.arange(CH3, dtype=I32)[:, None]
                    full = jnp.zeros((CH3, 1024), cdt)
                    full = full.at[ci, idx].set(val.astype(cdt),
                                                mode="drop")
                    return _residual_pass(R, full, pos, 3, False, bd)

                R = jax.lax.fori_loop(0, tr(trip_slot), body3, R)
        br = min(160, pha)
        trip3 = (lambda i: tr(i)) if shared_trips else (lambda i: None)
        F = _mc_pass(F, pool, kernels, seg("mc4"), seg("mc4h"),
                     misc[0], misc[23], 4, 4, br, bd, trip=trip3(0))
        F = _mc_pass(F, pool, kernels, seg("mc8"), seg("mc8h"),
                     misc[1], misc[24], 8, 8, br, bd, trip=trip3(1))
        F = _mc_pass(F, pool, kernels, seg("mc16"), seg("mc16h"),
                     misc[2], misc[25], 16, 16, br, bd, trip=trip3(2))
        # 32x32 tile class (big smooth areas at HD/4K: 4x fewer records
        # and loop iterations than landing 64x64/32x32 blocks as mc16)
        F = _mc_pass(F, pool, kernels, seg("mc32"), seg("mc32h"),
                     misc[33], misc[34], 32, 32, br, bd, trip=trip3(33))
        if "mcs" in layout.segs:
            # scaled-reference tiles (runs LAST: compound averages with
            # a scaled first reference see their ref0 prediction)
            F = _mcs_pass(F, pool, kernels, seg("mcs"), seg("mcsh"),
                          misc[14], misc[15], br, bd)
        # inter residual add over non-skip inter mi cells (mask ships
        # bit-packed: 16 mi cells per int16 word); chroma cell size
        # follows the plane subsampling
        mp = seg("mi_mask")
        m = ((mp[:, :, None] >> jnp.arange(16, dtype=I32)[None, None, :])
             & 1).reshape(mi_rows, -1)[:, :mi_cols]
        mask = jnp.zeros((3, ha, wa), jnp.bool_)
        y8 = jnp.repeat(jnp.repeat(m, 8, axis=0), 8, axis=1) != 0
        mask = mask.at[0, :mi_rows * 8, :mi_cols * 8].set(y8)
        chh_, chw_ = 8 >> ssy, 8 >> ssx
        c4 = jnp.repeat(jnp.repeat(m, chh_, axis=0), chw_, axis=1) != 0
        mask = mask.at[1, :mi_rows * chh_, :mi_cols * chw_].set(c4)
        mask = mask.at[2, :mi_rows * chh_, :mi_cols * chw_].set(c4)
        F = jnp.where(mask, jnp.clip(F + R, 0, (1 << bd) - 1), F)
        F = _intra_pass(F, R, seg("intra"), seg("chunk_bs"), tr(3), bd)
        # loop filter (pallas kernel; interpret under the CPU backend)
        from ..ops.pallas.loopfilter import lf_frame
        interp = jax.default_backend() == "cpu"
        if ss == (1, 1):
            F = lf_frame(F, seg("lfm", jnp.int16), seg("lf_thr", jnp.int16), misc[4],
                         mi_rows=mi_rows, mi_cols=mi_cols, bd=bd,
                         interpret=interp)
        elif ss == (0, 0):
            # 4:4:4 chroma deblocks through the kernel's LUMA path on
            # the chroma plane's own cell geometry (chroma SBs coincide
            # with luma SBs, so the kernel's per-SB V-then-H order is
            # exactly VP9's).  The lfm ships zeroed chroma fields, so
            # lf_frame's 4:2:0 chroma pass no-ops — but it still
            # rebuilds chroma from its 4:2:0 quarter, so capture the
            # planes FIRST.
            rc = cdiv(mi_rows, 1 << ssy)
            cc = cdiv(mi_cols, 1 << ssx)
            hac = ((rc + 7) & ~7) * 8
            wac = ((cc + 7) & ~7) * 8
            hcc, wcc = ha >> ssy, wa >> ssx
            lfmc = seg("lfm_c", jnp.int16)
            Fc = (F[1], F[2])
            F = lf_frame(F, seg("lfm", jnp.int16), seg("lf_thr", jnp.int16), misc[4],
                         mi_rows=mi_rows, mi_cols=mi_cols, bd=bd,
                         interpret=interp)
            for pch in (1, 2):
                Cp = jnp.zeros((3, hac, wac), I32)
                Cp = Cp.at[0, :hcc, :wcc].set(Fc[pch - 1][:hcc, :wcc])
                Cp = lf_frame(Cp, lfmc, seg("lf_thr", jnp.int16), misc[4], mi_rows=rc, mi_cols=cc,
                              bd=bd, interpret=interp)
                F = F.at[pch, :hcc, :wcc].set(Cp[0, :hcc, :wcc])
        else:
            # 4:2:2: chroma slices per LUMA SB are 32 px wide, so the
            # 64-px kernel order would flip overlapping V/H filters at
            # half-SB seams; the sequential-tile path replays VP9's
            # exact luma-SB-raster order (ops/device/lf_wave.py)
            from ..ops.device.lf_wave import lf_plane_tiles
            wcc = wa >> ssx
            Fc = (F[1], F[2])
            F = lf_frame(F, seg("lfm", jnp.int16), seg("lf_thr", jnp.int16), misc[4],
                         mi_rows=mi_rows, mi_cols=mi_cols, bd=bd,
                         interpret=interp)
            lfw = [seg(nm) for nm in ("lfw_v", "lfw_h", "lfw_mb",
                                      "lfw_lm", "lfw_hv")]
            for pch in (1, 2):
                P = lf_plane_tiles(Fc[pch - 1][:, :wcc], *lfw, misc[4],
                                   gx=8 >> ssx, gy=8 >> ssy, bd=bd)
                F = F.at[pch, :, :wcc].set(P)
        # in-step reference-pool refresh
        refresh = misc[5:13]
        if (pha, pwa) != (ha, wa):
            Fp = jnp.zeros((3, pha, pwa), I32).at[:, :ha, :wa].set(F)
        else:
            Fp = F
        pool = jnp.where(refresh[:, None, None, None] > 0, Fp[None], pool)
        # write the frame into its output-ring slot (fetched in one D2H per
        # RING frames: the tunnel's device->host fixed cost amortizes);
        # high bit depth rings are int16 (pixels <= 4095)
        hc, wc = ha >> ssy, wa >> ssx
        odt = jnp.uint8 if bd == 8 else jnp.int16
        out = jnp.concatenate(
            [F[0].reshape(-1), F[1, :hc, :wc].reshape(-1),
             F[2, :hc, :wc].reshape(-1)]).astype(odt)
        nout_ring = ring.shape[1]
        if out.shape[0] < nout_ring:
            # ring rows are pool-geometry sized; pad the tail
            out = jnp.zeros((nout_ring,), odt).at[:out.shape[0]].set(out)
        # dynamic_update keeps the donated ring in place; a one-hot
        # where() was tried for the batched path and measured ~2x WORSE
        # there (it materializes the whole [N, RING, nout] ring per
        # round instead of updating one row).  In shared-trips mode the
        # slot comes from the UNBATCHED trips vector (all streams of a
        # round share one slot), so under vmap this stays a
        # dynamic_update_slice instead of lowering to a scatter.
        ring = jax.lax.dynamic_update_index_in_dim(ring, out, tr(13), 0)
        return pool, ring

    if not jit_wrap:
        return step  # raw body (vmapped by the batched multi-stream path)
    return jax.jit(step, donate_argnums=(0, 1))


# Module-level step cache: steps are pure functions of the geometry key, so
# independent decoder instances (e.g. bench warmup vs timed run) share
# compilations.
_STEP_CACHE = {}
_BATCH_CACHE = {}


def get_batched_step(n_streams: int, mi_rows: int, mi_cols: int,
                     lossless: bool, bd: int = 8, pages_tier: int = 0,
                     mesh=None, tier: str = "wide"):
    """(batched_step, caps, layout) for N same-geometry streams.

    The per-frame step body is vmapped over a leading stream axis
    (pool [N,8,3,ha,wa], ring [N,RING,nout], flat [N,...]) so N streams
    reconstruct in ONE dispatch (SURVEY P7 / BASELINE config 5).
    Typical rounds run the "tight" capacity tier (small host pack
    buffers + small uploads); a round where any stream overflows tight
    escalates the WHOLE round to the "wide" variant (the other streams'
    tight flats remap by segment copy — a tight pack is a valid sparse
    wide pack).  With a `mesh`, the stream axis is sharded over the
    mesh's 'data' axis (pure data parallelism: streams are independent,
    no collectives).
    """
    from . import pack
    key = (n_streams, mi_rows, mi_cols, lossless, bd, pages_tier,
           id(mesh) if mesh is not None else None, tier)
    if key not in _BATCH_CACHE:
        caps = pack.compute_caps(mi_rows, mi_cols, tier, lossless)
        # batched rounds escalate tight packs to the wide layout by a
        # per-segment prefix copy (_remap_wide); the tight tier's
        # 16-unit intra chunks would break that (wide chunks are 64
        # units), so the batched tiers pin the 64-unit chunk
        caps["intra_chunk"] = pack.CHUNK_INTRA
        layout = pack.build_layout(caps, mi_rows, mi_cols, lossless, bd)
        body = make_frame_step(mi_rows, mi_cols, caps, layout, lossless,
                               bd, pages_tier, jit_wrap=False,
                               shared_trips=True)
        # trips (the round-max trip counts) ride UNBATCHED so every
        # fori_loop keeps a shared trip under vmap (see _mc_pass)
        vstep = jax.vmap(body, in_axes=(0, 0, None, 0, None))
        if mesh is None:
            step = jax.jit(vstep, donate_argnums=(0, 1))
        else:
            from ..parallel import stream_sharding
            data, repl = stream_sharding(mesh)
            step = jax.jit(vstep, donate_argnums=(0, 1),
                           in_shardings=(data, data, repl, data, repl),
                           out_shardings=(data, data))
        _BATCH_CACHE[key] = (step, caps, layout)
    return _BATCH_CACHE[key]


def get_frame_step(mi_rows: int, mi_cols: int, tier: str, lossless: bool,
                   bd: int = 8, pages_tier: int = 0, pool_geom=None,
                   ss=(1, 1)):
    """Cached (step, caps, layout) for one frame-geometry/cap-tier key.
    pool_geom=(pha, pwa): reference-pool canvas, >= the frame canvas
    (differs when scaled references / mid-stream resizes are live).
    ss=(ssx, ssy): chroma subsampling (profiles 1/3 run the same fused
    step with plane-parametric geometry)."""
    from . import pack
    ha = ((mi_rows + 7) & ~7) * 8
    wa = ((mi_cols + 7) & ~7) * 8
    if pool_geom is None or tuple(pool_geom) == (ha, wa):
        pool_geom = None
    ss = tuple(ss)
    key = (mi_rows, mi_cols, tier, lossless, bd, pages_tier, pool_geom,
           ss)
    if key not in _STEP_CACHE:
        pha = pool_geom[0] if pool_geom else None
        caps = pack.compute_caps(mi_rows, mi_cols, tier, lossless,
                                 pool_ha=pha, ss=ss)
        layout = pack.build_layout(caps, mi_rows, mi_cols, lossless, bd,
                                   ss=ss)
        step = make_frame_step(mi_rows, mi_cols, caps, layout, lossless,
                               bd, pages_tier, pool_geom=pool_geom, ss=ss)
        _STEP_CACHE[key] = (step, caps, layout)
    return _STEP_CACHE[key]

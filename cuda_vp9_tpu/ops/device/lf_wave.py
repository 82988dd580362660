"""Sequential-tile jnp loop filter for planes whose SB partitioning does
not match the 64x64 pallas kernel.

VP9 deblocks in LUMA-superblock raster order: all vertical edges of the
SB, then its horizontal edges (vp9_loopfilter.c loop_filter_rows).  For
a 4:2:2 chroma plane each luma SB covers a 32-wide x 64-tall tile, so
adjacent tiles' V and H filters interleave at 32-px column granularity —
an ordering the 64-px-SB kernel path cannot reproduce (its whole-SB
V-then-H order flips overlapping filters at half-SB boundaries; measured
as off-by-one pixels at those seams).  This module replays the exact
order with one fori_loop over tiles (the per-tile body is a fixed set of
static-slice filter windows; tile count is the loop trip, so compile
size is O(1) in frame area).

Filter math is the proven jnp formulation from the pre-pallas fused loop
filter (bit-exact vs vpx_dsp/loopfilter.c on the conformance corpus).
Masks/thresholds arrive as per-cell maps packed by runtime/pack._pack_lf
(bit 0 = 16-wide, 1 = 8-wide, 2 = 4-wide, 3 = interior 4x4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

I32 = jnp.int32


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


def _filter_window4(W, kind4, lim, blim, hevt, bd):
    """filter4-only window (interior 4x4 edges)."""
    mask, hev, _flat = _lf_masks_w(W, lim, blim, hevt, bd)
    mask = mask & kind4
    op1, op0, oq0, oq1 = _filter4_vals(W, mask, hev, bd)
    out = W
    out = out.at[..., 6].set(jnp.where(mask, op1, W[..., 6]))
    out = out.at[..., 7].set(jnp.where(mask, op0, W[..., 7]))
    out = out.at[..., 8].set(jnp.where(mask, oq0, W[..., 8]))
    out = out.at[..., 9].set(jnp.where(mask, oq1, W[..., 9]))
    return out


def _filter_window(W, kind16, kind8, kind4, lim, blim, hevt, bd):
    """Filter a [..., 16] window across the edge (between index 7 and 8)
    given per-row one-hot filter-kind flags."""
    mask, hev, flat = _lf_masks_w(W, lim, blim, hevt, bd)
    anyk = kind16 | kind8 | kind4
    mask = mask & anyk
    op1, op0, oq0, oq1 = _filter4_vals(W, mask, hev, bd)
    out = W
    out = out.at[..., 6].set(jnp.where(mask, op1, W[..., 6]))
    out = out.at[..., 7].set(jnp.where(mask, op0, W[..., 7]))
    out = out.at[..., 8].set(jnp.where(mask, oq0, W[..., 8]))
    out = out.at[..., 9].set(jnp.where(mask, oq1, W[..., 9]))
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


def _kinds(bits):
    """[g] int bitfield -> (k16, k8, k4, k4i) bool [g, 1] (the window
    field slices W[..., k] are [g, 8])."""
    def b(k):
        return (((bits >> k) & 1) != 0)[:, None]
    return b(0), b(1), b(2), b(3)


def _tile_pass_v(tile, bits, mb, lm, hv, gx, gy, bd):
    for i in range(gx):
        W = jax.lax.slice(tile, (8, i * 8), (8 + gy * 8, i * 8 + 16))
        W = W.reshape(gy, 8, 16)
        k16, k8, k4, k4i = _kinds(bits[:, i])
        e = lambda a: a[:, None]
        Wf = _filter_window(W, k16, k8, k4, e(lm[:, i]), e(mb[:, i]),
                            e(hv[:, i]), bd)
        Wi = jnp.zeros_like(Wf).at[..., 4:12].set(Wf[..., 8:16])
        Wif = _filter_window4(Wi, k4i, e(lm[:, i]), e(mb[:, i]),
                              e(hv[:, i]), bd)
        Wf = Wf.at[..., 10:14].set(Wif[..., 6:10])
        tile = tile.at[8:8 + gy * 8, i * 8:i * 8 + 16].set(
            Wf.reshape(gy * 8, 16))
    return tile


def _tile_pass_h(tile, bits, mb, lm, hv, gx, gy, bd):
    for j in range(gy):
        W = jax.lax.slice(tile, (j * 8, 8), (j * 8 + 16, 8 + gx * 8))
        W = W.transpose(1, 0).reshape(gx, 8, 16)
        k16, k8, k4, k4i = _kinds(bits[j, :])
        e = lambda a: a[:, None]
        Wf = _filter_window(W, k16, k8, k4, e(lm[j, :]), e(mb[j, :]),
                            e(hv[j, :]), bd)
        Wi = jnp.zeros_like(Wf).at[..., 4:12].set(Wf[..., 8:16])
        Wif = _filter_window4(Wi, k4i, e(lm[j, :]), e(mb[j, :]),
                              e(hv[j, :]), bd)
        Wf = Wf.at[..., 10:14].set(Wif[..., 6:10])
        Wt = Wf.reshape(gx * 8, 16).transpose(1, 0)
        tile = tile.at[j * 8:j * 8 + 16, 8:8 + gx * 8].set(Wt)
    return tile


def lf_plane_tiles(P, vbits, hbits, mb, lm, hv, lf_on, *,
                   gx: int, gy: int, bd: int):
    """Deblock one plane in (gy*8)x(gx*8)-px tile raster order.

    P [Hp, Wp] int32 (Hp/Wp multiples of the tile size); vbits/hbits/
    mb/lm/hv [Hp/8, Wp/8] per-cell mask bitfields and threshold values
    (zero cells no-op).  Each tile applies its vertical edges then its
    horizontal edges — the luma-SB-raster order VP9 mandates."""
    Hp, Wp = P.shape
    th, tw = gy * 8, gx * 8
    tr, tc = Hp // th, Wp // tw
    Pp = jnp.zeros((Hp + 8, Wp + 8), P.dtype).at[8:, 8:].set(P)

    def body(i, Pp):
        r = i // tc
        c = i % tc
        tile = jax.lax.dynamic_slice(Pp, (r * th, c * tw),
                                     (th + 8, tw + 8))
        vb = jax.lax.dynamic_slice(vbits, (r * gy, c * gx), (gy, gx))
        hb = jax.lax.dynamic_slice(hbits, (r * gy, c * gx), (gy, gx))
        mbt = jax.lax.dynamic_slice(mb, (r * gy, c * gx), (gy, gx))
        lmt = jax.lax.dynamic_slice(lm, (r * gy, c * gx), (gy, gx))
        hvt = jax.lax.dynamic_slice(hv, (r * gy, c * gx), (gy, gx))
        tile = _tile_pass_v(tile, vb, mbt, lmt, hvt, gx, gy, bd)
        tile = _tile_pass_h(tile, hb, mbt, lmt, hvt, gx, gy, bd)
        return jax.lax.dynamic_update_slice(Pp, tile, (r * th, c * tw))

    Pp = jax.lax.cond(
        lf_on > 0,
        lambda Pp: jax.lax.fori_loop(0, tr * tc, body, Pp),
        lambda Pp: Pp, Pp)
    return Pp[8:, 8:]

"""Host packer: FramePlan -> fixed-shape tensors for the fused frame step.

Capacities are static per frame geometry so each stream compiles once.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .. import models as M
from ..decoder import constants as C
from . import lfmeta
from . import plan as planlib
from .fused import CHUNK_INTRA, CHUNK_MC, cdiv

_INTRA_MODE_TO_TX_TYPE = np.array(
    [0, 1, 2, 0, 3, 1, 2, 2, 1, 3], np.int32)

NEED_LEFT = 1 << 1
NEED_ABOVE = 1 << 2
NEED_ABOVERIGHT = 1 << 3
EXTEND = np.array([NEED_ABOVE | NEED_LEFT, NEED_ABOVE, NEED_LEFT,
                   NEED_ABOVERIGHT, NEED_LEFT | NEED_ABOVE,
                   NEED_LEFT | NEED_ABOVE, NEED_LEFT | NEED_ABOVE,
                   NEED_LEFT, NEED_ABOVERIGHT, NEED_LEFT | NEED_ABOVE],
                  np.int32)


def compute_caps(mi_rows: int, mi_cols: int) -> Dict[str, int]:
    w4, h4 = mi_cols * 2, mi_rows * 2
    cells = w4 * h4          # luma 4x4 blocks
    total44 = cells + 2 * (cells // 4)
    caps = {}
    for tx in range(4):
        caps[f"tx{tx}"] = max(16, total44 >> (2 * tx))
    # MC tiles: worst case all-4x4 sub8x8 with compound (2 refs)
    caps["mc4"] = cdiv(max(CHUNK_MC, (cells + 2 * (cells // 4)) * 2),
                       CHUNK_MC)
    caps["mc8"] = cdiv(max(CHUNK_MC, (cells // 4 + 2 * (cells // 16)) * 2),
                       CHUNK_MC)
    # intra chunks: all-intra frame; every wave can open up to 4 bs groups
    max_units = total44
    max_waves = w4 + h4 + 2
    caps["intra"] = cdiv(max_units, CHUNK_INTRA) + 4 * max_waves
    sbr, sbc = cdiv(mi_rows, 8), cdiv(mi_cols, 8)
    caps["lf_waves"] = 2 * sbr + sbc if sbr * sbc else 0
    caps["lf_maxsb"] = min(sbr, cdiv(sbc + 1, 2)) + 1
    return caps


def pack_coeffs(plan, caps):
    """Returns (coeff[4] arrays, cpos[4] arrays)."""
    hdr = plan.hdr
    mi = plan.mi
    lossless = bool(hdr.lossless)
    out_c = []
    out_p = []
    # derive per-position tx size / type for all planes at once
    buckets = {tx: [] for tx in range(4)}
    for plane in range(3):
        eob = plan.eob_maps[plane]
        off = plan.coeff_off_maps[plane]
        ys, xs = np.nonzero(eob > 0)
        if len(ys) == 0:
            continue
        if plane:
            mi_r = np.minimum(ys, mi.mi_rows - 1)
            mi_c = np.minimum(xs, mi.mi_cols - 1)
        else:
            mi_r = ys >> 1
            mi_c = xs >> 1
        bsize = mi.sb_type[mi_r, mi_c].astype(np.int32)
        tx_y = mi.tx_size[mi_r, mi_c].astype(np.int32)
        if plane:
            tx = M.UV_TXSIZE_LOOKUP[bsize, tx_y, 1, 1]
            tt = np.zeros_like(tx)
        else:
            tx = tx_y
            if lossless:
                tt = np.zeros_like(tx)
            else:
                inter = mi.ref[mi_r, mi_c, 0] > C.INTRA_FRAME
                sub = ((ys & 1) << 1) | (xs & 1)
                mode_s = mi.bmi_mode[mi_r, mi_c, sub]
                mode_b = mi.mode[mi_r, mi_c]
                mode = np.where(bsize < C.BLOCK_8X8, mode_s, mode_b)
                mode = np.minimum(mode.astype(np.int32), 9)  # inter -> DCT
                tt = np.where(inter, 0,
                              _INTRA_MODE_TO_TX_TYPE[mode]).astype(np.int32)
        tt = np.where(tx == 3, 0, tt)
        offs = off[ys, xs]
        for t in range(4):
            sel = tx == t
            if sel.any():
                buckets[t].append((plane, ys[sel], xs[sel], offs[sel],
                                   tt[sel]))
    for t in range(4):
        cap = caps[f"tx{t}"]
        n = 4 << t
        cm = np.zeros((cap, n * n), np.int32)
        pm = np.zeros((cap, 4), np.int32)
        pm[:, 1] = -32768
        k = 0
        for plane, ys, xs, offs, tts in buckets[t]:
            cnt = len(ys)
            src = plan.coeffs[plane]
            idx = offs[:, None] + np.arange(n * n)[None, :]
            cm[k:k + cnt] = src[idx]
            pm[k:k + cnt, 0] = plane
            pm[k:k + cnt, 1] = ys * 4
            pm[k:k + cnt, 2] = xs * 4
            pm[k:k + cnt, 3] = tts
            k += cnt
        out_c.append(cm)
        out_p.append(pm)
    return out_c, out_p


def pack_mc(plan, refs, caps):
    """Returns (mc4 [C4, CHUNK, 12], n4, mc8 [C8, CHUNK, 12], n8)."""
    ref_sizes = {k: (rb.width, rb.height) if rb else None
                 for k, rb in refs.items()}
    units = planlib.build_mc_units(plan, ref_sizes)
    hdr = plan.hdr
    tiles4 = []
    tiles8 = []
    crop = {}
    for k, rb in refs.items():
        if rb is None:
            continue
        for p in range(3):
            sx = hdr.subsampling_x if p else 0
            sy = hdr.subsampling_y if p else 0
            crop[(k - 1, p)] = ((rb.width + sx) >> sx,
                                (rb.height + sy) >> sy)
    for u in units:
        cw, ch_ = crop[(u.ref_slot, u.plane)]
        base = [u.plane, 0, 0, u.ref_slot, 0, 0, u.subpel_x, u.subpel_y,
                u.filter, cw, ch_, u.is_avg]
        ts = 8 if (u.w >= 8 and u.h >= 8) else 4
        dest = tiles8 if ts == 8 else tiles4
        for ty in range(0, u.h, ts):
            for tx in range(0, u.w, ts):
                t = list(base)
                t[1] = u.dx + tx
                t[2] = u.dy + ty
                t[4] = u.x0 + tx
                t[5] = u.y0 + ty
                dest.append(t)
    def pad(tiles, cap_chunks):
        # avg tiles must run after all their ref0 partners: stable ordering
        tiles = sorted(tiles, key=lambda t: t[11])
        n = len(tiles)
        nch = max(1, cdiv(n, CHUNK_MC))
        arr = np.zeros((cap_chunks, CHUNK_MC, 12), np.int32)
        arr[:, :, 2] = -32768
        if n:
            flat = np.array(tiles, np.int32)
            a2 = arr.reshape(-1, 12)
            a2[:n] = flat
        return arr, np.int32(nch if n else 0)
    mc4, n4 = pad(tiles4, caps["mc4"])
    mc8, n8 = pad(tiles8, caps["mc8"])
    return mc4, n4, mc8, n8


def pack_intra(plan, caps):
    units, _num_waves = planlib.build_intra_units(plan)
    hdr = plan.hdr
    ss_x, ss_y = hdr.subsampling_x, hdr.subsampling_y
    aligned = [(hdr.mi_cols * 8, hdr.mi_rows * 8),
               ((hdr.mi_cols * 8) >> ss_x, (hdr.mi_rows * 8) >> ss_y),
               ((hdr.mi_cols * 8) >> ss_x, (hdr.mi_rows * 8) >> ss_y)]
    rows = []
    for u in units:
        fw, fh = aligned[u.plane]
        need = int(EXTEND[u.mode])
        bs = u.bs
        n_left = 0
        if (need & NEED_LEFT) and u.have_left:
            n_left = (fh - u.y0) if (u.bottom_clipped and u.y0 + bs > fh) \
                else bs
        n_above = 0
        if (need & (NEED_ABOVE | NEED_ABOVERIGHT)) and u.have_up:
            if need & NEED_ABOVERIGHT:
                if u.right_clipped:
                    if u.x0 + 2 * bs <= fw:
                        n_above = 2 * bs if (u.have_right and bs == 4) else bs
                    elif u.x0 + bs <= fw:
                        n_above = (fw - u.x0) if (u.have_right and bs == 4) \
                            else bs
                    else:
                        n_above = fw - u.x0
                else:
                    n_above = 2 * bs if (bs == 4 and u.have_right) else bs
            else:
                n_above = (fw - u.x0) if (u.right_clipped
                                          and u.x0 + bs > fw) else bs
        if u.have_up and (need & (NEED_ABOVE | NEED_ABOVERIGHT)):
            tl_mode = 0 if u.have_left else 1
        else:
            tl_mode = 2
        bs_idx = {4: 0, 8: 1, 16: 2, 32: 3}[bs]
        rows.append((u.wave, bs_idx, u.plane, u.x0, u.y0, u.mode, n_above,
                     n_left, tl_mode, u.have_up, u.have_left))
    cap = caps["intra"]
    chunks = np.zeros((cap, CHUNK_INTRA, 9), np.int32)
    chunks[:, :, 2] = -32768
    chunk_bs = np.zeros(cap, np.int32)
    if not rows:
        return chunks, chunk_bs, np.int32(0)
    rows.sort(key=lambda t: (t[0], t[1]))
    ci = 0
    pos = 0
    cur_key = (rows[0][0], rows[0][1])
    chunk_bs[0] = rows[0][1]
    for t in rows:
        key = (t[0], t[1])
        if key != cur_key or pos == CHUNK_INTRA:
            ci += 1
            pos = 0
            cur_key = key
            chunk_bs[ci] = t[1]
        chunks[ci, pos] = t[2:]
        pos += 1
    return chunks, chunk_bs, np.int32(ci + 1)


def pack_lf(plan, caps):
    hdr = plan.hdr
    from ..ops.ref.loopfilter import make_thresholds
    (lvl_y, vy, hy), (lvl_uv, vuv, huv) = lfmeta.build_lf_metadata(
        plan.mi, plan.seg_map, hdr)
    mb, lm, hv = make_thresholds(hdr.lf.sharpness_level)
    thr = np.stack([mb, lm, hv]).astype(np.int32)
    sbr, sbc = cdiv(hdr.mi_rows, 8), cdiv(hdr.mi_cols, 8)
    n_waves = caps["lf_waves"]
    waves = np.full((max(1, n_waves), caps["lf_maxsb"], 2), -32768,
                    np.int32)
    for w in range(n_waves):
        k = 0
        for r in range(sbr):
            c = w - 2 * r
            if 0 <= c < sbc:
                waves[w, k] = (r, c)
                k += 1
    meta_vy = [lvl_y.astype(np.int32)] + list(vy)
    meta_hy = [lvl_y.astype(np.int32)] + list(hy)
    meta_vuv = [lvl_uv.astype(np.int32)] + list(vuv)
    meta_huv = [lvl_uv.astype(np.int32)] + list(huv)
    lf_on = np.int32(1 if hdr.lf.filter_level else 0)
    return (meta_vy, meta_hy, meta_vuv, meta_huv, waves, thr, lf_on)


def inter_mask(plan):
    hdr = plan.hdr
    mi = plan.mi
    ss_x, ss_y = hdr.subsampling_x, hdr.subsampling_y
    wa = ((hdr.mi_cols + 7) & ~7) * 8
    ha = ((hdr.mi_rows + 7) & ~7) * 8
    m = (mi.ref[:, :, 0] > C.INTRA_FRAME) & (mi.skip == 0)
    mask = np.zeros((3, ha, wa), bool)
    y8 = np.repeat(np.repeat(m, 8, axis=0), 8, axis=1)
    mask[0, :y8.shape[0], :y8.shape[1]] = y8
    cm = np.repeat(np.repeat(m, 8 >> ss_y, axis=0), 8 >> ss_x, axis=1)
    mask[1, :cm.shape[0], :cm.shape[1]] = cm
    mask[2, :cm.shape[0], :cm.shape[1]] = cm
    return mask

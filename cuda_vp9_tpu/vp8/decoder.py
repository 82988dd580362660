"""VP8 keyframe decoder (RFC 6386): frame header, intra mode parse,
token decode, reconstruction, loop filter.  NumPy host oracle.

Behavior parity with the reference's vp8/decoder/{decodeframe.c,
decodemv.c,detokenize.c} and vp8/common/{reconintra.c,reconintra4x4.c,
idctllm.c,vp8_loopfilter.c,setupintrarecon.c}.  The keyframe slice is
the architecture-landing step (VERDICT round-2 item 8); inter frames
follow the same host-parse + recon shape.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..decoder.bitreader import BoolDecoder
from . import recon as R
from . import tables_gen as T


class Vp8Error(ValueError):
    pass


@dataclass
class Vp8Header:
    frame_type: int = 0
    version: int = 0
    show_frame: int = 1
    width: int = 0
    height: int = 0
    hscale: int = 0
    vscale: int = 0
    seg_enabled: int = 0
    seg_update_map: int = 0
    seg_abs_delta: int = 0
    seg_tree_probs: List[int] = field(default_factory=lambda: [255] * 3)
    seg_quant: List[int] = field(default_factory=lambda: [0] * 4)
    seg_lf: List[int] = field(default_factory=lambda: [0] * 4)
    filter_type: int = 0
    filter_level: int = 0
    sharpness: int = 0
    lf_delta_enabled: int = 0
    ref_lf_deltas: List[int] = field(default_factory=lambda: [0] * 4)
    mode_lf_deltas: List[int] = field(default_factory=lambda: [0] * 4)
    base_qindex: int = 0
    y1dc_delta: int = 0
    y2dc_delta: int = 0
    y2ac_delta: int = 0
    uvdc_delta: int = 0
    uvac_delta: int = 0
    mb_no_coeff_skip: int = 0
    prob_skip_false: int = 0


def _clamp_q(qi):
    return max(0, min(127, qi))


def _dq16(coeffs, dq):
    """Dequantize with the reference's int16 truncation (dqcoeff is a
    short array: vp8/common/dequantize.c)."""
    v = coeffs.astype(np.int64) * dq
    return ((v + 0x8000) & 0xFFFF) - 0x8000


def _dequant_factors(hdr: Vp8Header, seg_id: int):
    """(y1dc, y1ac, y2dc, y2ac, uvdc, uvac) (vp8/common/quant_common.c +
    vp8_mb_init_dequantizer segment handling)."""
    q = hdr.base_qindex
    if hdr.seg_enabled:
        if hdr.seg_abs_delta:
            q = hdr.seg_quant[seg_id]
        else:
            q = q + hdr.seg_quant[seg_id]
        q = _clamp_q(q)
    y1dc = T.DC_QLOOKUP[_clamp_q(q + hdr.y1dc_delta)]
    y1ac = T.AC_QLOOKUP[_clamp_q(q)]
    y2dc = T.DC_QLOOKUP[_clamp_q(q + hdr.y2dc_delta)] * 2
    y2ac = T.AC_QLOOKUP[_clamp_q(q + hdr.y2ac_delta)] * 155 // 100
    if y2ac < 8:
        y2ac = 8
    uvdc = T.DC_QLOOKUP[_clamp_q(q + hdr.uvdc_delta)]
    if uvdc > 132:
        uvdc = 132
    uvac = T.AC_QLOOKUP[_clamp_q(q + hdr.uvac_delta)]
    return y1dc, y1ac, y2dc, y2ac, uvdc, uvac


def _read_tree(bc, tree, probs):
    i = 0
    while True:
        i = tree[i + bc.read(probs[i >> 1])]
        if i <= 0:
            return -i


_KBANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7, 0]
_CAT_BASE = [5, 7, 11, 19, 35, 67]
_CAT_PROBS = [T.PCAT1, T.PCAT2, T.PCAT3, T.PCAT4, T.PCAT5, T.PCAT6]


def _get_coeffs(bc, probs, ctx, first, out):
    """vp8/decoder/detokenize.c GetCoeffs: returns the position of the
    last nonzero coeff plus one, and 0 if there are none (`first` is 1
    when the DC lives in the Y2 block).  probs: [8][3][11]."""
    n = first
    p = probs[_KBANDS[n]][ctx]
    if not bc.read(p[0]):
        return 0
    while True:
        n += 1
        if not bc.read(p[1]):
            p = probs[_KBANDS[n]][0]
        else:
            if not bc.read(p[2]):
                p_next = probs[_KBANDS[n]][1]
                v = 1
            else:
                if not bc.read(p[3]):
                    if not bc.read(p[4]):
                        v = 2
                    else:
                        v = 3 + bc.read(p[5])
                else:
                    if not bc.read(p[6]):
                        if not bc.read(p[7]):
                            v = 5 + bc.read(159)
                        else:
                            v = 7 + 2 * bc.read(165)
                            v += bc.read(145)
                    else:
                        # cat 0..3 here selects DCT_VAL_CATEGORY3..6
                        bit1 = bc.read(p[8])
                        bit0 = bc.read(p[9 + bit1])
                        cat = 2 * bit1 + bit0
                        v = 0
                        for pr in _CAT_PROBS[cat + 2]:
                            v += v + bc.read(pr)
                        v += 3 + (8 << cat)
                p_next = probs[_KBANDS[n]][2]
            j = T.ZIGZAG[n - 1]
            out[j] = -v if bc.read(128) else v
            p = p_next
            if n == 16 or not bc.read(p[0]):
                return n
        if n == 16:
            return 16


class Vp8KeyframeDecoder:
    """Decode a VP8 keyframe payload to (Y, U, V) uint8 planes."""

    def __init__(self):
        self.coef_probs = None

    def decode(self, data: bytes):
        if len(data) < 10:
            raise Vp8Error("truncated VP8 frame")
        hdr = Vp8Header()
        b0 = data[0] | (data[1] << 8) | (data[2] << 16)
        hdr.frame_type = b0 & 1
        hdr.version = (b0 >> 1) & 7
        hdr.show_frame = (b0 >> 4) & 1
        first_part_size = b0 >> 5
        if hdr.frame_type != 0:
            raise Vp8Error("only keyframes supported (VP8 inter pending)")
        if data[3:6] != b"\x9d\x01\x2a":
            raise Vp8Error("bad VP8 keyframe start code")
        w = data[6] | (data[7] << 8)
        h = data[8] | (data[9] << 8)
        hdr.width, hdr.hscale = w & 0x3FFF, w >> 14
        hdr.height, hdr.vscale = h & 0x3FFF, h >> 14
        if hdr.width == 0 or hdr.height == 0:
            raise Vp8Error("bad frame size")
        if 10 + first_part_size > len(data):
            raise Vp8Error("first partition overruns frame")
        bc = BoolDecoder(data, 10, first_part_size, marker=False)

        bc.read_bit()                      # colorspace
        bc.read_bit()                      # clamping type
        self._parse_segmentation(bc, hdr)
        hdr.filter_type = bc.read_bit()
        hdr.filter_level = bc.read_literal(6)
        hdr.sharpness = bc.read_literal(3)
        hdr.lf_delta_enabled = bc.read_bit()
        if hdr.lf_delta_enabled and bc.read_bit():
            for i in range(4):
                if bc.read_bit():
                    v = bc.read_literal(6)
                    hdr.ref_lf_deltas[i] = -v if bc.read_bit() else v
            for i in range(4):
                if bc.read_bit():
                    v = bc.read_literal(6)
                    hdr.mode_lf_deltas[i] = -v if bc.read_bit() else v

        # token partitions (count read from bc; sizes follow the first
        # partition in the byte stream)
        n_parts = 1 << bc.read_literal(2)
        part_base = 10 + first_part_size
        sizes_len = 3 * (n_parts - 1)
        if part_base + sizes_len > len(data):
            raise Vp8Error("partition size table overruns frame")
        parts = []
        off = part_base + sizes_len
        for i in range(n_parts):
            if i < n_parts - 1:
                o = part_base + 3 * i
                sz = data[o] | (data[o + 1] << 8) | (data[o + 2] << 16)
            else:
                sz = len(data) - off
            if off + sz > len(data) or sz < 0:
                raise Vp8Error("token partition overruns frame")
            parts.append(BoolDecoder(data, off, sz, marker=False))
            off += sz

        hdr.base_qindex = bc.read_literal(7)
        hdr.y1dc_delta = self._delta_q(bc)
        hdr.y2dc_delta = self._delta_q(bc)
        hdr.y2ac_delta = self._delta_q(bc)
        hdr.uvdc_delta = self._delta_q(bc)
        hdr.uvac_delta = self._delta_q(bc)

        bc.read_bit()                      # refresh_entropy_probs
        # coef prob updates (persistent probs reset to defaults on every
        # keyframe by init_frame)
        probs = [[[list(T.DEFAULT_COEF_PROBS[i][j][k]) for k in range(3)]
                  for j in range(8)] for i in range(4)]
        for i in range(4):
            for j in range(8):
                for k in range(3):
                    up = T.COEF_UPDATE_PROBS[i][j][k]
                    for l in range(11):
                        if bc.read(up[l]):
                            probs[i][j][k][l] = bc.read_literal(8)
        self.coef_probs = probs

        hdr.mb_no_coeff_skip = bc.read_bit()
        if hdr.mb_no_coeff_skip:
            hdr.prob_skip_false = bc.read_literal(8)

        return self._decode_mbs(data, hdr, bc, parts)

    @staticmethod
    def _delta_q(bc):
        if bc.read_bit():
            v = bc.read_literal(4)
            return -v if bc.read_bit() else v
        return 0

    def _parse_segmentation(self, bc, hdr):
        hdr.seg_enabled = bc.read_bit()
        if not hdr.seg_enabled:
            return
        hdr.seg_update_map = bc.read_bit()
        update_data = bc.read_bit()
        if update_data:
            hdr.seg_abs_delta = bc.read_bit()
            for i in range(4):
                if bc.read_bit():
                    v = bc.read_literal(7)
                    hdr.seg_quant[i] = -v if bc.read_bit() else v
            for i in range(4):
                if bc.read_bit():
                    v = bc.read_literal(6)
                    hdr.seg_lf[i] = -v if bc.read_bit() else v
        if hdr.seg_update_map:
            for i in range(3):
                hdr.seg_tree_probs[i] = (bc.read_literal(8)
                                         if bc.read_bit() else 255)

    # -------------------------------------------------------------- MBs

    def _decode_mbs(self, data, hdr, bc, parts):
        mb_cols = (hdr.width + 15) >> 4
        mb_rows = (hdr.height + 15) >> 4
        W, H = mb_cols * 16, mb_rows * 16

        # canvases with 1-px top/left and 24-px right/bottom margins
        # (vp8_setup_intra_recon: above row 127, left column 129; right
        # borders replicate per completed MB row)
        MT, ML, MR = 1, 1, 24
        Y = np.full((MT + H + MR, ML + W + MR), 127, np.uint8)
        U = np.full((MT + H // 2 + MR, ML + W // 2 + MR), 127, np.uint8)
        V = np.full((MT + H // 2 + MR, ML + W // 2 + MR), 127, np.uint8)
        for P in (Y, U, V):
            P[MT:, 0] = 129

        # per-MB side info for the loop filter
        mb_mode = np.zeros((mb_rows, mb_cols), np.int32)
        mb_skip_lf = np.zeros((mb_rows, mb_cols), bool)
        mb_seg = np.zeros((mb_rows, mb_cols), np.int32)

        # mode parse state (whole-frame pass: modes live in the first
        # partition before any tokens)
        ymodes = np.full((mb_rows, mb_cols), 0, np.int32)
        bmodes = np.zeros((mb_rows, mb_cols, 4, 4), np.int32)
        uvmodes = np.zeros((mb_rows, mb_cols), np.int32)
        skips = np.zeros((mb_rows, mb_cols), bool)
        # B_PRED above/left sub-mode context rows (B_DC_PRED outside)
        above_sub = np.zeros((mb_cols, 4), np.int32)
        for r in range(mb_rows):
            left_sub = np.zeros(4, np.int32)
            for c in range(mb_cols):
                if hdr.seg_enabled and hdr.seg_update_map:
                    p = hdr.seg_tree_probs
                    if bc.read(p[0]):
                        mb_seg[r, c] = 2 + bc.read(p[2])
                    else:
                        mb_seg[r, c] = bc.read(p[1])
                if hdr.mb_no_coeff_skip:
                    skips[r, c] = bc.read(hdr.prob_skip_false)
                ym = _read_tree(bc, T.KF_YMODE_TREE, T.KF_YMODE_PROB)
                ymodes[r, c] = ym
                if ym == 4:  # B_PRED
                    for i in range(16):
                        br, bcol = i >> 2, i & 3
                        A = (bmodes[r, c, br - 1, bcol] if br > 0
                             else above_sub[c, bcol])
                        L = (bmodes[r, c, br, bcol - 1] if bcol > 0
                             else left_sub[br])
                        m = _read_tree(bc, T.BMODE_TREE,
                                       T.KF_BMODE_PROB[A][L])
                        bmodes[r, c, br, bcol] = m
                else:
                    # fixed sub-mode context for whole-MB modes
                    # (above/left_block_mode map DC/V/H/TM -> B_*)
                    ctx = {0: 0, 1: 2, 2: 3, 3: 1}[ym]
                    bmodes[r, c, :, :] = ctx
                uvmodes[r, c] = _read_tree(bc, T.UV_MODE_TREE,
                                           T.KF_UV_MODE_PROB)
                above_sub[c] = bmodes[r, c, 3]
                left_sub[:] = bmodes[r, c, :, 3]

        # token decode + reconstruction, MB raster order
        probs = self.coef_probs
        self._above_ctx = np.zeros((mb_cols, 9), np.int32)
        for r in range(mb_rows):
            part = parts[r % len(parts)]
            left_ctx = np.zeros(9, np.int32)
            for c in range(mb_cols):
                ym = int(ymodes[r, c])
                skip = bool(skips[r, c])
                has_y2 = ym != 4
                coeffs = np.zeros((25, 16), np.int32)
                eobs = np.zeros(25, np.int32)
                a = self._above_ctx[c]
                l = left_ctx
                if skip:
                    # vp8_reset_mb_tokens_context
                    a[:8] = 0
                    l[:8] = 0
                    if has_y2:
                        a[8] = l[8] = 0
                    eobtotal = 0
                else:
                    eobtotal = 0
                    first = 0
                    if has_y2:
                        ctx = int(a[8] + l[8])
                        nz = _get_coeffs(part, probs[1], ctx, 0, coeffs[24])
                        a[8] = l[8] = int(nz > 0)
                        eobs[24] = nz
                        eobtotal += nz - 16
                        ptype = 0
                        first = 1
                    else:
                        ptype = 3
                    for i in range(16):
                        ai = i & 3
                        li = (i & 0xC) >> 2
                        ctx = int(a[ai] + l[li])
                        nz = _get_coeffs(part, probs[ptype], ctx, first,
                                         coeffs[i])
                        a[ai] = l[li] = int(nz > 0)
                        nz += first
                        eobs[i] = nz
                        eobtotal += nz
                    for i in range(16, 24):
                        ai = 4 + (((i > 19) << 1) + (i & 1))
                        li = 4 + (((i > 19) << 1) + int((i & 3) > 1))
                        ctx = int(a[ai] + l[li])
                        nz = _get_coeffs(part, probs[2], ctx, 0, coeffs[i])
                        a[ai] = l[li] = int(nz > 0)
                        eobs[i] = nz
                        eobtotal += nz
                    if eobtotal == 0:
                        # decode_macroblock: force the loop filter (and
                        # residual application) to skip on eobtotal == 0
                        skip = True
                mb_mode[r, c] = ym
                mb_skip_lf[r, c] = (ym != 4) and skip
                self._recon_mb(Y, U, V, hdr, r, c, ym,
                               bmodes[r, c], int(uvmodes[r, c]),
                               int(mb_seg[r, c]), skip, coeffs, eobs,
                               MT, ML, W)
            # extend right border for this MB row (decodeframe.c
            # yv12_extend_frame_left_right_c per row)
            y0, y1 = MT + r * 16, MT + (r + 1) * 16
            Y[y0:y1, ML + W:] = Y[y0:y1, ML + W - 1:ML + W]
            c0, c1 = MT + r * 8, MT + (r + 1) * 8
            U[c0:c1, ML + W // 2:] = U[c0:c1, ML + W // 2 - 1:ML + W // 2]
            V[c0:c1, ML + W // 2:] = V[c0:c1, ML + W // 2 - 1:ML + W // 2]
            left_ctx[:] = 0

        self._loop_filter(Y, U, V, hdr, mb_mode, mb_skip_lf, mb_seg,
                          MT, ML, W, H)

        y = Y[MT:MT + hdr.height, ML:ML + hdr.width].copy()
        u = U[MT:MT + (hdr.height + 1) // 2, ML:ML + (hdr.width + 1) // 2]
        v = V[MT:MT + (hdr.height + 1) // 2, ML:ML + (hdr.width + 1) // 2]
        return hdr, (y, u.copy(), v.copy())

    def _recon_mb(self, Y, U, V, hdr, r, c, ym, bmode, uvm, seg, skip,
                  coeffs, eobs, MT, ML, W):
        y1dc, y1ac, y2dc, y2ac, uvdc, uvac = _dequant_factors(hdr, seg)
        y0, x0 = MT + r * 16, ML + c * 16
        up = r > 0
        left = c > 0

        # chroma prediction
        cy, cx = MT + r * 8, ML + c * 8
        for P, pred_mode in ((U, uvm), (V, uvm)):
            above = P[cy - 1, cx:cx + 8]
            lcol = P[cy:cy + 8, cx - 1]
            tl = P[cy - 1, cx - 1]
            P[cy:cy + 8, cx:cx + 8] = R.mb_pred(pred_mode, above, lcol, tl,
                                                8, up, left)

        if ym == 4:  # B_PRED
            if skip:
                eobs = np.zeros(25, np.int32)
            # intra_prediction_down_copy: replicate above-right 4 pixels
            # into rows +4/+8/+12 at x+16
            ar = Y[y0 - 1, x0 + 16:x0 + 20]
            for dy in (4, 8, 12):
                Y[y0 - 1 + dy, x0 + 16:x0 + 20] = ar
            dq = np.array([y1dc] + [y1ac] * 15, np.int64)
            for i in range(16):
                br, bcol = i >> 2, i & 3
                by, bx = y0 + br * 4, x0 + bcol * 4
                above8 = Y[by - 1, bx:bx + 8]
                tl = Y[by - 1, bx - 1]
                lcol = Y[by:by + 4, bx - 1]
                pred = R.b_pred_4x4(int(bmode[br, bcol]), above8, tl, lcol)
                Y[by:by + 4, bx:bx + 4] = pred
                if eobs[i] > 1:
                    resid = R.idct4x4(_dq16(coeffs[i], dq))
                    blk = Y[by:by + 4, bx:bx + 4].astype(np.int32) + resid
                    Y[by:by + 4, bx:bx + 4] = np.clip(blk, 0, 255)
                elif eobs[i] == 1:
                    dc = (R._s16(int(coeffs[i][0]) * y1dc) + 4) >> 3
                    blk = Y[by:by + 4, bx:bx + 4].astype(np.int32) + dc
                    Y[by:by + 4, bx:bx + 4] = np.clip(blk, 0, 255)
        else:
            above = Y[y0 - 1, x0:x0 + 16]
            lcol = Y[y0:y0 + 16, x0 - 1]
            tl = Y[y0 - 1, x0 - 1]
            Y[y0:y0 + 16, x0:x0 + 16] = R.mb_pred(ym, above, lcol, tl,
                                                  16, up, left)
            if not skip:
                # Y2 then Y blocks with the walsh-distributed DCs
                if eobs[24] > 1:
                    y2 = _dq16(coeffs[24],
                               np.array([y2dc] + [y2ac] * 15, np.int64))
                    dcs = R.iwalsh4x4(y2)
                else:
                    dc0 = R._s16(int(coeffs[24][0]) * y2dc)
                    d = R._s16((dc0 + 3) >> 3)
                    dcs = np.full(16, d, np.int32)
                dq = np.array([y1dc] + [y1ac] * 15, np.int64)
                for i in range(16):
                    br, bcol = i >> 2, i & 3
                    by, bx = y0 + br * 4, x0 + bcol * 4
                    blkc = _dq16(coeffs[i], dq)
                    blkc[0] = dcs[i]
                    if eobs[i] > 1 or dcs[i]:
                        resid = R.idct4x4(blkc)
                        blk = (Y[by:by + 4, bx:bx + 4].astype(np.int32)
                               + resid)
                        Y[by:by + 4, bx:bx + 4] = np.clip(blk, 0, 255)

        if not skip:
            dqc = np.array([uvdc] + [uvac] * 15, np.int64)
            for i in range(16, 24):
                P = U if i < 20 else V
                j = i - 16 if i < 20 else i - 20
                br, bcol = j >> 1, j & 1
                by = MT + r * 8 + br * 4
                bx = ML + c * 8 + bcol * 4
                if eobs[i] > 1:
                    resid = R.idct4x4(_dq16(coeffs[i], dqc))
                    blk = P[by:by + 4, bx:bx + 4].astype(np.int32) + resid
                    P[by:by + 4, bx:bx + 4] = np.clip(blk, 0, 255)
                elif eobs[i] == 1:
                    dc = (R._s16(int(coeffs[i][0]) * uvdc) + 4) >> 3
                    blk = P[by:by + 4, bx:bx + 4].astype(np.int32) + dc
                    P[by:by + 4, bx:bx + 4] = np.clip(blk, 0, 255)

    # ------------------------------------------------------ loop filter

    def _loop_filter(self, Y, U, V, hdr, mb_mode, mb_skip_lf, mb_seg,
                     MT, ML, W, H):
        if hdr.filter_level == 0:
            return
        limits = R.lf_limits(hdr.sharpness)
        mb_rows, mb_cols = mb_mode.shape
        Yl = Y.astype(np.int32)
        Ul = U.astype(np.int32)
        Vl = V.astype(np.int32)
        for r in range(mb_rows):
            for c in range(mb_cols):
                lvl = hdr.filter_level
                if hdr.seg_enabled:
                    if hdr.seg_abs_delta:
                        lvl = hdr.seg_lf[mb_seg[r, c]]
                    else:
                        lvl = lvl + hdr.seg_lf[mb_seg[r, c]]
                    lvl = max(0, min(63, lvl))
                if hdr.lf_delta_enabled:
                    lvl += hdr.ref_lf_deltas[0]     # INTRA_FRAME
                    if mb_mode[r, c] == 4:           # B_PRED
                        lvl += hdr.mode_lf_deltas[0]
                    lvl = max(0, min(63, lvl))
                if lvl == 0:
                    continue
                blim, mblim, lim = limits[lvl]
                thr = R.hev_threshold(0, lvl)
                skip = bool(mb_skip_lf[r, c])
                y0, x0 = MT + r * 16, ML + c * 16
                cy, cx = MT + r * 8, ML + c * 8
                if hdr.filter_type == 0:   # normal
                    if c > 0:
                        R._edge_v(Yl, y0, x0, 16, mblim, lim, thr, True)
                        R._edge_v(Ul, cy, cx, 8, mblim, lim, thr, True)
                        R._edge_v(Vl, cy, cx, 8, mblim, lim, thr, True)
                    if not skip:
                        for dx in (4, 8, 12):
                            R._edge_v(Yl, y0, x0 + dx, 16, blim, lim,
                                      thr, False)
                        R._edge_v(Ul, cy, cx + 4, 8, blim, lim, thr, False)
                        R._edge_v(Vl, cy, cx + 4, 8, blim, lim, thr, False)
                    if r > 0:
                        R._edge_h(Yl, y0, x0, 16, mblim, lim, thr, True)
                        R._edge_h(Ul, cy, cx, 8, mblim, lim, thr, True)
                        R._edge_h(Vl, cy, cx, 8, mblim, lim, thr, True)
                    if not skip:
                        for dy in (4, 8, 12):
                            R._edge_h(Yl, y0 + dy, x0, 16, blim, lim,
                                      thr, False)
                        R._edge_h(Ul, cy + 4, cx, 8, blim, lim, thr, False)
                        R._edge_h(Vl, cy + 4, cx, 8, blim, lim, thr, False)
                else:                       # simple: luma only
                    if c > 0:
                        R._simple_edge(Yl, y0, x0, False, mblim)
                    if not skip:
                        for dx in (4, 8, 12):
                            R._simple_edge(Yl, y0, x0 + dx, False, blim)
                    if r > 0:
                        R._simple_edge(Yl, y0, x0, True, mblim)
                    if not skip:
                        for dy in (4, 8, 12):
                            R._simple_edge(Yl, y0 + dy, x0, True, blim)
        Y[:] = Yl.astype(np.uint8)
        U[:] = Ul.astype(np.uint8)
        V[:] = Vl.astype(np.uint8)

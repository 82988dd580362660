"""Host-side loop-filter metadata: per-cell filter levels and edge masks.

Vectorized numpy port of the mask construction in
vp9_filter_block_plane_non420 (vp9/common/vp9_loopfilter.c:1080) — the
device loop filter consumes these dense mask planes directly, so the whole
deblocking pass runs as one jitted computation.

Outputs per plane set:
  y:  lfl [R, C]  level per 8x8 cell
      vert (m16, m8, m4, m4i) and horz (h16, h8, h4, h4i): bool [R, C]
  uv: same at [R2, C2] (R2 = ceil(R/2)) for each of U/V (identical masks,
      one copy).
"""

from __future__ import annotations

import numpy as np

from .. import models as M
from ..decoder import constants as C
from ..ops.ref.loopfilter import MODE_LF_LUT, build_lvl_table


def build_lf_metadata(mi, seg_map, hdr):
    lf = hdr.lf
    R, Cc = hdr.mi_rows, hdr.mi_cols
    lvl_tab = build_lvl_table(lf.filter_level, lf, hdr.seg)

    sb_type = mi.sb_type.astype(np.int32)
    skip = mi.skip.astype(bool)
    ref0 = mi.ref[:, :, 0].astype(np.int32)
    is_inter = ref0 > C.INTRA_FRAME
    tx_y = mi.tx_size.astype(np.int32)
    seg_id = mi.segment_id.astype(np.int32)
    mode_lf = np.asarray(MODE_LF_LUT, np.int32)[mi.mode.astype(np.int32)]

    lvl = lvl_tab[seg_id, np.maximum(ref0, 0), mode_lf].astype(np.int32)

    n4w = M.NUM_4X4_W[sb_type]
    n4h = M.NUM_4X4_H[sb_type]
    n8w = M.NUM_8X8_W[sb_type]
    n8h = M.NUM_8X8_H[sb_type]
    skip_this = skip & is_inter

    cgrid = np.arange(Cc)[None, :] & 7          # c within SB
    rgrid = np.arange(R)[:, None] & 7
    block_edge_left = np.where(n4w > 1, (cgrid & (n8w - 1)) == 0, True)
    block_edge_above = np.where(n4h > 1, (rgrid & (n8h - 1)) == 0, True)
    skip_c = skip_this & ~block_edge_left
    skip_r = skip_this & ~block_edge_above

    def plane_masks(ssx, ssy=None, luma=None):
        """Cell masks for one plane at (ssx, ssy) subsampling (cells on
        the plane's own 8x8 grid; asymmetric ss covers 4:2:2)."""
        if ssy is None:
            ssy = ssx          # legacy symmetric call
        if luma is None:
            luma = not (ssx or ssy)
        if ssx or ssy or not luma:
            sl = np.s_[::1 << ssy, ::1 << ssx]
            tx = M.UV_TXSIZE_LOOKUP[sb_type[sl], tx_y[sl], ssx, ssy]
            sc = skip_c[sl]
            sr = skip_r[sl]
            st = skip_this[sl]
            lv = lvl[sl]
            rows = np.arange(0, R, 1 << ssy)
            cols = np.arange(0, Cc, 1 << ssx)
            cpos = (cols[None, :] & 7) >> ssx   # c within SB, plane units
            rpos = (rows[:, None] & 7) >> ssy
            last_col = (cols[None, :] == (Cc - 1)) if ssx \
                else np.zeros((1, len(cols)), bool)
            last_row = (rows[:, None] == (R - 1)) if ssy \
                else np.zeros((len(rows), 1), bool)
        else:
            tx = tx_y
            sc, sr, st, lv = skip_c, skip_r, skip_this, lvl
            cpos = cgrid
            rpos = rgrid
            last_col = np.zeros_like(sc)
            last_row = np.zeros_like(sc)
        nz = lv > 0
        m16 = np.zeros_like(nz)
        m8 = np.zeros_like(nz)
        m4 = np.zeros_like(nz)
        m4i = np.zeros_like(nz)
        h16 = np.zeros_like(nz)
        h8 = np.zeros_like(nz)
        h4 = np.zeros_like(nz)
        # vertical
        c32 = (tx == 3) & ~sc & ((cpos & 3) == 0)
        m16 |= c32 & ~last_col
        m8 |= c32 & last_col
        c16 = (tx == 2) & ~sc & ((cpos & 1) == 0)
        m16 |= c16 & ~last_col
        m8 |= c16 & last_col
        low = tx <= 1
        c8 = low & ~sc & ((tx == 1) | ((cpos & 3) == 0))
        m8 |= c8
        m4 |= low & ~sc & ~((tx == 1) | ((cpos & 3) == 0))
        m4i |= low & (tx < 1) & ~st & ~last_col
        # horizontal
        r32 = (tx == 3) & ~sr & ((rpos & 3) == 0)
        h16 |= r32 & ~last_row
        h8 |= r32 & last_row
        r16 = (tx == 2) & ~sr & ((rpos & 1) == 0)
        h16 |= r16 & ~last_row
        h8 |= r16 & last_row
        r8 = low & ~sr & ((tx == 1) | ((rpos & 3) == 0))
        h8 |= r8
        h4 |= low & ~sr & ~((tx == 1) | ((rpos & 3) == 0))
        h4i = m4i & ~last_row   # skip_border_4x4_r kills interior horz
        for m in (m16, m8, m4, m4i, h16, h8, h4, h4i):
            m &= nz
        # frame edges
        m16[:, 0] = m8[:, 0] = m4[:, 0] = False
        h16[0, :] = h8[0, :] = h4[0, :] = False
        return lv, (m16, m8, m4, m4i), (h16, h8, h4, h4i)

    y = plane_masks(0, 0, luma=True)
    uv = plane_masks(hdr.subsampling_x, hdr.subsampling_y, luma=False)
    return y, uv

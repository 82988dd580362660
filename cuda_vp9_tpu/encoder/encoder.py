"""VP9 encoder: intra-only (keyframe) fixed-QP bitstream writer.

First slice of the reference's vp9/encoder/ (SURVEY S19 — vp9_encoder.c,
vp9_bitstream.c `write_uncompressed_header`/`write_compressed_header`/
`pack_mb_tokens`, vp9_cx_iface.c).  TPU-framework counterpart design:

- every frame is a keyframe with error_resilient_mode=1, so no backward
  adaptation and no frame-context bookkeeping is needed;
- a fixed partition grid (default 16x16 blocks, forced splits at frame
  edges) with per-block intra mode search over DC/V/H/TM by SAD;
- forward transforms derived from the repo's own normative inverse
  (encoder/transforms.py), quantization against the normative dequant
  tables, tokens written by the decode-tree mirror (encoder/tokenize.py);
- the in-loop reconstruction mirrors `ops/ref/recon._recon_intra_block`
  exactly, so prediction feedback matches any conformant decoder,
  bit-for-bit;
- loop filter level is 0 (valid; the decoder then skips filtering).

The produced stream is validated two ways in tests/test_encoder.py: this
repo's own decoder and the normative libavcodec vp9 decoder must produce
identical frame MD5s, and PSNR vs the source must clear a floor.
"""

from __future__ import annotations

import numpy as np

from .. import models as M
from ..decoder import constants as C
from .bitwriter import BitWriter, BoolEncoder, tree_paths
from . import tokenize
from .transforms import fwd_txfm2d, fwd_wht2d
from ..ops.ref import intra
from ..ops.ref import transforms as inv

_INTRA_MODE_TO_TX_TYPE = [C.DCT_DCT, C.ADST_DCT, C.DCT_ADST, C.DCT_DCT,
                          C.ADST_ADST, C.ADST_DCT, C.DCT_ADST, C.DCT_ADST,
                          C.ADST_DCT, C.ADST_ADST]

_PARTITION_PATHS = tree_paths(M.PARTITION_TREE)
_INTRA_MODE_PATHS = tree_paths(M.INTRA_MODE_TREE)

# default intra mode search candidates (cheap, directional spread)
_MODE_CANDIDATES = (C.DC_PRED, C.V_PRED, C.H_PRED, C.TM_PRED)


class Vp9Encoder:
    """Intra-only fixed-QP VP9 encoder.

    Profiles 0 (8-bit 4:2:0) and 2 (10/12-bit 4:2:0).  `block_size` is the
    fixed coding block size (BLOCK_8X8 / 16X16 / 32X32 / 64X64).
    """

    def __init__(self, width: int, height: int, base_qindex: int = 60,
                 bit_depth: int = 8, block_size: int = C.BLOCK_16X16,
                 lossless: bool = False, mode_search: bool = True):
        if not (0 < width < 65536 and 0 < height < 65536):
            raise ValueError("bad frame size")
        self.width = width
        self.height = height
        self.bit_depth = bit_depth
        self.profile = 0 if bit_depth == 8 else 2
        self.lossless = lossless
        self.base_qindex = 0 if lossless else max(1, min(255, base_qindex))
        self.block_size = block_size
        self.mode_search = mode_search

        self.mi_cols = (width + 7) >> C.MI_SIZE_LOG2
        self.mi_rows = (height + 7) >> C.MI_SIZE_LOG2
        self.sb_cols = (self.mi_cols + 7) >> 3
        self.sb_rows = (self.mi_rows + 7) >> 3

        # tile columns: the spec's minimum for this width
        sb64_cols = self.sb_cols
        log2 = 0
        while (C.MAX_TILE_WIDTH_B64 << log2) < sb64_cols:
            log2 += 1
        self.log2_tile_cols = log2
        max_log2 = 1
        while (sb64_cols >> max_log2) >= C.MIN_TILE_WIDTH_B64:
            max_log2 += 1
        self.max_log2_tile_cols = max_log2 - 1

        # dequant values (normative tables; y only deltas = 0)
        dcq, acq = M.DC_QLOOKUP[bit_depth], M.AC_QLOOKUP[bit_depth]
        q = self.base_qindex
        self.dq_y = (int(dcq[q]), int(acq[q]))
        self.dq_uv = (int(dcq[q]), int(acq[q]))

        self.fc = M.FrameContext.default()
        self.coef_probs_list = self.fc.coef.tolist()
        self.skip_probs = self.fc.skip.tolist()
        self.kf_partition_probs = M.KF_PARTITION_PROBS.tolist()
        self.kf_y_probs = M.KF_Y_MODE_PROB.tolist()
        self.kf_uv_probs = M.KF_UV_MODE_PROB.tolist()
        self.scans = M.SCAN_ORDERS

    # ------------------------------------------------------------ frame

    def encode_frame(self, planes) -> bytes:
        """Encode [y, u, v] planes (uint8/uint16, crop dims) as a keyframe."""
        st = _FrameState(self, planes)
        tile_data = self._encode_tiles(st)
        comp = self._compressed_header()
        unc = self._uncompressed_header(len(comp))
        self._last_recon = st.recon  # in-loop reconstruction (PSNR probes)
        return unc + comp + tile_data

    _last_recon = None

    # ----------------------------------------------------------- headers

    def _uncompressed_header(self, comp_size: int) -> bytes:
        """Mirror of parse_uncompressed_header (decoder/headers.py:261)."""
        wb = BitWriter()
        wb.f(C.VP9_FRAME_MARKER, 2)
        wb.write_bit(self.profile & 1)
        wb.write_bit((self.profile >> 1) & 1)
        wb.write_bit(0)              # show_existing_frame
        wb.write_bit(C.KEY_FRAME)    # frame_type
        wb.write_bit(1)              # show_frame
        wb.write_bit(1)              # error_resilient_mode
        for b in C.VP9_SYNC_CODE:
            wb.f(b, 8)
        if self.profile >= 2:
            wb.write_bit(0 if self.bit_depth == 10 else 1)
        wb.f(C.CS_BT_601, 3)         # color_space
        wb.write_bit(0)              # color_range (studio)
        # profile 0/2: 4:2:0 implied, no subsampling bits
        wb.f(self.width - 1, 16)
        wb.f(self.height - 1, 16)
        wb.write_bit(0)              # render size == frame size
        # error_resilient: no refresh_frame_context/frame_parallel bits
        wb.f(0, C.FRAME_CONTEXTS_LOG2)  # frame_context_idx
        # loop filter: level 0 (decoder skips filtering)
        wb.f(0, 6)                   # filter_level
        wb.f(0, 3)                   # sharpness
        wb.write_bit(0)              # mode_ref_delta_enabled
        # quantization
        wb.f(self.base_qindex, 8)
        wb.write_bit(0)              # y_dc_delta_q
        wb.write_bit(0)              # uv_dc_delta_q
        wb.write_bit(0)              # uv_ac_delta_q
        wb.write_bit(0)              # segmentation enabled
        # tile info: unary-ish increment bits from min to chosen (== min)
        if self.log2_tile_cols < self.max_log2_tile_cols:
            wb.write_bit(0)          # stop at min_log2_tile_cols
        wb.write_bit(0)              # log2_tile_rows = 0
        wb.f(comp_size, 16)          # first partition size
        return wb.data()

    def _compressed_header(self) -> bytes:
        """Keyframe compressed header with zero probability updates
        (mirror of read_compressed_header, decoder/compressed_header.py)."""
        w = BoolEncoder()
        if not self.lossless:
            w.write_literal(C.ALLOW_32X32, 2)
            w.write_bit(0)           # not TX_MODE_SELECT
        # coef prob update flags: one bit per tx size <= biggest tx
        n_tx = 1 if self.lossless else (C.TX_32X32 + 1)
        for _ in range(n_tx):
            w.write_bit(0)
        for _ in range(C.SKIP_CONTEXTS):
            w.write(0, C.DIFF_UPDATE_PROB)
        return w.stop()

    # ------------------------------------------------------------- tiles

    def _encode_tiles(self, st: "_FrameState") -> bytes:
        tile_cols = 1 << self.log2_tile_cols
        chunks = []
        for tc in range(tile_cols):
            col_start = _tile_offset(tc, self.mi_cols, self.log2_tile_cols)
            col_end = _tile_offset(tc + 1, self.mi_cols, self.log2_tile_cols)
            w = BoolEncoder()
            st.tile_col_start = col_start
            for mi_row in range(0, self.mi_rows, C.MI_BLOCK_SIZE):
                st.zero_left_ctx()
                for mi_col in range(col_start, col_end, C.MI_BLOCK_SIZE):
                    self._encode_partition(st, w, mi_row, mi_col,
                                           C.BLOCK_64X64, 4)
            chunks.append(w.stop())
        out = bytearray()
        for i, c in enumerate(chunks):
            if i != len(chunks) - 1:
                out += len(c).to_bytes(4, "big")
            out += c
        return bytes(out)

    # --------------------------------------------------------- partition

    def _encode_partition(self, st, w, mi_row, mi_col, bsize, n4x4_l2):
        """Mirror of tiles._decode_partition with a fixed target size."""
        if mi_row >= self.mi_rows or mi_col >= self.mi_cols:
            return
        n8x8_l2 = n4x4_l2 - 1
        num_8x8_wh = 1 << n8x8_l2
        hbs = num_8x8_wh >> 1
        has_rows = (mi_row + hbs) < self.mi_rows
        has_cols = (mi_col + hbs) < self.mi_cols

        # choose: NONE once we reach the target size AND the block fits;
        # SPLIT otherwise (partial nodes always split until everything fits)
        fits = has_rows and has_cols
        if bsize <= self.block_size and fits:
            partition = C.PARTITION_NONE
        elif not hbs:
            partition = C.PARTITION_NONE  # 8x8 leaf always fits
        else:
            partition = C.PARTITION_SPLIT

        ctx = _partition_ctx(st, mi_row, mi_col, n8x8_l2)
        probs = self.kf_partition_probs[ctx]
        if has_rows and has_cols:
            w.write_tree(M.PARTITION_TREE, probs, _PARTITION_PATHS, partition)
        elif not has_rows and has_cols:
            w.write(1 if partition == C.PARTITION_SPLIT else 0, probs[1])
        elif has_rows and not has_cols:
            w.write(1 if partition == C.PARTITION_SPLIT else 0, probs[2])
        # neither: forced SPLIT, no bits

        subsize = int(M.SUBSIZE_LOOKUP[partition][bsize])
        if partition == C.PARTITION_NONE:
            self._encode_block(st, w, mi_row, mi_col, subsize,
                               max(n4x4_l2, 1), max(n4x4_l2, 1))
        else:  # SPLIT
            self._encode_partition(st, w, mi_row, mi_col, subsize, n8x8_l2)
            self._encode_partition(st, w, mi_row, mi_col + hbs, subsize,
                                   n8x8_l2)
            self._encode_partition(st, w, mi_row + hbs, mi_col, subsize,
                                   n8x8_l2)
            self._encode_partition(st, w, mi_row + hbs, mi_col + hbs,
                                   subsize, n8x8_l2)

        if bsize >= C.BLOCK_8X8 and (bsize == C.BLOCK_8X8
                                     or partition != C.PARTITION_SPLIT):
            _update_partition_ctx(st, mi_row, mi_col, subsize, num_8x8_wh)

    # ------------------------------------------------------------- block

    def _encode_block(self, st, w, mi_row, mi_col, bsize, bwl, bhl):
        bd = self.bit_depth
        bw_mi = 1 << (bwl - 1)
        bh_mi = 1 << (bhl - 1)
        x_mis = min(bw_mi, self.mi_cols - mi_col)
        y_mis = min(bh_mi, self.mi_rows - mi_row)
        mb_to_right = (self.mi_cols - bw_mi - mi_col) * 64
        mb_to_bottom = (self.mi_rows - bh_mi - mi_row) * 64

        tx_size_y = int(M.MAX_TXSIZE_LOOKUP[bsize]) if not self.lossless \
            else C.TX_4X4

        # ---- mode decision (whole-block SAD approximation)
        y_mode = C.DC_PRED
        uv_mode = C.DC_PRED
        if self.mode_search:
            y_mode = self._pick_mode(st, 0, mi_row, mi_col, bsize, bwl, bhl,
                                     mb_to_right, mb_to_bottom)
            uv_mode = y_mode

        # ---- compute + reconstruct (mirror of recon._recon_intra_block)
        tx_blocks = []  # (plane, row, col, tx_size, levels, tx_type)
        eobtotal_nz = False
        for plane in range(3):
            sx = 1 if plane else 0
            sy = 1 if plane else 0
            recon = st.recon[plane]
            src = st.src[plane]
            fw, fh = st.aligned_dims[plane]
            tx_size = tx_size_y if plane == 0 else \
                int(M.UV_TXSIZE_LOOKUP[bsize][tx_size_y][sx][sy])
            n4_w = (1 << bwl) >> sx
            n4_h = (1 << bhl) >> sy
            n4_wl = bwl - sx
            step = 1 << tx_size
            max_bw = n4_w + (mb_to_right >> (5 + sx) if mb_to_right < 0
                             else 0)
            max_bh = n4_h + (mb_to_bottom >> (5 + sy) if mb_to_bottom < 0
                             else 0)
            bx4 = (mi_col * 2) >> sx
            by4 = (mi_row * 2) >> sy
            mode = y_mode if plane == 0 else uv_mode
            bs = 4 << tx_size
            have_up_blk = mi_row > 0
            have_left_blk = mi_col > st.tile_col_start
            dq = self.dq_y if plane == 0 else self.dq_uv
            for row in range(0, max_bh, step):
                for col in range(0, max_bw, step):
                    x0 = (bx4 + col) * 4
                    y0 = (by4 + row) * 4
                    have_up = (row > 0) or have_up_blk
                    have_left = (col > 0) or have_left_blk
                    have_right = (col + step) < (1 << n4_wl)
                    above, tl, left = intra.build_edges(
                        recon, fw, fh, x0, y0, bs, mode, have_up, have_left,
                        have_right, mb_to_right < 0, mb_to_bottom < 0, bd)
                    pred = intra.predict(mode, bs, above, tl, left,
                                         have_left, have_up, bd)
                    resid = (src[y0:y0 + bs, x0:x0 + bs].astype(np.int64)
                             - pred)
                    tx_type = (C.DCT_DCT if (plane or self.lossless)
                               else _INTRA_MODE_TO_TX_TYPE[mode])
                    if self.lossless:
                        # exact integer WHT levels (dequant at q0 is 4,
                        # the iwht input >>2 undoes it bit-exactly)
                        levels = fwd_wht2d(resid[None])[0].astype(np.int32)
                    else:
                        cf = fwd_txfm2d(resid[None], tx_size, tx_type)
                        levels = tokenize.quantize_block(
                            cf[0], dq[0], dq[1], tx_size, bd)
                    recon[y0:y0 + bs, x0:x0 + bs] = pred
                    if levels.any():
                        eobtotal_nz = True
                        # dequant + inverse = what the decoder adds
                        dq_shift = 1 if tx_size == C.TX_32X32 else 0
                        dqv = np.full(levels.shape, dq[1], np.int64)
                        dqv[0] = dq[0]
                        dqc = (np.sign(levels)
                               * ((np.abs(levels) * dqv) >> dq_shift))
                        dqc = ((dqc + (1 << 31)) % (1 << 32)) - (1 << 31)
                        if self.lossless:
                            res = inv.inv_wht2d(
                                dqc.astype(np.int32)[None], bd)[0]
                        else:
                            res = inv.inv_txfm2d(
                                dqc.astype(np.int32)[None], tx_size,
                                tx_type, bd)[0]
                        region = recon[y0:y0 + bs, x0:x0 + bs]
                        region[:] = np.clip(
                            region.astype(np.int64) + res, 0,
                            (1 << bd) - 1)
                    tx_blocks.append((plane, row, col, tx_size, levels,
                                      tx_type, step, max_bw, max_bh))

        skip = 0 if eobtotal_nz else 1

        # ---- write syntax (mirror of read_mode_info + _detoken_block)
        above_mi = (mi_row - 1, mi_col) if mi_row > 0 else None
        left_mi = (mi_row, mi_col - 1) if mi_col > st.tile_col_start \
            else None
        skip_ctx = ((st.skip_grid[above_mi] if above_mi else 0)
                    + (st.skip_grid[left_mi] if left_mi else 0))
        w.write(skip, self.skip_probs[skip_ctx])
        # tx_size: tx_mode != TX_MODE_SELECT -> no bits
        a_mode = int(st.mode_grid[above_mi]) if above_mi else C.DC_PRED
        l_mode = int(st.mode_grid[left_mi]) if left_mi else C.DC_PRED
        w.write_tree(M.INTRA_MODE_TREE, self.kf_y_probs[a_mode][l_mode],
                     _INTRA_MODE_PATHS, y_mode)
        w.write_tree(M.INTRA_MODE_TREE, self.kf_uv_probs[y_mode],
                     _INTRA_MODE_PATHS, uv_mode)

        if skip:
            _reset_skip_ctx(st, mi_row, mi_col, bwl, bhl)
        else:
            for (plane, row, col, tx_size, levels, tx_type, step,
                 max_bw, max_bh) in tx_blocks:
                sx = 1 if plane else 0
                sy = 1 if plane else 0
                plane_type = 1 if plane else 0
                above = st.above_ctx[plane]
                left = st.left_ctx[plane]
                apos = (mi_col * 2) >> sx
                lpos = ((mi_row * 2) & 15) >> sy
                n4_w = (1 << bwl) >> sx
                n4_h = (1 << bhl) >> sy
                clip_w = max_bw if mb_to_right < 0 else 0
                clip_h = max_bh if mb_to_bottom < 0 else 0
                if tx_size == C.TX_4X4:
                    ctx = int(above[apos + col] != 0) + \
                        int(left[lpos + row] != 0)
                else:
                    ctx = int(above[apos + col:apos + col + step].any()) + \
                        int(left[lpos + row:lpos + row + step].any())
                sc = self.scans[tx_size][
                    tx_type if not (plane or self.lossless) else C.DCT_DCT]
                coef_probs = self.coef_probs_list[tx_size][plane_type][0]
                eob = tokenize.encode_coefs(
                    w, coef_probs, levels, tx_size, ctx,
                    sc.scan.tolist(), sc.neighbors.reshape(-1).tolist(),
                    self.bit_depth)
                nz = 1 if eob > 0 else 0
                sh_a = (step - (clip_w - col)) if (clip_w
                                                   and step + col > clip_w) \
                    else 0
                sh_l = (step - (clip_h - row)) if (clip_h
                                                   and step + row > clip_h) \
                    else 0
                above[apos + col:apos + col + step] = 0
                above[apos + col:apos + col + step - sh_a] = nz
                left[lpos + row:lpos + row + step] = 0
                left[lpos + row:lpos + row + step - sh_l] = nz

        # ---- mi grid updates over the block extent (replicate)
        sl = np.s_[mi_row:mi_row + y_mis, mi_col:mi_col + x_mis]
        st.mode_grid[sl] = y_mode
        st.skip_grid[sl] = skip

    def _pick_mode(self, st, plane, mi_row, mi_col, bsize, bwl, bhl,
                   mb_to_right, mb_to_bottom):
        """Whole-block single-prediction SAD over the mode candidates.

        Approximates per-tx-block prediction (no recon feedback inside the
        block); only mode CHOICE depends on it, so any error costs quality,
        never correctness."""
        bd = self.bit_depth
        recon = st.recon[plane]
        src = st.src[plane]
        fw, fh = st.aligned_dims[plane]
        x0 = mi_col * 8
        y0 = mi_row * 8
        have_up = mi_row > 0
        have_left = mi_col > st.tile_col_start
        # probe with one square predictor over the block (cap 32x32)
        probe = min((1 << bwl) * 4, 32)
        best_mode, best_sad = C.DC_PRED, None
        s = src[y0:y0 + probe, x0:x0 + probe].astype(np.int64)
        for mode in _MODE_CANDIDATES:
            try:
                above, tl, left = intra.build_edges(
                    recon, fw, fh, x0, y0, probe, mode, have_up, have_left,
                    False, mb_to_right < 0, mb_to_bottom < 0, bd)
                pred = intra.predict(mode, probe, above, tl, left,
                                     have_left, have_up, bd)
            except Exception:
                continue
            sad = int(np.abs(s - pred[:s.shape[0], :s.shape[1]]).sum())
            if best_sad is None or sad < best_sad:
                best_mode, best_sad = mode, sad
        return best_mode


# ----------------------------------------------------------- frame state

class _FrameState:
    def __init__(self, enc: Vp9Encoder, planes):
        self.enc = enc
        mi_rows, mi_cols = enc.mi_rows, enc.mi_cols
        wa = ((mi_cols + 7) & ~7) * 8
        ha = ((mi_rows + 7) & ~7) * 8
        w, h = mi_cols * 8, mi_rows * 8
        self.aligned_dims = [(w, h), (w >> 1, h >> 1), (w >> 1, h >> 1)]
        self.recon = [np.zeros((ha, wa), np.uint16),
                      np.zeros((ha >> 1, wa >> 1), np.uint16),
                      np.zeros((ha >> 1, wa >> 1), np.uint16)]
        # source padded to the aligned dims by edge replication
        self.src = []
        for p in range(3):
            sp = np.asarray(planes[p])
            th, tw = self.recon[p].shape
            padded = np.zeros((th, tw), np.uint16)
            sh, sw = min(sp.shape[0], th), min(sp.shape[1], tw)
            padded[:sh, :sw] = sp[:sh, :sw]
            if sw < tw:
                padded[:sh, sw:] = padded[:sh, sw - 1:sw]
            if sh < th:
                padded[sh:, :] = padded[sh - 1:sh, :]
            self.src.append(padded)

        self.mode_grid = np.full((mi_rows, mi_cols), C.DC_PRED, np.int8)
        self.skip_grid = np.zeros((mi_rows, mi_cols), np.int8)

        aligned = (mi_cols + 7) & ~7
        self.above_ctx = [np.zeros(((aligned * 2) >> (1 if p else 0)) + 8,
                                   np.uint8) for p in range(3)]
        self.left_ctx = [np.zeros(16 >> (1 if p else 0), np.uint8)
                         for p in range(3)]
        self.above_seg_ctx = np.zeros(aligned + 8, np.uint8)
        self.left_seg_ctx = np.zeros(8, np.uint8)
        self.tile_col_start = 0

    def zero_left_ctx(self):
        for p in range(3):
            self.left_ctx[p][:] = 0
        self.left_seg_ctx[:] = 0


def _tile_offset(idx, mis, log2):
    sb_cols = ((mis + 7) & ~7) >> C.MI_BLOCK_SIZE_LOG2
    offset = ((idx * sb_cols) >> log2) << C.MI_BLOCK_SIZE_LOG2
    return min(offset, mis)


def _partition_ctx(st, mi_row, mi_col, bsl):
    above = (int(st.above_seg_ctx[mi_col]) >> bsl) & 1
    left = (int(st.left_seg_ctx[mi_row & 7]) >> bsl) & 1
    return (left * 2 + above) + bsl * C.PARTITION_PLOFFSET


def _update_partition_ctx(st, mi_row, mi_col, subsize, bw):
    st.above_seg_ctx[mi_col:mi_col + bw] = \
        M.PARTITION_CONTEXT_LOOKUP[subsize][0]
    base = mi_row & 7
    st.left_seg_ctx[base:base + bw] = M.PARTITION_CONTEXT_LOOKUP[subsize][1]


def _reset_skip_ctx(st, mi_row, mi_col, bwl, bhl):
    for plane in range(3):
        sx = 1 if plane else 0
        sy = 1 if plane else 0
        n4_w = (1 << bwl) >> sx
        n4_h = (1 << bhl) >> sy
        apos = (mi_col * 2) >> sx
        lpos = ((mi_row * 2) & 15) >> sy
        st.above_ctx[plane][apos:apos + n4_w] = 0
        st.left_ctx[plane][lpos:lpos + n4_h] = 0

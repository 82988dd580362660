"""Frame-level decoder driver: the vp9_receive_compressed_data state machine.

Parity with vp9/decoder/vp9_decoder.c (vp9_receive_compressed_data:407,
swap_frame_buffers:334, ref-map updates), vp9/vp9_dx_iface.c (superframe
handling), vp9_setup_past_independence (vp9/common/vp9_entropymode.c:425),
and the end-of-frame backward adaptation (vp9_decodeframe.c:3571-3586).

Reconstruction is pluggable: the NumPy oracle (ops/ref/recon.py) or the
TPU pipeline (runtime/) — both consume the same FramePlan.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .. import models as M
from ..models import adapt
from ..ops.ref import recon as ref_recon
from . import constants as C
from .bitreader import parse_superframe_index
from .compressed_header import read_compressed_header
from .headers import (BitstreamError, LoopFilterParams, SegmentationParams,
                      parse_uncompressed_header)
from .tiles import FrameParseState, parse_tiles


class DecodedFrame:
    """One output frame (what vpx_codec_get_frame yields)."""

    def __init__(self, planes, width, height, bit_depth, ss_x, ss_y):
        self.planes = planes
        self.width = width
        self.height = height
        self.bit_depth = bit_depth
        self.ss_x = ss_x
        self.ss_y = ss_y

    def visible_planes(self):
        """Planes cropped to display size (Y, U, V)."""
        w, h = self.width, self.height
        cw = (w + self.ss_x) >> self.ss_x
        ch = (h + self.ss_y) >> self.ss_y
        y = self.planes[0][:h, :w]
        u = self.planes[1][:ch, :cw]
        v = self.planes[2][:ch, :cw]
        if self.bit_depth == 8:
            return [y.astype(np.uint8), u.astype(np.uint8),
                    v.astype(np.uint8)]
        return [y, u, v]


def _peek_frame_kind(payload: bytes) -> str:
    """'resync' for key/intra-only frames (they clear pbi->need_resync,
    vp9_decodeframe.c read_uncompressed_header), 'show' for
    show_existing_frame (exempt from the resync gate), 'other' else."""
    from .bitreader import BitReader
    rb = BitReader(payload)
    if rb.f(2) != C.VP9_FRAME_MARKER:
        return "other"
    profile = rb.read_bit() | (rb.read_bit() << 1)
    if profile > 2:
        profile += rb.read_bit()
    if rb.read_bit():            # show_existing_frame
        return "show"
    frame_type = rb.read_bit()
    if frame_type == C.KEY_FRAME:
        return "resync"
    show_frame = rb.read_bit()
    rb.read_bit()                # error_resilient_mode
    intra_only = (not show_frame) and rb.read_bit()
    return "resync" if intra_only else "other"


class Vp9Decoder:
    """Single-stream VP9 decoder (host parse + pluggable reconstruction)."""

    def __init__(self, recon_fn=None):
        self.frame_contexts = [M.FrameContext.default() for _ in range(4)]
        self.ref_slots: list = [None] * C.REF_FRAMES
        self.lf = LoopFilterParams()
        self.seg = SegmentationParams()
        self.seg_map_last: Optional[np.ndarray] = None
        self.prev_mv = None
        self.prev_ref = None
        self.last_frame_type = C.KEY_FRAME
        self.last_show_frame = 0
        self.last_intra_only = 0
        self.last_width = 0
        self.last_height = 0
        self.bit_depth = 8
        self.subsampling_x = 1
        self.subsampling_y = 1
        self.hold_buf = None  # last decoded frame (for show_existing paths)
        self._outputs = []
        self._recon_fn = recon_fn or self._recon_numpy
        self._hdr = None  # current frame header (during past-independence)
        # same-instance keyframe resync (vp9_decoder.h pbi->need_resync:
        # starts 1, cleared by a key/intra-only frame, set by any decode
        # error; inter frames are refused while set)
        self.need_resync = 1
        self.last_qindex = 0
        self.last_ref_updates = 0
        self.skip_loop_filter = False
        self.last_ref_buf = None  # frame_refs[0] (VP8_COPY_REFERENCE)
        self._last_payload = None

    @property
    def last_tile_data(self):
        """Per-tile (byte_offset, size) spans into the last frame's
        payload, raster order (VP9D_GET_TILE_DATA; the reference's
        libvpx v1.9 predates this control — provided for tooling that
        inspects tile boundaries)."""
        return _tile_spans(self._last_payload, self._ref_sizes)

    # --------------------------------------------------------- hooks

    def _ref_sizes(self, idx: int):
        rb = self.ref_slots[idx]
        if rb is None:
            raise BitstreamError(f"reference slot {idx} unpopulated")
        return rb.width, rb.height

    def on_past_independence(self, hdr):
        """vp9_setup_past_independence parity."""
        self.seg.__init__()
        self.lf.ref_deltas = [1, 0, -1, -1]
        self.lf.mode_deltas = [0, 0]
        if self.seg_map_last is not None:
            self.seg_map_last[:] = 0
        default = M.FrameContext.default()
        if (hdr.frame_type == C.KEY_FRAME or hdr.error_resilient_mode
                or hdr.reset_frame_context == 3):
            self.frame_contexts = [default.copy() for _ in range(4)]
        elif hdr.reset_frame_context == 2:
            self.frame_contexts[hdr.frame_context_idx] = default.copy()

    # --------------------------------------------------------- decode

    def decode(self, data: bytes):
        """Decode one compressed chunk (handles superframes); queued output
        frames are retrieved with get_frame().  On error the instance stays
        usable: it drops input until the next key/intra-only frame
        (vp9_receive_compressed_data need_resync semantics,
        vp9_decoder.c:416-429)."""
        try:
            for off, sz in parse_superframe_index(data):
                self._decode_one(data[off:off + sz])
        except Exception:
            self.need_resync = 1
            raise

    def get_frame(self):
        if self._outputs:
            return self._outputs.pop(0)
        return None

    def frames(self):
        while self._outputs:
            yield self._outputs.pop(0)

    def _recon_numpy(self, plan, refs):
        return ref_recon.reconstruct_frame(plan, refs)

    def _decode_one(self, payload: bytes):
        if self.need_resync and _peek_frame_kind(payload) == "other":
            raise BitstreamError(
                "keyframe / intra-only frame required to reset decoder "
                "state (resync)")
        self._last_payload = payload
        hdr = parse_uncompressed_header(payload, ref_sizes=self._ref_sizes,
                                        dec_ctx=self)
        if hdr.show_existing_frame:
            rb = self.ref_slots[hdr.frame_to_show]
            if rb is None:
                raise BitstreamError("show_existing of empty slot")
            self._outputs.append(DecodedFrame(
                rb.planes, rb.width, rb.height, rb.bit_depth,
                self.subsampling_x, self.subsampling_y))
            # vp9_dx_iface decode_one: show_existing does not touch contexts
            self.last_width, self.last_height = rb.width, rb.height
            self.last_show_frame = 1
            return

        if hdr.frame_is_intra_only:
            self.need_resync = 0
            self.bit_depth = hdr.bit_depth
            self.subsampling_x = hdr.subsampling_x
            self.subsampling_y = hdr.subsampling_y
        else:
            hdr.bit_depth = self.bit_depth
            hdr.subsampling_x = self.subsampling_x
            hdr.subsampling_y = self.subsampling_y

        fc = self.frame_contexts[hdr.frame_context_idx].copy()
        ch = read_compressed_header(payload, hdr, fc)
        counts = (M.FrameCounts()
                  if not hdr.frame_parallel_decoding_mode else None)

        use_prev = (not hdr.error_resilient_mode
                    and hdr.width == self.last_width
                    and hdr.height == self.last_height
                    and not self.last_intra_only
                    and bool(self.last_show_frame)
                    and self.last_frame_type != C.KEY_FRAME
                    and self.prev_mv is not None)

        class _DS:
            subsampling_x = self.subsampling_x
            subsampling_y = self.subsampling_y
            seg_map_last = (self.seg_map_last
                            if (self.seg_map_last is not None
                                and self.seg_map_last.shape
                                == (hdr.mi_rows, hdr.mi_cols)) else None)
            use_prev_frame_mvs = use_prev
            prev_ref = self.prev_ref
            prev_mv = self.prev_mv

        st = FrameParseState(hdr, ch, fc, counts, _DS)
        plan = parse_tiles(payload, st)
        if plan.corrupted:
            raise BitstreamError("frame data corrupted")

        if self.skip_loop_filter:
            hdr.lf.filter_level = 0  # VP9_SET_SKIP_LOOP_FILTER

        refs = {}
        if not hdr.frame_is_intra_only:
            for i in range(C.REFS_PER_FRAME):
                refs[C.LAST_FRAME + i] = self.ref_slots[hdr.ref_frame_idx[i]]
            # frame_refs[0] of the current frame (VP8_COPY_REFERENCE
            # reads it: vp9_copy_reference_dec, get_ref_frame(cm, 0))
            self.last_ref_buf = refs[C.LAST_FRAME]

        planes = self._recon_fn(plan, refs)

        # backward adaptation (vp9_decodeframe.c:3571)
        if not hdr.error_resilient_mode \
                and not hdr.frame_parallel_decoding_mode:
            pre = self.frame_contexts[hdr.frame_context_idx]
            adapt.adapt_coef_probs(fc, pre, counts, hdr.frame_is_intra_only,
                                   self.last_frame_type == C.KEY_FRAME)
            if not hdr.frame_is_intra_only:
                adapt.adapt_mode_probs(
                    fc, pre, counts,
                    hdr.interp_filter == C.SWITCHABLE,
                    ch.tx_mode == C.TX_MODE_SELECT)
                adapt.adapt_mv_probs(fc, pre, counts,
                                     hdr.allow_high_precision_mv)
        if hdr.refresh_frame_context:
            self.frame_contexts[hdr.frame_context_idx] = fc

        # reference map update (swap_frame_buffers)
        new_ref = ref_recon.RefBuffer(planes, hdr.width, hdr.height,
                                      hdr.bit_depth, hdr.subsampling_x,
                                      hdr.subsampling_y)
        for i in range(C.REF_FRAMES):
            if hdr.refresh_frame_flags & (1 << i):
                self.ref_slots[i] = new_ref

        # segmentation map swap (only when enabled, vp9_decoder.c:486)
        if hdr.seg.enabled:
            self.seg_map_last = st.seg_map_cur

        # temporal MV state
        self.prev_mv = st.cur_mv
        self.prev_ref = st.cur_ref

        self.last_frame_type = hdr.frame_type
        self.last_show_frame = hdr.show_frame
        self.last_intra_only = hdr.intra_only
        self.last_width = hdr.width
        self.last_height = hdr.height
        # decoder-control observability (VPXD_GET_LAST_QUANTIZER,
        # VP8D_GET_LAST_REF_UPDATES, VP9D_GET_FRAME_HEADER_INFO)
        self.last_qindex = hdr.base_qindex
        self.last_ref_updates = hdr.refresh_frame_flags
        self.last_header_sizes = (hdr.uncompressed_header_size_in_bytes,
                                  hdr.header_size_in_bytes)

        if hdr.show_frame:
            self._outputs.append(DecodedFrame(
                planes, hdr.width, hdr.height, hdr.bit_depth,
                hdr.subsampling_x, hdr.subsampling_y))


def decode_stream_md5(ivf_path: str, max_frames: int = 10 ** 9):
    """Decode an IVF file, yielding (index, md5 hex) per shown frame
    (decode_to_md5 parity; the primary conformance harness)."""
    from ..containers import IvfReader
    from ..utils.md5 import frame_md5
    dec = Vp9Decoder()
    n = 0
    with IvfReader(ivf_path) as r:
        for data, _pts in r:
            dec.decode(data)
            for frame in dec.frames():
                yield n, frame_md5(frame.visible_planes())
                n += 1
                if n >= max_frames:
                    return


def _tile_spans(payload, ref_sizes):
    """Per-tile (byte_offset, size) spans of a frame payload, raster
    order (VP9D_GET_TILE_DATA analog; the reference's libvpx v1.9
    predates the control).  Returns None for show_existing / missing
    payloads."""
    if not payload:
        return None
    from .headers import parse_uncompressed_header
    from .tiles import get_tile_buffers
    try:
        hdr = parse_uncompressed_header(payload, ref_sizes=ref_sizes)
        if hdr.show_existing_frame:
            return None
        off = (hdr.uncompressed_header_size_in_bytes
               + hdr.header_size_in_bytes)
        spans = get_tile_buffers(payload, off, hdr)
        return [(pos, size) for row in spans for (pos, size) in row]
    except Exception:
        return None


class NativeVp9Decoder:
    """Vp9Decoder variant with the C++ host entropy decoder (native/)."""

    def __init__(self, recon_fn=None, threads: int = 1):
        from ..native import NativeParser, ShowExisting
        self._ShowExisting = ShowExisting
        self._parser = NativeParser(threads=threads)
        self.ref_slots = [None] * C.REF_FRAMES
        self._outputs = []
        self._recon_fn = recon_fn or (
            lambda plan, refs: ref_recon.reconstruct_frame(plan, refs))
        self.need_resync = 1  # see Vp9Decoder.need_resync
        self.last_qindex = 0
        self.last_ref_updates = 0
        self.skip_loop_filter = False
        self._last_payload = None
        self.last_ref_buf = None  # frame_refs[0] (VP8_COPY_REFERENCE)

    @property
    def last_header_sizes(self):
        """(uncompressed, compressed) header byte sizes of the last
        frame (VP9D_GET_FRAME_HEADER_INFO) — parsed lazily; the native
        parser does not export offsets."""
        if not self._last_payload:
            return (0, 0)
        from .headers import parse_uncompressed_header
        hdr = parse_uncompressed_header(
            self._last_payload, ref_sizes=lambda i: (
                (self.ref_slots[i].width, self.ref_slots[i].height)
                if self.ref_slots[i] else (0, 0)))
        return (hdr.uncompressed_header_size_in_bytes,
                hdr.header_size_in_bytes)

    @property
    def last_tile_data(self):
        """Per-tile (byte_offset, size) spans of the last frame's
        payload (VP9D_GET_TILE_DATA)."""
        def ref_sizes(i):
            rb = self.ref_slots[i]
            return (rb.width, rb.height) if rb else (0, 0)
        return _tile_spans(self._last_payload, ref_sizes)

    def decode(self, data: bytes):
        try:
            for off, sz in parse_superframe_index(data):
                self._decode_one(data[off:off + sz])
        except Exception:
            self.need_resync = 1
            raise

    def get_frame(self):
        if self._outputs:
            return self._outputs.pop(0)
        return None

    def frames(self):
        while self._outputs:
            yield self._outputs.pop(0)

    def _decode_one(self, payload: bytes):
        if self.need_resync and _peek_frame_kind(payload) == "other":
            raise BitstreamError(
                "keyframe / intra-only frame required to reset decoder "
                "state (resync)")
        self._last_payload = payload
        plan = self._parser.parse(payload)
        if isinstance(plan, self._ShowExisting):
            rb = self.ref_slots[plan.frame_to_show]
            if rb is None:
                raise BitstreamError("show_existing of empty slot")
            self._outputs.append(DecodedFrame(
                rb.planes, rb.width, rb.height, rb.bit_depth,
                rb.ss_x, rb.ss_y))
            return
        hdr = plan.hdr
        if hdr.frame_is_intra_only:
            self.need_resync = 0
        self.last_qindex = hdr.base_qindex
        self.last_ref_updates = hdr.refresh_frame_flags
        if self.skip_loop_filter:
            hdr.lf.filter_level = 0  # VP9_SET_SKIP_LOOP_FILTER
        refs = {}
        if not hdr.frame_is_intra_only:
            for i in range(C.REFS_PER_FRAME):
                refs[C.LAST_FRAME + i] = self.ref_slots[hdr.ref_frame_idx[i]]
            # frame_refs[0] of the current frame (VP8_COPY_REFERENCE
            # reads it: vp9_copy_reference_dec, get_ref_frame(cm, 0))
            self.last_ref_buf = refs[C.LAST_FRAME]
        planes = self._recon_fn(plan, refs)
        new_ref = ref_recon.RefBuffer(planes, hdr.width, hdr.height,
                                      hdr.bit_depth, hdr.subsampling_x,
                                      hdr.subsampling_y)
        for i in range(C.REF_FRAMES):
            if hdr.refresh_frame_flags & (1 << i):
                self.ref_slots[i] = new_ref
        if hdr.show_frame:
            self._outputs.append(DecodedFrame(
                planes, hdr.width, hdr.height, hdr.bit_depth,
                hdr.subsampling_x, hdr.subsampling_y))


def native_decode_stream_md5(ivf_path: str, max_frames: int = 10 ** 9,
                             recon_fn=None, lag: int = 32):
    """decode_stream_md5 with the native host parser.

    Consumes output frames `lag` behind the decode front so a device
    recon backend with a batched output ring (TpuReconFused) amortizes
    its device->host fetches."""
    from collections import deque
    from ..containers import IvfReader
    from ..utils.md5 import frame_md5
    dec = NativeVp9Decoder(recon_fn=recon_fn)
    n = 0
    q = deque()
    with IvfReader(ivf_path) as r:
        for data, _pts in r:
            dec.decode(data)
            q.extend(dec.frames())
            while len(q) > lag:
                yield n, frame_md5(q.popleft().visible_planes())
                n += 1
                if n >= max_frames:
                    return
    while q:
        yield n, frame_md5(q.popleft().visible_planes())
        n += 1
        if n >= max_frames:
            return

"""TPU frame reconstruction pipeline.

Drop-in recon backend for Vp9Decoder: consumes the same FramePlan as the
NumPy oracle but runs the reconstruction stages as jitted JAX computations
(ops/device/stages.py).  Stage order mirrors the reference's frame passes
(vp9_decodeframe.c:2303 decode_tiles):

  1. batched inverse transforms -> residual planes     (PASS 2, on device)
  2. bucketed inter MC + residual add                  (PASS 3)
  3. wavefront-batched intra prediction + residual add (PASS 4)
  4. loop filter                                       (PASS 5)

Frames that use features outside the current device fast path
(4:2:2/4:4:4 subsampling, out-of-spec scale ratios, cap overflow) fall
back to the NumPy oracle — identical output, host speed.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .. import models as M
from ..decoder import constants as C
from ..ops.ref import intra as ref_intra
from ..ops.ref import loopfilter as ref_lf
from ..ops.ref import recon as ref_recon
from . import plan as planlib


def _pad_pow2(n, lo=16):
    p = lo
    while p < n:
        p *= 2
    return p


def _tier_ladder(K):
    """Page-tier ladder for a K-page flat layout: each tier is a separate
    compiled step variant; per frame the smallest tier >= the frame's
    non-zero page count is used (upload bytes AND the in-step expansion
    scatter scale with the tier, so a fixed one-size tier wastes 5-8x on
    typical frames).  1.5x steps: the expected tier-rounding waste is
    ~20% of the payload (x2 steps averaged ~45%, which at ~200 KB/frame
    was the single biggest remaining upload cost).  Frames denser than
    the largest tier ship dense."""
    ts = []
    t = 64
    # 32766 cap: the gather-layout page map g[K] is int16 (1-based data
    # row indices); denser frames ship the whole buffer
    while t * 4 <= K * 3 and t <= 32766:
        ts.append(t)
        t = (t * 3 // 2 + 63) & ~63
    return ts


# Module-level jit caches shared across decoder instances (a fresh lambda
# per instance would re-jit on every decode session).
_SLICER_CACHE = {}
_FETCHER_CACHE = {}


def _slicer(k, i, dtype, shape):
    """jitted s[i] for a [k, *shape] stack.  The index is STATIC — a
    traced index would ship a scalar per call, and on a tunneled link
    every host->device transfer pays a large fixed cost."""
    key = (k, i, dtype, shape)
    fn = _SLICER_CACHE.get(key)
    if fn is None:
        import jax
        fn = jax.jit(lambda s: jax.lax.index_in_dim(s, i, 0,
                                                    keepdims=False))
        _SLICER_CACHE[key] = fn
    return fn


def _fetcher(s0k, dtype, shape):
    """jitted r[s0:s0+k] ring-row slice (static bounds: no scalar
    transfer)."""
    s0, k = s0k
    key = (s0, k, dtype, shape)
    fn = _FETCHER_CACHE.get(key)
    if fn is None:
        import jax
        fn = jax.jit(lambda r: jax.lax.slice_in_dim(r, s0, s0 + k, axis=0))
        _FETCHER_CACHE[key] = fn
    return fn


class LazyPlanes:
    """Planes of a device-decoded frame, materialized on first access.

    Output frames live in a device-resident uint8 ring; each dispatched
    batch schedules ONE background D2H of its ring rows (the tunnel's
    fixed device->host cost amortizes across the batch, and the transfer
    overlaps the next batch's host work).  Accessing a plane before its
    batch was dispatched triggers a queue flush."""

    def __init__(self, recon, slot, ha, wa, ss=(1, 1)):
        self._recon = recon
        self._slot = slot
        self._geom = (ha, wa)
        self._ss = ss
        self._planes = None
        self._fut = None     # (future -> np rows, row index) once dispatched

    def _set_from_ring(self, row):
        ha, wa = self._geom
        hc, wc = ha >> self._ss[1], wa >> self._ss[0]
        ny, nc = ha * wa, hc * wc
        self._planes = [
            row[:ny].reshape(ha, wa).astype(np.uint16),
            row[ny:ny + nc].reshape(hc, wc).astype(np.uint16),
            row[ny + nc:ny + 2 * nc].reshape(hc, wc).astype(np.uint16)]

    def _force(self):
        if self._planes is None:
            import time as _time
            if self._fut is None:
                self._recon.flush()
            if self._fut is None:
                # deferred-output mode: fetch this frame's ring row now
                # (valid while its slot has not been reused)
                rows = np.asarray(_fetcher(
                    (self._slot, 1), self._recon._ring.dtype.str,
                    self._recon._ring.shape)(self._recon._ring))
                self._set_from_ring(rows[0])
                return self._planes
            fut, idx = self._fut
            _t0 = _time.time()
            rows = fut.result()
            self._recon._tw["wait"] += _time.time() - _t0
            self._set_from_ring(rows[idx])
        return self._planes

    def __getitem__(self, i):
        return self._force()[i]

    def __len__(self):
        return 3

    def __iter__(self):
        return iter(self._force())


class TpuReconFused:
    """Fused single-dispatch reconstruction with a device-resident
    reference pool (runtime/fused.py).

    Per frame: pack ONE flat int16 tensor in C++ (native/vp9host_pack.inc
    or runtime/pack.py), then ENQUEUE the jitted step (residuals + MC +
    intra + loop filter + pool refresh + output-ring write).  Queued
    frames' uploads are batched into one H2D per BATCH frames — the
    host->device link has a large fixed per-transfer cost, so upload
    batching (not bytes) dominates throughput on tunneled links.  Output
    planes are returned lazily (LazyPlanes) and fetched in one batched
    D2H per ring flush, sliced to the pending rows.  8/10/12-bit and
    scaled-reference (mid-stream resize / SVC) frames all run on device;
    frames outside the fast path (4:2:2/4:4:4, wide-cap overflow,
    out-of-spec scale ratios) run on the host oracle, bit-exact, and the
    affected device pool slots re-sync lazily before their next device
    use."""

    RING = 32
    BATCH = 16   # frames per dispatch batch (one ring fetch per batch:
                 # each device->host fetch pays a ~25 ms tunnel RTT)

    def __init__(self, validate_against_oracle: bool = False,
                 defer_output: bool = False):
        from ..utils.jaxcache import enable_persistent_cache
        enable_persistent_cache()
        import jax
        import jax.numpy as jnp
        from . import fused, pack
        # defer_output: do NOT schedule a device->host fetch of each
        # dispatch batch's output-ring rows; frames stay HBM-resident
        # (decode_perf_test.cc semantics — decode without blitting).
        # A LazyPlanes forced later re-fetches its row from the live
        # ring, which is only valid until its slot is reused (RING
        # frames); callers that defer must consume within that window
        # or not at all.
        self.defer_output = defer_output
        self.jax = jax
        self.jnp = jnp
        self.fused = fused
        self.pack = pack
        self.kernels = jnp.asarray(M.FILTER_KERNELS.astype(np.int32))
        self.validate = validate_against_oracle
        self._steps = {}
        self._pool = None
        self._pool_geom = None
        self._slot_dirty = [True] * 8
        self._ring = None
        self._ring_slot = 0
        self._pending = []
        self._queue = []        # deferred work: ("sync", i, canvas np)
                                # or ("step", step_fn, payload np, lp)
        self._n_queued_steps = 0
        import concurrent.futures as _cf
        self._d2h_pool = _cf.ThreadPoolExecutor(max_workers=1)
        self.frames_on_device = 0
        self.frames_on_host = 0
        # sticky page-tier floor per (geometry, cap tier): each distinct
        # page tier is a separately compiled step variant (multi-minute
        # remote compiles); once a stream needs tier T, smaller frames
        # reuse T instead of compiling a smaller variant (upload pads a
        # little; the compile bill shrinks a lot)
        self._ptier_floor = {}
        self.profile = False
        self._t_h2d = 0.0
        self._t_step = 0.0
        self._t_d2h = 0.0
        # always-on wall timers (non-blocking; used to find host-side
        # serialization in async mode)
        self._tw = {"stack": 0.0, "dispatch": 0.0, "fetch": 0.0,
                    "wait": 0.0, "pack": 0.0, "h2d_bytes": 0}

    # ------------------------------------------------------ dispatch queue

    def _dispatch_queue(self):
        """Run all deferred work in order; consecutive same-shape step
        payloads share one H2D transfer.  After ALL queued steps are
        dispatched, the ring rows they wrote are sliced on device in ONE
        program (a copy: safe against later steps donating/overwriting
        the ring) and fetched by a background thread, overlapping the
        next batch's host work.  One fetch per dispatch call matters:
        each device->host fetch pays the tunnel's ~25 ms round trip."""
        import time as _time
        jnp = self.jnp
        q = self._queue
        self._queue = []
        self._n_queued_steps = 0
        all_lps = []
        i = 0
        while i < len(q):
            kind = q[i][0]
            if kind == "sync":
                _, si, canvas = q[i]
                self._pool = self._pool.at[si].set(jnp.asarray(canvas))
                i += 1
                continue
            # group consecutive steps with identical payload shapes
            j = i
            while j < len(q) and q[j][0] == "step" \
                    and q[j][2].shape == q[i][2].shape:
                j += 1
            group = q[i:j]
            _t0 = _time.time()
            if len(group) == 1:
                payloads = [jnp.asarray(group[0][2])]
                self._tw["h2d_bytes"] += group[0][2].nbytes
            else:
                hstack = np.stack([g[2] for g in group])
                self._tw["h2d_bytes"] += hstack.nbytes
                stack = jnp.asarray(hstack)
                payloads = [
                    _slicer(len(group), k, hstack.dtype.str,
                            hstack.shape[1:])(stack)
                    for k in range(len(group))]
            if self.profile:
                self.jax.block_until_ready(payloads)
                self._t_h2d += _time.time() - _t0
            _t1 = _time.time()
            self._tw["stack"] += _t1 - _t0
            _t0 = _t1
            for (_, step, _payload, _lp), dev in zip(group, payloads):
                self._pool, self._ring = step(self._pool, self._ring,
                                              self.kernels, dev)
            if self.profile:
                self._ring.block_until_ready()
                self._t_step += _time.time() - _t0
            self._tw["dispatch"] += _time.time() - _t0
            all_lps.extend(g[3] for g in group)
            i = j
        if all_lps and not self.defer_output:
            _t0 = _time.time()
            s0 = all_lps[0]._slot
            rows = _fetcher((s0, len(all_lps)), self._ring.dtype.str,
                            self._ring.shape)(
                self._ring)
            fut = self._d2h_pool.submit(np.asarray, rows)
            self._tw["fetch"] += _time.time() - _t0
            for k, lp in enumerate(all_lps):
                lp._fut = (fut, k)

    def flush(self):
        """Dispatch queued steps and wait out all pending output
        fetches (deferred-output mode skips the forcing: frames stay
        in the HBM ring)."""
        self._dispatch_queue()
        import time as _time
        _t0 = _time.time()
        if not self.defer_output:
            for lp in self._pending:
                lp._force()
        if self.profile:
            self._t_d2h += _time.time() - _t0
        self._pending = []
        self._ring_slot = 0

    def sync(self) -> int:
        """Dispatch everything queued and block until the device has
        executed it, WITHOUT transferring the output frames: fetches an
        8-byte checksum of the output ring (data-dependent on every
        dispatched step).  Returns the checksum — decode_perf_test-style
        timing loops use it as the end-of-run barrier/liveness value.
        (On the tunneled backend `block_until_ready` does not actually
        block, so a tiny fetch is the only real sync.)"""
        self._dispatch_queue()
        self._pending = []
        self._ring_slot = 0
        import jax
        key = ("ringsum", self._ring.dtype.str, self._ring.shape)
        fn = _SLICER_CACHE.get(key)
        if fn is None:
            fn = jax.jit(lambda r: jax.numpy.sum(
                r.astype(jax.numpy.int32), dtype=jax.numpy.int32))
            _SLICER_CACHE[key] = fn
        return int(np.asarray(fn(self._ring)))

    def _can_run_on_device(self, plan, refs) -> bool:
        hdr = plan.hdr
        if hdr.bit_depth not in (8, 10, 12):
            return False
        if (hdr.subsampling_x, hdr.subsampling_y) not in ((1, 1), (0, 0),
                                                          (1, 0)):
            return False
        if (hdr.subsampling_x, hdr.subsampling_y) != (1, 1) \
                and not hdr.frame_is_intra_only \
                and self._any_scaled(plan, refs):
            # scaled refs + non-4:2:0: host oracle (no mcs class there)
            return False
        if not hdr.frame_is_intra_only and self._any_scaled(plan, refs):
            # scaled references decode on device via the "mcs" tile
            # class; refs outside the spec's scale range (2x down /
            # 16x up, vp9_scale.c valid_ref_frame_size) stay on the
            # host oracle
            from ..ops.ref.inter import ScaleFactors
            for rb in refs.values():
                if rb is None:
                    continue
                if not ScaleFactors(rb.width, rb.height, hdr.width,
                                    hdr.height).is_valid():
                    return False
        return True

    @staticmethod
    def _any_scaled(plan, refs) -> bool:
        hdr = plan.hdr
        return any(rb is not None
                   and (rb.width != hdr.width or rb.height != hdr.height)
                   for rb in refs.values())

    def _pool_geom_for(self, plan, refs):
        """Reference-pool canvas: the frame plus any larger reference
        (scaled prediction reads refs bigger than the frame)."""
        hdr = plan.hdr

        def align(mi):
            return ((mi + 7) & ~7) * 8

        pha = align(hdr.mi_rows)
        pwa = align(hdr.mi_cols)
        if not hdr.frame_is_intra_only:
            for rb in refs.values():
                if rb is None:
                    continue
                pha = max(pha, align((rb.height + 7) // 8))
                pwa = max(pwa, align((rb.width + 7) // 8))
        return pha, pwa

    def _ensure_pool(self, plan, refs):
        """(Re)allocate the device pool/ring; returns the pool canvas
        (pha, pwa) >= the frame canvas.  The pool keeps its running-max
        geometry across mid-stream resizes (re-allocating per frame
        would thrash compile caches and re-sync every slot); keyframes
        refresh every slot, so they may shrink it."""
        jnp = self.jnp
        hdr = plan.hdr
        need = self._pool_geom_for(plan, refs)
        bd = hdr.bit_depth
        ss = (hdr.subsampling_x, hdr.subsampling_y)
        cur = self._pool_geom
        if cur is not None and cur[2] == (bd, ss) \
                and need[0] <= cur[0] and need[1] <= cur[1]:
            if not (hdr.frame_type == C.KEY_FRAME and need != cur[:2]):
                return cur[0], cur[1]
        self.flush()
        pha, pwa = need
        nout = pha * pwa + 2 * ((pha >> ss[1]) * (pwa >> ss[0]))
        odt = jnp.uint8 if bd == 8 else jnp.int16
        self._pool = jnp.zeros((8, 3, pha, pwa), jnp.int32)
        self._ring = jnp.zeros((self.RING, nout), odt)
        self._pool_geom = (pha, pwa, (bd, ss))
        self._slot_dirty = [True] * 8
        return pha, pwa

    def _sync_slot(self, i, rb):
        """Queue a host RefBuffer push into device pool slot i (ordered
        with the queued steps)."""
        ha, wa = self._pool_geom[:2]
        canvas = np.zeros((3, ha, wa), np.int32)
        for p in range(3):
            pl = rb.planes[p]
            canvas[p, :pl.shape[0], :pl.shape[1]] = pl
        self._queue.append(("sync", i, canvas))
        self._slot_dirty[i] = False

    def _compact(self, flat):
        """Compact a packed frame by eliding all-zero 1KB pages (the flat
        buffer is capacity-padded; typical frames fill 10-20% of it).
        Picks the smallest page-tier step variant that fits the frame's
        non-zero page count AND the stream's sticky floor (each tier is
        its own compiled program; both the upload bytes and the in-step
        expansion scatter scale with the tier).  The page scatter runs
        inside the frame step (a separate expander program would pay the
        same multi-minute fixed remote-compile cost).  Returns
        (comb, tier), or (None, 0) when dense / no ladder."""
        PAGE = self.pack.PAGE
        K = flat.size // PAGE
        ladder = _tier_ladder(K)
        if not ladder:
            return None, 0
        try:
            from ..native import native_compact, native_count_pages
            nzp = native_count_pages(flat, K)
        except Exception:
            native_compact = None  # lib unavailable: numpy fallback below
            nzp = int(flat.reshape(K, PAGE).any(axis=1).sum())
        nzp = max(nzp, self._ptier_floor.get(K, 0))
        tier = next((t for t in ladder if nzp <= t), None)
        if tier is None:
            return None, 0  # dense frame: caller ships the whole buffer
        self._ptier_floor[K] = tier
        if native_compact is not None:
            return native_compact(flat, K, tier), tier
        pg = flat.reshape(K, PAGE)
        nz = np.flatnonzero(pg.any(axis=1))
        # compacted upload, gather layout: header rows carry the g[K]
        # page map (0 = the shared zero page at data row 0), then the
        # non-zero pages; the step expands with ONE 1 KB-row gather.
        hr = (K + PAGE - 1) // PAGE
        comb = np.zeros((hr + 1 + tier, PAGE), np.int16)
        head = comb[:hr].reshape(-1)
        head[nz] = np.arange(1, len(nz) + 1)
        comb[hr + 1:hr + 1 + len(nz)] = pg[nz]
        return comb, tier

    def _mark_host_frame(self, refresh_flags):
        """A frame was produced on the host: its refreshed device slots
        are stale until re-synced."""
        for i in range(8):
            if refresh_flags & (1 << i):
                self._slot_dirty[i] = True

    def __call__(self, plan, refs):
        if self._can_run_on_device(plan, refs):
            planes = self._recon_device(plan, refs)
            if planes is not None:
                self.frames_on_device += 1
                return planes
        self.frames_on_host += 1
        planes = ref_recon.reconstruct_frame(plan, refs)
        self._mark_host_frame(plan.hdr.refresh_frame_flags)
        return planes

    def _recon_device(self, plan, refs):
        jnp = self.jnp
        hdr = plan.hdr
        scaled = not hdr.frame_is_intra_only \
            and self._any_scaled(plan, refs)
        tier = "full" if hdr.frame_is_intra_only else (
            "scaled" if scaled else "tight")
        bd = hdr.bit_depth
        ss = (hdr.subsampling_x, hdr.subsampling_y)
        pool_geom = self._ensure_pool(plan, refs)
        ha = ((hdr.mi_rows + 7) & ~7) * 8
        wa = ((hdr.mi_cols + 7) & ~7) * 8
        step, caps, layout = self.fused.get_frame_step(
            hdr.mi_rows, hdr.mi_cols, tier, bool(hdr.lossless), bd=bd,
            pool_geom=pool_geom, ss=ss)

        if self._ring_slot >= self.RING:
            # ring wrap: dispatch queued steps (their output rows are
            # snapshotted on device before any later step overwrites
            # them), then reuse slots from 0 — no host sync needed
            self._dispatch_queue()
            self._ring_slot = 0
            self._pending = [lp for lp in self._pending
                             if lp._planes is None and lp._fut is None]
        slot = self._ring_slot

        import time as _time
        _tp0 = _time.time()
        nparser = getattr(plan, "native_parser", None)

        frame_geom = (ha, wa)

        def pack_with(caps, layout):
            if nparser is not None and ss == (1, 1):
                # single-pass C++ packer on the parser's live state
                # (incl. the scaled-reference mcs class; band geometry
                # spans the pool canvas when it exceeds the frame)
                return nparser.pack(
                    plan, refs, caps, layout, ring_slot=slot,
                    pool_ha=(pool_geom[0]
                             if pool_geom != frame_geom else None))
            f = self.pack.pack_frame(plan, refs, caps, layout,
                                     pool_ha=pool_geom[0])
            if f is not None:
                layout.view(f, "misc")[13] = slot
            return f

        flat = pack_with(caps, layout)
        if flat is None and tier == "tight":
            # dense frame: escalate to the worst-case "wide" device tier
            # (the host oracle is ~100x slower than a wide-step dispatch)
            tier = "wide"
            step, caps, layout = self.fused.get_frame_step(
                hdr.mi_rows, hdr.mi_cols, tier, bool(hdr.lossless), bd=bd,
                pool_geom=pool_geom, ss=ss)
            flat = pack_with(caps, layout)
        self._tw["pack"] += _time.time() - _tp0
        if flat is None:
            return None  # capacity overflow: caller does host fallback

        if not hdr.frame_is_intra_only:
            for k, rb in refs.items():
                if rb is None:
                    continue
                rslot = hdr.ref_frame_idx[k - 1]
                if self._slot_dirty[rslot]:
                    self._sync_slot(rslot, rb)

        comb, ptier = self._compact(flat)
        if comb is not None:
            step, _, _ = self.fused.get_frame_step(
                hdr.mi_rows, hdr.mi_cols, tier, bool(hdr.lossless),
                bd=bd, pages_tier=ptier, pool_geom=pool_geom, ss=ss)
            payload = comb
        else:
            payload = flat
        planes = LazyPlanes(self, slot, ha, wa, ss)
        self._queue.append(("step", step, payload, planes))
        self._pending.append(planes)
        self._ring_slot = slot + 1
        self._n_queued_steps += 1
        if self._n_queued_steps >= self.BATCH:
            self._dispatch_queue()
        for i in range(8):
            if hdr.refresh_frame_flags & (1 << i):
                self._slot_dirty[i] = False  # device wrote these slots
        if self.validate:
            self.flush()
            want = ref_recon.reconstruct_frame(plan, refs)
            for p in range(3):
                if not np.array_equal(planes[p], want[p]):
                    d = np.nonzero(planes[p].astype(int)
                                   - want[p].astype(int))
                    raise AssertionError(
                        f"fused recon mismatch plane {p}: {len(d[0])} px, "
                        f"first rows {sorted(set(d[0][:8].tolist()))} "
                        f"cols {sorted(set(d[1][:8].tolist()))}")
        return planes

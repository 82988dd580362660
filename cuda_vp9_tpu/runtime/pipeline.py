"""TPU frame reconstruction pipeline.

Drop-in recon backend for Vp9Decoder: consumes the same FramePlan as the
NumPy oracle but runs the reconstruction stages as jitted JAX computations
(ops/device/stages.py).  Stage order mirrors the reference's frame passes
(vp9_decodeframe.c:2303 decode_tiles):

  1. batched inverse transforms -> residual planes     (PASS 2, on device)
  2. bucketed inter MC + residual add                  (PASS 3)
  3. wavefront-batched intra prediction + residual add (PASS 4)
  4. loop filter                                       (PASS 5)

Frames that use features outside the current device fast path (high bit
depth, scaled references) fall back to the NumPy oracle — identical output,
host speed.
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
    typical frames).  Frames denser than the largest tier ship dense."""
    ts = []
    t = 64
    while t * 4 <= K * 3:
        ts.append(t)
        t *= 2
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


class TpuRecon:
    """Reconstruction backend running on the default JAX device."""

    def __init__(self, validate_against_oracle: bool = False):
        from ..utils.jaxcache import enable_persistent_cache
        enable_persistent_cache()
        import jax
        import jax.numpy as jnp
        from ..ops.device import stages
        self.jax = jax
        self.jnp = jnp
        self.stages = stages
        self.kernels = jnp.asarray(M.FILTER_KERNELS.astype(np.int32))
        self.validate = validate_against_oracle
        self.frames_on_device = 0
        self.frames_on_host = 0

    # ---------------------------------------------------------- fallback

    def _can_run_on_device(self, plan, refs) -> bool:
        hdr = plan.hdr
        if hdr.bit_depth != 8:
            return False
        if not hdr.frame_is_intra_only:
            for rb in refs.values():
                if rb is None:
                    continue
                if rb.width != hdr.width or rb.height != hdr.height:
                    return False  # scaled references: oracle path
        return True

    # ---------------------------------------------------------- main

    def __call__(self, plan, refs):
        if not self._can_run_on_device(plan, refs):
            self.frames_on_host += 1
            return ref_recon.reconstruct_frame(plan, refs)
        self.frames_on_device += 1
        return self._recon_device(plan, refs)

    def _recon_device(self, plan, refs):
        jnp = self.jnp
        hdr = plan.hdr
        bd = hdr.bit_depth
        ss_x, ss_y = hdr.subsampling_x, hdr.subsampling_y
        wa = ((hdr.mi_cols + 7) & ~7) * 8
        ha = ((hdr.mi_rows + 7) & ~7) * 8
        aligned = [(hdr.mi_cols * 8, hdr.mi_rows * 8),
                   ((hdr.mi_cols * 8) >> ss_x, (hdr.mi_rows * 8) >> ss_y),
                   ((hdr.mi_cols * 8) >> ss_x, (hdr.mi_rows * 8) >> ss_y)]

        F = jnp.zeros((3, ha, wa), jnp.int32)
        R = jnp.zeros((3, ha, wa), jnp.int32)

        # ---- stage 1: residuals
        for b in planlib.build_coeff_buckets(plan):
            cap = b.coeffs.shape[0]
            y0 = np.full(cap, -32768, np.int32)
            x0 = np.zeros(cap, np.int32)
            y0[:b.count] = b.y4[:b.count] * 4
            x0[:b.count] = b.x4[:b.count] * 4
            R = self.stages.residual_scatter(
                R, jnp.asarray(b.coeffs), jnp.asarray(b.plane),
                jnp.asarray(y0), jnp.asarray(x0),
                b.tx_size, b.tx_type, b.lossless, bd)

        # ---- stage 2: inter
        any_inter = False
        if not hdr.frame_is_intra_only:
            ref_sizes = {k: (rb.width, rb.height) if rb else None
                         for k, rb in refs.items()}
            units = planlib.build_mc_units(plan, ref_sizes)
            if units:
                any_inter = True
                F = self._run_inter(F, R, plan, refs, units, ha, wa, bd)

        # ---- stage 3: intra waves
        units, num_waves = planlib.build_intra_units(plan)
        if units:
            F = self._run_intra(F, R, plan, units, num_waves, aligned, bd)

        planes_dev = np.asarray(F)
        hc, wc = ha >> ss_y, wa >> ss_x
        planes = [planes_dev[0].astype(np.uint16),
                  planes_dev[1, :hc, :wc].astype(np.uint16),
                  planes_dev[2, :hc, :wc].astype(np.uint16)]

        # ---- stage 4: loop filter (host for now; device port pending)
        ref_lf.filter_frame(planes, plan.mi, plan.seg_map, hdr,
                            hdr.mi_rows, hdr.mi_cols, ss_x, ss_y, bd)

        if self.validate:
            want = ref_recon.reconstruct_frame(plan, refs)
            for p in range(3):
                if not np.array_equal(planes[p], want[p]):
                    d = np.nonzero(planes[p].astype(int)
                                   - want[p].astype(int))
                    raise AssertionError(
                        f"device recon mismatch plane {p}: "
                        f"{len(d[0])} pixels, first {d[0][:4]},{d[1][:4]}")
        return planes

    # ---------------------------------------------------------- inter

    def _run_inter(self, F, R, plan, refs, units, ha, wa, bd):
        jnp = self.jnp
        hdr = plan.hdr
        ss_x, ss_y = hdr.subsampling_x, hdr.subsampling_y
        # stack the (up to 3) active reference frames on device
        ref_stack = np.zeros((3, 3, ha, wa), np.int32)
        crop = np.ones((3, 3, 2), np.int32)  # [slot][plane][(w, h)]
        for k in (1, 2, 3):
            rb = refs.get(k)
            if rb is None:
                continue
            for p in range(3):
                pl = rb.planes[p]
                ref_stack[k - 1, p, :pl.shape[0], :pl.shape[1]] = pl
                sx = ss_x if p else 0
                sy = ss_y if p else 0
                crop[k - 1, p, 0] = (rb.width + sx) >> sx
                crop[k - 1, p, 1] = (rb.height + sy) >> sy
        ref_dev = jnp.asarray(ref_stack)

        buckets: Dict = {}
        for u in units:
            buckets.setdefault((u.w, u.h, u.is_avg), []).append(u)
        # all first-ref units before averaging units
        for key in sorted(buckets, key=lambda k: (k[2], k[0], k[1])):
            w, h, is_avg = key
            us = buckets[key]
            cap = _pad_pow2(len(us))
            arr = {n: np.zeros(cap, np.int32) for n in
                   ("plane", "dx", "dy", "slot", "x0", "y0", "spx", "spy",
                    "filt", "cw", "ch")}
            arr["dy"][:] = -32768
            for i, u in enumerate(us):
                arr["plane"][i] = u.plane
                arr["dx"][i] = u.dx
                arr["dy"][i] = u.dy
                arr["slot"][i] = u.ref_slot
                arr["x0"][i] = u.x0
                arr["y0"][i] = u.y0
                arr["spx"][i] = u.subpel_x
                arr["spy"][i] = u.subpel_y
                arr["filt"][i] = u.filter
                arr["cw"][i] = crop[u.ref_slot, u.plane, 0]
                arr["ch"][i] = crop[u.ref_slot, u.plane, 1]
            F = self.stages.mc_bucket(
                F, ref_dev, self.kernels,
                *(jnp.asarray(arr[n]) for n in
                  ("plane", "dx", "dy", "slot", "x0", "y0", "spx", "spy",
                   "filt", "cw", "ch")),
                w=w, h=h, is_avg=bool(is_avg), bd=bd)

        # residual add over non-skip inter block areas
        mask = self._inter_mask(plan, ha, wa, ss_x, ss_y)
        F = self.stages.add_residual_masked(F, R, jnp.asarray(mask),
                                            (1 << bd) - 1)
        return F

    def _inter_mask(self, plan, ha, wa, ss_x, ss_y):
        mi = plan.mi
        m = (mi.ref[:, :, 0] > C.INTRA_FRAME) & (mi.skip == 0)
        mask = np.zeros((3, ha, wa), bool)
        y8 = np.repeat(np.repeat(m, 8, axis=0), 8, axis=1)
        mask[0, :y8.shape[0], :y8.shape[1]] = y8
        c4h = 8 >> ss_y
        c4w = 8 >> ss_x
        cm = np.repeat(np.repeat(m, c4h, axis=0), c4w, axis=1)
        mask[1, :cm.shape[0], :cm.shape[1]] = cm
        mask[2, :cm.shape[0], :cm.shape[1]] = cm
        return mask

    # ---------------------------------------------------------- intra

    def _run_intra(self, F, R, plan, units, num_waves, aligned, bd):
        jnp = self.jnp
        # availability parameters per unit (host, reference edge rules)
        by_wave_bs: Dict = {}
        for u in units:
            fw, fh = aligned[u.plane]
            need = ref_intra.EXTEND_MODES[u.mode]
            bs = u.bs
            n_left = 0
            if (need & ref_intra.NEED_LEFT) and u.have_left:
                if u.bottom_clipped and u.y0 + bs > fh:
                    n_left = fh - u.y0
                else:
                    n_left = bs
            n_above = 0
            if (need & (ref_intra.NEED_ABOVE | ref_intra.NEED_ABOVERIGHT)) \
                    and u.have_up:
                if need & ref_intra.NEED_ABOVERIGHT:
                    if u.right_clipped:
                        if u.x0 + 2 * bs <= fw:
                            n_above = 2 * bs if (u.have_right and bs == 4) \
                                else bs
                        elif u.x0 + bs <= fw:
                            n_above = (fw - u.x0) if (u.have_right
                                                      and bs == 4) else bs
                        else:
                            n_above = fw - u.x0
                    else:
                        n_above = 2 * bs if (bs == 4 and u.have_right) \
                            else bs
                else:
                    if u.right_clipped and u.x0 + bs > fw:
                        n_above = fw - u.x0
                    else:
                        n_above = bs
            if u.have_up and (need & (ref_intra.NEED_ABOVE
                                      | ref_intra.NEED_ABOVERIGHT)):
                tl_mode = 0 if u.have_left else 1
            else:
                tl_mode = 2
            by_wave_bs.setdefault((u.wave, u.bs), []).append(
                (u.plane, u.x0, u.y0, u.mode, n_above, n_left, tl_mode,
                 u.have_up, u.have_left))

        for wave in range(1, num_waves + 1):
            for bs in (4, 8, 16, 32):
                us = by_wave_bs.get((wave, bs))
                if not us:
                    continue
                cap = _pad_pow2(len(us), lo=8)
                cols = np.zeros((9, cap), np.int32)
                cols[2, :] = -32768  # padded y0 -> dropped
                for i, t in enumerate(us):
                    for j in range(9):
                        cols[j, i] = t[j]
                F = self.stages.intra_wave(
                    F, R, *(jnp.asarray(cols[j]) for j in range(9)),
                    bs=bs, bd=bd)
        return F


class LazyPlanes:
    """Planes of a device-decoded frame, materialized on first access.

    Output frames live in a device-resident uint8 ring; each dispatched
    batch schedules ONE background D2H of its ring rows (the tunnel's
    fixed device->host cost amortizes across the batch, and the transfer
    overlaps the next batch's host work).  Accessing a plane before its
    batch was dispatched triggers a queue flush."""

    def __init__(self, recon, slot, ha, wa):
        self._recon = recon
        self._slot = slot
        self._geom = (ha, wa)
        self._planes = None
        self._fut = None     # (future -> np rows, row index) once dispatched

    def _set_from_ring(self, row):
        ha, wa = self._geom
        hc, wc = ha >> 1, wa >> 1
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
    D2H per ring flush, sliced to the pending rows.  Frames outside the
    fast path (bd>8, scaled refs, 4:2:2/4:4:4, tight-cap overflow) run
    on the host oracle, bit-exact, and the affected device pool slots
    re-sync lazily before their next device use."""

    RING = 32
    BATCH = 16   # frames per dispatch batch (one ring fetch per batch:
                 # each device->host fetch pays a ~25 ms tunnel RTT)

    def __init__(self, validate_against_oracle: bool = False):
        from ..utils.jaxcache import enable_persistent_cache
        enable_persistent_cache()
        import jax
        import jax.numpy as jnp
        from . import fused, pack
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
        if all_lps:
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
        fetches."""
        self._dispatch_queue()
        import time as _time
        _t0 = _time.time()
        for lp in self._pending:
            lp._force()
        if self.profile:
            self._t_d2h += _time.time() - _t0
        self._pending = []
        self._ring_slot = 0

    def _can_run_on_device(self, plan, refs) -> bool:
        hdr = plan.hdr
        if hdr.bit_depth not in (8, 10, 12):
            return False
        if hdr.subsampling_x != 1 or hdr.subsampling_y != 1:
            return False
        if not hdr.frame_is_intra_only:
            for rb in refs.values():
                if rb is None:
                    continue
                if rb.width != hdr.width or rb.height != hdr.height:
                    return False  # scaled references: oracle path
        return True

    def _ensure_pool(self, plan):
        jnp = self.jnp
        hdr = plan.hdr
        wa = ((hdr.mi_cols + 7) & ~7) * 8
        ha = ((hdr.mi_rows + 7) & ~7) * 8
        geom = (ha, wa, hdr.bit_depth)
        if self._pool is None or self._pool_geom != geom:
            self.flush()
            nout = ha * wa + 2 * ((ha >> 1) * (wa >> 1))
            odt = jnp.uint8 if hdr.bit_depth == 8 else jnp.int16
            self._pool = jnp.zeros((8, 3, ha, wa), jnp.int32)
            self._ring = jnp.zeros((self.RING, nout), odt)
            self._pool_geom = geom
            self._slot_dirty = [True] * 8
        return ha, wa

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
        non-zero page count (each tier is its own compiled program; both
        the upload bytes and the in-step expansion scatter scale with the
        tier).  The page scatter runs inside the frame step (a separate
        expander program would break async dispatch pipelining).  Returns
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
        tier = next((t for t in ladder if nzp <= t), None)
        if tier is None:
            return None, 0  # dense frame: caller ships the whole buffer
        if native_compact is not None:
            return native_compact(flat, K, tier), tier
        pg = flat.reshape(K, PAGE)
        nz = np.flatnonzero(pg.any(axis=1))
        # compacted upload: header rows carry the page indices as
        # (low15, high) int16 pairs, then the non-zero pages.  Unused
        # index slots decode to a huge positive value and drop at the
        # in-step scatter.
        hr = (2 * tier + PAGE - 1) // PAGE
        comb = np.zeros((hr + tier, PAGE), np.int16)
        head = comb[:hr].reshape(-1)
        head[0:2 * len(nz):2] = nz & 0x7FFF
        head[1:2 * len(nz):2] = nz >> 15
        head[2 * len(nz):2 * tier] = 0x7FFF
        comb[hr:hr + len(nz)] = pg[nz]
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
        tier = "full" if hdr.frame_is_intra_only else "tight"
        bd = hdr.bit_depth
        step, caps, layout = self.fused.get_frame_step(
            hdr.mi_rows, hdr.mi_cols, tier, bool(hdr.lossless), bd=bd)

        ha, wa = self._ensure_pool(plan)
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

        def pack_with(caps, layout):
            if nparser is not None:
                # single-pass C++ packer on the parser's live state
                return nparser.pack(plan, refs, caps, layout,
                                    ring_slot=slot)
            f = self.pack.pack_frame(plan, refs, caps, layout)
            if f is not None:
                layout.view(f, "misc")[13] = slot
            return f

        flat = pack_with(caps, layout)
        if flat is None and tier == "tight":
            # dense frame: escalate to the worst-case "wide" device tier
            # (the host oracle is ~100x slower than a wide-step dispatch)
            tier = "wide"
            step, caps, layout = self.fused.get_frame_step(
                hdr.mi_rows, hdr.mi_cols, tier, bool(hdr.lossless), bd=bd)
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
                bd=bd, pages_tier=ptier)
            payload = comb
        else:
            payload = flat
        planes = LazyPlanes(self, slot, ha, wa)
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

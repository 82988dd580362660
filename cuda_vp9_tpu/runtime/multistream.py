"""Multi-stream batched decode (SURVEY.md P7; BASELINE config 5).

The reference decodes a single stream; the TPU design scales throughput by
decoding many independent streams per chip.  Two levels:

1. `MultiStreamDecoder` (this module, single chip): N independent decoder
   pipelines interleaved round-robin.  Every stream's fused frame step is
   dispatched asynchronously, so while stream i's frame executes on the
   device, streams i+1..N parse/pack on the host — host work and device
   work overlap across streams, and streams with the same frame geometry
   share one compiled step (module-level cache).  Output rings keep
   device->host fetches batched per stream.

2. `BatchedFusedDecoder` (below, single- or multi-chip): N same-geometry
   streams decoded in lockstep by ONE vmapped fused step per round; with
   a `jax.sharding.Mesh`, the stream axis is sharded over the mesh's
   'data' axis (pure data parallelism, zero collectives — see
   `fused.get_batched_step` and `__graft_entry__.dryrun_multichip`).

Usage:
    msd = MultiStreamDecoder(n_streams=4)
    while feeding:
        msd.put(stream_idx, packet)     # one compressed chunk
        for idx, frame in msd.ready():  # DecodedFrames, decode order
            ...
    for idx, frame in msd.flush():
        ...
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

from ..decoder.frame import NativeVp9Decoder
from .pipeline import TpuReconFused


class MultiStreamDecoder:
    """Round-robin multi-stream decoder with per-stream device pipelines."""

    def __init__(self, n_streams: int, lag: int = 32,
                 recon_factory=TpuReconFused):
        self.n = n_streams
        self.lag = lag
        self.recons = [recon_factory() for _ in range(n_streams)]
        self.decs = [NativeVp9Decoder(recon_fn=r) for r in self.recons]
        self._q: List[List] = [[] for _ in range(n_streams)]

    def put(self, stream: int, packet: bytes) -> None:
        """Feed one compressed chunk to a stream (dispatches its frame
        step(s) asynchronously)."""
        dec = self.decs[stream]
        dec.decode(packet)
        self._q[stream].extend(dec.frames())

    def ready(self) -> Iterator[Tuple[int, object]]:
        """Yield (stream, frame) pairs that are at least `lag` frames
        behind each stream's decode front (keeps output fetches batched)."""
        for s in range(self.n):
            while len(self._q[s]) > self.lag:
                yield s, self._q[s].pop(0)

    def flush(self) -> Iterator[Tuple[int, object]]:
        """Drain all pending frames (end of streams)."""
        for s in range(self.n):
            while self._q[s]:
                yield s, self._q[s].pop(0)

    def stats(self):
        return [{"device": r.frames_on_device, "host": r.frames_on_host}
                for r in self.recons]


# --------------------------------------------------------------- batched


_BFETCH_CACHE = {}
_SYNC_CACHE = {}


def _pool_syncer(S, pool_shape):
    """jitted donated batch pool-slot writer: (pool [N,8,3,ha,wa],
    idx [S,2], canvases [S,3,ha,wa]) -> pool with rows replaced
    in-place (donation).  Padded entries repeat the last real sync —
    writing the same canvas twice is idempotent, so no mask is needed."""
    key = (S, pool_shape)
    fn = _SYNC_CACHE.get(key)
    if fn is None:
        import jax

        def sync(pool, idx, canv):
            return pool.at[idx[:, 0], idx[:, 1]].set(canv)

        fn = jax.jit(sync, donate_argnums=0)
        _SYNC_CACHE[key] = fn
    return fn


def _bfetcher(s0, k, dtype, shape):
    """jitted r[:, s0:s0+k] ring-slot range slice for a batched ring
    [N, RING, nout] (static bounds: no scalar transfer).  The copy
    snapshots the rows on device so later donated steps can overwrite
    the ring while the background D2H drains."""
    key = (s0, k, dtype, shape)
    fn = _BFETCH_CACHE.get(key)
    if fn is None:
        import jax
        fn = jax.jit(lambda r: jax.lax.slice_in_dim(r, s0, s0 + k,
                                                    axis=1))
        _BFETCH_CACHE[key] = fn
    return fn


class _BatchLazyPlanes:
    """Planes of one stream's device-decoded frame in a batched round."""

    def __init__(self, group, stream, slot, ha, wa, bd):
        self._group = group
        self._stream = stream
        self._slot = slot
        self._geom = (ha, wa)
        self._bd = bd
        self._planes = None
        self._fut = None       # (future -> np [N, k, nout], row index k)

    def _set_from_row(self, row):
        import numpy as np
        ha, wa = self._geom
        hc, wc = ha >> 1, wa >> 1
        ny, nc = ha * wa, hc * wc
        self._planes = [
            row[:ny].reshape(ha, wa).astype(np.uint16),
            row[ny:ny + nc].reshape(hc, wc).astype(np.uint16),
            row[ny + nc:ny + 2 * nc].reshape(hc, wc).astype(np.uint16)]

    def _force(self):
        if self._planes is None:
            if self._fut is None:
                self._group.flush()
            fut, k = self._fut
            self._set_from_row(fut.result()[self._stream, k])
        return self._planes

    def __getitem__(self, i):
        return self._force()[i]

    def __len__(self):
        return 3

    def __iter__(self):
        return iter(self._force())


class BatchedRecon:
    """Per-stream recon facade over a shared _BatchGroup.

    Presents the same recon_fn interface as TpuReconFused, but instead
    of dispatching per frame it buffers the packed payload; the group
    dispatches ONE vmapped step for all streams per round."""

    def __init__(self, group, stream):
        self._g = group
        self._s = stream
        self.frames_on_device = 0
        self.frames_on_host = 0

    def __call__(self, plan, refs):
        out = self._g.recon(self._s, plan, refs)
        if isinstance(out, _BatchLazyPlanes):
            self.frames_on_device += 1
        else:
            self.frames_on_host += 1
        return out

    def flush(self):
        self._g.flush()


class BatchedFusedDecoder:
    """N same-geometry streams decoded in lockstep: one vmapped fused
    dispatch reconstructs frame i of EVERY stream (SURVEY P7; BASELINE
    config 5).  With a `jax.sharding.Mesh`, the stream axis is sharded
    over the mesh's 'data' axis so streams scale over chips with no
    cross-chip communication.

    Usage:
        bd = BatchedFusedDecoder(n_streams=16, mesh=None)
        for round_packets in zip(*stream_packet_lists):
            bd.decode_round(list(round_packets))
        for s, frame in bd.drain():
            ...
    """

    RING = 32

    def __init__(self, n_streams: int, mesh=None,
                 validate_against_oracle: bool = False,
                 defer_output: bool = False):
        from ..utils.jaxcache import enable_persistent_cache
        enable_persistent_cache()
        import concurrent.futures as _cf
        import jax
        import jax.numpy as jnp
        import numpy as np
        from .. import models as M
        self.jax, self.jnp, self.np = jax, jnp, np
        self.n = n_streams
        # defer_output: decode_perf_test semantics — no device->host
        # output fetches; frames stay in the HBM rings (see
        # pipeline.TpuReconFused.defer_output)
        self.defer_output = defer_output
        self.mesh = mesh
        self.validate = validate_against_oracle
        self.kernels = jnp.asarray(M.FILTER_KERNELS.astype(np.int32))
        self.recons = [BatchedRecon(self, s) for s in range(n_streams)]
        self.decs = [NativeVp9Decoder(recon_fn=r) for r in self.recons]
        self._geom = None          # (ha, wa, bd)
        self._caps = self._layout = None          # tight tier
        self._caps_w = self._layout_w = None      # wide escalation tier
        self._pool = None          # [N, 8, 3, ha, wa] int32
        self._ring = None          # [N, RING, nout]
        self._ring_slot = 0
        self._slot_dirty = [[True] * 8 for _ in range(n_streams)]
        self._round_flats = [None] * n_streams    # (flat, is_wide)
        self._round_lps = [None] * n_streams
        self._syncs = []           # (stream, slot, canvas) pool updates
        self._pending = []
        self._out = [[] for _ in range(n_streams)]
        self._d2h_pool = _cf.ThreadPoolExecutor(max_workers=1)
        # rounds awaiting their output fetch: [(ring_slot, [lps])];
        # fetched FETCH_EVERY rounds at a time in ONE background D2H
        # (each device->host fetch pays the tunnel's ~24 ms fixed cost —
        # a per-round fetch alone would cap 16 streams near 40 fps)
        self._unfetched = []
        # page-tier floor: sticky running max so per-round content
        # changes don't bounce between compiled step variants mid-run
        self._page_tier_floor = 0
        # wall timers (diagnostics; printed by profiling tools)
        self._tw = {"sync": 0.0, "remap": 0.0, "count": 0.0,
                    "compact": 0.0, "stack": 0.0, "dispatch": 0.0,
                    "tiers": set()}

    FETCH_EVERY = 8

    # ------------------------------------------------------------ state

    def _ensure_state(self, hdr):
        jnp = self.jnp
        wa = ((hdr.mi_cols + 7) & ~7) * 8
        ha = ((hdr.mi_rows + 7) & ~7) * 8
        geom = (ha, wa, hdr.bit_depth)
        if self._geom is None:
            from . import fused
            self._geom = geom
            self._mi_rows, self._mi_cols = hdr.mi_rows, hdr.mi_cols
            self._lossless = bool(hdr.lossless)
            _, self._caps, self._layout = fused.get_batched_step(
                self.n, hdr.mi_rows, hdr.mi_cols, self._lossless,
                hdr.bit_depth, mesh=self.mesh, tier="tight")
            _, self._caps_w, self._layout_w = fused.get_batched_step(
                self.n, hdr.mi_rows, hdr.mi_cols, self._lossless,
                hdr.bit_depth, mesh=self.mesh, tier="wide")
            nout = ha * wa + 2 * ((ha >> 1) * (wa >> 1))
            odt = jnp.uint8 if hdr.bit_depth == 8 else jnp.int16
            pool = jnp.zeros((self.n, 8, 3, ha, wa), jnp.int32)
            ring = jnp.zeros((self.n, self.RING, nout), odt)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                sh = NamedSharding(self.mesh, P("data"))
                pool = self.jax.device_put(pool, sh)
                ring = self.jax.device_put(ring, sh)
            self._pool, self._ring = pool, ring
        elif self._geom != geom:
            raise ValueError("batched decode requires constant geometry "
                             f"(have {self._geom}, got {geom})")
        return ha, wa

    # ------------------------------------------------------------ recon

    def _can_run_on_device(self, plan, refs):
        hdr = plan.hdr
        if hdr.bit_depth not in (8, 10, 12):
            return False
        if hdr.subsampling_x != 1 or hdr.subsampling_y != 1:
            return False
        if not hdr.frame_is_intra_only:
            for rb in refs.values():
                if rb is not None and (rb.width != hdr.width
                                       or rb.height != hdr.height):
                    return False
        return True

    def recon(self, s, plan, refs):
        from ..ops.ref import recon as ref_recon
        np = self.np
        hdr = plan.hdr
        if self._geom is not None:
            wa = ((hdr.mi_cols + 7) & ~7) * 8
            ha = ((hdr.mi_rows + 7) & ~7) * 8
            if (ha, wa, hdr.bit_depth) != self._geom:
                # mid-stream resize in ONE stream must not kill the
                # batch: that stream's frame takes the host oracle (its
                # slots re-sync lazily when the geometry returns)
                planes = ref_recon.reconstruct_frame(plan, refs)
                for i in range(8):
                    if hdr.refresh_frame_flags & (1 << i):
                        self._slot_dirty[s][i] = True
                return planes
        if self._geom is not None \
                and bool(hdr.lossless) != self._lossless:
            # per-frame lossless flips need a different step layout:
            # host oracle for the odd frame
            planes = ref_recon.reconstruct_frame(plan, refs)
            for i in range(8):
                if hdr.refresh_frame_flags & (1 << i):
                    self._slot_dirty[s][i] = True
            return planes
        if not self._can_run_on_device(plan, refs):
            planes = ref_recon.reconstruct_frame(plan, refs)
            for i in range(8):
                if hdr.refresh_frame_flags & (1 << i):
                    self._slot_dirty[s][i] = True
            return planes
        if self._round_lps[s] is not None:
            # superframe: this stream produced a second frame in one
            # packet -- dispatch the in-flight round first
            self._dispatch_round()
        ha, wa = self._ensure_state(hdr)
        slot = self._ring_slot
        nparser = getattr(plan, "native_parser", None)

        def try_pack(caps, layout):
            if nparser is not None:
                return nparser.pack(plan, refs, caps, layout,
                                    ring_slot=slot)
            from . import pack as packmod
            f = packmod.pack_frame(plan, refs, caps, layout)
            if f is not None:
                layout.view(f, "misc")[13] = slot
            return f

        # tight tier first; dense frames (keyframes, scene cuts)
        # escalate to the wide tier -- the whole round remaps (segment
        # copy) so the batch still dispatches as ONE step
        is_wide = False
        flat = try_pack(self._caps, self._layout)
        if flat is None:
            flat = try_pack(self._caps_w, self._layout_w)
            is_wide = True
        if flat is None:   # beyond even wide caps: host oracle
            planes = ref_recon.reconstruct_frame(plan, refs)
            for i in range(8):
                if hdr.refresh_frame_flags & (1 << i):
                    self._slot_dirty[s][i] = True
            return planes
        if not hdr.frame_is_intra_only:
            for k, rb in refs.items():
                if rb is None:
                    continue
                rslot = hdr.ref_frame_idx[k - 1]
                if self._slot_dirty[s][rslot]:
                    canvas = np.zeros((3, ha, wa), np.int32)
                    for p in range(3):
                        pl = rb.planes[p]
                        canvas[p, :pl.shape[0], :pl.shape[1]] = pl
                    self._syncs.append((s, rslot, canvas))
                    self._slot_dirty[s][rslot] = False
        lp = _BatchLazyPlanes(self, s, slot, ha, wa, hdr.bit_depth)
        self._round_flats[s] = (flat, is_wide)
        self._round_lps[s] = lp
        self._pending.append(lp)
        for i in range(8):
            if hdr.refresh_frame_flags & (1 << i):
                self._slot_dirty[s][i] = False
        return lp

    # ------------------------------------------------------------ rounds

    def decode_round(self, packets):
        """Feed one packet per stream (None = no data for that stream
        this round) and dispatch ONE batched device step."""
        for s, p in enumerate(packets):
            if p is not None:
                self.decs[s].decode(p)
                self._out[s].extend(self.decs[s].frames())
        self._dispatch_round()

    def _dispatch_round(self):
        import time as _time
        jax, jnp, np = self.jax, self.jnp, self.np
        if self._geom is None:
            return
        from . import fused, pack as packmod
        from .pipeline import _tier_ladder
        if all(f is None for f in self._round_flats) and not self._syncs:
            return
        ha, wa, bd = self._geom
        # ordered pool syncs for host-produced reference slots: ONE
        # stacked H2D + ONE donated jitted scatter for the whole round
        # (a bare pool.at[s,i].set outside jit copies the entire
        # [N,8,3,ha,wa] pool per slot — ~90 MB at 16x640x360)
        _t0 = _time.time()
        if self._syncs:
            S = 1 << (len(self._syncs) - 1).bit_length()
            syncs = self._syncs + [self._syncs[-1]] * (S - len(self._syncs))
            idx = np.array([(s, i) for (s, i, _) in syncs], np.int32)
            canv = np.stack([c for (_, _, c) in syncs])
            self._pool = _pool_syncer(S, self._pool.shape)(
                self._pool, jnp.asarray(idx), jnp.asarray(canv))
            self._syncs = []
        self._tw["sync"] += _time.time() - _t0
        if all(f is None for f in self._round_flats):
            return
        PAGE = packmod.PAGE
        use_wide = any(f is not None and f[1] for f in self._round_flats)
        layout = self._layout_w if use_wide else self._layout
        nflat = (layout.size + PAGE - 1) // PAGE * PAGE
        K = nflat // PAGE
        # zero payload = identity step for streams with no frame.  Its
        # ring write must target THIS round's slot: a zero misc[13]
        # would clobber ring row 0 — a prior round's output that the
        # deferred batched fetch may not have read yet
        _t0 = _time.time()
        flats = []
        for f in self._round_flats:
            if f is None:
                z = np.zeros(nflat, np.int16)
                layout.view(z, "misc")[13] = self._ring_slot
                flats.append(z)
            elif use_wide and not f[1]:
                flats.append(self._remap_wide(f[0]))
            else:
                flats.append(f[0])
        # shared trip counts: elementwise max of every stream's misc.
        # Passed UNBATCHED to the vmapped step so all fori_loops keep a
        # shared trip (per-stream trips lower to predicated while_loops
        # that select over the whole batched carry every iteration —
        # measured ~20x the cost of N sequential steps).  Trip slots
        # max correctly; slot 13 (ring slot) is round-constant; the
        # data-boundary slots (0-3 counts, 23-25 n_ref0) are read
        # per-stream from misc inside the step, never from trips.
        trips = np.maximum.reduce(
            [np.asarray(layout.view(f, "misc"), np.int32) for f in flats])
        self._tw["remap"] += _time.time() - _t0
        _t0 = _time.time()
        # shared page tier: smallest that fits every stream's frame
        try:
            from ..native import native_compact, native_count_pages
            nzp = max(native_count_pages(f, K) for f in flats)
        except Exception:
            native_compact = None
            nzp = max(int(f.reshape(K, PAGE).any(axis=1).sum())
                      for f in flats)
        self._tw["count"] += _time.time() - _t0
        _t0 = _time.time()
        nzp = max(nzp, self._page_tier_floor)
        tier = next((t for t in _tier_ladder(K) if nzp <= t), None)
        self._page_tier_floor = tier or 0
        if tier is not None:
            if native_compact is not None:
                combs = [native_compact(f, K, tier) for f in flats]
            else:
                combs = [self._np_compact(f, K, tier, PAGE) for f in flats]
            payload = np.stack(combs)
        else:
            payload = np.stack(flats)
            tier = 0
        self._tw["compact"] += _time.time() - _t0
        self._tw["tiers"].add(("wide" if use_wide else "tight", tier))
        _t0 = _time.time()
        step, _, _ = fused.get_batched_step(
            self.n, self._mi_rows, self._mi_cols, self._lossless, bd,
            pages_tier=tier, mesh=self.mesh,
            tier="wide" if use_wide else "tight")
        payload_d = jnp.asarray(payload)
        self._tw["stack"] += _time.time() - _t0
        _t0 = _time.time()
        self._pool, self._ring = step(self._pool, self._ring,
                                      self.kernels, payload_d,
                                      jnp.asarray(trips))
        self._tw["dispatch"] += _time.time() - _t0
        if not self.defer_output:
            self._unfetched.append(
                (self._ring_slot,
                 [lp for lp in self._round_lps if lp is not None]))
        if len(self._unfetched) >= self.FETCH_EVERY:
            self._flush_fetch()
        self._round_flats = [None] * self.n
        self._round_lps = [None] * self.n
        self._ring_slot = (self._ring_slot + 1) % self.RING
        if self._ring_slot == 0:
            self._flush_fetch()   # ring wraps: snapshot before overwrite
            self._pending = [lp for lp in self._pending
                             if lp._planes is not None or lp._fut is not None]

    def _flush_fetch(self):
        """ONE background D2H for all rounds since the last fetch (their
        ring slots are contiguous: the slot counter only resets at a
        wrap, which forces a fetch first)."""
        if not self._unfetched:
            return
        np = self.np
        s0 = self._unfetched[0][0]
        k = len(self._unfetched)
        assert self._unfetched[-1][0] == s0 + k - 1
        rows = _bfetcher(s0, k, self._ring.dtype.str,
                         self._ring.shape)(self._ring)
        fut = self._d2h_pool.submit(np.asarray, rows)
        for j, (_, lps) in enumerate(self._unfetched):
            for lp in lps:
                lp._fut = (fut, j)
        self._unfetched = []

    def _remap_wide(self, flat_t):
        """Expand a tight-tier flat pack into the wide layout: pure
        per-segment copy (capacities only grow, fill counts and misc
        scalars stay valid), so escalation never re-packs a stream."""
        np = self.np
        PAGE = 512
        nflat = (self._layout_w.size + PAGE - 1) // PAGE * PAGE
        out = np.zeros(nflat, np.int16)
        for name, (off, shape) in self._layout.segs.items():
            src = self._layout.view(flat_t, name)
            dst = self._layout_w.view(out, name)
            if src.shape == dst.shape:
                dst[:] = src
            else:
                dst[:src.shape[0]] = src
        return out

    @staticmethod
    def _np_compact(flat, K, tier, PAGE):
        import numpy as np
        pg = flat.reshape(K, PAGE)
        nz = np.flatnonzero(pg.any(axis=1))
        # gather layout (see pipeline._compact)
        hr = (K + PAGE - 1) // PAGE
        comb = np.zeros((hr + 1 + tier, PAGE), np.int16)
        head = comb[:hr].reshape(-1)
        head[nz] = np.arange(1, len(nz) + 1)
        comb[hr + 1:hr + 1 + len(nz)] = pg[nz]
        return comb

    # ------------------------------------------------------------ output

    def flush(self):
        self._dispatch_round()
        self._flush_fetch()
        if not self.defer_output:
            for lp in self._pending:
                if isinstance(lp, _BatchLazyPlanes):
                    lp._force()
        self._pending = []

    def sync(self) -> int:
        """Dispatch everything queued and block until the device has
        executed it WITHOUT transferring outputs: fetches an 8-byte
        checksum of the output rings (data-dependent on every
        dispatched round) — the deferred-output timing barrier."""
        self._dispatch_round()
        self._pending = []
        import jax
        import numpy as np
        fn = jax.jit(lambda r: jax.numpy.sum(
            r.astype(jax.numpy.int32), dtype=jax.numpy.int32))
        return int(np.asarray(fn(self._ring)))

    def drain(self):
        """Yield (stream, DecodedFrame) for everything decoded so far."""
        self.flush()
        for s in range(self.n):
            for fr in self._out[s]:
                yield s, fr
            self._out[s] = []

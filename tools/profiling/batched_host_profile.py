"""Host-side cost profile of one BatchedFusedDecoder round (no device).

The round-2 measurement showed the isolated batched device step is fast
(10.7 ms / 16 frames at 640x360) while the aggregate mode runs at
11.5 fps — so ~99% of a round is host work.  This probe replays a real
stream's frames through the exact per-round host path (tight pack ->
wide escalate -> remap -> count -> compact -> stack) x N streams and
times each piece, CPU-only.

Usage: python tools/profiling/batched_host_profile.py [ivf] [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

from cuda_vp9_tpu.decoder.frame import NativeVp9Decoder  # noqa: E402
from cuda_vp9_tpu.runtime import pack as packmod  # noqa: E402
from cuda_vp9_tpu.runtime.pipeline import _tier_ladder  # noqa: E402

IVF = sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures/tl01_640x360_t2.ivf"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 16

from cuda_vp9_tpu.containers import IvfReader  # noqa: E402

try:
    from cuda_vp9_tpu.native import native_compact, native_count_pages
except Exception:
    native_compact = native_count_pages = None
    print("native compact unavailable")

T = {}


def clock(key, fn, *a, **kw):
    t0 = time.perf_counter()
    out = fn(*a, **kw)
    T[key] = T.get(key, 0.0) + time.perf_counter() - t0
    return out


state = {}
n_wide_frames = 0
rounds = 0


def tap(plan, refs):
    """Recon hook: runs the per-round batched host path on the LIVE
    native-parser state, N times per frame (one per simulated stream),
    then reconstructs via the oracle so decode can continue."""
    global n_wide_frames, rounds
    from cuda_vp9_tpu.ops.ref import recon as ref_recon
    hdr = plan.hdr
    if not state:
        mi_rows, mi_cols = hdr.mi_rows, hdr.mi_cols
        caps_t = packmod.compute_caps(mi_rows, mi_cols, "tight", False)
        lay_t = packmod.build_layout(caps_t, mi_rows, mi_cols, False)
        caps_w = packmod.compute_caps(mi_rows, mi_cols, "wide", False)
        lay_w = packmod.build_layout(caps_w, mi_rows, mi_cols, False)
        PAGE = packmod.PAGE
        state.update(caps_t=caps_t, lay_t=lay_t, caps_w=caps_w,
                     lay_w=lay_w,
                     K_t=(lay_t.size + PAGE - 1) // PAGE,
                     K_w=(lay_w.size + PAGE - 1) // PAGE)
        print(f"layout tight {lay_t.size * 2 / 1e6:.2f} MB "
              f"({state['K_t']} pages), wide {lay_w.size * 2 / 1e6:.2f} "
              f"MB ({state['K_w']} pages)")
    rounds += 1
    nparser = getattr(plan, "native_parser", None)
    PAGE = packmod.PAGE

    def try_pack(caps, layout):
        if nparser is not None:
            return nparser.pack(plan, refs, caps, layout, ring_slot=0)
        return packmod.pack_frame(plan, refs, caps, layout)

    # N streams pack this frame (copy per stream, as the real mode does)
    flat = clock("pack_tight", try_pack, state["caps_t"], state["lay_t"])
    is_wide = False
    if flat is None:
        flat = clock("pack_wide", try_pack, state["caps_w"], state["lay_w"])
        is_wide = True
        n_wide_frames += 1
    if flat is not None:
        for _ in range(N - 1):
            if is_wide:
                clock("pack_wide", try_pack, state["caps_w"], state["lay_w"])
            else:
                clock("pack_tight", try_pack, state["caps_t"],
                      state["lay_t"])
        K = state["K_w"] if is_wide else state["K_t"]
        flats = [flat] * N
        if native_count_pages is not None:
            nzp = clock("count_pages", lambda: max(
                native_count_pages(f, K) for f in flats))
        else:
            nzp = clock("count_pages", lambda: max(
                int(f.reshape(K, PAGE).any(axis=1).sum()) for f in flats))
        tier = next((t for t in _tier_ladder(K) if nzp <= t), None)
        if tier is not None and native_compact is not None:
            combs = clock("compact", lambda: [
                native_compact(f, K, tier) for f in flats])
            clock("stack", np.stack, combs)
        else:
            clock("stack", np.stack, flats)
    return ref_recon.reconstruct_frame(plan, refs)


dec = NativeVp9Decoder(recon_fn=tap)
with IvfReader(IVF) as rd:
    for pkt, _ in rd:
        dec.decode(pkt)
        list(dec.frames())

tot = sum(T.values())
print(f"\nframes={rounds} wide={n_wide_frames}  (per-round = per-frame x {N})")
for k, v in sorted(T.items(), key=lambda kv: -kv[1]):
    print(f"  {k:14s} {v:8.3f} s total  {v / rounds * 1000:8.2f} ms/round")
print(f"  {'TOTAL':14s} {tot:8.3f} s        {tot / rounds * 1000:8.2f} ms/round"
      f"  -> {N * rounds / tot:.1f} fps aggregate ceiling (host-bound)")

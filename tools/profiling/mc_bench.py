"""MC-pass microbenchmark: current banded-Mh formulation vs the
segment-window formulation and group-staged scatters, at dense-4K
geometry, on the real device.  Checks bit-exactness of the variants
against the production _mc_chunk before timing.

Usage: python tools/profiling/mc_bench.py [mi_rows mi_cols]
"""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))
import numpy as np
import jax
import jax.numpy as jnp
from cuda_vp9_tpu.runtime import fused, pack
from cuda_vp9_tpu import models as M

I32 = jnp.int32
mi_rows, mi_cols = (int(sys.argv[1]), int(sys.argv[2])) \
    if len(sys.argv) > 2 else (272, 480)   # 4K
ha = ((mi_rows + 7) & ~7) * 8
wa = ((mi_cols + 7) & ~7) * 8
br, stride = pack.band_params(ha)
bd = 8
maxv = (1 << bd) - 1
CH = int(os.environ.get("MC_CH", pack.CHUNK_MC16))
w = h = 16
rng = np.random.default_rng(0)

# ---- synthetic dense mc16 tiles: full luma coverage, random MVs ----
cw, chh = wa - 8, ha - 6          # crop a bit inside the canvas
tiles = []
for ty in range(ha // 16):
    for tx in range(wa // 16):
        dx, dy = tx * 16, ty * 16
        mvr = int(rng.integers(-48, 48))
        mvc = int(rng.integers(-48, 48))
        x0 = dx + (mvc >> 2)
        y0 = dy + (mvr >> 2)
        spx = (mvc & 3) << 2
        spy = (mvr & 3) << 2
        filt = int(rng.integers(0, 4))
        tiles.append((0, dx, dy + 1, 0, x0, y0, spx, spy, filt,
                      cw, chh, 0))
tiles = np.array(tiles, np.int64)
# give some tiles extreme MVs to exercise clamping (dests stay unique:
# real pack output never duplicates a non-avg destination)
ext = rng.choice(len(tiles), 64, replace=False)
tiles[ext, 4] = rng.integers(-200, wa + 200, 64)
tiles[ext, 5] = rng.integers(-200, ha + 200, 64)
tiles[ext, 6] = rng.integers(0, 16, 64)
tiles[ext, 7] = rng.integers(0, 16, 64)
print(f"{len(tiles)} tiles")

# group by srow band exactly like pack._pack_mc
rmin = np.clip(tiles[:, 5] - 3, 0, tiles[:, 10] - 1)
srow = np.clip((rmin // stride) * stride, 0, ha - br)
order = np.lexsort((srow, tiles[:, 0], tiles[:, 3], tiles[:, 11]))
tiles = tiles[order]
srow = srow[order]
gkey = srow
starts = np.nonzero(np.r_[True, gkey[1:] != gkey[:-1]])[0]
ends = np.r_[starts[1:], len(tiles)]
# project to the 6-field wire rows + 8-wide chunk headers
# (runtime/pack.py build_layout: dx, dy+1, sr, sc, filt, 0)
units_l, hdrs_l = [], []
for s, e in zip(starts, ends):
    for k0 in range(s, e, CH):
        part = tiles[k0:min(k0 + CH, e)]
        u = np.zeros((CH, 6), np.int16)
        u[:len(part), 0] = part[:, 1]
        u[:len(part), 1] = part[:, 2]
        u[:len(part), 2] = ((part[:, 5] - (part[:, 2] - 1)) << 4)             | part[:, 7]
        u[:len(part), 3] = ((part[:, 4] - part[:, 1]) << 4) | part[:, 6]
        u[:len(part), 4] = part[:, 8]
        units_l.append(u)
        hdrs_l.append((0, 0, srow[s], part[0, 9], part[0, 10], 0, 0, 0))
n_chunks = len(units_l)
CAPC = n_chunks + 8
mc_units = np.zeros((CAPC, CH, 6), np.int16)
mc_units[:n_chunks] = np.stack(units_l)
mc_hdrs = np.zeros((CAPC, 8), np.int16)
mc_hdrs[:n_chunks] = np.array(hdrs_l, np.int16)
print(f"{n_chunks} chunks of {CH}")

pool = np.zeros((8, 3, ha, wa), np.int32)
pool[0, 0, :chh, :cw] = rng.integers(0, 256, (chh, cw))
pool_d = jnp.asarray(pool)
kernels = jnp.asarray(M.FILTER_KERNELS.astype(np.int32))
units_d = jnp.asarray(mc_units.astype(np.int16)).astype(I32)
hdrs_d = jnp.asarray(mc_hdrs.astype(np.int16)).astype(I32)


# ---------------------------------------------------------------- variant A
@jax.jit
def run_A(pool, units, hdrs):
    F = jnp.zeros((3, ha, wa), I32)
    return fused._mc_pass(F, pool, kernels, units, hdrs, n_chunks,
                          n_chunks, w, h, br, bd)


# ---------------------------------------------------------------- variant B
# segment-window compute: tiny one-hot over 8-col segments -> 32-wide
# per-tile window (one MXU matmul), per-tile [32, 16] banded filter
# matrix with in-window edge clamping, row-selection one-hot on the
# 23-row slab only.
def mc_chunk_compute_segw(pool, kernels, hd, u, w, h, br, bd):
    N = u.shape[0]
    wa_ = pool.shape[3]
    S = (wa_ + 32) // 8                 # segments incl. +32 zero pad
    dx = u[:, 1]
    x0, y0, spx, spy = u[:, 4], u[:, 5], u[:, 6], u[:, 7]
    filt, cwv, chv = u[:, 8], u[:, 9], u[:, 10]
    ih = h + 7
    maxv = (1 << bd) - 1

    band = jax.lax.dynamic_slice(
        pool, (hd[0], hd[1], hd[2], 0), (1, 1, br, wa_))[0, 0]
    bandp = jnp.pad(band, ((0, 0), (0, 32)))
    band_r = bandp.reshape(br, S, 8)
    fx = kernels[filt, spx & 15]
    fy = kernels[filt, spy & 15]
    xs = x0 + (spx >> 4) - 3
    lo = jnp.clip(xs, 0, cwv - 1)
    q = jnp.minimum(lo >> 3, (wa_ + 32) // 8 - 4)
    # one-hot over (4 consecutive segments): OHq4 [N, 4, S]
    segs = jnp.arange(S, dtype=I32)[None, None, :]
    t4 = jnp.arange(4, dtype=I32)[None, :, None]
    oh = (segs == (q[:, None, None] + t4)).astype(jnp.float32)
    mdt = jnp.bfloat16 if bd == 8 else jnp.float32
    prec = None if bd == 8 else jax.lax.Precision.HIGHEST
    # W4 [N, 4, br, 8] -> W [N, br, 32]
    W4 = jax.lax.dot_general(
        oh.astype(mdt), band_r.astype(mdt),
        (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    W = W4.transpose(0, 2, 1, 3).reshape(N, br, 32)
    # row selection first: rows rr [N, ih] -> Wr [N, ih, 32]
    rr = jnp.clip(y0[:, None] - 3 + jnp.arange(ih, dtype=I32)[None, :],
                  0, chv[:, None] - 1) - hd[2]
    oh_r = (rr[:, :, None] == jnp.arange(br, dtype=I32)[None, None, :]
            ).astype(jnp.float32)
    Wr = jax.lax.dot_general(
        oh_r, W, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)          # [N, ih, 32]
    # per-tile banded filter matrix Mf [N, 32, w] with in-window clamp
    c_idx = jnp.arange(w, dtype=I32)[None, :]
    jj = jnp.arange(32, dtype=I32)[None, :, None]
    Mf = jnp.zeros((N, 32, w), jnp.float32)
    for k in range(8):
        tgt = jnp.clip(xs[:, None] + c_idx + k, 0, cwv[:, None] - 1) \
            - (q[:, None] << 3)                        # [N, w]
        Mf = Mf + fx[:, k, None, None] * (tgt[:, None, :] == jj)
    winh = jax.lax.dot_general(
        Wr, Mf, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)          # [N, ih, w]
    temp = jnp.clip((winh.astype(I32) + 64) >> 7, 0, maxv)
    acc = jnp.zeros((N, h, w), I32)
    for k in range(8):
        acc = acc + fy[:, k, None, None] * temp[:, k:k + h, :]
    return jnp.clip((acc + 64) >> 7, 0, maxv)


def scatter_tiles(F, u, out, w, h, valid=None):
    plane, dx = u[:, 0], u[:, 1]
    dy = jnp.where(u[:, 2] == 0, -(1 << 20), u[:, 2] - 1)
    if valid is not None:
        dy = jnp.where(valid, dy, -(1 << 20))
    rows_o = dy[:, None, None] + jnp.arange(h, dtype=I32)[None, :, None]
    cols_o = dx[:, None, None] + jnp.arange(w, dtype=I32)[None, None, :]
    return F.at[plane[:, None, None], rows_o, cols_o].set(out, mode="drop")


@jax.jit
def run_B(pool, units, hdrs):
    F = jnp.zeros((3, ha, wa), I32)

    def body(i, F):
        u = jax.lax.dynamic_index_in_dim(units, i, 0, False)
        hd = jax.lax.dynamic_index_in_dim(hdrs, i, 0, False)
        out = mc_chunk_compute_segw(pool, kernels, hd, u, w, h, br, bd)
        return scatter_tiles(F, u, out, w, h)
    return jax.lax.fori_loop(0, n_chunks, body, F)


# ---------------------------------------------------------------- variant C
G = max(1, 512 // CH)


def make_run_C(G):
    @jax.jit
    def run_C(pool, units, hdrs):
        F = jnp.zeros((3, ha, wa), I32)
        n_groups = (n_chunks + G - 1) // G

        def body(g, F):
            stage = jnp.zeros((G * CH, h, w), I32)
            us = []
            valids = []
            for j in range(G):
                ci = g * G + j
                u = jax.lax.dynamic_index_in_dim(units, ci, 0, False)
                hd = jax.lax.dynamic_index_in_dim(hdrs, ci, 0, False)
                out = mc_chunk_compute_segw(pool, kernels, hd, u, w, h,
                                            br, bd)
                stage = jax.lax.dynamic_update_slice(
                    stage, out, (j * CH, 0, 0))
                us.append(u)
                valids.append(jnp.full((CH,), ci < n_chunks))
            uu = jnp.concatenate(us)
            vv = jnp.concatenate(valids)
            return scatter_tiles(F, uu, stage, w, h, valid=vv)
        return jax.lax.fori_loop(0, n_groups, body, F)
    return run_C


# ---------------------------------------------------------------- check
print("compiling / checking bit-exactness...", flush=True)
run_A_ok = CH == pack.CHUNK_MC16
FB = np.asarray(run_B(pool_d, units_d, hdrs_d))
runC = make_run_C(G)
FC = np.asarray(runC(pool_d, units_d, hdrs_d))
FA = np.asarray(run_A(pool_d, units_d, hdrs_d)) if run_A_ok else FB
for name, FX in (("B", FB), ("C", FC)):
    if not np.array_equal(FA, FX):
        d = np.nonzero(FA - FX)
        print(f"variant {name} MISMATCH: {len(d[0])} px, "
              f"first {d[1][:5]},{d[2][:5]}")
        sys.exit(1)
print("bit-exact OK", flush=True)

# ---------------------------------------------------------------- timing
fetch = jax.jit(lambda F: F[0, :1, :1])


def timeit(fn, n=8):
    _ = np.asarray(fetch(fn(pool_d, units_d, hdrs_d)))
    ts = []
    for _ in range(3):
        t0 = time.time()
        Fs = [fn(pool_d, units_d, hdrs_d) for _ in range(n)]
        _ = np.asarray(fetch(Fs[-1]))
        ts.append(time.time() - t0)
    return min(ts) / n


# RTT
t_rtt = []
F0 = run_A(pool_d, units_d, hdrs_d)
for _ in range(5):
    t0 = time.time()
    _ = np.asarray(fetch(F0))
    t_rtt.append(time.time() - t0)
rtt = min(t_rtt)
print(f"RTT {1e3*rtt:.1f} ms")

variants = [("B segw", run_B), ("C segw+staged", runC)]
if run_A_ok:
    variants.insert(0, ("A current", run_A))
for name, fn in variants:
    t = timeit(fn)
    print(f"{name}: {1e3*(t - rtt/8):.1f} ms/pass "
          f"({1e3*(t - rtt/8)/n_chunks*1e3:.0f} us/chunk)", flush=True)

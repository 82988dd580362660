"""Ablate the segment-window MC chunk compute to find the dominant cost.
Each variant nulls out one stage (shapes preserved).  Not bit-exact —
timing only.  Usage: MC_CH=256 python tools/profiling/mc_ablate.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))
import numpy as np
import jax
import jax.numpy as jnp
from cuda_vp9_tpu.runtime import pack
from cuda_vp9_tpu import models as M

I32 = jnp.int32
mi_rows, mi_cols = 272, 480
ha, wa = mi_rows * 8, mi_cols * 8
br, stride = pack.band_params(ha)
bd = 8
CH = int(os.environ.get("MC_CH", "256"))
w = h = 16
rng = np.random.default_rng(0)

cw, chh = wa - 8, ha - 6
tiles = []
for ty in range(ha // 16):
    for tx in range(wa // 16):
        dx, dy = tx * 16, ty * 16
        mvr = int(rng.integers(-48, 48))
        mvc = int(rng.integers(-48, 48))
        tiles.append((0, dx, dy + 1, 0, dx + (mvc >> 2), dy + (mvr >> 2),
                      (mvc & 3) << 2, (mvr & 3) << 2,
                      int(rng.integers(0, 4)), cw, chh, 0))
tiles = np.array(tiles, np.int64)
rmin = np.clip(tiles[:, 5] - 3, 0, tiles[:, 10] - 1)
srow = np.clip((rmin // stride) * stride, 0, ha - br)
order = np.lexsort((srow,))
tiles, srow = tiles[order], srow[order]
starts = np.nonzero(np.r_[True, srow[1:] != srow[:-1]])[0]
ends = np.r_[starts[1:], len(tiles)]
units_l, hdrs_l = [], []
for s, e in zip(starts, ends):
    for k0 in range(s, e, CH):
        part = tiles[k0:min(k0 + CH, e)]
        u = np.zeros((CH, 12), np.int16)
        u[:len(part)] = part
        units_l.append(u)
        hdrs_l.append((0, 0, srow[s], 0))
n_chunks = len(units_l)
mc_units = np.zeros((n_chunks + 2, CH, 12), np.int16)
mc_units[:n_chunks] = np.stack(units_l)
mc_hdrs = np.zeros((n_chunks + 2, 4), np.int16)
mc_hdrs[:n_chunks] = np.array(hdrs_l, np.int16)
print(f"{len(tiles)} tiles, {n_chunks} chunks of {CH}")

pool = np.zeros((8, 3, ha, wa), np.int32)
pool[0, 0, :chh, :cw] = rng.integers(0, 256, (chh, cw))
pool_d = jnp.asarray(pool)
kernels = jnp.asarray(M.FILTER_KERNELS.astype(np.int32))
units_d = jnp.asarray(mc_units).astype(I32)
hdrs_d = jnp.asarray(mc_hdrs).astype(I32)
G = max(1, 512 // CH)


def compute(pool, hd, u, skip):
    N = u.shape[0]
    S = (wa + 32) // 8
    x0, y0, spx, spy = u[:, 4], u[:, 5], u[:, 6], u[:, 7]
    filt, cwv, chv = u[:, 8], u[:, 9], u[:, 10]
    ih = h + 7
    maxv = 255
    band = jax.lax.dynamic_slice(
        pool, (hd[0], hd[1], hd[2], 0), (1, 1, br, wa))[0, 0]
    bandp = jnp.pad(band, ((0, 0), (0, 32)))
    band_r = bandp.reshape(br, S, 8)
    fx = kernels[filt, spx & 15]
    fy = kernels[filt, spy & 15]
    xs = x0 + (spx >> 4) - 3
    lo = jnp.clip(xs, 0, cwv - 1)
    q = jnp.minimum(lo >> 3, S - 4)
    segs = jnp.arange(S, dtype=I32)[None, None, :]
    t4 = jnp.arange(4, dtype=I32)[None, :, None]
    oh = (segs == (q[:, None, None] + t4)).astype(jnp.bfloat16)
    if "W" in skip:
        W = jnp.broadcast_to(band[0, 0].astype(jnp.float32),
                             (N, br, 32)) + oh.sum() * 0
    else:
        W4 = jax.lax.dot_general(
            oh, band_r.astype(jnp.bfloat16),
            (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        W = W4.transpose(0, 2, 1, 3).reshape(N, br, 32)
    rr = jnp.clip(y0[:, None] - 3 + jnp.arange(ih, dtype=I32)[None, :],
                  0, chv[:, None] - 1) - hd[2]
    if "R" in skip:
        Wr = W[:, :ih, :]
    else:
        oh_r = (rr[:, :, None] == jnp.arange(br, dtype=I32)[None, None, :]
                ).astype(jnp.bfloat16)
        Wr = jax.lax.dot_general(
            oh_r, W.astype(jnp.bfloat16), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    if "F" in skip:
        winh = Wr[:, :, :w] * 128.0
    else:
        c_idx = jnp.arange(w, dtype=I32)[None, :]
        jj = jnp.arange(32, dtype=I32)[None, :, None]
        Mf = jnp.zeros((N, 32, w), jnp.float32)
        for k in range(8):
            tgt = jnp.clip(xs[:, None] + c_idx + k, 0, cwv[:, None] - 1) \
                - (q[:, None] << 3)
            Mf = Mf + fx[:, k, None, None] * (tgt[:, None, :] == jj)
        winh = jax.lax.dot_general(
            Wr.astype(jnp.bfloat16), Mf.astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    temp = jnp.clip((winh.astype(I32) + 64) >> 7, 0, maxv)
    if "V" in skip:
        out = temp[:, :h, :]
    else:
        acc = jnp.zeros((N, h, w), I32)
        for k in range(8):
            acc = acc + fy[:, k, None, None] * temp[:, k:k + h, :]
        out = jnp.clip((acc + 64) >> 7, 0, maxv)
    return out


def make_run(skip):
    gland = "G" in skip
    # gather landing: ALL chunks stage into one [CAP*CH, h*w] buffer;
    # afterwards a scalar scatter builds tile map [3, TY, TX] from the
    # unit coords, a row-gather of staging by the map lands the tiles,
    # and a mask-combine merges into F.
    @jax.jit
    def run(pool, units, hdrs):
        F = jnp.zeros((3, ha, wa), I32)
        n_groups = (n_chunks + G - 1) // G

        if gland:
            CAP = units.shape[0]
            stage0 = jnp.zeros((CAP * CH, h * w), I32)

            def bodyg(ci, stage):
                u = jax.lax.dynamic_index_in_dim(units, ci, 0, False)
                hd = jax.lax.dynamic_index_in_dim(hdrs, ci, 0, False)
                if "C" in skip:
                    out = jnp.zeros((CH, h, w), I32) + u[0, 0]
                else:
                    out = compute(pool, hd, u, skip)
                return jax.lax.dynamic_update_slice(
                    stage, out.reshape(CH, h * w), (ci * CH, 0))
            stage = jax.lax.fori_loop(0, n_chunks, bodyg, stage0)
            TY, TX = ha // h, wa // w
            uu = units.reshape(CAP * CH, 12)
            plane, dx = uu[:, 0], uu[:, 1]
            dy = jnp.where(uu[:, 2] == 0, -(1 << 20), uu[:, 2] - 1)
            tmap = jnp.full((3, TY, TX), -1, I32)
            tmap = tmap.at[plane, dy // h, dx // w].set(
                jnp.arange(CAP * CH, dtype=I32), mode="drop")
            g = jnp.take(stage, tmap.reshape(-1).clip(0), axis=0)
            g = g.reshape(3, TY, TX, h, w).transpose(0, 1, 3, 2, 4)
            g = g.reshape(3, ha, wa)
            cov = jnp.repeat(jnp.repeat(tmap >= 0, h, 1), w, 2)
            return jnp.where(cov, g, F)

        def body(g, F):
            stage = jnp.zeros((G * CH, h, w), I32)
            us, valids = [], []
            for j in range(G):
                ci = g * G + j
                u = jax.lax.dynamic_index_in_dim(units, ci, 0, False)
                hd = jax.lax.dynamic_index_in_dim(hdrs, ci, 0, False)
                if "C" in skip:
                    out = jnp.zeros((CH, h, w), I32) + u[0, 0]
                else:
                    out = compute(pool, hd, u, skip)
                stage = jax.lax.dynamic_update_slice(
                    stage, out, (j * CH, 0, 0))
                us.append(u)
                valids.append(jnp.full((CH,), ci < n_chunks))
            uu = jnp.concatenate(us)
            vv = jnp.concatenate(valids)
            plane, dx = uu[:, 0], uu[:, 1]
            dy = jnp.where(uu[:, 2] == 0, -(1 << 20), uu[:, 2] - 1)
            dy = jnp.where(jnp.concatenate(valids), dy, -(1 << 20))
            rows_o = dy[:, None, None] + jnp.arange(h, dtype=I32)[None, :,
                                                                  None]
            cols_o = dx[:, None, None] + jnp.arange(w, dtype=I32)[None,
                                                                  None, :]
            return F.at[plane[:, None, None], rows_o, cols_o].set(
                stage, mode="drop")
        return jax.lax.fori_loop(0, n_groups, body, F)
    return run


fetch = jax.jit(lambda F: F[0, :1, :1])
F0 = make_run("")(pool_d, units_d, hdrs_d)
_ = np.asarray(fetch(F0))
ts = []
for _ in range(5):
    t0 = time.time()
    _ = np.asarray(fetch(F0))
    ts.append(time.time() - t0)
rtt = min(ts)
print(f"RTT {1e3*rtt:.1f} ms")


def timeit(fn, n=8):
    _ = np.asarray(fetch(fn(pool_d, units_d, hdrs_d)))
    ts = []
    for _ in range(3):
        t0 = time.time()
        Fs = [fn(pool_d, units_d, hdrs_d) for _ in range(n)]
        _ = np.asarray(fetch(Fs[-1]))
        ts.append(time.time() - t0)
    return min(ts) / n - rtt / n


for skip in os.environ.get("MC_SKIPS", ",W,R,F,V,WRFV,C").split(","):
    t = timeit(make_run(skip))
    print(f"skip={skip or 'none':5s}: {1e3*t:6.1f} ms/pass", flush=True)

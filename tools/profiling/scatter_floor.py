"""Measure scalar-scatter and row-gather primitive throughput on the
device: fixed cost per op + per-element cost.  Sizes the gather-landing
design (map scatter over unit capacity, landing gather over frame cells).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))
import numpy as np
import jax
import jax.numpy as jnp

I32 = jnp.int32
rng = np.random.default_rng(0)
fetch = jax.jit(lambda x: x.reshape(-1)[:1])


def timeit(fn, args, n=16):
    o = fn(*args)
    _ = np.asarray(fetch(o))
    ts = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(n):
            o = fn(*args)
        _ = np.asarray(fetch(o))
        ts.append(time.time() - t0)
    return min(ts) / n


o = jnp.zeros((4,), I32)
_ = np.asarray(fetch(o))
ts = []
for _ in range(10):
    t0 = time.time()
    _ = np.asarray(fetch(o))
    ts.append(time.time() - t0)
rtt = min(ts)
print(f"RTT {1e3*rtt:.2f} ms")


# ---- scalar scatter: N indices into [M] map
for N in (32_768, 262_144, 3_000_000):
    M = 1_600_000
    idx = jnp.asarray(rng.integers(0, M, N).astype(np.int32))

    @jax.jit
    def scat(idx):
        return jnp.full((M,), -1, I32).at[idx].set(
            jnp.arange(N, dtype=I32), mode="drop")
    t = timeit(scat, (idx,)) - rtt / 16
    print(f"scalar scatter N={N:9d}: {1e3*t:7.2f} ms "
          f"({N/t/1e6:.0f} M elem/s)", flush=True)

# ---- row gather: T rows of W elements from [K, W]
for (T, W, K) in ((98_304, 256, 500_000), (1_566_720, 16, 3_000_000),
                  (98_304, 256, 50_000), (391_680, 64, 700_000),
                  (391_680, 64, 120_000), (195_840, 128, 120_000),
                  (1_566_720, 16, 300_000)):
    src = jnp.asarray(rng.integers(0, 255, (K, W)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, K, T).astype(np.int32))

    @jax.jit
    def gath(src, idx):
        return jnp.take(src, idx, axis=0)
    t = timeit(gath, (src, idx)) - rtt / 16
    print(f"row gather T={T} W={W} K={K}: {1e3*t:7.2f} ms "
          f"({T*W*4/t/1e9:.1f} GB/s)", flush=True)

# ---- zeros init cost
for MB in (50, 400):
    n = MB * 1024 * 1024 // 4

    @jax.jit
    def z(x):
        return jnp.zeros((n,), I32).at[x[0]].set(1)
    t = timeit(z, (jnp.asarray([5], I32),)) - rtt / 16
    print(f"zeros {MB} MB: {1e3*t:7.2f} ms", flush=True)

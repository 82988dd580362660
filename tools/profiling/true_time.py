"""True device timing on the axon tunnel: block_until_ready appears to
be a no-op there, so time N dispatches amortized behind ONE tiny D2H
fetch (which genuinely syncs), minus the fetch RTT measured alone."""
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
    if len(sys.argv) > 2 else (45, 80)
ha = ((mi_rows + 7) & ~7) * 8
wa = ((mi_cols + 7) & ~7) * 8
step, caps, layout = fused.get_frame_step(mi_rows, mi_cols, "tight", False)
K = (layout.size + pack.PAGE - 1) // pack.PAGE
nout = ha * wa + 2 * ((ha >> 1) * (wa >> 1))
kernels = jnp.asarray(M.FILTER_KERNELS.astype(np.int32))
flat = jnp.asarray(np.zeros((K * pack.PAGE,), np.int16))
pool = jnp.zeros((8, 3, ha, wa), I32)
ring = jnp.zeros((32, nout), jnp.uint8)

fetch = jax.jit(lambda r: r[0, :1])

# warmup
pool, ring = step(pool, ring, kernels, flat)
_ = np.asarray(fetch(ring))

# fetch RTT alone
ts = []
for _ in range(10):
    t0 = time.time()
    _ = np.asarray(fetch(ring))
    ts.append(time.time() - t0)
rtt = min(ts)
print(f"fetch RTT: {1e3*rtt:.1f} ms", flush=True)

# N steps + one fetch
for N in (1, 4, 16):
    ts = []
    for _ in range(5):
        t0 = time.time()
        for _ in range(N):
            pool, ring = step(pool, ring, kernels, flat)
        _ = np.asarray(fetch(ring))
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"{N} steps + fetch: {1e3*best:.1f} ms "
          f"-> per-step ~{1e3*(best-rtt)/N:.2f} ms", flush=True)

# D2H bandwidth: full ring fetch
ts = []
for _ in range(5):
    t0 = time.time()
    _ = np.asarray(ring)
    ts.append(time.time() - t0)
best = min(ts)
print(f"full ring D2H ({32*nout/1e6:.1f} MB): {1e3*best:.1f} ms "
      f"= {32*nout/1e6/best:.0f} MB/s", flush=True)

# H2D bandwidth: flat upload
h = np.zeros((K * pack.PAGE,), np.int16)
ts = []
for _ in range(5):
    t0 = time.time()
    d = jnp.asarray(h)
    _ = np.asarray(fetch(ring))   # sync
    ts.append(time.time() - t0)
best = min(ts)
print(f"flat H2D ({K*pack.PAGE*2/1e6:.1f} MB): {1e3*best:.1f} ms(incl rtt)",
      flush=True)

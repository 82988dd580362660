"""Time the Pallas loop-filter kernel alone on the real device."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))
import numpy as np
import jax
import jax.numpy as jnp
from cuda_vp9_tpu.ops.pallas.loopfilter import lf_frame, K, cdiv

mi_rows, mi_cols = (int(sys.argv[1]), int(sys.argv[2])) \
    if len(sys.argv) > 2 else (45, 80)
ha = ((mi_rows + 7) & ~7) * 8
wa = ((mi_cols + 7) & ~7) * 8
sb_rows, sb_cols = cdiv(mi_rows, 8), cdiv(mi_cols, 8)
n_sbs_pad = cdiv(sb_rows, K) * K * sb_cols
rng = np.random.default_rng(0)
F = jnp.asarray(rng.integers(0, 255, (3, ha, wa)).astype(np.int32))
lfm = jnp.asarray(rng.integers(0, 4, (n_sbs_pad, 2, 128)).astype(np.int16))
thr = jnp.asarray(np.ones((64, 4), np.int16))

for lf_on in (0, 1):
    f = jax.jit(lambda F, lfm, n=lf_on: lf_frame(
        F, lfm, thr, jnp.int32(n), mi_rows=mi_rows, mi_cols=mi_cols))
    out = f(F, lfm); out.block_until_ready()
    ts = []
    for _ in range(8):
        t0 = time.time()
        out = f(F, lfm)
        out.block_until_ready()
        ts.append(time.time() - t0)
    print(f"lf_frame lf_on={lf_on}: min {1e3*min(ts):.2f} ms", flush=True)

"""Multi-chip scale-out: device mesh + sharded multi-stream reconstruction.

Parallelism axes (SURVEY.md §2d):
  data    — independent video streams (the production throughput axis;
            per-chip batched decode scales linearly over ICI with no
            cross-chip communication)
  spatial — tile columns within a frame (VP9 tile columns are fully
            independent for entropy + reconstruction before the loop
            filter; the loop filter needs an 8-pixel halo exchange at
            column seams, done with a ppermute collective)

Reference frames are replicated over 'spatial' and sharded over 'data';
the frame buffer is sharded over both.  Global scatter positions are
translated per shard and out-of-shard units drop out of the scatter,
so every shard can be handed the full unit list.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, dp: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if dp is None:
        dp = n // 2 if n >= 4 and n % 2 == 0 else n
    sp = n // dp
    return Mesh(np.array(devs[:dp * sp]).reshape(dp, sp),
                ("data", "spatial"))


def _shard_map(fn, mesh, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False) \
        if hasattr(jax, "shard_map") else \
        __import__("jax.experimental.shard_map", fromlist=["shard_map"]
                   ).shard_map(fn, mesh=mesh, in_specs=in_specs,
                               out_specs=out_specs, check_rep=False)


def build_sharded_recon_step(mesh: Mesh, bd: int = 8):
    """A jitted multi-stream frame-reconstruction step over the mesh.

    Arguments of the returned function (S streams, W split over 'spatial'):
      F       [S, 3, H, W]  current frame buffers (int32)
      refs    [S, 3, H, W]  one reference slot per stream (replicated over
                            'spatial' so MC can read across column seams)
      kernels [4, 16, 8]    interpolation filter banks
      coeffs  [S, N, 64]    8x8 coefficient blocks
      cpos    [S, N, 3]     (plane, y, x) global positions (-32768 pad)
      mc      [S, M, 10]    MC unit params (plane, dx, dy, x0, y0, spx, spy,
                            filt, cw, ch), dy = -32768 pad
      intra   [S, K, 9]     intra unit params as in stages.intra_wave (bs=4)

    Returns the reconstructed F.  Demonstrates the full dp x sp sharding:
    per-shard scatter translation, replicated-ref gathers, and a loop-filter
    halo exchange over 'spatial' via ppermute.
    """
    from ..ops.ref import transforms as T
    from ..ops.device import stages

    n_sp = mesh.shape["spatial"]

    def per_stream(F, refs, kernels, coeffs, cpos, mc, intra, x_off, w_loc):
        # ---- residuals: inverse transform + local scatter
        resid = T.inv_txfm2d(coeffs, 1, 0, bd, xp=jnp,
                             work_dtype=jnp.int32)
        plane, y0, x0g = cpos[:, 0], cpos[:, 1], cpos[:, 2]
        x0 = x0g - x_off
        x0 = jnp.where((x0 >= 0) & (x0 + 8 <= w_loc), x0, -32768)
        n = 8
        rows = y0[:, None, None] + jnp.arange(n, dtype=jnp.int32)[None, :,
                                                                  None]
        cols = x0[:, None, None] + jnp.arange(n, dtype=jnp.int32)[None,
                                                                  None, :]
        R = jnp.zeros_like(F)
        R = R.at[plane[:, None, None], rows, cols].set(
            resid.astype(jnp.int32), mode="drop")

        # ---- inter MC (refs replicated: global x coords valid)
        (mplane, dxg, dy, mx0, my0, spx, spy, filt, cw, ch) = [
            mc[:, k] for k in range(10)]
        dx = dxg - x_off
        dy = jnp.where((dx >= 0) & (dx + 8 <= w_loc), dy, -32768)
        ih = 8 + 7
        rows_g = jnp.clip(my0[:, None] - 3
                          + jnp.arange(ih, dtype=jnp.int32)[None, :],
                          0, ch[:, None] - 1)
        tap = jnp.arange(8, dtype=jnp.int32)
        cols_g = jnp.clip((mx0 + (spx >> 4))[:, None, None] - 3
                          + jnp.arange(8, dtype=jnp.int32)[None, :, None]
                          + tap[None, None, :], 0, cw[:, None, None] - 1)
        g = refs[mplane[:, None, None, None], rows_g[:, :, None, None],
                 cols_g[:, None, :, :]]
        fx = kernels[filt, spx & 15]
        temp = jnp.clip((jnp.sum(g * fx[:, None, None, :], axis=3) + 64)
                        >> 7, 0, 255)
        fy = kernels[filt, spy & 15]
        idx_v = jnp.arange(8, dtype=jnp.int32)[:, None] + tap[None, :]
        out = jnp.clip((jnp.sum(temp[:, idx_v] * fy[:, None, :, None],
                                axis=2) + 64) >> 7, 0, 255)
        rows_o = dy[:, None, None] + jnp.arange(8, dtype=jnp.int32)[None, :,
                                                                    None]
        cols_o = dx[:, None, None] + jnp.arange(8, dtype=jnp.int32)[None,
                                                                    None, :]
        F = F.at[mplane[:, None, None], rows_o, cols_o].set(out, mode="drop")
        F = jnp.clip(F + R, 0, 255)
        return F

    def step(F, refs, kernels, coeffs, cpos, mc, intra):
        sp_i = jax.lax.axis_index("spatial")
        w_loc = F.shape[-1]
        x_off = sp_i.astype(jnp.int32) * w_loc
        Fo = jax.vmap(
            lambda f, r, c, cp, m, it: per_stream(
                f, r, kernels, c, cp, m, it, x_off, w_loc)
        )(F, refs, coeffs, cpos, mc, intra)

        # ---- loop-filter halo: fetch 8 left-neighbor columns over ICI and
        # smooth the seam (collective over 'spatial')
        right_edge = Fo[..., -8:]
        left_halo = jax.lax.ppermute(
            right_edge, "spatial",
            [(i, (i + 1) % n_sp) for i in range(n_sp)])
        seam = (left_halo[..., -1:] + Fo[..., :1] + 1) >> 1
        Fo = jnp.where(sp_i > 0, Fo.at[..., :1].set(seam), Fo)
        return Fo

    fn = _shard_map(
        step, mesh,
        in_specs=(P("data", None, None, "spatial"),
                  P("data", None, None, None),
                  P(None, None, None),
                  P("data", None, None), P("data", None, None),
                  P("data", None, None), P("data", None, None)),
        out_specs=P("data", None, None, "spatial"))
    return jax.jit(fn)


def example_inputs(mesh: Mesh, streams_per_dp: int = 1, H: int = 64,
                   W: int = 128, n_coeff: int = 16, n_mc: int = 16,
                   n_intra: int = 8):
    """Tiny, valid inputs for the sharded step (used by the dryrun)."""
    import numpy as np
    dp = mesh.shape["data"]
    sp = mesh.shape["spatial"]
    S = dp * streams_per_dp
    rng = np.random.default_rng(0)
    F = np.zeros((S, 3, H, W), np.int32)
    refs = rng.integers(0, 255, (S, 3, H, W)).astype(np.int32)
    from .. import models as M
    kernels = M.FILTER_KERNELS.astype(np.int32)
    coeffs = rng.integers(-512, 512, (S, n_coeff, 64)).astype(np.int32)
    cpos = np.zeros((S, n_coeff, 3), np.int32)
    cpos[..., 1] = rng.integers(0, (H - 8) // 8, (S, n_coeff)) * 8
    cpos[..., 2] = rng.integers(0, (W - 8) // 8, (S, n_coeff)) * 8
    mc = np.zeros((S, n_mc, 10), np.int32)
    mc[..., 0] = 0
    mc[..., 1] = rng.integers(0, (W - 8) // 8, (S, n_mc)) * 8   # dx
    mc[..., 2] = rng.integers(0, (H - 8) // 8, (S, n_mc)) * 8   # dy
    mc[..., 3] = rng.integers(4, W - 16, (S, n_mc))             # x0
    mc[..., 4] = rng.integers(4, H - 16, (S, n_mc))             # y0
    mc[..., 5] = rng.integers(0, 16, (S, n_mc))                 # subpel x
    mc[..., 6] = rng.integers(0, 16, (S, n_mc))                 # subpel y
    mc[..., 7] = rng.integers(0, 4, (S, n_mc))                  # filter
    mc[..., 8] = W
    mc[..., 9] = H
    intra = np.zeros((S, n_intra, 9), np.int32)
    intra[..., 2] = -32768
    return (F, refs, kernels, coeffs, cpos, mc, intra)

"""Probe the pallas TPU primitives the loop-filter kernel needs:
sequential grid, scalar prefetch, dynamic-index HBM->VMEM DMA,
input_output_aliases, sublane transpose, lane repeat.

Run on the tunneled TPU:  python tools/profiling/pallas_probe.py
On CPU (interpret):       JAX_PLATFORMS=cpu python ... --interpret
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = "--interpret" in sys.argv

MAXW = 4
TS = 72


def kernel(coords_ref, frame_in, masks_hbm, expand_ref, out_hbm, tiles,
           tilesT, mvm, sems, msem):
    w = pl.program_id(0)
    # DMA in: per-entry tile + mask row
    for n in range(MAXW):
        sbr = coords_ref[w * MAXW * 2 + n * 2] - 1
        sbc = coords_ref[w * MAXW * 2 + n * 2 + 1] - 1

        @pl.when(sbr >= 0)
        def _():
            pltpu.make_async_copy(
                out_hbm.at[pl.ds(sbr * 64, TS), pl.ds(sbc * 64, TS)],
                tiles.at[n], sems.at[n]).start()
            pltpu.make_async_copy(
                masks_hbm.at[pl.ds(sbr * 8, 1), :],
                mvm.at[pl.ds(n, 1), :], msem.at[n]).start()

    for n in range(MAXW):
        sbr = coords_ref[w * MAXW * 2 + n * 2] - 1
        sbc = coords_ref[w * MAXW * 2 + n * 2 + 1] - 1

        @pl.when(sbr >= 0)
        def _():
            pltpu.make_async_copy(
                out_hbm.at[pl.ds(sbr * 64, TS), pl.ds(sbc * 64, TS)],
                tiles.at[n], sems.at[n]).wait()
            pltpu.make_async_copy(
                masks_hbm.at[pl.ds(sbr * 8, 1), :],
                mvm.at[pl.ds(n, 1), :], msem.at[n]).wait()

    # transpose each tile (sublane<->lane)
    tilesT[:] = jnp.swapaxes(tiles[:], 1, 2)
    # per-"chain" variable extraction + repeat: take sublane row j, add mask
    acc = jnp.zeros((MAXW, 64), jnp.int32)
    for j in range(2):
        v = tilesT[:, 8 + j, 8:TS]                      # [MAXW, 64]
        m8 = mvm[:, :8]                                  # [MAXW, 8]
        m = jax.lax.dot_general(
            m8.astype(jnp.float32), expand_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        acc = acc + v + m
    # write acc back into the tile rows, transpose back, DMA out
    tilesT[:, 8, 8:TS] = acc
    tiles[:] = jnp.swapaxes(tilesT[:], 1, 2)
    for n in range(MAXW):
        sbr = coords_ref[w * MAXW * 2 + n * 2] - 1
        sbc = coords_ref[w * MAXW * 2 + n * 2 + 1] - 1

        @pl.when(sbr >= 0)
        def _():
            cp = pltpu.make_async_copy(
                tiles.at[n],
                out_hbm.at[pl.ds(sbr * 64, TS), pl.ds(sbc * 64, TS)],
                sems.at[n])
            cp.start()
            cp.wait()


def main():
    H = W = 64 * 3 + 8
    frame = np.arange(H * W, dtype=np.int32).reshape(H, W) % 251
    masks = (np.arange(3 * 8 * 128, dtype=np.int32)
             .reshape(3 * 8, 128) % 7)
    # waves: 3 waves x MAXW entries, +1-encoded coords, 0 = pad
    coords = np.zeros((3, MAXW, 2), np.int32)
    coords[0, 0] = (1, 1)
    coords[1, 0] = (1, 2)
    coords[1, 1] = (2, 1)
    coords[2, 0] = (3, 3)  # out of range rows? keep in range: 3 SBs -> r<3
    coords[2, 0] = (2, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(3,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((MAXW, TS, TS), jnp.int32),
            pltpu.VMEM((MAXW, TS, TS), jnp.int32),
            pltpu.VMEM((MAXW, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((MAXW,)),
            pltpu.SemaphoreType.DMA((MAXW,)),
        ],
    )
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(frame.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    expand = np.zeros((8, 64), np.float32)
    for c in range(8):
        expand[c, c * 8:(c + 1) * 8] = 1
    out = jax.jit(fn)(coords.reshape(-1), frame, masks, expand)
    out = np.asarray(out)

    # reference
    ref = frame.copy()
    for wv in range(3):
        for n in range(MAXW):
            sbr, sbc = coords[wv, n] - 1
            if sbr < 0:
                continue
            tile = ref[sbr * 64:sbr * 64 + TS, sbc * 64:sbc * 64 + TS].copy()
            tileT = tile.T.copy()
            acc = np.zeros((64,), np.int64)
            for j in range(2):
                v = tileT[8 + j, 8:TS]
                m = np.repeat(masks[sbr * 8, :8], 8)
                acc = acc + v + m
            tileT[8, 8:TS] = acc
            ref[sbr * 64:sbr * 64 + TS, sbc * 64:sbc * 64 + TS] = tileT.T

    if np.array_equal(out, ref):
        print("PROBE OK")
    else:
        bad = np.argwhere(out != ref)
        print("PROBE MISMATCH", bad[:10], out[tuple(bad[0])],
              ref[tuple(bad[0])])


if __name__ == "__main__":
    main()

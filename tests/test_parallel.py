"""Mesh + sharded reconstruction step on the virtual CPU mesh."""

import jax
import numpy as np
import pytest

import __graft_entry__ as ge


def test_entry_compiles():
    fn, args = ge.entry()
    pool, ring = jax.jit(fn)(*args)
    jax.block_until_ready((pool, ring))
    assert pool.shape == (8, 3, 64, 64)
    assert ring.shape[0] == 32


@pytest.mark.slow
def test_dryrun_multichip_8():
    # decodes real fixtures through the batched fused step sharded over
    # the 8-device virtual mesh and asserts golden MD5s (slow: first run
    # compiles the vmapped step; cached in .jax_cache afterwards)
    ge.dryrun_multichip(8)

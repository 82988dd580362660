"""Mesh + sharded reconstruction step on the virtual CPU mesh."""

import jax
import numpy as np

import __graft_entry__ as ge


def test_entry_compiles():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert out.shape == (3, 128, 128)


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)

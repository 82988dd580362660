import time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

def add_kernel(x_ref, y_ref, o_ref):
    o_ref[...] = x_ref[...] + y_ref[...]

@jax.jit
def add(x, y):
    return pl.pallas_call(
        add_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, y)

x = jnp.ones((256, 256), jnp.int32)
y = jnp.ones((256, 256), jnp.int32)
r = add(x, y)
print("pallas basic:", np.asarray(r)[0, :3])

# a kernel with a grid + scalar prefetch-ish indexing
def scale_kernel(x_ref, o_ref):
    i = pl.program_id(0)
    o_ref[...] = x_ref[...] * (i + 1)

@jax.jit
def scale(x):
    return pl.pallas_call(
        scale_kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec((64, 256), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((64, 256), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32),
    )(x)
r = scale(x)
print("pallas grid:", np.asarray(r)[[0, 64, 128, 192], 0])

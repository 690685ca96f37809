#!/usr/bin/env python
"""Probe: do aliased pallas outputs start with the input's content?"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend())

B, N = 4, 256


def kernel(x_ref, s_ref, o_ref, so_ref):
    # only touch one element; the rest must carry the input through
    o_ref[0, 0, :] = o_ref[0, 0, :] + 1
    so_ref[0, 0, 5] = so_ref[0, 0, 5] + 100


@jax.jit
def run(x, s):
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, N), jnp.int32),
        ],
        input_output_aliases={0: 0, 1: 1},
    )(x, s)


x = jnp.arange(B * 8 * 128, dtype=jnp.int32).reshape(B, 8, 128)
s = jnp.arange(B * N, dtype=jnp.int32).reshape(B, 1, N)
xo, so = run(x, s)
xo = np.asarray(xo)
so = np.asarray(so)
xn = np.arange(B * 8 * 128, dtype=np.int32).reshape(B, 8, 128)
sn = np.arange(B * N, dtype=np.int32).reshape(B, 1, N)
ok_x = np.array_equal(xo[:, 1:], xn[:, 1:]) and np.array_equal(
    xo[:, 0], xn[:, 0] + 1)
ok_s = (np.array_equal(np.delete(so, 5, axis=2), np.delete(sn, 5, axis=2))
        and np.array_equal(so[:, 0, 5], sn[:, 0, 5] + 100))
print("vmem aliased out carries input:", ok_x)
print("smem aliased out carries input:", ok_s)

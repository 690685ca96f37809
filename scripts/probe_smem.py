#!/usr/bin/env python
"""Probe SMEM scratch capacity on the current TPU backend."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend())


def try_smem(kb):
    n = kb * 1024 // 4

    def kernel(x_ref, o_ref, smem):
        smem[0] = x_ref[0, 0]
        smem[n - 1] = x_ref[0, 1]
        o_ref[0, 0] = smem[0] + smem[n - 1]

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((1, 2), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        scratch_shapes=[pltpu.SMEM((n,), jnp.int32)],
    )
    try:
        out = f(jnp.asarray([[3, 4]], jnp.int32))
        ok = int(np.asarray(out)[0, 0]) == 7
        print(f"SMEM {kb:5d} KB: {'ok' if ok else 'WRONG RESULT'}")
        return ok
    except Exception as e:
        print(f"SMEM {kb:5d} KB: FAIL ({str(e)[:120]})")
        return False


for kb in (32, 64, 128, 192, 256, 384, 512):
    if not try_smem(kb):
        break

#!/usr/bin/env python
"""Chained-step profile: run k dependent steps, read back one scalar."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from racon_tpu.poa import engine as E

B, L0, L, N, P = 32, 500, 640, 1792, 12
T_CAP = N + L

rng = np.random.RandomState(0)
backbone = rng.randint(0, 4, size=(B, L0)).astype(np.int32)


def fresh_state():
    return E.init_graphs(jnp.asarray(backbone),
                         jnp.ones((B, L0), jnp.int32),
                         jnp.full((B,), L0, np.int32), N, P)


def fresh_layer(i):
    r = np.random.RandomState(i)
    seq = r.randint(0, 4, size=(B, L)).astype(np.int32)
    return E.LayerBatch(
        seq=jnp.asarray(seq), weights=jnp.ones((B, L), jnp.int32),
        length=jnp.full((B,), min(L - 1, 520), np.int32),
        begin=jnp.zeros((B,), np.int32), end=jnp.full((B,), L0 - 1, np.int32),
        full=jnp.ones((B,), bool), active=jnp.ones((B,), bool))


use_pallas = jax.default_backend() not in ("cpu",)
print("backend:", jax.default_backend(), "use_pallas:", use_pallas)

layers = [fresh_layer(i) for i in range(8)]

for up in ([True, False] if use_pallas else [False]):
    # warm compile
    st = fresh_state()
    st = E.add_layer_jit(st, layers[0], 3, -5, -4, t_cap=T_CAP, use_pallas=up)
    int(np.asarray(st.n_nodes)[0])

    st = fresh_state()
    k = 16
    t0 = time.time()
    for i in range(k):
        st = E.add_layer_jit(st, layers[i % 8], 3, -5, -4, t_cap=T_CAP,
                             use_pallas=up)
    int(np.asarray(st.n_nodes)[0])
    dt = (time.time() - t0) / k
    print(f"chained add_layer (pallas={up}): {dt*1e3:9.2f} ms/step "
          f"(n_nodes {np.asarray(st.n_nodes).max()})")

#!/usr/bin/env python
"""Measure per-dispatch overhead through the axon tunnel, and scan-vs-loop."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from racon_tpu.poa import engine as E

print("backend:", jax.default_backend())


# 1. trivial chained dispatch
@jax.jit
def tick(x):
    return x + 1

x = jnp.zeros((8, 128), jnp.int32)
x = tick(x); np.asarray(x)
t0 = time.time()
for _ in range(100):
    x = tick(x)
np.asarray(x)
print(f"trivial dispatch: {(time.time()-t0)/100*1e3:7.2f} ms/call")

# 2. moderately sized chained op (donated)
import functools

@functools.partial(jax.jit, donate_argnums=(0,))
def tock(s):
    return jax.tree_util.tree_map(lambda a: a + 1, s)

s = {k: jnp.zeros((32, 1793, 12), jnp.int32) for k in "abcd"}
s = tock(s); np.asarray(s["a"][0, 0, 0])
t0 = time.time()
for _ in range(50):
    s = tock(s)
np.asarray(s["a"][0, 0, 0])
print(f"donated 33MB-state dispatch: {(time.time()-t0)/50*1e3:7.2f} ms/call")

# 3. scan over D layers in one dispatch
B, L0, L, N, P = 32, 500, 640, 1792, 12
T_CAP = N + L
D = 8
rng = np.random.RandomState(0)
backbone = rng.randint(0, 4, size=(B, L0)).astype(np.int32)
state = E.init_graphs(jnp.asarray(backbone), jnp.ones((B, L0), jnp.int32),
                      jnp.full((B,), L0, np.int32), N, P)
seq = rng.randint(0, 4, size=(D, B, L)).astype(np.int32)
layers = E.LayerBatch(
    seq=jnp.asarray(seq), weights=jnp.ones((D, B, L), jnp.int32),
    length=jnp.full((D, B), min(L - 1, 520), np.int32),
    begin=jnp.zeros((D, B), np.int32),
    end=jnp.full((D, B), L0 - 1, np.int32),
    full=jnp.ones((D, B), bool), active=jnp.ones((D, B), bool))

t0 = time.time()
out = E.run_layers(state, layers, 3, -5, -4, t_cap=T_CAP)
np.asarray(out.n_nodes)
print(f"run_layers compile+first: {time.time()-t0:7.2f} s")
t0 = time.time()
out = E.run_layers(state, layers, 3, -5, -4, t_cap=T_CAP)
np.asarray(out.n_nodes)
dt = time.time() - t0
print(f"run_layers scan: {dt/D*1e3:7.2f} ms/layer (D={D})")

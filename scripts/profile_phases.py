#!/usr/bin/env python
"""Per-phase timing of the fused kernel on realistic shapes."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from racon_tpu.poa import engine as E
from racon_tpu.poa import fused_step as F
import tests.test_fused_step as T

B, L0, L, N, P = 32, 500, 640, 1792, 12
T_CAP = N + L
D = 4

state, layers = T.random_problem(B, L0, L, D, N, P, seed=0, partial=False)
fs0 = F.pack_state(state)
jax.block_until_ready(fs0.nn)

meta = np.zeros((B, 1, 8), np.int32)
layer = layers[0]
meta[:, 0, 0] = np.asarray(layer.begin)
meta[:, 0, 1] = np.asarray(layer.end)
meta[:, 0, 2] = np.asarray(layer.full).astype(np.int32)
meta[:, 0, 3] = np.asarray(layer.length)
meta[:, 0, 4] = np.asarray(layer.active).astype(np.int32)
seq_t, wts_t = F.pack_layer_tiles(
    np.asarray(layer.seq)[None], np.asarray(layer.weights)[None])
meta = jnp.asarray(meta)
seq_t = jnp.asarray(seq_t[0])
wts_t = jnp.asarray(wts_t[0])

print("backend:", jax.default_backend(), f"B={B} N={N} L={L}")

prev = 0.0
for phase in (0, 1, 2, 3, 4, 5, 6):
    def run(fs):
        return F.fused_layer_step(fs, meta, seq_t, wts_t, p_cap=P, match=3,
                                  mismatch=-5, gap=-4, t_cap=T_CAP,
                                  stop_phase=phase)
    fs = jax.tree_util.tree_map(jnp.copy, fs0)
    fs = run(fs)
    jax.block_until_ready(fs.nn)
    n = 8
    fss = [jax.tree_util.tree_map(jnp.copy, fs0) for _ in range(n)]
    jax.block_until_ready(fss[-1].nn)
    t0 = time.time()
    for i in range(n):
        fss[i] = run(fss[i])
    jax.block_until_ready([f.nn for f in fss])
    dt = (time.time() - t0) / n * 1e3
    print(f"phase <= {phase}: {dt:8.2f} ms  (delta {dt - prev:+8.2f} ms)")
    prev = dt

#!/usr/bin/env python
"""Timing + real-TPU parity of the resident chunk kernel (fused_chunk).

Compares per-layer-step cost against the v1 per-layer kernel on realistic
lambda shapes, and checks the final state against the XLA engine computed
on CPU host (catches buffer-residency bugs interpret mode cannot see).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from racon_tpu.poa import engine as E
from racon_tpu.poa import fused_chunk as FC
from tests.test_fused_chunk import build_chunk_inputs
from tests.test_fused_chunk import assert_states_equal, random_problem

B, L0, L, N, P = 32, 500, 640, 1792, 12
D = int(sys.argv[1]) if len(sys.argv) > 1 else 22
SUB_L = -(-(L + 1) // 128)
T_CAP = N + L
CHECK = "--check" in sys.argv

state0, layers = random_problem(B, L0, L, D, N, P, seed=0, partial=False)
codes0 = np.asarray(state0.codes)
blen = np.asarray(state0.n_nodes)
bb = codes0[:, :L0].astype(np.int32)
rng = np.random.RandomState(99)
bw = rng.randint(1, 50, size=(B, L0)).astype(np.int32)
for b in range(B):
    bb[b, blen[b]:] = E.PAD_CODE
    bw[b, blen[b]:] = 0
metas, seq_t, wts_t = build_chunk_inputs(layers, SUB_L)
bbj, bwj, blj = jnp.asarray(bb), jnp.asarray(bw), jnp.asarray(blen)
metas, seq_t, wts_t = (jnp.asarray(metas), jnp.asarray(seq_t),
                       jnp.asarray(wts_t))

print(f"backend: {jax.default_backend()} B={B} N={N} L={L} sub_l={SUB_L} "
      f"D={D}")


def run():
    return FC.polish_chunk(bbj, bwj, blj, metas, seq_t, wts_t, n_cap=N,
                           p_cap=P, sub_l=SUB_L, match=3, mismatch=-5,
                           gap=-4, t_cap=T_CAP)


t0 = time.time()
st, nr = run()
jax.block_until_ready(st)
print(f"compile+run: {time.time() - t0:.1f} s")
reps = 4
t0 = time.time()
for _ in range(reps):
    st, nr = run()
_ = np.asarray(st[:, FC.R_MISC, :2])   # force readback through the tunnel
dt = (time.time() - t0) / reps
print(f"chunk: {dt * 1e3:8.2f} ms total, {dt / D * 1e3:8.3f} ms/layer-step "
      f"({B * D / dt:.0f} layer-steps/s)")

if CHECK:
    ref = (E.init_graphs(bbj, bwj, blj, N, P))
    for layer in layers:
        ref = E.add_layer(ref, layer, 3, -5, -4, T_CAP)
    got = FC.unpack_chunk_state(np.asarray(st), np.asarray(nr), P)
    assert_states_equal(got, jax.tree_util.tree_map(np.asarray, ref), D - 1)
    nn = np.asarray(st[:, FC.R_MISC, 0])
    print(f"real-TPU parity OK; n_nodes min/mean/max: {nn.min()} "
          f"{int(nn.mean())} {nn.max()}")

#!/usr/bin/env python
"""Real-TPU stop-phase bisect of the K=2 interleaved kernel's runtime
abort (K=2 compiles but aborts on device at every size with ACTIVE
layers; interpret mode passes; K=1 passes).  Tiny shapes keep each
compile ~1 min.  Run one phase per invocation if the tunnel keeps
wedging: python scripts/debug_k2_abort.py <phase>."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from racon_tpu.poa import engine as E
from racon_tpu.poa import fused_chunk as FC
from tests.test_fused_chunk import build_chunk_inputs, random_problem

B, L0, L, N, P, D = 4, 40, 96, 160, 8, 3
SUB_L = 1
T_CAP = N + L

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

phases = ([int(sys.argv[1])] if len(sys.argv) > 1
          else [-1, 1, 31, 2, 3, 4, 5, 6, 9])
for phase in phases:
    try:
        st, nr = FC.polish_chunk(
            jnp.asarray(bb), jnp.asarray(bw), jnp.asarray(blen), metas,
            seq_t, wts_t, n_cap=N, p_cap=P, sub_l=SUB_L, match=3,
            mismatch=-5, gap=-4, t_cap=T_CAP, interleave=2,
            stop_phase=phase)
        jax.block_until_ready(st)
        print(f"phase {phase}: OK  failed_codes="
              f"{np.asarray(st[:, FC.R_MISC, 1]).tolist()}", flush=True)
    except Exception as e:
        print(f"phase {phase}: {type(e).__name__}: {str(e)[:140]}",
              flush=True)
        break

#!/usr/bin/env python
"""Bisect the first diverging layer of the chunk kernel on real TPU by
masking layers >= X inactive (same compiled shape), and dump the diff."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from racon_tpu.poa import engine as E
from racon_tpu.poa import fused_chunk as FC
from tests.test_fused_chunk import build_chunk_inputs
from tests.test_fused_chunk import normalize, random_problem

B, L0, L, N, P = 32, 500, 640, 1792, 12
D = 22
SUB_L = -(-(L + 1) // 128)
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
metas = np.asarray(metas)
bbj, bwj, blj = jnp.asarray(bb), jnp.asarray(bw), jnp.asarray(blen)

log = open("/tmp/chunk_parity.log", "w", buffering=1)


def say(msg):
    print(msg, file=log)
    print(msg, flush=True)


# reference chain, computed once
refs = []
ref = E.init_graphs(bbj, bwj, blj, N, P)
for layer in layers:
    ref = E.add_layer(ref, layer, 3, -5, -4, T_CAP)
    refs.append(jax.tree_util.tree_map(np.asarray, ref))
say("reference chain done")


def run_chunk(depth):
    m2 = metas.copy()
    m2[depth:, :, 4] = 0     # deactivate layers >= depth
    st, nr = FC.polish_chunk(bbj, bwj, blj, jnp.asarray(m2),
                             jnp.asarray(seq_t), jnp.asarray(wts_t),
                             n_cap=N, p_cap=P, sub_l=SUB_L, match=3,
                             mismatch=-5, gap=-4, t_cap=T_CAP)
    return FC.unpack_chunk_state(np.asarray(st), np.asarray(nr), P)


def diff_fields(got, want):
    gotn = normalize(got)
    wantn = normalize(E.GraphState(*[jnp.asarray(x) for x in want]))
    okm = ~np.asarray(want.failed)
    bad = {}
    for f in want._fields:
        g, w = np.asarray(getattr(gotn, f)), np.asarray(getattr(wantn, f))
        neq = (g[okm] != w[okm])
        if neq.any():
            bad[f] = (int(neq.sum()), g, w)
    return bad


for depth in range(1, D + 1):
    got = run_chunk(depth)
    want = refs[depth - 1]
    bad = diff_fields(got, want)
    say(f"depth={depth}: "
        f"{'OK' if not bad else {k: v[0] for k, v in bad.items()}}")
    if bad:
        for f, (cnt, g, w) in bad.items():
            idx = np.argwhere(g != w)
            bwin = sorted(set(idx[:, 0].tolist()))
            say(f"  field {f}: windows {bwin[:10]}")
            for r in idx[:8]:
                say(f"    {f}{tuple(r)}: got {g[tuple(r)]} want {w[tuple(r)]}")
        say(f"  n_nodes got {np.asarray(got.n_nodes)[bwin[:6]]} "
            f"want {np.asarray(want.n_nodes)[bwin[:6]]}")
        break

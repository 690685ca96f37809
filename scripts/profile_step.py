#!/usr/bin/env python
"""Micro-profile the POA layer step components on the current backend."""
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
state = E.init_graphs(jnp.asarray(backbone),
                      jnp.ones((B, L0), jnp.int32),
                      jnp.full((B,), L0, np.int32), N, P)

seq = rng.randint(0, 4, size=(B, L)).astype(np.int32)
layer = E.LayerBatch(
    seq=jnp.asarray(seq), weights=jnp.ones((B, L), jnp.int32),
    length=jnp.full((B,), min(L, 520), np.int32),
    begin=jnp.zeros((B,), np.int32), end=jnp.full((B,), L0 - 1, np.int32),
    full=jnp.ones((B,), bool), active=jnp.ones((B,), bool))

use_pallas = jax.default_backend() not in ("cpu",)
print("backend:", jax.default_backend(), "use_pallas:", use_pallas)


def _force(out):
    # materialize on host: block_until_ready alone proved unreliable through
    # the axon tunnel
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)


def timeit(name, fn, *args, n=8, **kw):
    out = fn(*args, **kw)
    _force(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
        _force(out)
    dt = (time.time() - t0) / n
    print(f"{name:30s} {dt*1e3:9.2f} ms")
    return out


barange = jnp.arange(B)
rb = jnp.zeros((B,), jnp.int32)
re = state.n_nodes - 1


# 1. full add_layer (pallas on TPU)
@functools.partial(jax.jit, static_argnames=("up",))
def full_step(s, l, up):
    return E.add_layer(s, l, 3, -5, -4, t_cap=T_CAP, use_pallas=up)

timeit("add_layer(total)", full_step, state, layer, use_pallas)

# 2. align only (pallas path): pregather + kernel
@jax.jit
def align_only(s, l):
    return E._align_pallas(s, l, 3, -5, -4, rb, re, T_CAP)

if use_pallas:
    pn, pp, plen, overrun = timeit("align_pallas(pregather+k)", align_only,
                                   state, layer)
else:
    @jax.jit
    def align_xla(s, l):
        H, bp, hs = E._forward_dp(s, l, 3, -5, -4, rb, re)
        return E._traceback(s, l, H, bp, hs, rb, re, T_CAP)
    pn, pp, plen, overrun = timeit("align_xla", align_xla, state, layer)

# 3. update_graph only
@jax.jit
def update_only(s, l, pn, pp, plen, overrun):
    return E._update_graph(s, l, pn, pp, plen, overrun)

timeit("update_graph", update_only, state, layer, pn, pp, plen, overrun)

# 4. pregather only (the rank-space gathers feeding the kernel)
@jax.jit
def pregather(s, l):
    Np1 = s.pred.shape[1]
    Nn = Np1 - 1
    b2 = jnp.arange(B)[:, None]
    order_safe = jnp.clip(s.order, 0, Nn)
    codes_r = s.codes[b2, order_safe]
    pred_n = s.pred[b2, order_safe]
    predr_n = jnp.where(
        pred_n < Nn,
        jnp.take_along_axis(s.rank, pred_n.reshape(B, Nn * P),
                            axis=1).reshape(B, Nn, P), -1)
    hs = E._compute_has_succ(s, l, rb, re)
    return codes_r, predr_n, hs

timeit("pregather+has_succ", pregather, state, layer)

# 5. the lexsort part of update alone
@jax.jit
def rerank_only(s):
    Np1 = s.pred.shape[1]
    Nn = Np1 - 1
    ar = jnp.arange(Nn, dtype=jnp.int32)
    node_valid = ar[None, :] < s.n_nodes[:, None]
    rep_v = jnp.where(node_valid, s.rep[:, :Nn], Nn)
    key_v = jnp.where(node_valid, s.key[:, :Nn], jnp.int32(2**30))
    ids = jnp.broadcast_to(ar[None, :], (B, Nn))
    return jnp.lexsort((ids, rep_v, key_v), axis=1)

timeit("lexsort[B,N]", rerank_only, state)

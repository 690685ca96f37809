"""Pallas DP kernel (interpret mode on CPU) vs the XLA reference path:
identical alignment paths and identical resulting graphs."""

import random

import numpy as np
import pytest

import jax.numpy as jnp


def noisy(s, rate, rng):
    out = []
    for c in s:
        r = rng.random()
        if r < rate / 3:
            continue
        elif r < 2 * rate / 3:
            out.append(rng.choice("ACGT"))
            out.append(c)
        elif r < rate:
            out.append(rng.choice("ACGT"))
        else:
            out.append(c)
    return "".join(out)


def build_layers(rng, B=3, L0=90, depth=6, partial=True):
    from racon_tpu.poa import engine as E
    from racon_tpu.poa.graph import encode

    N, P, L = 256, 8, 128
    trues = ["".join(rng.choice("ACGT") for _ in range(L0)) for _ in range(B)]
    backbones = [noisy(t, 0.12, rng).encode() for t in trues]
    bb = np.full((B, max(len(b) for b in backbones)), E.PAD_CODE, np.int32)
    blen = np.zeros(B, np.int32)
    for i, b in enumerate(backbones):
        bb[i, :len(b)] = encode(b)
        blen[i] = len(b)
    state = E.init_graphs(jnp.asarray(bb), jnp.ones_like(jnp.asarray(bb)),
                          jnp.asarray(blen), N, P)

    layers = []
    for d in range(depth):
        seq = np.full((B, L), E.PAD_CODE, np.int32)
        length = np.zeros(B, np.int32)
        begin = np.zeros(B, np.int32)
        end = np.zeros(B, np.int32)
        full = np.zeros(B, bool)
        for i in range(B):
            if partial and rng.random() < 0.5:
                half = int(blen[i]) // 2
                s = encode(noisy(trues[i][:L0 // 2], 0.1, rng).encode())
                b_, e_ = 0, half
            else:
                s = encode(noisy(trues[i], 0.1, rng).encode())
                b_, e_ = 0, int(blen[i]) - 1
            s = s[:L]
            seq[i, :len(s)] = s
            length[i] = len(s)
            begin[i], end[i] = b_, e_
            full[i] = b_ < int(0.01 * blen[i]) and \
                e_ > int(blen[i]) - int(0.01 * blen[i])
        layers.append(E.LayerBatch(
            seq=jnp.asarray(seq), weights=jnp.ones((B, L), jnp.int32),
            length=jnp.asarray(length), begin=jnp.asarray(begin),
            end=jnp.asarray(end), full=jnp.asarray(full),
            active=jnp.ones(B, bool)))
    return state, layers, N, P, L


def test_pallas_matches_xla_reference():
    from racon_tpu.poa import engine as E
    from racon_tpu.poa import pallas_dp as PK

    PK.INTERPRET = True
    try:
        rng = random.Random(21)
        state_x, layers, N, P, L = build_layers(rng)
        state_p = state_x
        t_cap = N + L
        for layer in layers:
            state_x = E.add_layer(state_x, layer, 3, -5, -4, t_cap,
                                  use_pallas=False)
            state_p = E.add_layer(state_p, layer, 3, -5, -4, t_cap,
                                  use_pallas=True)
        assert not bool(np.asarray(state_x.failed).any())
        assert not bool(np.asarray(state_p.failed).any())
        for name in ("codes", "key", "pred", "pred_w", "pred_cnt", "cov",
                     "rep", "order", "rank", "n_nodes"):
            np.testing.assert_array_equal(
                np.asarray(getattr(state_p, name)),
                np.asarray(getattr(state_x, name)), err_msg=name)
    finally:
        PK.INTERPRET = False


def test_pallas_inactive_and_padded_windows():
    """Padded batch entries (inactive, empty graphs) must be handled without
    out-of-bounds access and leave state untouched."""
    from racon_tpu.poa import engine as E
    from racon_tpu.poa import pallas_dp as PK

    PK.INTERPRET = True
    try:
        rng = random.Random(5)
        state, layers, N, P, L = build_layers(rng, B=4, depth=3)
        # deactivate windows 2,3 as if they were batch padding
        import jax.numpy as jnp
        sn = np.asarray(state.n_nodes).copy()
        sn[2:] = 0
        state = state._replace(n_nodes=jnp.asarray(sn))
        t_cap = N + L
        for layer in layers:
            act = np.asarray(layer.active).copy()
            act[2:] = False
            layer = layer._replace(active=jnp.asarray(act))
            sx = E.add_layer(state, layer, 3, -5, -4, t_cap, use_pallas=False)
            sp = E.add_layer(state, layer, 3, -5, -4, t_cap, use_pallas=True)
            for name in ("codes", "key", "pred", "pred_w", "pred_cnt", "cov",
                         "rep", "order", "rank", "n_nodes", "failed"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(sp, name)),
                    np.asarray(getattr(sx, name)), err_msg=name)
            state = sx
    finally:
        PK.INTERPRET = False

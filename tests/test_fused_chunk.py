"""Bit-identity of the resident multi-layer chunk kernel vs the XLA engine.

polish_chunk builds every window's whole POA graph in one kernel launch
(grid (B, D), state resident on-chip per window).  These tests run it in
interpret mode on CPU against engine.add_layer applied layer by layer,
comparing the full normalized graph state — at every prefix depth for the
small cases (so a regression pinpoints the first diverging layer) and at
the final state for the larger ones.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from racon_tpu.poa import engine as E
from racon_tpu.poa import fused_chunk as FC
from tests.test_fused_step import (assert_states_equal, normalize,
                                   random_problem)


def build_chunk_inputs(layers, sub_l):
    D = len(layers)
    B = layers[0].seq.shape[0]
    metas = np.zeros((D, B, 8), np.int32)
    seqs = np.stack([np.asarray(l.seq) for l in layers])
    wtss = np.stack([np.asarray(l.weights) for l in layers])
    for d, l in enumerate(layers):
        metas[d, :, 0] = np.asarray(l.begin)
        metas[d, :, 1] = np.asarray(l.end)
        metas[d, :, 2] = np.asarray(l.full).astype(np.int32)
        metas[d, :, 3] = np.asarray(l.length)
        metas[d, :, 4] = np.asarray(l.active).astype(np.int32)
    seq_t, wts_t = FC.pack_layer_tiles(seqs, wtss, sub_l)
    return jnp.asarray(metas), jnp.asarray(seq_t), jnp.asarray(wts_t)


def run_parity(B, L0, L, D, N, P, seed, match=3, mismatch=-5, gap=-4,
               every_prefix=True, partial=True):
    rng = np.random.RandomState(seed + 1000)
    state0, layers = random_problem(B, L0, L, D, N, P, seed, partial=partial)
    # take the backbone codes/lengths from the generated init state and
    # draw fresh per-base weights (fed identically to both paths)
    codes0 = np.asarray(state0.codes)
    blen = np.asarray(state0.n_nodes)
    bb = codes0[:, :L0].astype(np.int32)
    bw_base = rng.randint(1, 50, size=(B, L0)).astype(np.int32)
    for b in range(B):
        bb[b, blen[b]:] = E.PAD_CODE
        bw_base[b, blen[b]:] = 0
    state = E.init_graphs(jnp.asarray(bb), jnp.asarray(bw_base),
                          jnp.asarray(blen), N, P)

    sub_l = -(-(L + 1) // FC.LANE)
    t_cap = N + L
    prefixes = range(1, D + 1) if every_prefix else [D]
    ref = state
    ref_states = []
    for layer in layers:
        ref = E.add_layer(ref, layer, match, mismatch, gap, t_cap)
        ref_states.append(ref)

    for Dp in prefixes:
        metas, seq_t, wts_t = build_chunk_inputs(layers[:Dp], sub_l)
        st, nr = FC.polish_chunk(
            jnp.asarray(bb), jnp.asarray(bw_base), jnp.asarray(blen),
            metas, seq_t, wts_t, n_cap=N, p_cap=P, sub_l=sub_l,
            match=match, mismatch=mismatch, gap=gap, t_cap=t_cap,
            interpret=True)
        got = FC.unpack_chunk_state(st, nr, P)
        assert_states_equal(got, ref_states[Dp - 1], Dp - 1)
    return ref_states[-1]


class TestFusedChunkParity:
    def test_small_random(self):
        run_parity(B=3, L0=40, L=96, D=6, N=160, P=8, seed=0)

    def test_more_windows(self):
        run_parity(B=4, L0=56, L=128, D=5, N=192, P=8, seed=7)

    def test_full_span_only(self):
        run_parity(B=3, L0=48, L=96, D=5, N=192, P=8, seed=9, partial=False)

    def test_scoring_variants(self):
        run_parity(B=2, L0=32, L=64, D=4, N=128, P=8, seed=3,
                   match=1, mismatch=-1, gap=-1, every_prefix=False)
        run_parity(B=2, L0=32, L=64, D=4, N=128, P=8, seed=4,
                   match=5, mismatch=-4, gap=-8, every_prefix=False)

    def test_capacity_overflow_parity(self):
        # tiny node capacity: windows must fail identically on both paths
        st = run_parity(B=3, L0=40, L=96, D=10, N=56, P=6, seed=1,
                        every_prefix=False)
        assert bool(np.asarray(st.failed).any())

    def test_pred_overflow_parity(self):
        st = run_parity(B=3, L0=40, L=96, D=10, N=256, P=2, seed=2,
                        every_prefix=False)
        assert bool(np.asarray(st.failed).any())

    def test_narrow_rows(self):
        # sub_l = 1 (single 128-lane row)
        run_parity(B=2, L0=24, L=64, D=4, N=96, P=8, seed=5,
                   every_prefix=False)

"""Bit-identity of the fused Pallas layer step vs the XLA engine.

Runs the fused kernel in interpret mode on CPU, layer by layer, against
engine.add_layer on the same inputs, comparing the full normalized graph
state after every step.

Why the merge re-rank is the lexsort: the XLA engine orders nodes by
(key, rep, id).  All nodes created by one layer carry strictly increasing
keys (anchor-column keys and interpolated run keys are strictly between
their anchors), old nodes keep their relative order, and on key ties the
old node wins (equal key implies equal column implies equal rep, and new
ids are larger) — so a stable merge of the two sorted streams with
old-first ties reproduces the lexsort exactly.  These tests assert that.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from racon_tpu.poa import engine as E
from racon_tpu.poa import fused_step as F


def normalize(s: E.GraphState) -> E.GraphState:
    """Mask sentinel/garbage entries so engine and fused states compare."""
    B, Np1, P = s.pred.shape
    N = Np1 - 1
    node_ar = jnp.arange(Np1, dtype=jnp.int32)[None, :]
    node_ok = node_ar < s.n_nodes[:, None]
    rank_ar = jnp.arange(N, dtype=jnp.int32)[None, :]
    rank_ok = rank_ar < s.n_nodes[:, None]
    return E.GraphState(
        codes=jnp.where(node_ok, s.codes, E.PAD_CODE),
        key=jnp.where(node_ok, s.key, 2 ** 30),
        pred=jnp.where(node_ok[:, :, None], s.pred, N),
        pred_w=jnp.where(node_ok[:, :, None], s.pred_w, 0),
        pred_cnt=jnp.where(node_ok, s.pred_cnt, 0),
        cov=jnp.where(node_ok, s.cov, 0),
        rep=jnp.where(node_ok, s.rep, N),
        letter_node=jnp.where(node_ok[:, :, None], s.letter_node, -1),
        order=jnp.where(rank_ok, s.order, N),
        rank=jnp.where(node_ok, s.rank, 2 ** 30),
        n_nodes=s.n_nodes,
        failed=s.failed)


def assert_states_equal(got: E.GraphState, want: E.GraphState, d: int):
    got, want = normalize(got), normalize(want)
    np.testing.assert_array_equal(np.asarray(got.failed),
                                  np.asarray(want.failed),
                                  err_msg=f"failed@layer{d}")
    ok = ~np.asarray(want.failed)
    for f in want._fields:
        g, w = np.asarray(getattr(got, f)), np.asarray(getattr(want, f))
        np.testing.assert_array_equal(
            g[ok], w[ok], err_msg=f"{f}@layer{d}")


def random_problem(B, L0, L, D, N, P, seed, partial=True):
    rng = np.random.RandomState(seed)
    backbone = rng.randint(0, 4, size=(B, L0)).astype(np.int32)
    backbone_len = rng.randint(max(4, L0 - 8), L0 + 1, size=B).astype(np.int32)
    backbone_w = rng.randint(1, 50, size=(B, L0)).astype(np.int32)
    for b in range(B):
        backbone[b, backbone_len[b]:] = E.PAD_CODE
        backbone_w[b, backbone_len[b]:] = 0
    state = E.init_graphs(jnp.asarray(backbone), jnp.asarray(backbone_w),
                          jnp.asarray(backbone_len), N, P)

    layers = []
    for d in range(D):
        seq = np.full((B, L), E.PAD_CODE, np.int32)
        wts = np.zeros((B, L), np.int32)
        length = np.zeros(B, np.int32)
        begin = np.zeros(B, np.int32)
        end = np.zeros(B, np.int32)
        fullf = np.zeros(B, bool)
        active = np.zeros(B, bool)
        for b in range(B):
            if rng.rand() < 0.15:          # inactive slot
                continue
            active[b] = True
            bl = int(backbone_len[b])
            if partial and rng.rand() < 0.5:
                bg = rng.randint(0, bl // 2)
                en = rng.randint(bg + 2, bl)
            else:
                bg, en = 0, bl - 1
                fullf[b] = True
            # mutate a slice of the backbone into a read segment
            base = backbone[b, bg:en + 1].copy()
            out = []
            for ch in base:
                r = rng.rand()
                if r < 0.10:
                    out.append(rng.randint(0, 4))      # substitution
                elif r < 0.15:
                    out.append(int(ch)); out.append(rng.randint(0, 4))
                elif r < 0.20:
                    pass                                # deletion
                else:
                    out.append(int(ch))
            out = (out or [0])[:L]
            seq[b, :len(out)] = out
            wts[b, :len(out)] = rng.randint(1, 40, size=len(out))
            length[b] = len(out)
            begin[b] = bg
            end[b] = en
        layers.append(E.LayerBatch(
            seq=jnp.asarray(seq), weights=jnp.asarray(wts),
            length=jnp.asarray(length), begin=jnp.asarray(begin),
            end=jnp.asarray(end), full=jnp.asarray(fullf),
            active=jnp.asarray(active)))
    return state, layers


def run_parity(B, L0, L, D, N, P, seed, match=3, mismatch=-5, gap=-4):
    state, layers = random_problem(B, L0, L, D, N, P, seed)
    t_cap = N + L
    fs = F.pack_state(state)
    for d, layer in enumerate(layers):
        state = E.add_layer(state, layer, match, mismatch, gap, t_cap)

        meta = np.zeros((B, 1, 8), np.int32)
        meta[:, 0, 0] = np.asarray(layer.begin)
        meta[:, 0, 1] = np.asarray(layer.end)
        meta[:, 0, 2] = np.asarray(layer.full).astype(np.int32)
        meta[:, 0, 3] = np.asarray(layer.length)
        meta[:, 0, 4] = np.asarray(layer.active).astype(np.int32)
        seq_t, wts_t = F.pack_layer_tiles(
            np.asarray(layer.seq)[None], np.asarray(layer.weights)[None])
        fs = F.fused_layer_step(
            fs, jnp.asarray(meta), jnp.asarray(seq_t[0]),
            jnp.asarray(wts_t[0]), p_cap=P, match=match, mismatch=mismatch,
            gap=gap, t_cap=t_cap, interpret=True)
        got = F.unpack_state(fs, P)
        assert_states_equal(got, state, d)
    return state


class TestFusedStepParity:
    def test_small_random(self):
        run_parity(B=3, L0=40, L=96, D=6, N=160, P=8, seed=0)

    def test_more_windows(self):
        run_parity(B=4, L0=56, L=128, D=5, N=192, P=8, seed=7)

    def test_scoring_variants(self):
        run_parity(B=2, L0=32, L=64, D=4, N=128, P=8, seed=3,
                   match=1, mismatch=-1, gap=-1)
        run_parity(B=2, L0=32, L=64, D=4, N=128, P=8, seed=4,
                   match=5, mismatch=-4, gap=-8)

    def test_capacity_overflow_parity(self):
        # tiny node capacity: windows must fail identically on both paths
        st = run_parity(B=3, L0=40, L=96, D=10, N=56, P=6, seed=1)
        assert bool(np.asarray(st.failed).any())

    def test_pred_overflow_parity(self):
        st = run_parity(B=3, L0=40, L=96, D=10, N=256, P=2, seed=2)
        assert bool(np.asarray(st.failed).any())


def test_init_fused_matches_pack_state():
    rng = np.random.RandomState(5)
    B, L0, N, P = 3, 48, 128, 8
    backbone = rng.randint(0, 4, size=(B, L0)).astype(np.int32)
    blen = np.array([48, 40, 33], np.int32)
    bw = rng.randint(1, 30, size=(B, L0)).astype(np.int32)
    for b in range(B):
        backbone[b, blen[b]:] = E.PAD_CODE
        bw[b, blen[b]:] = 0
    st = E.init_graphs(jnp.asarray(backbone), jnp.asarray(bw),
                       jnp.asarray(blen), N, P)
    want = F.pack_state(st)
    got = F.init_fused(jnp.asarray(backbone), jnp.asarray(bw),
                       jnp.asarray(blen), N, P)
    for f in want._fields:
        if f == "col":
            # col beyond the valid ranks is unread; compare valid only
            for b in range(B):
                np.testing.assert_array_equal(
                    np.asarray(getattr(got, f))[b, 0, :blen[b]],
                    np.asarray(getattr(want, f))[b, 0, :blen[b]], f)
            continue
        np.testing.assert_array_equal(np.asarray(getattr(got, f)),
                                      np.asarray(getattr(want, f)), f)


class TestFusedEngine:
    def test_engine_fused_matches_oracle(self, monkeypatch):
        """End-to-end through the batched scheduler in fused mode."""
        import random

        from racon_tpu.poa.batched import BatchedPOAEngine
        from racon_tpu.poa.consensus import consensus_window
        from tests.test_engine import make_window

        monkeypatch.setattr(F, "INTERPRET", True)
        rng = random.Random(11)
        windows = [make_window(rng, length=100, depth=6, with_quality=True,
                               partial=True)[0] for _ in range(4)]
        engine = BatchedPOAEngine(3, -5, -4, batch_size=4, mode="fused")
        got = engine.polish_windows(windows, trim=False)
        assert engine.stats["fallback"] == 0, "device flagged failures"
        for w, (cons, polished) in zip(windows, got):
            ref_cons, ref_polished = consensus_window(w, 3, -5, -4,
                                                      trim=False)
            assert polished == ref_polished
            assert cons == ref_cons

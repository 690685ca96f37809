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
               every_prefix=True, partial=True, interleave=1):
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
            interpret=True, interleave=interleave)
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

    def test_interleaved_windows(self):
        # K=2: two windows per grid step, serial phases interleaved
        run_parity(B=4, L0=40, L=96, D=5, N=160, P=8, seed=14,
                   interleave=2)

    def test_interleaved_overflow(self):
        # failures must stay per-window under interleaving
        st = run_parity(B=4, L0=40, L=96, D=10, N=56, P=6, seed=1,
                        every_prefix=False, interleave=2)
        assert bool(np.asarray(st.failed).any())
        assert not bool(np.asarray(st.failed).all())

    def test_interleaved_k3(self):
        # K=3 at full p_cap: 3 streams' state tables fit the SMEM budget
        # without the p_cap=9 shrink (needs batch_size % 3 == 0)
        run_parity(B=6, L0=40, L=96, D=4, N=160, P=8, seed=17,
                   every_prefix=False, interleave=3)

    def test_interleaved_k4(self):
        # K=4 with p_cap=9: the config the scheduler picks when asked
        # for 4 streams (p_cap drops 12->9 to fit the SMEM budget)
        run_parity(B=4, L0=40, L=96, D=4, N=160, P=9, seed=21,
                   every_prefix=False, interleave=4)

    def test_narrow_rows(self):
        # sub_l = 1 (single 128-lane row)
        run_parity(B=2, L0=24, L=64, D=4, N=96, P=8, seed=5,
                   every_prefix=False)


def test_wide_rank_packing_parity():
    """Node capacities beyond the old 11-bit rank-payload limit (N > 2046)
    are bit-identical to the engine (the traceback re-derives predecessors
    from slot codes, so N is bounded only by on-chip memory)."""
    B, L0, L, D, N, P = 2, 48, 96, 4, 2100, 6
    state0, layers = random_problem(B, L0, L, D, N, P, seed=21)
    codes0 = np.asarray(state0.codes)
    blen = np.asarray(state0.n_nodes)
    bb = codes0[:, :L0].astype(np.int32)
    rng = np.random.RandomState(77)
    bw = rng.randint(1, 50, size=(B, L0)).astype(np.int32)
    for b in range(B):
        bb[b, blen[b]:] = E.PAD_CODE
        bw[b, blen[b]:] = 0
    ref = E.init_graphs(jnp.asarray(bb), jnp.asarray(bw), jnp.asarray(blen),
                        N, P)
    for layer in layers:
        ref = E.add_layer(ref, layer, 3, -5, -4, N + L)
    sub_l = 1
    metas, seq_t, wts_t = build_chunk_inputs(layers, sub_l)
    st, nr = FC.polish_chunk(
        jnp.asarray(bb), jnp.asarray(bw), jnp.asarray(blen), metas, seq_t,
        wts_t, n_cap=N, p_cap=P, sub_l=sub_l, match=3, mismatch=-5, gap=-4,
        t_cap=N + L, interpret=True)
    got = FC.unpack_chunk_state(st, nr, P)
    assert_states_equal(got, ref, D - 1)


def test_saturation_fails_to_host():
    """Scores reaching SAT_FLOOR fail the window on-device (the 16-bit
    packed field would wrap); the engine reference keeps exact int32
    scores, so the batched scheduler must reroute such windows to the
    host oracle and still produce the oracle's answer."""
    import random

    from racon_tpu.poa.batched import BatchedPOAEngine
    from racon_tpu.poa.consensus import consensus_window
    from tests.test_engine import make_window

    rng = random.Random(5)
    w, _ = make_window(rng, length=420, depth=4, with_quality=False,
                       partial=False)
    # a hostile scoring config: gap -64 drives garbage paths past the
    # saturation floor on long windows
    import racon_tpu.poa.fused_chunk as F

    class Probe:
        pass

    engine = BatchedPOAEngine(2, -60, -64, batch_size=1, mode="fused")
    import unittest.mock as mock
    with mock.patch.object(F, "INTERPRET", True):
        got = engine.polish_windows([w], trim=False)
    ref = consensus_window(w, 2, -60, -64, trim=False)
    assert got[0] == ref


class TestFusedChunkEngine:
    def test_engine_fused_matches_oracle(self, monkeypatch):
        """End-to-end through the batched scheduler in fused mode."""
        import random

        from racon_tpu.poa.batched import BatchedPOAEngine
        from racon_tpu.poa.consensus import consensus_window
        from tests.test_engine import make_window

        monkeypatch.setattr(FC, "INTERPRET", True)
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

    def test_ragged_chunk_interleaved(self, monkeypatch):
        """A final chunk smaller than batch_size pads with inactive
        windows; with K=2 interleave a padded slot shares a stream pair
        with a real window (genome-scale runs hit this on their last
        chunk — lambda's 96 = 3 x 32 never does).  Output must still
        match the oracle with zero fallbacks."""
        import random

        from racon_tpu.poa.batched import BatchedPOAEngine
        from racon_tpu.poa.consensus import consensus_window
        from tests.test_engine import make_window

        monkeypatch.setattr(FC, "INTERPRET", True)
        rng = random.Random(13)
        windows = [make_window(rng, length=80, depth=5, with_quality=True,
                               partial=True)[0] for _ in range(6)]
        engine = BatchedPOAEngine(3, -5, -4, batch_size=8, mode="fused",
                                  interleave=2)
        got = engine.polish_windows(windows, trim=False)
        assert engine.stats["k"] == 2
        assert engine.stats["fallback"] == 0, "device flagged failures"
        for w, (cons, polished) in zip(windows, got):
            ref_cons, ref_polished = consensus_window(w, 3, -5, -4,
                                                      trim=False)
            assert polished == ref_polished
            assert cons == ref_cons

    def test_interleave_not_dividing_batch(self, monkeypatch):
        """K need not divide batch_size: the launch pads the batch up to
        a multiple of K (K=3 at batch 4 -> 6 slots, 2 inactive), so K=3
        is usable at the production batch of 32.  Output must match the
        oracle with zero fallbacks."""
        import random

        from racon_tpu.poa.batched import BatchedPOAEngine
        from racon_tpu.poa.consensus import consensus_window
        from tests.test_engine import make_window

        monkeypatch.setattr(FC, "INTERPRET", True)
        rng = random.Random(29)
        windows = [make_window(rng, length=80, depth=5, with_quality=True,
                               partial=True)[0] for _ in range(4)]
        engine = BatchedPOAEngine(3, -5, -4, batch_size=4, mode="fused",
                                  interleave=3)
        got = engine.polish_windows(windows, trim=False)
        assert engine.stats["k"] == 3
        assert engine.stats["fallback"] == 0, "device flagged failures"
        for w, (cons, polished) in zip(windows, got):
            ref_cons, ref_polished = consensus_window(w, 3, -5, -4,
                                                      trim=False)
            assert polished == ref_polished
            assert cons == ref_cons


# ----------------------------------------------------------------------- #
# in-kernel consensus (phase 7): heaviest_bundle on the resident graph
# ----------------------------------------------------------------------- #


def run_consensus_parity(B, L0, L, D, N, P, seed, match=3, mismatch=-5,
                         gap=-4, partial=True, interleave=1,
                         allow_code6=False):
    """polish_chunk(consensus=True) must emit the exact consensus the
    host heaviest_bundle computes from the downloaded graph (reference
    consensus policy: spoa GenerateConsensus, src/window.cpp:122-123).
    Returns the number of windows that needed branch completion (so
    callers can assert the BC path was actually exercised)."""
    from racon_tpu.poa.consensus_host import consensus_from_arrays

    rng = np.random.RandomState(seed + 1000)
    state0, layers = random_problem(B, L0, L, D, N, P, seed, partial=partial)
    codes0 = np.asarray(state0.codes)
    blen = np.asarray(state0.n_nodes)
    bb = codes0[:, :L0].astype(np.int32)
    bw_base = rng.randint(1, 50, size=(B, L0)).astype(np.int32)
    for b in range(B):
        bb[b, blen[b]:] = E.PAD_CODE
        bw_base[b, blen[b]:] = 0
    sub_l = -(-(L + 1) // FC.LANE)
    t_cap = N + L
    metas, seq_t, wts_t = build_chunk_inputs(layers, sub_l)
    args = (jnp.asarray(bb), jnp.asarray(bw_base), jnp.asarray(blen),
            metas, seq_t, wts_t)
    kw = dict(n_cap=N, p_cap=P, sub_l=sub_l, match=match, mismatch=mismatch,
              gap=gap, t_cap=t_cap, interpret=True, interleave=interleave)
    st_ref, nr_ref = FC.polish_chunk(*args, **kw)
    ref = {k: np.asarray(v) for k, v in
           FC.pack_for_download_chunk(st_ref, nr_ref, p_cap=P).items()}
    st, _ = FC.polish_chunk(*args, consensus=True, **kw)
    got = FC.unpack_consensus_chunk(
        np.asarray(FC.pack_consensus_chunk(st)["consfused"]))
    Np1 = got["cons"].shape[1]

    if not allow_code6:
        assert not (got["failed_code"] == 6).any(), got["failed_code"]
    # phase 7 only ADDS code 6 on previously-ok windows; every other
    # failure must be byte-identical to the consensus-off launch
    not6 = got["failed_code"] != 6
    np.testing.assert_array_equal(got["failed_code"][not6],
                                  ref["failed_code"][not6])

    n_checked = n_bc = 0
    for b in range(B):
        if ref["failed"][b] or got["failed_code"][b] == 6:
            continue
        n_nodes = int(ref["n_nodes"][b])
        want_codes, want_cov = consensus_from_arrays(
            ref["codes"][b], ref["pred"][b], ref["pred_w"][b],
            ref["pred_cnt"][b], ref["cov"][b], ref["order"][b],
            ref["rank"][b], n_nodes)
        ln = int(got["cons_len"][b])
        assert ln == len(want_codes), f"cons_len b={b}: {ln} != " \
            f"{len(want_codes)}"
        np.testing.assert_array_equal(got["cons"][b, Np1 - ln:],
                                      want_codes, err_msg=f"cons b={b}")
        np.testing.assert_array_equal(
            got["cons_cov"][b, Np1 - ln:].astype(np.int32), want_cov,
            err_msg=f"cons_cov b={b}")
        n_checked += 1
        # did the host need branch completion (path end not the
        # max-scoring node)?  Re-derive pass-1 max_v and compare.
        scores = np.full(n_nodes, -1, dtype=np.int64)
        choice = np.full(n_nodes, -1, dtype=np.int64)
        max_v = -1
        for r in range(n_nodes):
            v = int(ref["order"][b][r])
            for s in range(int(ref["pred_cnt"][b][v])):
                p, w = int(ref["pred"][b][v, s]), int(ref["pred_w"][b][v, s])
                if p >= Np1 - 1:
                    continue
                if scores[v] < w or (scores[v] == w
                                     and scores[choice[v]] <= scores[p]):
                    scores[v], choice[v] = w, p
            if choice[v] != -1:
                scores[v] += scores[choice[v]]
            if max_v == -1 or scores[max_v] < scores[v]:
                max_v = v
        # the host enters its while-loop (branch completion) iff max_v
        # has at least one successor
        succ = any(
            max_v in [int(ref["pred"][b][h, s])
                      for s in range(int(ref["pred_cnt"][b][h]))]
            for h in range(n_nodes))
        if succ:
            n_bc += 1
    assert n_checked > 0
    return n_bc


class TestFusedChunkConsensus:
    def test_consensus_small(self):
        run_consensus_parity(B=3, L0=40, L=96, D=6, N=160, P=8, seed=0)

    def test_consensus_more_windows(self):
        run_consensus_parity(B=4, L0=56, L=128, D=5, N=192, P=8, seed=7)

    def test_consensus_full_span(self):
        run_consensus_parity(B=3, L0=48, L=96, D=5, N=192, P=8, seed=9,
                             partial=False)

    def test_consensus_interleaved(self):
        run_consensus_parity(B=4, L0=40, L=96, D=5, N=160, P=8, seed=14,
                             interleave=2)

    def test_consensus_branch_completion(self):
        """Heavy partial layers over only a backbone PREFIX make the
        max-scoring node land mid-graph (it has successors), forcing the
        branch-completion while-loop on both host and kernel."""
        from racon_tpu.poa.consensus_host import consensus_from_arrays

        B, L0, D, N, P = 2, 40, 5, 160, 8
        L = 96
        rng = np.random.RandomState(3)
        bb = rng.randint(0, 4, size=(B, L0)).astype(np.int32)
        bw = np.ones((B, L0), np.int32)
        blen = np.full(B, L0, np.int32)
        layers = []
        cut = 21
        for d in range(D):
            seq = np.full((B, L), E.PAD_CODE, np.int32)
            wts = np.zeros((B, L), np.int32)
            seq[:, :cut] = bb[:, :cut]        # exact prefix copy
            wts[:, :cut] = 50                 # heavy
            layers.append(E.LayerBatch(
                seq=jnp.asarray(seq), weights=jnp.asarray(wts),
                length=jnp.asarray(np.full(B, cut, np.int32)),
                begin=jnp.asarray(np.zeros(B, np.int32)),
                end=jnp.asarray(np.full(B, cut - 1, np.int32)),
                full=jnp.asarray(np.zeros(B, bool)),
                active=jnp.asarray(np.ones(B, bool))))
        sub_l = -(-(L + 1) // FC.LANE)
        t_cap = N + L
        metas, seq_t, wts_t = build_chunk_inputs(layers, sub_l)
        args = (jnp.asarray(bb), jnp.asarray(bw), jnp.asarray(blen),
                metas, seq_t, wts_t)
        kw = dict(n_cap=N, p_cap=P, sub_l=sub_l, match=3, mismatch=-5,
                  gap=-4, t_cap=t_cap, interpret=True)
        st_ref, nr_ref = FC.polish_chunk(*args, **kw)
        ref = {k: np.asarray(v) for k, v in
               FC.pack_for_download_chunk(st_ref, nr_ref, p_cap=P).items()}
        st, _ = FC.polish_chunk(*args, consensus=True, **kw)
        got = FC.unpack_consensus_chunk(
            np.asarray(FC.pack_consensus_chunk(st)["consfused"]))
        Np1 = got["cons"].shape[1]
        assert not got["failed"].any()
        for b in range(B):
            want_codes, want_cov = consensus_from_arrays(
                ref["codes"][b], ref["pred"][b], ref["pred_w"][b],
                ref["pred_cnt"][b], ref["cov"][b], ref["order"][b],
                ref["rank"][b], int(ref["n_nodes"][b]))
            # BC must actually have run: the path must extend past the
            # heavy prefix to the backbone sink (full backbone length)
            assert len(want_codes) == L0, "test setup failed to force BC"
            ln = int(got["cons_len"][b])
            assert ln == len(want_codes)
            np.testing.assert_array_equal(got["cons"][b, Np1 - ln:],
                                          want_codes)
            np.testing.assert_array_equal(
                got["cons_cov"][b, Np1 - ln:].astype(np.int32), want_cov)

    def test_consensus_with_failures(self):
        """Graph-build failures (capacity overflow) must carry their
        original code through a consensus launch untouched."""
        run_consensus_parity(B=3, L0=40, L=96, D=10, N=56, P=6, seed=1,
                             allow_code6=True)

"""Banded-DP chunk kernel: parity + fallback contract.

The banded kernel (fused_chunk band_sub > 0, cudapoa static-band analog —
reference: src/cuda/cudabatch.cpp:56-59) must produce BIT-IDENTICAL graphs
to the full-row kernel for every window it does not flag, and must flag
(failure code 5 -> host fallback) any window whose result could have been
influenced by the band edge.  Unlike the reference GPU path, banding here
never silently changes output.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from racon_tpu.poa import engine as E
from racon_tpu.poa import fused_chunk as FC
from tests.test_fused_chunk import build_chunk_inputs, random_problem


def run_pair(B, L0, L, N, P, D, sub_l, band_sub, seed=0, partial=True,
             K=1):
    t_cap = N + L
    state0, layers = random_problem(B, L0, L, D, N, P, seed=seed,
                                    partial=partial)
    codes0 = np.asarray(state0.codes)
    blen = np.asarray(state0.n_nodes)
    bb = codes0[:, :L0].astype(np.int32)
    rng = np.random.RandomState(99)
    bw = rng.randint(1, 50, size=(B, L0)).astype(np.int32)
    for b in range(B):
        bb[b, blen[b]:] = E.PAD_CODE
        bw[b, blen[b]:] = 0
    metas, seq_t, wts_t = build_chunk_inputs(layers, sub_l)
    args = (jnp.asarray(bb), jnp.asarray(bw), jnp.asarray(blen), metas,
            seq_t, wts_t)
    kw = dict(n_cap=N, p_cap=P, sub_l=sub_l, match=3, mismatch=-5, gap=-4,
              t_cap=t_cap, interpret=True, interleave=K)
    st_f, nr_f = FC.polish_chunk(*args, **kw)
    st_b, nr_b = FC.polish_chunk(*args, band_sub=band_sub, **kw)
    return (np.asarray(st_f), np.asarray(nr_f),
            np.asarray(st_b), np.asarray(nr_b))


def assert_band_contract(st_f, nr_f, st_b, nr_b, P, max_flag_frac=0.5):
    code_f = st_f[:, FC.R_MISC, 1]
    code_b = st_b[:, FC.R_MISC, 1]
    B = code_f.shape[0]
    n_band = 0
    g_f = FC.unpack_chunk_state(st_f, nr_f, p_cap=P)
    g_b = FC.unpack_chunk_state(st_b, nr_b, p_cap=P)
    for b in range(B):
        if code_b[b] == 5:
            n_band += 1
            continue
        # unflagged windows must agree with the full kernel EXACTLY
        assert code_b[b] == code_f[b], (b, code_b[b], code_f[b])
        for f in g_f._fields:
            vf = np.asarray(getattr(g_f, f)[b])
            vb = np.asarray(getattr(g_b, f)[b])
            assert np.array_equal(vf, vb), (b, f)
    assert n_band <= max_flag_frac * B, f"{n_band}/{B} windows flagged"
    return n_band


def test_band_parity_small():
    st_f, nr_f, st_b, nr_b = run_pair(B=4, L0=60, L=255, N=256, P=8, D=3,
                                      sub_l=2, band_sub=1, seed=3)
    assert_band_contract(st_f, nr_f, st_b, nr_b, P=8)


def test_band_parity_wider():
    """band_sub=2 of sub_l=3 on diagonal-ish layers: most windows should
    stay on device and match exactly."""
    st_f, nr_f, st_b, nr_b = run_pair(B=4, L0=100, L=383, N=384, P=8, D=4,
                                      sub_l=3, band_sub=2, seed=4)
    n_band = assert_band_contract(st_f, nr_f, st_b, nr_b, P=8)
    # the random layers are ~20% edited copies of the backbone — the
    # diagonal band should keep the large majority on device
    assert n_band <= 2


def test_band_interleaved():
    st_f, nr_f, st_b, nr_b = run_pair(B=4, L0=60, L=255, N=256, P=8, D=3,
                                      sub_l=2, band_sub=1, seed=5, K=2)
    assert_band_contract(st_f, nr_f, st_b, nr_b, P=8)


def test_band_through_scheduler(monkeypatch):
    """Forced banding through the production scheduler (polish_windows)
    stays bit-identical to the oracle — flagged windows ride the host
    fallback transparently."""
    import random

    from racon_tpu.poa.batched import BatchedPOAEngine
    from racon_tpu.poa.consensus import consensus_window
    from tests.test_engine import make_window

    monkeypatch.setattr(FC, "INTERPRET", True)
    rng = random.Random(77)
    windows = [make_window(rng, length=60, depth=5, with_quality=True,
                           partial=True)[0] for _ in range(4)]
    eng = BatchedPOAEngine(3, -5, -4, batch_size=4, mode="fused",
                           interleave=2)
    eng.band_sub = 1
    got = eng.polish_windows(windows, trim=False)
    assert eng.stats["band"] == 1
    for w, (cons, polished) in zip(windows, got):
        rc, rp = consensus_window(w, 3, -5, -4, trim=False)
        assert cons == rc and polished == rp


def test_band_flags_offdiagonal():
    """A layer that aligns far off the backbone diagonal (prefix of the
    backbone vs a sequence padded with a long tail) must either match the
    full kernel or be flagged — never silently diverge.  Constructed so
    at least one window exercises the edge path."""
    st_f, nr_f, st_b, nr_b = run_pair(B=4, L0=120, L=511, N=384, P=8, D=2,
                                      sub_l=4, band_sub=1, seed=6,
                                      partial=False)
    assert_band_contract(st_f, nr_f, st_b, nr_b, P=8, max_flag_frac=1.0)


def test_depth_cap_routes_to_host(monkeypatch):
    """Windows deeper than DEPTH_CAP must ride the host-oracle fallback
    (device coverage is a 16-bit packed field), with identical output."""
    import random

    import racon_tpu.poa.batched as BT
    from racon_tpu.poa.batched import BatchedPOAEngine
    from racon_tpu.poa.consensus import consensus_window
    from tests.test_engine import make_window

    monkeypatch.setattr(FC, "INTERPRET", True)
    monkeypatch.setattr(BT, "DEPTH_CAP", 6)
    rng = random.Random(5)
    windows = [make_window(rng, length=50, depth=d, with_quality=True)[0]
               for d in (4, 8)]        # depth 8 > cap 6 -> host
    expect = [consensus_window(w, 3, -5, -4, trim=False) for w in windows]
    eng = BatchedPOAEngine(3, -5, -4, batch_size=4, mode="fused")
    got = eng.polish_windows(windows, trim=False)
    assert got == expect
    assert eng.stats["fallback"] == 1


def test_interleave_smem_policy(monkeypatch):
    """The scheduler's SMEM clamp: when K streams of private state don't
    fit the budget at full p_cap, K steps down (and must keep dividing
    the batch).  With the 16-bit state-row packing the table is 24
    padded rows for any p_cap in 5..12, so p_cap shrinking is no longer
    a rescue lever.  Consensus stays correct in every regime."""
    import random

    from racon_tpu.poa.batched import BatchedPOAEngine
    from racon_tpu.poa.consensus import consensus_window
    from tests.test_engine import make_window

    monkeypatch.setattr(FC, "INTERPRET", True)
    rng = random.Random(78)
    windows = [make_window(rng, length=60, depth=5, with_quality=True)[0]
               for _ in range(4)]
    expect = [consensus_window(w, 3, -5, -4, trim=False) for w in windows]

    captured = {}
    real_polish = FC.polish_chunk

    def spy(*a, **kw):
        captured.update(kw)
        return real_polish(*a, **kw)

    monkeypatch.setattr(FC, "polish_chunk", spy)

    def run(expect_k, expect_pcap):
        eng = BatchedPOAEngine(3, -5, -4, batch_size=4, mode="fused",
                               interleave=4)
        got = eng.polish_windows(windows, trim=False)
        assert eng.stats["k"] == expect_k
        assert captured["interleave"] == expect_k
        assert captured["p_cap"] == expect_pcap
        assert got == expect

    # ample budget: K=4 fits at full p_cap
    run(4, 12)
    N, sub_l = captured["n_cap"], captured["sub_l"]
    # the scheduler sizes streams with the input-block term (L0 = the
    # actual max backbone length), so the budget thresholds below must too
    L0 = max(len(w.sequences[0]) for w in windows)
    s12 = FC.smem_stream_bytes(N, 12, sub_l, L0)
    # the 16-bit packing makes the p_cap=9 table the SAME size (both pad
    # to 24 rows) — the old p_cap-shrink rescue is structurally dead
    assert FC.smem_stream_bytes(N, 9, sub_l, L0) == s12

    # budget fits only 2 streams -> K clamps to 2 (must divide the batch
    # of 4) at full p_cap
    monkeypatch.setattr(FC, "SMEM_BUDGET", 2 * s12)
    run(2, 12)

    # budget below a single stream's needs: interleave fully disabled
    monkeypatch.setattr(FC, "SMEM_BUDGET", s12)
    run(1, 12)

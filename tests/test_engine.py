"""Batched JAX engine vs NumPy oracle: the two must build bit-identical
graphs and consensus (same integer scores, same tie rules, same integer
column keys)."""

import random

import numpy as np
import pytest

from racon_tpu.align.edit_distance import edit_distance
from racon_tpu.core.window import Window, WindowType
from racon_tpu.poa.batched import BatchedPOAEngine
from racon_tpu.poa.consensus import consensus_window
from racon_tpu.poa.graph import POAGraph, encode, weights_from_quality


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


def make_window(rng, length=150, depth=8, error=0.12, with_quality=False,
                partial=False):
    true = "".join(rng.choice("ACGT") for _ in range(length))
    backbone = noisy(true, error, rng).encode()
    w = Window(0, 0, WindowType.TGS, backbone, b"!" * len(backbone))
    for _ in range(depth):
        if partial and rng.random() < 0.5:
            half = len(backbone) // 2
            if rng.random() < 0.5:
                seg = noisy(true[:length // 2], error, rng).encode()
                b, e = 0, half
            else:
                seg = noisy(true[length // 2:], error, rng).encode()
                b, e = half, len(backbone) - 1
        else:
            seg = noisy(true, error, rng).encode()
            b, e = 0, len(backbone) - 1
        q = bytes(rng.randint(34, 73) for _ in range(len(seg))) \
            if with_quality else None
        w.add_layer(seg, q, b, e)
    return w, true


@pytest.mark.parametrize("with_quality,partial", [
    (False, False), (True, False), (False, True), (True, True)])
def test_engine_matches_oracle(with_quality, partial):
    rng = random.Random(hash((with_quality, partial)) & 0xffff)
    windows = [make_window(rng, with_quality=with_quality, partial=partial)[0]
               for _ in range(5)]
    engine = BatchedPOAEngine(3, -5, -4, batch_size=5)
    got = engine.polish_windows(windows, trim=False)
    assert engine.stats["fallback"] == 0, "device flagged failures"
    for w, (cons, polished) in zip(windows, got):
        ref_cons, ref_polished = consensus_window(w, 3, -5, -4, trim=False)
        assert polished == ref_polished
        assert cons == ref_cons


def test_engine_graph_state_matches_oracle():
    """Compare the full graph structure, not just the consensus."""
    import jax.numpy as jnp
    from racon_tpu.poa import engine as E

    rng = random.Random(7)
    w, _ = make_window(rng, length=120, depth=6)

    # oracle build
    g = POAGraph()
    bb = encode(w.sequences[0])
    g.add_alignment([], bb, weights_from_quality(w.qualities[0], len(bb)))
    offset = int(0.01 * len(bb))
    order = sorted(range(1, len(w.sequences)), key=lambda i: w.positions[i][0])
    for i in order:
        seq = encode(w.sequences[i])
        b, e = w.positions[i]
        if b < offset and e > len(bb) - offset:
            aln = g.align(seq, 3, -5, -4)
        else:
            aln = g.align(seq, 3, -5, -4, begin_node=b, end_node=e)
        g.add_alignment(aln, seq, weights_from_quality(w.qualities[i],
                                                       len(seq)))

    # engine build (batch of 1)
    eng = BatchedPOAEngine(3, -5, -4, batch_size=1)
    results = [None]
    N = 512
    eng._run_chunk([0], [w], results, trim=False, B=1,
                   D=len(w.sequences) - 1,
                   L=256, L0=len(bb), N=N, t_cap=N + 256)
    # rebuild the last chunk state for comparison
    # (rerun manually to capture state)
    from racon_tpu.poa.graph import weights_from_quality as wq
    backbone = np.full((1, len(bb)), E.PAD_CODE, np.int32)
    backbone[0] = bb
    bw = np.zeros((1, len(bb)), np.int32)
    bw[0] = wq(w.qualities[0], len(bb))
    state = E.init_graphs(jnp.asarray(backbone), jnp.asarray(bw),
                          jnp.asarray([len(bb)], dtype=np.int32), N, 8)
    D = len(w.sequences) - 1
    seq = np.full((D, 1, 256), E.PAD_CODE, np.int8)
    wts = np.zeros((D, 1, 256), np.int8)
    length = np.zeros((D, 1), np.int32)
    begin = np.zeros((D, 1), np.int32)
    end = np.zeros((D, 1), np.int32)
    full = np.zeros((D, 1), bool)
    active = np.ones((D, 1), bool)
    for d, i in enumerate(order):
        s = encode(w.sequences[i])
        seq[d, 0, :len(s)] = s
        wts[d, 0, :len(s)] = wq(w.qualities[i], len(s))
        length[d, 0] = len(s)
        begin[d, 0], end[d, 0] = w.positions[i]
        full[d, 0] = begin[d, 0] < offset and end[d, 0] > len(bb) - offset
    layers = E.LayerBatch(
        seq=jnp.asarray(seq).astype(jnp.int32),
        weights=jnp.asarray(wts).astype(jnp.int32),
        length=jnp.asarray(length), begin=jnp.asarray(begin),
        end=jnp.asarray(end), full=jnp.asarray(full),
        active=jnp.asarray(active))
    state = E.run_layers(state, layers, 3, -5, -4, N + 256)

    assert not bool(state.failed[0])
    n = int(state.n_nodes[0])
    assert n == len(g.codes), (n, len(g.codes))
    np.testing.assert_array_equal(np.asarray(state.codes[0, :n]),
                                  np.asarray(g.codes, dtype=np.int32))
    np.testing.assert_array_equal(np.asarray(state.order[0, :n]),
                                  np.asarray(g.order, dtype=np.int32))
    np.testing.assert_array_equal(np.asarray(state.cov[0, :n]),
                                  np.asarray(g.cov, dtype=np.int32))
    # predecessor lists (insertion order) and weights
    pred = np.asarray(state.pred[0])
    pred_w = np.asarray(state.pred_w[0])
    pred_cnt = np.asarray(state.pred_cnt[0])
    for v in range(n):
        assert int(pred_cnt[v]) == len(g.preds[v]), f"node {v}"
        assert list(pred[v, :pred_cnt[v]]) == g.preds[v], f"node {v}"
        assert list(pred_w[v, :pred_cnt[v]]) == g.pred_w[v], f"node {v}"


def test_engine_trivial_and_fallback_paths():
    w = Window(0, 0, WindowType.TGS, b"ACGT", b"!!!!")
    engine = BatchedPOAEngine(3, -5, -4)
    got = engine.polish_windows([w], trim=True)
    assert got[0] == (b"ACGT", False)

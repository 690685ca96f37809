import random

import numpy as np
import pytest

from racon_tpu.align.edit_distance import edit_distance
from racon_tpu.core.window import Window, WindowType
from racon_tpu.poa.consensus import consensus_window
from racon_tpu.poa.graph import POAGraph, decode, encode, weights_from_quality


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


def test_single_sequence_graph_roundtrip():
    g = POAGraph()
    seq = encode(b"ACGTTGCA")
    g.add_alignment([], seq, np.ones(len(seq), dtype=np.int32))
    codes, cov = g.generate_consensus()
    assert decode(codes) == b"ACGTTGCA"
    assert list(cov) == [1] * 8


def test_two_identical_sequences():
    g = POAGraph()
    seq = encode(b"ACGTTGCA")
    g.add_alignment([], seq, np.ones(len(seq), dtype=np.int32))
    aln = g.align(seq, 3, -5, -4)
    g.add_alignment(aln, seq, np.ones(len(seq), dtype=np.int32))
    assert len(g.codes) == 8  # full fusion, no new nodes
    codes, cov = g.generate_consensus()
    assert decode(codes) == b"ACGTTGCA"
    assert list(cov) == [2] * 8


def test_mismatch_opens_column():
    g = POAGraph()
    g.add_alignment([], encode(b"AAAA"), np.ones(4, dtype=np.int32))
    seq2 = encode(b"AACA")
    aln = g.align(seq2, 3, -5, -4)
    g.add_alignment(aln, seq2, np.ones(4, dtype=np.int32))
    assert len(g.codes) == 5  # one new column member for the C
    # majority: third letter ties 1-1; consensus still length 4
    codes, _ = g.generate_consensus()
    assert len(codes) == 4


def test_consensus_recovers_truth():
    rng = random.Random(42)
    true = "".join(rng.choice("ACGT") for _ in range(200))
    backbone = noisy(true, 0.15, rng)
    w = Window(0, 0, WindowType.TGS, backbone.encode(), b"!" * len(backbone))
    for _ in range(20):
        w.add_layer(noisy(true, 0.12, rng).encode(), None, 0, len(backbone) - 1)
    cons, polished = consensus_window(w, 3, -5, -4, trim=True)
    assert polished
    assert edit_distance(cons, true.encode()) == 0


def test_quality_weights_beat_bad_reads():
    # low-quality wrong reads should lose against few high-quality right ones
    rng = random.Random(1)
    true = "".join(rng.choice("ACGT") for _ in range(100))
    wrong = noisy(true, 0.3, rng)
    w = Window(0, 0, WindowType.NGS, true.encode(), b"I" * len(true))
    hi = b"I"  # phred 40
    lo = b'"'  # phred 1
    for _ in range(3):
        w.add_layer(true.encode(), hi * len(true), 0, len(true) - 1)
    for _ in range(4):
        w.add_layer(wrong.encode(), lo * len(wrong), 0, len(true) - 1)
    cons, _ = consensus_window(w, 3, -5, -4, trim=False)
    assert edit_distance(cons, true.encode()) == 0


def test_under_three_sequences_returns_backbone():
    w = Window(0, 0, WindowType.TGS, b"ACGT", b"!!!!")
    w.add_layer(b"ACGT", None, 0, 3)
    cons, polished = consensus_window(w, 3, -5, -4, trim=True)
    assert not polished
    assert cons == b"ACGT"


def test_subgraph_partial_layer():
    rng = random.Random(5)
    true = "".join(rng.choice("ACGT") for _ in range(300))
    backbone = noisy(true, 0.1, rng)
    w = Window(0, 0, WindowType.TGS, backbone.encode(), b"!" * len(backbone))
    # layers covering only halves
    half = len(backbone) // 2
    for _ in range(8):
        w.add_layer(noisy(true[:len(true) // 2], 0.1, rng).encode(), None,
                    0, half)
        w.add_layer(noisy(true[len(true) // 2:], 0.1, rng).encode(), None,
                    half, len(backbone) - 1)
    cons, polished = consensus_window(w, 3, -5, -4, trim=False)
    assert polished
    # should be much closer to truth than the backbone was
    assert edit_distance(cons, true.encode()) < \
        edit_distance(backbone.encode(), true.encode()) // 2


def test_trim_low_coverage_ends():
    from racon_tpu.core.window import trim_consensus
    cons = b"AAACCCGGG"
    cov = [0, 0, 5, 5, 5, 5, 5, 0, 0]
    out = trim_consensus(cons, cov, n_sequences=9, window_id=0, window_rank=0)
    # (9-1)//2 = 4; indices 2..6 survive
    assert out == b"ACCCG"

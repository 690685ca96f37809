"""Banded wavefront alignment kernel: edit distances must match a full-DP
oracle exactly (band wide enough), and the crossing-segmented CIGARs must
be valid optimal-cost alignments."""

import numpy as np
import pytest

from racon_tpu.align import pallas_align as PA


def np_edit_distance(q: bytes, t: bytes) -> int:
    n, m = len(q), len(t)
    prev = np.arange(m + 1, dtype=np.int32)
    qa = np.frombuffer(q, np.uint8)
    ta = np.frombuffer(t, np.uint8)
    for i in range(1, n + 1):
        cur = np.empty(m + 1, np.int32)
        cur[0] = i
        sub = prev[:-1] + (ta != qa[i - 1])
        for j in range(1, m + 1):
            cur[j] = min(sub[j - 1], prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return int(prev[m])


def mutate(rng, s, rate):
    out = bytearray()
    for ch in s:
        r = rng.random()
        if r < rate / 3:
            continue
        elif r < 2 * rate / 3:
            out.append(rng.randrange(65, 69))
            out.append(ch)
        elif r < rate:
            out.append(rng.randrange(65, 69))
        else:
            out.append(ch)
    return bytes(out)


def cigar_cost_and_valid(cigar: bytes, q: bytes, t: bytes) -> int:
    """Walk the CIGAR; return unit cost; assert it transforms q into t."""
    qi = ti = cost = 0
    num = 0
    for ch in cigar.decode():
        if ch.isdigit():
            num = num * 10 + ord(ch) - 48
            continue
        if ch == "M":
            for _ in range(num):
                cost += q[qi] != t[ti]
                qi += 1
                ti += 1
        elif ch == "I":
            qi += num
            cost += num
        elif ch == "D":
            ti += num
            cost += num
        else:
            raise AssertionError(f"bad op {ch}")
        num = 0
    assert qi == len(q) and ti == len(t), (qi, len(q), ti, len(t))
    return cost


@pytest.fixture(scope="module")
def pairs():
    import random
    rng = random.Random(9)
    ps = []
    for ln, rate in ((300, 0.15), (1200, 0.2), (5000, 0.25), (50, 0.3),
                     (2048, 0.1)):
        t = bytes(rng.randrange(65, 69) for _ in range(ln))
        q = mutate(rng, t, rate)
        ps.append((q, t))
    return ps


def test_wavefront_edit_distance(pairs):
    meta, q_sm, t_sm, qv = PA._pack_inputs(pairs)
    import jax.numpy as jnp
    ed, caps, base = PA.wavefront_pass(
        jnp.asarray(meta), jnp.asarray(q_sm), jnp.asarray(t_sm),
        jnp.asarray(qv), interpret=True)
    ed = np.asarray(ed)
    for b, (q, t) in enumerate(pairs):
        want = np_edit_distance(q, t)
        assert ed[b] == want, (b, ed[b], want)


def test_aligner_cigars_optimal(pairs):
    al = PA.PallasAligner(num_threads=2, interpret=True)
    cigars = al.align_batch(pairs)
    assert al.stats["device"] >= len(pairs) - 1   # tiny band-clips allowed
    for (q, t), cg in zip(pairs, cigars):
        if cg is None:
            continue
        cost = cigar_cost_and_valid(cg, q, t)
        assert cost == np_edit_distance(q, t), "segmented CIGAR not optimal"

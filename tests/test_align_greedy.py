"""The banded-Myers traceback must equal the exact full-matrix greedy
traceback — band-independence is what makes order 3 replicate edlib's
path (reference: src/overlap.cpp:205-224 uses edlibAlign NW+PATH; edlib's
backward move priority is up, left, diagonal).

The oracle here is an O(nm) NW DP with the same backward greedy priority;
myers_align must produce byte-identical CIGARs for every order.
"""

import random

import numpy as np
import pytest

from racon_tpu.native.rtlib import NativeAligner

# backward move priority per order: 0 = diag, 1 = up ('I'), 2 = left ('D')
_PERMS = {
    0: (0, 1, 2), 1: (0, 2, 1), 2: (1, 0, 2),
    3: (1, 2, 0), 4: (2, 0, 1), 5: (2, 1, 0),
}


def _greedy_cigar(q: bytes, t: bytes, order: int) -> bytes:
    n, m = len(q), len(t)
    if n == 0:
        return f"{m}D".encode() if m else b""
    if m == 0:
        return f"{n}I".encode()
    qa = np.frombuffer(q, dtype=np.uint8)
    ta = np.frombuffer(t, dtype=np.uint8)
    D = np.zeros((n + 1, m + 1), dtype=np.int64)
    D[:, 0] = np.arange(n + 1)
    D[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        row, prev = D[i], D[i - 1]
        sub = prev[:-1] + (ta != qa[i - 1])
        row[0] = i
        for j in range(1, m + 1):
            row[j] = min(sub[j - 1], prev[j] + 1, row[j - 1] + 1)
    ops = []
    r, c = n, m
    perm = _PERMS[order]
    while r > 0 or c > 0:
        for mv in perm:
            if mv == 1 and r > 0 and D[r - 1][c] + 1 == D[r][c]:
                ops.append("I")
                r -= 1
                break
            if mv == 2 and c > 0 and D[r][c - 1] + 1 == D[r][c]:
                ops.append("D")
                c -= 1
                break
            if mv == 0 and r > 0 and c > 0 and \
                    D[r - 1][c - 1] + (q[r - 1] != t[c - 1]) == D[r][c]:
                ops.append("M")
                r -= 1
                c -= 1
                break
        else:
            raise AssertionError("inconsistent DP")
    out = []
    i = len(ops) - 1
    while i >= 0:
        j = i
        while j >= 0 and ops[j] == ops[i]:
            j -= 1
        out.append(f"{i - j}{ops[i]}")
        i = j
    return "".join(out).encode()


def _mutate(rng, s: bytes, rate: float) -> bytes:
    out = bytearray()
    bases = b"ACGT"
    for ch in s:
        r = rng.random()
        if r < rate / 3:
            continue  # deletion
        if r < 2 * rate / 3:
            out.append(rng.choice(bases))  # insertion
            out.append(ch)
        elif r < rate:
            out.append(rng.choice([b for b in bases if b != ch]))
        else:
            out.append(ch)
    return bytes(out)


@pytest.mark.parametrize("order", [3, 2, 0])
def test_traceback_matches_exact_greedy(order):
    rng = random.Random(1234 + order)
    al = NativeAligner(algo=order)
    pairs = []
    for _ in range(40):
        n = rng.randrange(1, 400)
        t = bytes(rng.choice(b"ACGT") for _ in range(n))
        q = _mutate(rng, t, rng.choice([0.02, 0.1, 0.3, 0.6]))
        if rng.random() < 0.1:  # length-skewed pairs
            q = q[: max(1, len(q) // 3)]
        pairs.append((q, t))
    pairs += [(b"A" * 50, b"A" * 50), (b"AC" * 30, b"CA" * 30),
              (b"A", b"C" * 100), (b"ACGT" * 25, b"TGCA" * 25)]
    got = al.align_batch(pairs)
    for (q, t), cg in zip(pairs, got):
        want = _greedy_cigar(q, t, order)
        assert cg == want, (order, q, t, cg, want)

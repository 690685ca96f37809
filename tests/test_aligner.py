import random
import re

import pytest

from racon_tpu.align.aligner import align_ond_py
from racon_tpu.align.edit_distance import edit_distance as py_ed


def mutate(s, rate, rng):
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


def cigar_cost(q: bytes, t: bytes, cigar: bytes) -> int:
    qp = tp = cost = 0
    for num, op in re.findall(rb"(\d+)([MID])", cigar):
        n = int(num)
        if op == b"M":
            cost += sum(1 for k in range(n) if q[qp + k] != t[tp + k])
            qp += n
            tp += n
        elif op == b"I":
            qp += n
            cost += n
        else:
            tp += n
            cost += n
    assert qp == len(q) and tp == len(t), "CIGAR does not consume both sequences"
    return cost


def test_python_aligner_optimal():
    rng = random.Random(0)
    for _ in range(25):
        t = "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 300)))
        q = mutate(t, 0.3, rng)
        qb, tb = q.encode(), t.encode()
        cig = align_ond_py(qb, tb)
        assert cigar_cost(qb, tb, cig) == py_ed(qb, tb)


def test_empty_inputs():
    assert align_ond_py(b"", b"ACG") == b"3D"
    assert align_ond_py(b"ACG", b"") == b"3I"
    assert align_ond_py(b"", b"") == b""


def test_native_matches_python():
    rtlib = pytest.importorskip("racon_tpu.native.rtlib")
    rng = random.Random(7)
    pairs = []
    for _ in range(30):
        t = "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 600)))
        q = mutate(t, 0.25, rng)
        pairs.append((q.encode(), t.encode()))
    # the O(ND) path is an exact CIGAR-for-CIGAR mirror of the Python one
    cigs = rtlib.NativeAligner(2, algo=-1).align_batch(pairs)
    for (q, t), c in zip(pairs, cigs):
        assert c == align_ond_py(q, t)
        assert rtlib.edit_distance(q, t) == py_ed(q, t)
    # the banded Myers default produces a different optimal alignment:
    # same unit cost, full consumption of both sequences
    cigs = rtlib.NativeAligner(2).align_batch(pairs)
    for (q, t), c in zip(pairs, cigs):
        qi = ti = cost = 0
        num = 0
        for ch in c.decode():
            if ch.isdigit():
                num = num * 10 + ord(ch) - 48
                continue
            if ch == "M":
                cost += sum(1 for k in range(num) if q[qi + k] != t[ti + k])
                qi += num
                ti += num
            elif ch == "I":
                cost += num
                qi += num
            elif ch == "D":
                cost += num
                ti += num
            num = 0
        assert (qi, ti) == (len(q), len(t))
        assert cost == rtlib.edit_distance(q, t)

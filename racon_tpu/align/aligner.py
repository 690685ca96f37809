"""Pairwise global aligner: produces SAM-style CIGARs for overlaps that
arrive without one (MHAP/PAF inputs).

Plays the role of edlib in the reference (src/overlap.cpp:205-224): global
(NW) alignment of a read segment against a contig segment at unit edit
costs.  Three implementations:

  * the native C++ banded Myers bit-vector aligner with traceback
    (racon_tpu.native, NativeAligner default) — the production path,
    multi-threaded over overlap batches,
  * the native C++ O(ND) wavefront (NativeAligner algo=-1),
  * a pure-Python O(ND) Myers diff fallback for small inputs/tests.

All produce an optimal unit-cost alignment; tie-breaking between equal-cost
paths may differ from edlib's, which can shift individual breaking points
(the reference's own GPU path has the same property,
test/racon_test.cpp:297-507).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple


def _compress_cigar(ops: List[str]) -> bytes:
    out = []
    i = 0
    while i < len(ops):
        j = i
        while j < len(ops) and ops[j] == ops[i]:
            j += 1
        out.append(f"{j - i}{ops[i]}")
        i = j
    return "".join(out).encode()


_INVALID = -(1 << 30)


def align_ond_py(q: bytes, t: bytes, max_d: int = 0) -> bytes:
    """Unit-cost edit-distance alignment (Landau-Vishkin / edit-distance WFA)
    with traceback -> SAM CIGAR (query=q vs target=t).

    f(d, k) = furthest query index x reachable on diagonal k = x - y with
    exactly d edits, followed by a greedy match "snake".  Substitutions,
    insertions (consume query, 'I') and deletions (consume target, 'D') all
    cost 1.  Emitted CIGAR uses 'M' for both match and substitution — the
    same convention as edlib's standard CIGAR, which the breaking-point
    walker expects (reference: src/overlap.cpp:213-214,245).

    Traceback tie order: substitution, deletion, insertion.
    """
    n, m = len(q), len(t)
    if n == 0:
        return f"{m}D".encode() if m else b""
    if m == 0:
        return f"{n}I".encode()

    if max_d <= 0:
        max_d = n + m
    offset = max_d + 1

    def snake(x: int, y: int) -> int:
        while x < n and y < m and q[x] == t[y]:
            x += 1
            y += 1
        return x

    v = [_INVALID] * (2 * offset + 1)
    v[offset] = snake(0, 0)
    trace = [v.copy()]
    final_k = n - m
    d = 0
    while v[offset + final_k] < n:
        d += 1
        if d > max_d:
            raise RuntimeError(
                f"[racon_tpu::align_ond_py] error: edit distance exceeds "
                f"bound {max_d} for pair ({n} x {m})")
        nv = [_INVALID] * (2 * offset + 1)
        for k in range(-d, d + 1):
            x = _INVALID
            if -(d - 1) <= k <= d - 1 and v[offset + k] != _INVALID:
                x = v[offset + k] + 1                      # substitution
            if -(d - 1) <= k + 1 <= d - 1 and v[offset + k + 1] != _INVALID:
                x = max(x, v[offset + k + 1])              # deletion (D)
            if -(d - 1) <= k - 1 <= d - 1 and v[offset + k - 1] != _INVALID:
                x = max(x, v[offset + k - 1] + 1)          # insertion (I)
            if x == _INVALID:
                continue
            y = x - k
            if x > n or y > m or y < 0:
                continue
            nv[offset + k] = snake(x, y)
        v = nv
        trace.append(v.copy())

    # traceback
    ops: List[str] = []
    x, k = n, final_k
    for d in range(len(trace) - 1, 0, -1):
        pv = trace[d - 1]

        def cand(kk: int, bump: int) -> int:
            if -(d - 1) <= kk <= d - 1 and pv[offset + kk] != _INVALID:
                c = pv[offset + kk] + bump
                y = c - k
                if 0 <= c <= n and 0 <= y <= m:
                    return c
            return _INVALID

        c_sub = cand(k, 1)
        c_del = cand(k + 1, 0)
        c_ins = cand(k - 1, 1)
        px = max(c_sub, c_del, c_ins)
        ops.extend(["M"] * (x - px))           # snake (matches)
        if px == c_sub:
            ops.append("M")                     # substitution
            x, k = px - 1, k
        elif px == c_del:
            ops.append("D")
            x, k = px, k + 1
        else:
            ops.append("I")
            x, k = px - 1, k - 1
    ops.extend(["M"] * x)                       # d == 0 leading snake
    ops.reverse()
    return _compress_cigar(ops)


# kept name for callers; the production implementation is native C++
align_myers_py = align_ond_py


class PythonAligner:
    """Fallback aligner; fine for tests, slow for genome-scale input."""

    def __call__(self, q: bytes, t: bytes) -> bytes:
        return align_myers_py(q, t)

    def align_batch(self, pairs: Sequence[Tuple[bytes, bytes]]) -> List[bytes]:
        return [align_myers_py(q, t) for q, t in pairs]


def get_aligner(num_threads: int = 1):
    """Prefer the native C++ aligner; fall back to Python."""
    try:
        from racon_tpu.native import rtlib
        return rtlib.NativeAligner(num_threads)
    except Exception:
        return PythonAligner()

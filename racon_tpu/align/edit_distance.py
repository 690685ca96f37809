"""Edit distance via Myers' bit-parallel algorithm on Python big integers.

Used by tests to score polished output against the truth reference, playing
the role edlib plays in the reference's test harness
(reference: test/racon_test.cpp:14-23).  Python's arbitrary-precision ints
act as the bit-vectors, so one pass over the target handles the whole query
per step — fast enough for ~50 kb x ~50 kb comparisons.
"""

from __future__ import annotations


def edit_distance(query: bytes, target: bytes) -> int:
    m = len(query)
    if m == 0:
        return len(target)
    if len(target) == 0:
        return m

    # per-symbol match masks
    peq = {}
    for i, c in enumerate(query):
        peq[c] = peq.get(c, 0) | (1 << i)

    mask_all = (1 << m) - 1
    high_bit = 1 << (m - 1)
    pv = mask_all
    mv = 0
    score = m

    for c in target:
        eq = peq.get(c, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | ~(xh | pv) & mask_all
        mh = pv & xh
        if ph & high_bit:
            score += 1
        if mh & high_bit:
            score -= 1
        ph = (ph << 1) & mask_all | 1
        mh = (mh << 1) & mask_all
        pv = mh | ~(xv | ph) & mask_all
        mv = ph & xv

    return score

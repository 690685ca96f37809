import pytest

from racon_tpu.core.overlap import Overlap
from racon_tpu.core.sequence import Sequence


def make_transmuted(q_data: bytes, t_data: bytes, cigar: bytes,
                    t_begin: int = 0, strand: bool = False):
    seqs = [Sequence("t", t_data), Sequence("q", q_data)]
    o = Overlap.from_sam("q", 0x10 if strand else 0, "t", t_begin + 1, cigar)
    o.transmute(seqs, {"qq": 1, "tt": 0}, {})
    return o, seqs


def test_sam_coordinates_forward():
    o = Overlap.from_sam("q", 0, "t", 11, b"5S10M2I3D4M1H")
    assert o.t_begin == 10
    assert o.q_begin == 5
    assert o.q_end == 5 + 10 + 2 + 4
    assert o.q_length == 5 + 1 + 10 + 2 + 4
    assert o.t_end == 10 + 10 + 3 + 4
    assert not o.strand


def test_sam_coordinates_reverse():
    o = Overlap.from_sam("q", 16, "t", 1, b"2S4M")
    # q extents flipped on reverse strand (reference: src/overlap.cpp:96-100)
    assert o.q_length == 6
    assert o.q_begin == 0
    assert o.q_end == 4
    assert o.strand


def test_sam_unmapped_invalid():
    o = Overlap.from_sam("q", 4, "t", 1, b"*")
    assert not o.is_valid


def test_error_rate():
    o = Overlap.from_paf("q", 100, 0, 80, "+", "t", 200, 0, 100)
    assert o.length == 100
    assert abs(o.error - 0.2) < 1e-9


def test_breaking_points_simple_match():
    # 10bp target, window 5, exact match of whole target
    o, seqs = make_transmuted(b"ACGTACGTAC", b"ACGTACGTAC", b"10M")
    o.find_breaking_points(seqs, 5)
    # two windows: (t,q) first match + one-past last match per window
    assert o.breaking_points == [(0, 0), (5, 5), (5, 5), (10, 10)]


def test_breaking_points_with_deletion():
    # deletion crossing the window boundary
    o, seqs = make_transmuted(b"ACGTAGTAC", b"ACGTACGTAC", b"5M1D4M")
    o.find_breaking_points(seqs, 5)
    assert o.breaking_points == [(0, 0), (5, 5), (6, 5), (10, 9)]


def test_breaking_points_insertion_not_counted():
    o, seqs = make_transmuted(b"ACGTTTACGTAC", b"ACGTACGTAC", b"4M2I6M")
    o.find_breaking_points(seqs, 5)
    assert o.breaking_points == [(0, 0), (5, 7), (5, 7), (10, 12)]


def test_breaking_points_offset_start():
    # alignment starting inside the second window
    o, seqs = make_transmuted(b"GTAC", b"ACGTACGTAC", b"4M", t_begin=6)
    o.find_breaking_points(seqs, 5)
    assert o.breaking_points == [(6, 0), (10, 4)]


def test_transmute_unknown_name_invalidates():
    seqs = [Sequence("t", b"ACGT")]
    o = Overlap.from_paf("nosuch", 4, 0, 4, "+", "t", 4, 0, 4)
    o.transmute(seqs, {"tt": 0}, {})
    assert not o.is_valid


def test_transmute_length_mismatch_raises():
    from racon_tpu.core.overlap import LengthMismatchError
    seqs = [Sequence("t", b"ACGT"), Sequence("q", b"ACGTACGT")]
    o = Overlap.from_paf("q", 4, 0, 4, "+", "t", 4, 0, 4)
    with pytest.raises(LengthMismatchError):
        o.transmute(seqs, {"qq": 1, "tt": 0}, {})


def test_native_walker_matches_python():
    """The C++ breaking-point walker is byte-exact vs the Python
    re-expression of src/overlap.cpp:226-292, across random CIGARs,
    strands, and window lengths."""
    import random

    pytest.importorskip("racon_tpu.native.rtlib")
    from racon_tpu.core.overlap import Overlap

    rng = random.Random(13)
    for trial in range(200):
        t_len = rng.randint(20, 800)
        t_begin = rng.randint(0, max(0, t_len - 10))
        # build a CIGAR consuming the t span and a matching q span
        t_span = rng.randint(5, t_len - t_begin)
        ops = []
        tc = qc = 0
        while tc < t_span:
            op = rng.choice("MMMMIDX=N")
            n = rng.randint(1, min(9, t_span - tc) if op != "I" else 9)
            ops.append(f"{n}{op}")
            if op in "M=XDN":
                tc += n
            if op in "M=XI":
                qc += n
        q_begin = rng.randint(0, 50)
        q_len = q_begin + qc + rng.randint(0, 30)
        strand = rng.random() < 0.5
        w = rng.choice([7, 50, 100, 500])

        def make(cls_use_py):
            o = Overlap.__new__(Overlap)
            o.q_id = 0
            o.t_id = 1
            o.q_begin, o.q_end, o.q_length = q_begin, q_begin + qc, q_len
            o.t_begin, o.t_end = t_begin, t_begin + t_span
            o.strand = strand
            o.cigar = "".join(ops).encode()
            o.breaking_points = []
            if cls_use_py:
                o._find_breaking_points_from_cigar_py(w)
            else:
                o._find_breaking_points_from_cigar(w)
            return o.breaking_points

        native = make(False)
        py = make(True)
        assert native == py, (trial, "".join(ops), t_begin, t_span, w)

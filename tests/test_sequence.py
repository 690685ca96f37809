from racon_tpu.core.sequence import Sequence


def test_uppercase_on_construction():
    s = Sequence("x", b"acgtN")
    assert s.data == b"ACGTN"


def test_all_zero_quality_dropped():
    s = Sequence("x", b"ACGT", b"!!!!")
    assert s.quality == b""
    s = Sequence("x", b"ACGT", b"!!#!")
    assert s.quality == b"!!#!"


def test_reverse_complement():
    s = Sequence("x", b"AACGT", b"01234")
    s.create_reverse_complement()
    assert s.reverse_complement == b"ACGTT"
    assert s.reverse_quality == b"43210"


def test_reverse_complement_unknown_bases():
    s = Sequence("x", b"ANCG")
    s.create_reverse_complement()
    assert s.reverse_complement == b"CGNT"


def test_transmute():
    s = Sequence("x", b"ACGT", b"0123")
    s.transmute(has_name=False, has_data=False, has_reverse_data=True)
    assert s.name == ""
    assert s.data == b""
    assert s.quality == b""
    assert s.reverse_complement == b"ACGT"

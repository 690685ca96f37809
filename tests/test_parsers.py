import os

import pytest

from racon_tpu.io import parsers
from tests.conftest import REFERENCE_DATA

needs_data = pytest.mark.skipif(not os.path.isdir(REFERENCE_DATA),
                                reason="reference test data not present")


@needs_data
def test_parse_fastq_reads():
    reads = parsers.parse_fastq(f"{REFERENCE_DATA}/sample_reads.fastq.gz")
    assert len(reads) == 236
    assert reads[0].name == "1"
    assert len(reads[0].data) == len(reads[0].quality)
    assert set(reads[0].data) <= set(b"ACGTN")


@needs_data
def test_parse_fasta_reads_match_fastq():
    fa = parsers.parse_fasta(f"{REFERENCE_DATA}/sample_reads.fasta.gz")
    fq = parsers.parse_fastq(f"{REFERENCE_DATA}/sample_reads.fastq.gz")
    assert len(fa) == len(fq)
    for a, b in zip(fa, fq):
        assert a.name == b.name
        assert a.data == b.data
        assert a.quality == b""


@needs_data
def test_parse_layout():
    t = parsers.parse_fasta(f"{REFERENCE_DATA}/sample_layout.fasta.gz")
    assert len(t) == 1
    assert t[0].name == "utg000001l"
    assert len(t[0].data) == 47564


@needs_data
def test_parse_paf():
    ovl = parsers.parse_paf(f"{REFERENCE_DATA}/sample_overlaps.paf.gz")
    assert len(ovl) > 0
    o = ovl[0]
    assert o.q_name == "1"
    assert o.q_length == 1900
    assert o.q_begin == 449 and o.q_end == 1857
    assert o.t_name == "utg000001l"
    assert not o.strand


@needs_data
def test_parse_mhap():
    ovl = parsers.parse_mhap(f"{REFERENCE_DATA}/sample_ava_overlaps.mhap.gz")
    assert len(ovl) > 0
    o = ovl[0]
    assert o.q_id == 0 and o.t_id == 1  # 1-based ids in file
    assert o.q_begin == 30 and o.q_end == 1889 and o.q_length == 1900


@needs_data
def test_parse_sam():
    ovl = parsers.parse_sam(f"{REFERENCE_DATA}/sample_overlaps.sam.gz")
    assert len(ovl) > 0
    o = ovl[0]
    assert o.q_name == "1"
    assert o.t_name == "utg000001l"
    assert o.t_begin == 29075  # POS 29076, 0-based
    # 28S leading clip -> q_begin 28 (forward strand)
    assert o.q_begin == 28


def test_extension_dispatch_errors(tmp_path):
    with pytest.raises(RuntimeError, match="unsupported format extension"):
        parsers.parse_sequences("foo.txt")
    with pytest.raises(RuntimeError, match="unsupported format extension"):
        parsers.parse_overlaps("foo.txt")


def test_native_parser_matches_python():
    """The C++ parser and the Python reference implementation must agree
    byte-for-byte on the bundled data (names, bodies, qualities)."""
    import racon_tpu.io.parsers as P

    for path, is_fastq in (
            ("/root/reference/test/data/sample_reads.fastq.gz", True),
            ("/root/reference/test/data/sample_reads.fasta.gz", False),
            ("/root/reference/test/data/sample_layout.fasta.gz", False)):
        native = P._parse_native(path, is_fastq)
        assert native is not None, "native runtime unavailable"
        # force the pure-Python path
        orig = P._parse_native
        P._parse_native = lambda *a, **k: None
        try:
            py = (P.parse_fastq(path) if is_fastq else P.parse_fasta(path))
        finally:
            P._parse_native = orig
        assert len(native) == len(py)
        for a, b in zip(native, py):
            assert a.name == b.name
            assert a.data == b.data
            assert a.quality == b.quality


def test_native_overlap_parsers_match_python():
    import racon_tpu.io.parsers as P
    import racon_tpu.native.rtlib as rtlib

    D = "/root/reference/test/data"
    for path, fn in ((f"{D}/sample_overlaps.paf.gz", P.parse_paf),
                     (f"{D}/sample_overlaps.sam.gz", P.parse_sam),
                     (f"{D}/sample_ava_overlaps.mhap.gz", P.parse_mhap)):
        native = fn(path)
        orig = rtlib.parse_overlaps_raw
        rtlib.parse_overlaps_raw = lambda *a, **k: (_ for _ in ()).throw(
            OSError("force python"))
        try:
            py = fn(path)
        finally:
            rtlib.parse_overlaps_raw = orig
        assert len(native) == len(py), path
        for a, b in zip(native, py):
            for attr in ("q_id", "t_id", "q_begin", "q_end", "t_begin",
                         "t_end", "q_length", "t_length", "strand", "error",
                         "cigar", "q_name", "t_name"):
                av = getattr(a, attr, None)
                bv = getattr(b, attr, None)
                assert av == bv, (path, attr, av, bv)


def test_chunked_ingest_matches_whole_file():
    """1 GiB-chunk ingest semantics (tiny chunks here): record stream must
    equal the whole-file parse (reference: src/polisher.cpp:30, 200-265)."""
    import racon_tpu.io.parsers as P

    path = "/root/reference/test/data/sample_reads.fastq.gz"
    whole = P.parse_sequences(path)
    chunked = []
    n_chunks = 0
    for chunk in P.iter_sequence_chunks(path, chunk_bytes=100_000):
        n_chunks += 1
        chunked.extend(chunk)
    assert n_chunks > 5   # actually exercised chunking
    assert len(whole) == len(chunked)
    for a, b in zip(whole, chunked):
        assert a.name == b.name and a.data == b.data \
            and a.quality == b.quality


def test_overlap_chunked_ingest_matches_whole_file():
    """Streamed 1 GiB-chunk overlap ingest is record-identical to the
    whole-file parse across chunk sizes and formats (the reference's
    chunked ingest must not change results, src/polisher.cpp:311-349)."""
    from racon_tpu.io import parsers

    for name in ("sample_overlaps.paf.gz", "sample_overlaps.sam.gz",
                 "sample_ava_overlaps.mhap.gz"):
        path = f"{REFERENCE_DATA}/{name}"
        if not os.path.exists(path):
            continue
        whole = parsers.parse_overlaps(path)
        for chunk_bytes in (4096, 1 << 20):
            chunks = list(parsers.iter_overlap_chunks(path, chunk_bytes))
            flat = [o for c in chunks for o in c]
            assert len(flat) == len(whole)
            for a, b in zip(flat, whole):
                assert (a.q_name, a.t_name, a.q_begin, a.q_end, a.t_begin,
                        a.t_end, a.strand, a.cigar) == \
                       (b.q_name, b.t_name, b.q_begin, b.q_end, b.t_begin,
                        b.t_end, b.strand, b.cigar)

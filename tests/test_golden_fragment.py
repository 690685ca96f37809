"""Fragment-correction golden tests (slow: ~8k pairwise alignments on one
core).  Reference goldens: test/racon_test.cpp:234-294."""

import os

import pytest

from racon_tpu.pipeline import PolisherType, create_polisher
from tests.conftest import REFERENCE_DATA

needs_data = pytest.mark.skipif(not os.path.isdir(REFERENCE_DATA),
                                reason="reference test data not present")


def run(reads, overlaps, type, drop):
    p = create_polisher(
        f"{REFERENCE_DATA}/{reads}", f"{REFERENCE_DATA}/{overlaps}",
        f"{REFERENCE_DATA}/{reads}", type, 500, 10.0, 0.3, True,
        1, -1, -1, num_threads=4, engine="native")
    p.initialize()
    return p.polish(drop)


@needs_data
@pytest.mark.slow
def test_fragment_kc_ava_paf():
    dst = run("sample_reads.fastq.gz", "sample_ava_overlaps.paf.gz",
              PolisherType.kC, True)
    total = sum(len(d.data) for d in dst)
    assert len(dst) == 40                 # reference golden: 40
    assert total == 401236                # racon_tpu pinned (ref 401246;
    #                                       banded Myers host aligner,
    #                                       traceback order 3 = edlib)


@needs_data
@pytest.mark.slow
def test_fragment_kf_ava_paf_full():
    dst = run("sample_reads.fastq.gz", "sample_ava_overlaps.paf.gz",
              PolisherType.kF, False)
    total = sum(len(d.data) for d in dst)
    assert len(dst) == 236
    assert total == 1657664               # racon_tpu pinned (ref 1658216;
    #                                       banded Myers aligner order 3 +
    #                                       the reference-replica layer sort)
    assert all(d.name.split(" ")[0].endswith("r") for d in dst)


@needs_data
@pytest.mark.slow
def test_fragment_kf_ava_mhap_matches_paf():
    dst = run("sample_reads.fastq.gz", "sample_ava_overlaps.mhap.gz",
              PolisherType.kF, False)
    total = sum(len(d.data) for d in dst)
    # same property as the reference: MHAP and PAF inputs give identical
    # totals (racon_test.cpp:288-294 vs :252-258)
    assert (len(dst), total) == (236, 1657664)


@needs_data
@pytest.mark.slow
def test_fragment_kf_ava_paf_fasta():
    dst = run("sample_reads.fasta.gz", "sample_ava_overlaps.paf.gz",
              PolisherType.kF, False)
    total = sum(len(d.data) for d in dst)
    assert len(dst) == 236
    assert total == 1663254               # racon_tpu pinned (ref 1663982;
    #                                       banded Myers aligner order 3 +
    #                                       the reference-replica layer sort)

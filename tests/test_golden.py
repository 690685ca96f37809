"""Golden end-to-end tests on the lambda-phage dataset.

The reference pins exact edit distances for its CPU path
(test/racon_test.cpp:86-294); its own GPU path diverges from those
(test/racon_test.cpp:297-507).

Round-3 status: replicating the reference's unstable layer sort
(src/window.cpp:85-86, rt_layer_sort) closed almost the whole gap —
fasta+SAM matches the reference EXACTLY (1770); fastq+SAM is 2 ED
better (1315 vs 1317).

Round-4 status: the banded-Myers traceback is now provably
band-independent and defaults to edlib's exact backward tie priority
(order 3 = up, left, diag; see rtlib.py / test_align_greedy.py), the
only order with ALL six configs at-or-below the reference: fastq+PAF
1309 (-3), fasta+PAF 1553 (-13), w=1000 1284 (-5), m1x1g1 1312 (-9).
The residual deltas are the same consensus-side tie divergence seen on
the aligner-independent fastq+SAM config (-2, beneficial).

Reference goldens:  fastq+PAF 1312, fastq+SAM 1317, fasta+PAF 1566,
fasta+SAM 1770, fastq+PAF w=1000 1289, fastq+PAF m1x1g1 1321.
"""

import os

import pytest

from racon_tpu.core.sequence import Sequence
from racon_tpu.io.parsers import parse_fasta
from racon_tpu.pipeline import PolisherType, create_polisher
from tests.conftest import REFERENCE_DATA

needs_data = pytest.mark.skipif(not os.path.isdir(REFERENCE_DATA),
                                reason="reference test data not present")


def run_polish(reads, overlaps, engine="oracle", window_length=500,
               match=5, mismatch=-4, gap=-8, type=PolisherType.kC,
               drop=True):
    p = create_polisher(
        f"{REFERENCE_DATA}/{reads}",
        f"{REFERENCE_DATA}/{overlaps}",
        f"{REFERENCE_DATA}/sample_layout.fasta.gz",
        type, window_length, 10.0, 0.3, True, match, mismatch, gap,
        num_threads=4, engine=engine)
    p.initialize()
    return p.polish(drop)


def ed_vs_truth(polished) -> int:
    from racon_tpu.native.rtlib import edit_distance
    s = Sequence("x", polished.data)
    s.create_reverse_complement()
    ref = parse_fasta(f"{REFERENCE_DATA}/sample_reference.fasta.gz")[0]
    return edit_distance(s.reverse_complement, ref.data)


@needs_data
def test_consensus_with_qualities_sam():
    dst = run_polish("sample_reads.fastq.gz", "sample_overlaps.sam.gz")
    assert len(dst) == 1
    assert " RC:i:181 " in dst[0].name + " "
    ed = ed_vs_truth(dst[0])
    # 2 ED BETTER than the reference golden 1317: replicating the
    # reference's unstable layer sort (src/window.cpp:85-86) moved this
    # from 1346 to 1315; the residual -2 is a (beneficial) tie divergence
    assert ed == 1315          # racon_tpu pinned value
    assert ed <= 1317          # at or better than reference golden 1317


@needs_data
def test_consensus_with_qualities_paf():
    dst = run_polish("sample_reads.fastq.gz", "sample_overlaps.paf.gz")
    assert len(dst) == 1
    ed = ed_vs_truth(dst[0])
    assert ed == 1309          # racon_tpu pinned value (banded Myers host
    #                            aligner, edlib tie order 3 — rtlib.py);
    #                            3 ED BETTER than reference golden 1312
    assert ed <= 1312          # at or better than reference golden 1312


@needs_data
@pytest.mark.slow
def test_consensus_without_qualities_sam():
    dst = run_polish("sample_reads.fasta.gz", "sample_overlaps.sam.gz")
    assert len(dst) == 1
    ed = ed_vs_truth(dst[0])
    assert ed == 1770          # EXACT match of reference golden 1770


@needs_data
@pytest.mark.slow
def test_consensus_without_qualities_paf():
    dst = run_polish("sample_reads.fasta.gz", "sample_overlaps.paf.gz")
    ed = ed_vs_truth(dst[0])
    assert ed == 1553          # 13 ED BETTER than reference golden 1566
    assert ed <= 1566


@needs_data
@pytest.mark.slow
def test_consensus_larger_window():
    dst = run_polish("sample_reads.fastq.gz", "sample_overlaps.paf.gz",
                     window_length=1000)
    ed = ed_vs_truth(dst[0])
    assert ed == 1284          # 5 ED BETTER than reference golden 1289
    assert ed <= 1289


@needs_data
@pytest.mark.slow
def test_consensus_edit_distance_scores():
    dst = run_polish("sample_reads.fastq.gz", "sample_overlaps.paf.gz",
                     match=1, mismatch=-1, gap=-1)
    ed = ed_vs_truth(dst[0])
    # Was the only config above the reference golden (1336 vs 1321) under
    # the old order-2 default; the edlib tie order (3) with the exact-band
    # traceback brings it below (2026-08-19 sweep in rtlib.py docstring)
    assert ed == 1312          # racon_tpu pinned (edlib tie order 3)
    assert ed <= 1321          # at or better than reference golden 1321

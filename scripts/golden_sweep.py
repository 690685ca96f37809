"""Sweep RACON_TPU_ALIGN_ALGO over the FULL golden matrix (native engine,
CPU): the 4 contig-PAF configs (ED vs truth) AND the 4 fragment-mode
configs (seq count + total length).  Run after ANY aligner semantics
change — the fragment configs are part of the gate (round-4 lesson: the
order-2->3 default change shipped with only the contig sweep and left the
fragment pins stale/red).  Reference goldens: contig fastq+PAF 1312,
fasta+PAF 1566, w=1000 1289, m1x1g1 1321 (test/racon_test.cpp:104-220);
fragment kC 40/401246, kF 236/1658216 (paf=mhap), kF fasta 236/1663982
(test/racon_test.cpp:234-294).

Usage: golden_sweep.py [--no-fragments] [order ...]
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

CONFIGS = [
    ("fastq_paf", "sample_reads.fastq.gz", "sample_overlaps.paf.gz",
     dict(), 1312),
    ("fasta_paf", "sample_reads.fasta.gz", "sample_overlaps.paf.gz",
     dict(), 1566),
    ("w1000", "sample_reads.fastq.gz", "sample_overlaps.paf.gz",
     dict(window_length=1000), 1289),
    ("m1x1g1", "sample_reads.fastq.gz", "sample_overlaps.paf.gz",
     dict(match=1, mismatch=-1, gap=-1), 1321),
]

# (name, reads, overlaps, PolisherType name, drop_unpolished, ref golden
#  (count, total)).  racon_tpu pins live in tests/test_golden_fragment.py.
FRAGMENT_CONFIGS = [
    ("frag_kc_paf", "sample_reads.fastq.gz", "sample_ava_overlaps.paf.gz",
     "kC", True, (40, 401246)),
    ("frag_kf_paf", "sample_reads.fastq.gz", "sample_ava_overlaps.paf.gz",
     "kF", False, (236, 1658216)),
    ("frag_kf_mhap", "sample_reads.fastq.gz", "sample_ava_overlaps.mhap.gz",
     "kF", False, (236, 1658216)),
    ("frag_kf_fasta", "sample_reads.fasta.gz", "sample_ava_overlaps.paf.gz",
     "kF", False, (236, 1663982)),
]


def run_fragment(reference_data, reads, overlaps, type_name, drop):
    from racon_tpu.pipeline import PolisherType, create_polisher
    p = create_polisher(
        f"{reference_data}/{reads}", f"{reference_data}/{overlaps}",
        f"{reference_data}/{reads}", getattr(PolisherType, type_name),
        500, 10.0, 0.3, True, 1, -1, -1, num_threads=4, engine="native")
    p.initialize()
    dst = p.polish(drop)
    return len(dst), sum(len(d.data) for d in dst)


def main():
    args = sys.argv[1:]
    do_fragments = "--no-fragments" not in args
    args = [a for a in args if not a.startswith("--")]
    orders = [int(a) for a in args] or [2, 3]
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tests.conftest import REFERENCE_DATA  # noqa: E402
    from tests.test_golden import run_polish, ed_vs_truth  # noqa: E402
    if not os.path.isdir(REFERENCE_DATA):
        print("no reference data", REFERENCE_DATA)
        return 1
    for order in orders:
        os.environ["RACON_TPU_ALIGN_ALGO"] = str(order)
        row = []
        for name, reads, ovls, kw, golden in CONFIGS:
            t0 = time.time()
            dst = run_polish(reads, ovls, engine="native", **kw)
            ed = ed_vs_truth(dst[0])
            mark = "EXACT" if ed == golden else (
                "better" if ed < golden else "WORSE")
            row.append(f"{name}={ed}({ed - golden:+d} {mark})")
            print(f"order {order:2d} {name:10s} ed={ed} golden={golden} "
                  f"{mark} [{time.time() - t0:.1f}s]", flush=True)
        if do_fragments:
            for name, reads, ovls, tname, drop, (gn, gtot) in \
                    FRAGMENT_CONFIGS:
                t0 = time.time()
                n, total = run_fragment(REFERENCE_DATA, reads, ovls,
                                        tname, drop)
                row.append(f"{name}={n}/{total}")
                print(f"order {order:2d} {name:13s} n={n} total={total} "
                      f"ref={gn}/{gtot} [{time.time() - t0:.1f}s]",
                      flush=True)
        print(f"ORDER {order}: " + " ".join(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Sweep RACON_TPU_ALIGN_ALGO over the PAF golden configs (native engine,
CPU) and print ED-vs-truth per (order, config).  Run after any aligner
semantics change.  Reference goldens: fastq+PAF 1312, fasta+PAF 1566,
w=1000 1289, m1x1g1 1321 (test/racon_test.cpp:104-220).
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


def main():
    orders = [int(a) for a in sys.argv[1:]] or [2, 3]
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
        print(f"ORDER {order}: " + " ".join(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""racon-compatible command line (reference surface: src/main.cpp:18-229).

Usage: racon_tpu [options ...] <sequences> <overlaps> <target sequences>

Same flags and defaults as the reference binary (w=500, q=10, e=0.3, m=3,
x=-5, g=-4, trimming on), plus TPU-engine controls.
"""

from __future__ import annotations

import argparse
import sys

from racon_tpu.version import version_string


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="racon_tpu",
        description="TPU-native consensus module for raw de novo genome "
                    "assembly of long uncorrected reads")
    p.add_argument("sequences", help="FASTA/FASTQ (optionally gzipped) "
                   "sequences used for correction")
    p.add_argument("overlaps", help="MHAP/PAF/SAM (optionally gzipped) "
                   "overlaps between sequences and targets")
    p.add_argument("target_sequences", help="FASTA/FASTQ (optionally "
                   "gzipped) sequences to be corrected")
    p.add_argument("-u", "--include-unpolished", action="store_true",
                   help="output unpolished target sequences")
    p.add_argument("-f", "--fragment-correction", action="store_true",
                   help="perform fragment correction instead of contig "
                        "polishing (overlaps file should contain dual/self "
                        "overlaps!)")
    p.add_argument("-w", "--window-length", type=int, default=500,
                   help="size of window on which POA is performed "
                        "(default: 500)")
    p.add_argument("-q", "--quality-threshold", type=float, default=10.0,
                   help="threshold for average base quality of windows used "
                        "in POA (default: 10.0)")
    p.add_argument("-e", "--error-threshold", type=float, default=0.3,
                   help="maximum allowed error rate used for filtering "
                        "overlaps (default: 0.3)")
    p.add_argument("--no-trimming", action="store_true",
                   help="disables consensus trimming at window ends")
    p.add_argument("-m", "--match", type=int, default=3,
                   help="score for matching bases (default: 3)")
    p.add_argument("-x", "--mismatch", type=int, default=-5,
                   help="score for mismatching bases (default: -5)")
    p.add_argument("-g", "--gap", type=int, default=-4,
                   help="gap penalty, must be negative (default: -4)")
    p.add_argument("-t", "--threads", type=int, default=1,
                   help="number of host threads (default: 1)")
    p.add_argument("--engine", choices=["auto", "tpu", "oracle", "native"],
                   default="auto",
                   help="consensus engine: batched TPU engine (default), "
                        "host oracle, or native C++ fallback")
    p.add_argument("--batch-size", type=int, default=32,
                   help="windows per TPU megabatch (default: 32)")
    p.add_argument("--tpu-align", action="store_true",
                   help="align CIGAR-less overlaps on the TPU (banded "
                        "wavefront kernel; like the reference's CUDA "
                        "aligner, tie choices may differ from the host "
                        "path — the default host aligner stays "
                        "bit-reproducible)")
    p.add_argument("--band-width", type=int, default=0,
                   help="band width for the TPU aligner; 0 sizes it "
                        "automatically to 10%% of the mean overlap length "
                        "(reference: cudaaligner-band-width, "
                        "src/cuda/cudapolisher.cpp:150-163)")
    p.add_argument("--stream", action="store_true",
                   help="overlap the align phase with device consensus "
                        "(align remaining overlaps on the host WHILE "
                        "polishing already-completed windows; output is "
                        "bit-identical either way).  Off by default: "
                        "phased is the measured-fastest mode on this "
                        "hardware (BENCH_r03 regression analysis)")
    p.add_argument("--no-stream", action="store_true",
                   help=argparse.SUPPRESS)  # legacy: streaming is now opt-in
    p.add_argument("--version", action="version",
                   version=version_string)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    # persistent XLA compile cache (the POA chunk kernels take minutes to
    # compile; cache them across processes)
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.jax_cache"))

    # multi-host: join the JAX coordination service when configured
    # (RACON_TPU_COORDINATOR/NUM_PROCESSES/PROCESS_ID); windows are then
    # sharded across processes and every host stitches the identical
    # output (SURVEY.md §5.8 — the distributed layer the reference lacks)
    from racon_tpu.parallel.mesh import initialize_distributed
    initialize_distributed()

    from racon_tpu.pipeline import PolisherType, create_polisher

    polisher = create_polisher(
        args.sequences, args.overlaps, args.target_sequences,
        PolisherType.kF if args.fragment_correction else PolisherType.kC,
        args.window_length, args.quality_threshold, args.error_threshold,
        not args.no_trimming, args.match, args.mismatch, args.gap,
        args.threads, engine=args.engine, tpu_align=args.tpu_align,
        band_width=args.band_width, batch_size=args.batch_size,
        stream=(args.stream and not args.no_stream
                and args.engine in ("auto", "tpu")))
    polisher.initialize()
    polished = polisher.polish(not args.include_unpolished)

    out = sys.stdout
    for s in polished:
        out.write(f">{s.name}\n{s.data.decode()}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""racon_tpu_wrapper: subsample/split orchestration around the polisher.

Mirrors the reference wrapper surface (scripts/racon_wrapper.py): sequences
can be subsampled to a coverage and targets split into byte chunks that are
polished sequentially to bound memory.  Defaults also mirror the wrapper's
(m=5, x=-4, g=-8 — which differ from the binary's defaults, see
scripts/racon_wrapper.py:188-193 vs src/main.cpp:51-53).

Runs in-process (no subprocesses): each split part is one Polisher run.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

from racon_tpu.tools import sampler


def eprint(*args, **kwargs):
    print(*args, file=sys.stderr, flush=True, **kwargs)


def _manifest(args) -> str:
    """Checkpoint identity: CLI parameters + input file sizes/mtimes."""
    import hashlib
    h = hashlib.sha256()
    cfg = (args.split, tuple(args.subsample) if args.subsample else None,
           args.include_unpolished, args.fragment_correction,
           args.window_length, args.quality_threshold, args.error_threshold,
           args.match, args.mismatch, args.gap)
    h.update(repr(cfg).encode())
    for path in (args.sequences, args.overlaps, args.target_sequences):
        st = os.stat(path)
        h.update(f"{os.path.abspath(path)}:{st.st_size}:{st.st_mtime_ns}"
                 .encode())
    return h.hexdigest()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="racon_tpu_wrapper",
        description="racon_tpu wrapper with sequence subsampling and target "
                    "splitting for lower memory/runtime",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("sequences")
    p.add_argument("overlaps")
    p.add_argument("target_sequences")
    p.add_argument("--split", type=int,
                   help="split target sequences into chunks of desired size "
                        "in bytes")
    p.add_argument("--subsample", nargs=2, metavar=("REF_LEN", "COV"),
                   type=int,
                   help="subsample sequences to desired coverage (2nd arg) "
                        "given the reference length (1st arg)")
    p.add_argument("-u", "--include-unpolished", action="store_true")
    p.add_argument("-f", "--fragment-correction", action="store_true")
    p.add_argument("-w", "--window-length", type=int, default=500)
    p.add_argument("-q", "--quality-threshold", type=float, default=10.0)
    p.add_argument("-e", "--error-threshold", type=float, default=0.3)
    p.add_argument("-m", "--match", type=int, default=5)
    p.add_argument("-x", "--mismatch", type=int, default=-4)
    p.add_argument("-g", "--gap", type=int, default=-8)
    p.add_argument("-t", "--threads", type=int, default=1)
    p.add_argument("--engine", default="auto",
                   choices=["auto", "tpu", "oracle", "native"])
    p.add_argument("--checkpoint", metavar="DIR",
                   help="per-chunk checkpoint/resume directory: each split "
                        "part's polished FASTA is written there atomically "
                        "and completed parts are skipped on rerun (the "
                        "reference has no checkpointing; its wrapper chunks "
                        "are only coarse restart points, "
                        "scripts/racon_wrapper.py:86-148)")
    args = p.parse_args(argv)

    from racon_tpu.parallel.mesh import initialize_distributed
    initialize_distributed()

    work_directory = os.path.join(
        os.getcwd(), f"racon_tpu_work_directory_{time.time()}")
    os.makedirs(work_directory, exist_ok=True)
    try:
        sequences = os.path.abspath(args.sequences)
        if args.subsample:
            eprint("[racon_tpu_wrapper] subsampling sequences")
            sequences = sampler.subsample(
                sequences, args.subsample[0], args.subsample[1],
                work_directory)

        targets = [os.path.abspath(args.target_sequences)]
        if args.split:
            eprint("[racon_tpu_wrapper] splitting target sequences")
            targets = sampler.split(os.path.abspath(args.target_sequences),
                                    args.split, work_directory)
            eprint(f"[racon_tpu_wrapper] total number of splits: "
                   f"{len(targets)}")

        if args.checkpoint:
            os.makedirs(args.checkpoint, exist_ok=True)
            # a checkpoint is only valid for the exact configuration and
            # inputs that produced it: stamp a manifest and invalidate all
            # parts when it does not match (resuming a run with different
            # parameters must not emit stale output)
            manifest = _manifest(args)
            mpath = os.path.join(args.checkpoint, "MANIFEST")
            old = None
            if os.path.exists(mpath):
                with open(mpath) as fh:
                    old = fh.read()
            if old != manifest:
                if old is not None:
                    eprint("[racon_tpu_wrapper] checkpoint manifest mismatch "
                           "(parameters or inputs changed); invalidating "
                           "existing parts")
                for name in os.listdir(args.checkpoint):
                    if name.startswith("part_"):
                        os.remove(os.path.join(args.checkpoint, name))
                with open(mpath, "w") as fh:
                    fh.write(manifest)

        from racon_tpu.pipeline import PolisherType, create_polisher
        for idx, part in enumerate(targets):
            ckpt = (os.path.join(args.checkpoint, f"part_{idx:05d}.fasta")
                    if args.checkpoint else None)
            if ckpt and os.path.exists(ckpt):
                eprint(f"[racon_tpu_wrapper] part {idx}: checkpoint found, "
                       f"skipping")
                with open(ckpt) as fh:
                    shutil.copyfileobj(fh, sys.stdout)
                continue
            eprint("[racon_tpu_wrapper] processing data with racon_tpu")
            polisher = create_polisher(
                sequences, os.path.abspath(args.overlaps), part,
                PolisherType.kF if args.fragment_correction
                else PolisherType.kC,
                args.window_length, args.quality_threshold,
                args.error_threshold, True, args.match, args.mismatch,
                args.gap, args.threads, engine=args.engine)
            polisher.initialize()
            out = "".join(f">{s.name}\n{s.data.decode()}\n"
                          for s in polisher.polish(
                              not args.include_unpolished))
            if ckpt:
                tmp = ckpt + ".tmp"
                with open(tmp, "w") as fh:
                    fh.write(out)
                os.replace(tmp, ckpt)   # atomic: existence = complete
            sys.stdout.write(out)
    finally:
        try:
            shutil.rmtree(work_directory)
        except OSError:
            eprint("[racon_tpu_wrapper] warning: unable to clean work "
                   "directory!")
    return 0


if __name__ == "__main__":
    sys.exit(main())

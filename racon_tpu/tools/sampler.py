"""Sampler: subsample reads to a coverage / split targets into byte chunks.

The in-process equivalent of the reference's vendored ``rampler`` tool
(invoked by scripts/racon_wrapper.py:62-118):

  * ``subsample(sequences, reference_length, coverage)``: random subsets of
    reads totalling ~reference_length*coverage bases, written as
    ``<base>_<coverage>x.<ext>``,
  * ``split(sequences, chunk_size)``: consecutive chunks whose total
    sequence bytes stay under chunk_size, written as ``<base>_<i>.<ext>``.

Outputs are uncompressed FASTA/FASTQ, matching rampler's behavior.
"""

from __future__ import annotations

import os
import random
import sys
from typing import List, Optional

from racon_tpu.io import parsers


def _base_and_ext(path: str):
    base = os.path.basename(path).split(".")[0]
    is_fasta = path.endswith((".fasta", ".fasta.gz", ".fa", ".fa.gz",
                              ".fna", ".fna.gz"))
    return base, (".fasta" if is_fasta else ".fastq")


def _write(sequences, path: str, fasta: bool) -> None:
    with open(path, "w") as f:
        for s in sequences:
            if fasta or not s.quality:
                f.write(f">{s.name}\n{s.data.decode()}\n")
            else:
                f.write(f"@{s.name}\n{s.data.decode()}\n+\n"
                        f"{s.quality.decode()}\n")


def subsample(sequences_path: str, reference_length: int, coverage: int,
              out_directory: str = ".", seed: Optional[int] = None) -> str:
    seqs = parsers.parse_sequences(sequences_path)
    base, ext = _base_and_ext(sequences_path)
    target_bases = reference_length * coverage

    rng = random.Random(seed)
    order = list(range(len(seqs)))
    rng.shuffle(order)
    picked: List[int] = []
    total = 0
    for i in order:
        if total >= target_bases:
            break
        picked.append(i)
        total += len(seqs[i].data)
    picked.sort()

    out = os.path.join(out_directory, f"{base}_{coverage}x{ext}")
    _write([seqs[i] for i in picked], out, fasta=(ext == ".fasta"))
    return out


def split(sequences_path: str, chunk_size: int,
          out_directory: str = ".") -> List[str]:
    seqs = parsers.parse_sequences(sequences_path)
    base, ext = _base_and_ext(sequences_path)

    outs: List[str] = []
    chunk = []
    total = 0
    idx = 0

    def flush():
        nonlocal chunk, total, idx
        if not chunk:
            return
        out = os.path.join(out_directory, f"{base}_{idx}{ext}")
        _write(chunk, out, fasta=(ext == ".fasta"))
        outs.append(out)
        idx += 1
        chunk = []
        total = 0

    for s in seqs:
        if total and total + len(s.data) > chunk_size:
            flush()
        chunk.append(s)
        total += len(s.data)
    flush()
    return outs


def main(argv=None) -> int:
    import argparse
    p = argparse.ArgumentParser(
        prog="racon_tpu.tools.sampler",
        description="subsample or split FASTA/FASTQ files")
    p.add_argument("-o", "--out-directory", default=".")
    sub = p.add_subparsers(dest="mode", required=True)
    ps = sub.add_parser("subsample")
    ps.add_argument("sequences")
    ps.add_argument("reference_length", type=int)
    ps.add_argument("coverage", type=int)
    pp = sub.add_parser("split")
    pp.add_argument("sequences")
    pp.add_argument("chunk_size", type=int)
    args = p.parse_args(argv)
    if args.mode == "subsample":
        out = subsample(args.sequences, args.reference_length, args.coverage,
                        args.out_directory)
        print(out, file=sys.stderr)
    else:
        outs = split(args.sequences, args.chunk_size, args.out_directory)
        print("\n".join(outs), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

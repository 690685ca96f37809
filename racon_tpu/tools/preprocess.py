"""Preprocess Illumina paired-end FASTQ reads for use in racon_tpu.

Equivalent of scripts/racon_preprocess.py in the reference: gives each read
a unique header up to the first whitespace so pair mates are
distinguishable ('1' appended to first occurrence, '2' to the second).
"""

from __future__ import annotations

import argparse
import sys

from racon_tpu.io.parsers import parse_fastq


def process(path: str, read_set: set, out) -> None:
    for s in parse_fastq(path):
        if len(s.name) == 0 or len(s.data) == 0:
            print("File is not in FASTQ format", file=sys.stderr)
            sys.exit(1)
        if s.name in read_set:
            name = s.name + "2"
        else:
            read_set.add(s.name)
            name = s.name + "1"
        qual = s.quality if s.quality else b"!" * len(s.data)
        out.write(f"@{name}\n{s.data.decode()}\n+\n{qual.decode()}\n")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="racon_tpu.tools.preprocess",
        description="preprocess Illumina paired-end reads: unique headers "
                    "per mate")
    p.add_argument("first", help="file with the first read of a pair or both")
    p.add_argument("second", nargs="?",
                   help="optional file with the pair mates")
    args = p.parse_args(argv)

    read_set: set = set()
    process(args.first, read_set, sys.stdout)
    if args.second:
        process(args.second, read_set, sys.stdout)
    return 0


if __name__ == "__main__":
    sys.exit(main())

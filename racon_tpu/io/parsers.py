"""Input parsers: FASTA / FASTQ / MHAP / PAF / SAM, all optionally gzipped.

Python implementations of the five formats the reference consumes through
bioparser (reference: src/polisher.cpp:85-135).  Semantics mirrored:
  * sequence names are the header token up to the first whitespace,
  * multi-line FASTA/FASTQ bodies are concatenated,
  * extension-based dispatch with the same accepted extension lists,
  * gzip transparently handled.

A native C++ parser (racon_tpu.native) accelerates the same API for large
inputs; this module is the reference implementation and fallback.
"""

from __future__ import annotations

import gzip
import io
import os
from typing import Iterator, List

from racon_tpu.core.overlap import Overlap
from racon_tpu.core.sequence import Sequence

FASTA_EXTENSIONS = (".fasta", ".fasta.gz", ".fna", ".fna.gz", ".fa", ".fa.gz")
FASTQ_EXTENSIONS = (".fastq", ".fastq.gz", ".fq", ".fq.gz")
SEQUENCE_EXTENSIONS = FASTA_EXTENSIONS + FASTQ_EXTENSIONS
OVERLAP_EXTENSIONS = (".mhap", ".mhap.gz", ".paf", ".paf.gz", ".sam", ".sam.gz")


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def _name_token(header: bytes) -> str:
    return header.split(None, 1)[0].decode()


# --------------------------------------------------------------------- #
# sequences
# --------------------------------------------------------------------- #

def _parse_native(path: str, is_fastq: bool):
    """C++ parser (zlib/kseq-class; the bioparser role).  Returns None when
    the native runtime is unavailable (no compiler) so callers fall back to
    the Python implementations below."""
    try:
        from racon_tpu.native import rtlib
        recs = rtlib.parse_sequences_raw(path, is_fastq)
    except Exception:
        return None
    return [Sequence(n.decode(), d, q) for n, d, q in recs]


def parse_fasta(path: str) -> List[Sequence]:
    native = _parse_native(path, is_fastq=False)
    if native is not None:
        return native
    out: List[Sequence] = []
    name = None
    chunks: List[bytes] = []
    with _open(path) as f:
        for line in f:
            line = line.rstrip()
            if not line:
                continue
            if line.startswith(b">"):
                if name is not None:
                    out.append(Sequence(name, b"".join(chunks)))
                name = _name_token(line[1:])
                chunks = []
            else:
                chunks.append(line)
    if name is not None:
        out.append(Sequence(name, b"".join(chunks)))
    return out


def parse_fastq(path: str) -> List[Sequence]:
    native = _parse_native(path, is_fastq=True)
    if native is not None:
        return native
    out: List[Sequence] = []
    with _open(path) as f:
        it = iter(f)
        for header in it:
            header = header.rstrip()
            if not header:
                continue
            if not header.startswith(b"@"):
                raise RuntimeError(
                    f"[racon_tpu::parse_fastq] error: malformed header in {path}")
            name = _name_token(header[1:])
            # multi-line body until '+', then equally long quality
            data_chunks: List[bytes] = []
            for line in it:
                line = line.rstrip()
                if line.startswith(b"+"):
                    break
                data_chunks.append(line)
            data = b"".join(data_chunks)
            qual_chunks: List[bytes] = []
            qlen = 0
            while qlen < len(data):
                line = next(it).rstrip()
                qual_chunks.append(line)
                qlen += len(line)
            out.append(Sequence(name, data, b"".join(qual_chunks)))
    return out


def iter_sequence_chunks(path: str, chunk_bytes: int = 1 << 30):
    """Yield lists of Sequence records holding at most ``chunk_bytes`` of
    data each — the reference's 1 GiB chunked ingest
    (src/polisher.cpp:30, 200-265).  Falls back to a single whole-file
    chunk when the native runtime is unavailable."""
    is_fastq = path.endswith(FASTQ_EXTENSIONS)
    if not is_fastq and not path.endswith(FASTA_EXTENSIONS):
        raise RuntimeError(
            f"[racon_tpu::iter_sequence_chunks] error: file {path} has "
            f"unsupported format extension")
    try:
        from racon_tpu.native import rtlib
        stream = rtlib.stream_sequences(path, is_fastq, chunk_bytes)
    except Exception:
        yield parse_sequences(path)
        return
    for recs in stream:
        yield [Sequence(n.decode(), d, q) for n, d, q in recs]


def parse_sequences(path: str) -> List[Sequence]:
    if path.endswith(FASTA_EXTENSIONS):
        return parse_fasta(path)
    if path.endswith(FASTQ_EXTENSIONS):
        return parse_fastq(path)
    raise RuntimeError(
        f"[racon_tpu::parse_sequences] error: file {path} has unsupported "
        f"format extension (valid extensions: .fasta, .fasta.gz, .fna, "
        f".fna.gz, .fa, .fa.gz, .fastq, .fastq.gz, .fq, .fq.gz)!")


# --------------------------------------------------------------------- #
# overlaps
# --------------------------------------------------------------------- #

def parse_mhap(path: str) -> List[Overlap]:
    try:
        from racon_tpu.native import rtlib
        recs = rtlib.parse_overlaps_raw(path, "mhap")
        return [Overlap.from_mhap(a_id=r[0], b_id=r[1], a_rc=r[2],
                                  a_begin=r[3], a_end=r[4], a_length=r[5],
                                  b_rc=r[6], b_begin=r[7], b_end=r[8],
                                  b_length=r[9]) for r in recs]
    except ImportError:
        pass
    except OSError:
        pass
    out: List[Overlap] = []
    with _open(path) as f:
        for line in f:
            fields = line.split()
            if len(fields) < 12:
                continue
            out.append(Overlap.from_mhap(
                a_id=int(fields[0]), b_id=int(fields[1]),
                a_rc=int(fields[4]), a_begin=int(fields[5]),
                a_end=int(fields[6]), a_length=int(fields[7]),
                b_rc=int(fields[8]), b_begin=int(fields[9]),
                b_end=int(fields[10]), b_length=int(fields[11])))
    return out


def parse_paf(path: str) -> List[Overlap]:
    try:
        from racon_tpu.native import rtlib
        recs = rtlib.parse_overlaps_raw(path, "paf")
        return [Overlap.from_paf(q_name=r[0], q_length=r[3], q_begin=r[4],
                                 q_end=r[5], orientation=r[2], t_name=r[1],
                                 t_length=r[6], t_begin=r[7], t_end=r[8])
                for r in recs]
    except ImportError:
        pass
    except OSError:
        pass
    out: List[Overlap] = []
    with _open(path) as f:
        for line in f:
            fields = line.split(b"\t")
            if len(fields) < 12:
                continue
            out.append(Overlap.from_paf(
                q_name=fields[0].decode(), q_length=int(fields[1]),
                q_begin=int(fields[2]), q_end=int(fields[3]),
                orientation=fields[4].decode(),
                t_name=fields[5].decode(), t_length=int(fields[6]),
                t_begin=int(fields[7]), t_end=int(fields[8])))
    return out


def parse_sam(path: str) -> List[Overlap]:
    try:
        from racon_tpu.native import rtlib
        recs = rtlib.parse_overlaps_raw(path, "sam")
        return [Overlap.from_sam(q_name=r[0], flag=r[1], t_name=r[2],
                                 t_pos=r[3], cigar=r[4]) for r in recs]
    except ImportError:
        pass
    except OSError:
        pass
    out: List[Overlap] = []
    with _open(path) as f:
        for line in f:
            if line.startswith(b"@"):
                continue
            fields = line.split(b"\t")
            if len(fields) < 11:
                continue
            out.append(Overlap.from_sam(
                q_name=fields[0].decode(), flag=int(fields[1]),
                t_name=fields[2].decode(), t_pos=int(fields[3]),
                cigar=fields[5]))
    return out


def _overlap_fmt(path: str) -> str:
    if path.endswith((".mhap", ".mhap.gz")):
        return "mhap"
    if path.endswith((".paf", ".paf.gz")):
        return "paf"
    if path.endswith((".sam", ".sam.gz")):
        return "sam"
    raise RuntimeError(
        f"[racon_tpu::parse_overlaps] error: file {path} has unsupported "
        f"format extension (valid extensions: .mhap, .mhap.gz, .paf, "
        f".paf.gz, .sam, .sam.gz)!")


def _records_to_overlaps(recs, fmt: str) -> List[Overlap]:
    if fmt == "mhap":
        return [Overlap.from_mhap(a_id=r[0], b_id=r[1], a_rc=r[2],
                                  a_begin=r[3], a_end=r[4], a_length=r[5],
                                  b_rc=r[6], b_begin=r[7], b_end=r[8],
                                  b_length=r[9]) for r in recs]
    if fmt == "paf":
        return [Overlap.from_paf(q_name=r[0], q_length=r[3], q_begin=r[4],
                                 q_end=r[5], orientation=r[2], t_name=r[1],
                                 t_length=r[6], t_begin=r[7], t_end=r[8])
                for r in recs]
    return [Overlap.from_sam(q_name=r[0], flag=r[1], t_name=r[2],
                             t_pos=r[3], cigar=r[4]) for r in recs]


def iter_overlap_chunks(path: str, chunk_bytes: int = 1 << 30):
    """Yield lists of Overlap records parsed from at most ``chunk_bytes``
    of file text each — the reference's 1 GiB chunked overlap ingest
    (src/polisher.cpp:311-349), so transmute/filter interleave with
    parsing and peak memory stays bounded at genome scale.  Falls back to
    a single whole-file chunk without the native runtime."""
    fmt = _overlap_fmt(path)
    try:
        from racon_tpu.native import rtlib
        stream = rtlib.stream_overlaps_raw(path, fmt, chunk_bytes)
    except Exception:
        yield parse_overlaps(path)
        return
    for recs in stream:
        yield _records_to_overlaps(recs, fmt)


def parse_overlaps(path: str) -> List[Overlap]:
    if path.endswith((".mhap", ".mhap.gz")):
        return parse_mhap(path)
    if path.endswith((".paf", ".paf.gz")):
        return parse_paf(path)
    if path.endswith((".sam", ".sam.gz")):
        return parse_sam(path)
    raise RuntimeError(
        f"[racon_tpu::parse_overlaps] error: file {path} has unsupported "
        f"format extension (valid extensions: .mhap, .mhap.gz, .paf, "
        f".paf.gz, .sam, .sam.gz)!")


def write_fasta(sequences, stream) -> None:
    """Emit polished sequences as FASTA (reference: src/main.cpp:159-161)."""
    for s in sequences:
        stream.write(f">{s.name}\n")
        stream.write(s.data.decode() if isinstance(s.data, bytes) else s.data)
        stream.write("\n")

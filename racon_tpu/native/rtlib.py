"""ctypes bindings for the native runtime library."""

from __future__ import annotations

import ctypes
import os
from typing import List, Sequence, Tuple

import numpy as np

from racon_tpu.native.build import build

_lib = ctypes.CDLL(build())

_lib.rt_align_batch.restype = ctypes.c_void_p
_lib.rt_align_batch.argtypes = [
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
    ctypes.c_int64, ctypes.c_int, ctypes.c_int,
]
_lib.rt_edit_distance_banded.restype = ctypes.c_int64
_lib.rt_edit_distance_banded.argtypes = [
    ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
]
_lib.rt_breaking_points.restype = ctypes.c_int64
_lib.rt_breaking_points.argtypes = [
    ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
    ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
]

_lib.rt_result_len.restype = ctypes.c_int64
_lib.rt_result_len.argtypes = [ctypes.c_void_p, ctypes.c_int64]
_lib.rt_result_get.restype = None
_lib.rt_result_get.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                               ctypes.c_char_p]
_lib.rt_result_free.restype = None
_lib.rt_result_free.argtypes = [ctypes.c_void_p]
_lib.rt_edit_distance.restype = ctypes.c_int64
_lib.rt_edit_distance.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                  ctypes.c_char_p, ctypes.c_int64]
_lib.rt_result_flag.restype = ctypes.c_uint8
_lib.rt_result_flag.argtypes = [ctypes.c_void_p, ctypes.c_int64]
_I64P = ctypes.POINTER(ctypes.c_int64)
_I32P = ctypes.POINTER(ctypes.c_int32)
_U8P = ctypes.POINTER(ctypes.c_uint8)
_lib.rt_polish_windows.restype = ctypes.c_void_p
_lib.rt_polish_windows.argtypes = [
    ctypes.c_int64, _I64P,
    ctypes.c_char_p, _I64P,
    ctypes.c_char_p, _I64P,
    ctypes.c_char_p, _I64P,
    ctypes.c_char_p, _I64P,
    _I32P, _I32P, _U8P,
    ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int,
]


_I8P = ctypes.POINTER(ctypes.c_int8)
_I16P = ctypes.POINTER(ctypes.c_int16)
_lib.rt_consensus_batch.restype = ctypes.c_void_p
_lib.rt_consensus_batch.argtypes = [
    _I8P, _I16P, _I32P, _I16P, _I16P, _I16P, _I32P, _U8P,
    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
]


_lib.rt_layer_sort.restype = None
_lib.rt_layer_sort.argtypes = [_I32P, ctypes.c_int64, _I32P]


def layer_sort(begins) -> np.ndarray:
    """Layer processing order (0-based indices), replicating the
    reference's unstable std::sort by begin position (src/window.cpp:85-86)
    bit-exactly — all engines must add layers in this order."""
    b = np.ascontiguousarray(begins, dtype=np.int32)
    out = np.empty(len(b), dtype=np.int32)
    _lib.rt_layer_sort(b.ctypes.data_as(_I32P), len(b),
                       out.ctypes.data_as(_I32P))
    return out


def _concat(seqs: Sequence[bytes]):
    offs = np.zeros(len(seqs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in seqs], out=offs[1:])
    return b"".join(seqs), offs


def edit_distance(q: bytes, t: bytes) -> int:
    return _lib.rt_edit_distance(q, len(q), t, len(t))


def polish_windows(windows, match: int, mismatch: int, gap: int, trim: bool,
                   num_threads: int = 1):
    """Polish windows with the native C++ POA oracle.

    Returns [(consensus bytes, polished bool)], bit-identical to the NumPy
    oracle and the batched JAX engine.
    """
    from racon_tpu.core.window import WindowType

    n = len(windows)
    layer_counts = [len(w.sequences) - 1 for w in windows]
    layer_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(layer_counts, out=layer_off[1:])

    bb = [w.sequences[0] for w in windows]
    bbq = [w.qualities[0] for w in windows]
    seqs, quals, begins, ends = [], [], [], []
    trims = np.zeros(n, dtype=np.uint8)
    for i, w in enumerate(windows):
        trims[i] = 1 if (w.type == WindowType.TGS and trim) else 0
        for k in range(1, len(w.sequences)):
            seqs.append(w.sequences[k])
            quals.append(w.qualities[k] if w.qualities[k] else b"")
            begins.append(w.positions[k][0])
            ends.append(w.positions[k][1])

    bb_buf, bb_off = _concat(bb)
    bbq_buf, bbq_off = _concat(bbq)
    seq_buf, seq_off = _concat(seqs)
    qual_buf, qual_off = _concat(quals)
    begins_a = np.asarray(begins, dtype=np.int32)
    ends_a = np.asarray(ends, dtype=np.int32)

    handle = _lib.rt_polish_windows(
        n, layer_off.ctypes.data_as(_I64P),
        bb_buf, bb_off.ctypes.data_as(_I64P),
        bbq_buf, bbq_off.ctypes.data_as(_I64P),
        seq_buf, seq_off.ctypes.data_as(_I64P),
        qual_buf, qual_off.ctypes.data_as(_I64P),
        begins_a.ctypes.data_as(_I32P), ends_a.ctypes.data_as(_I32P),
        trims.ctypes.data_as(_U8P),
        match, mismatch, gap, max(1, num_threads))
    out = []
    try:
        for i in range(n):
            ln = _lib.rt_result_len(handle, i)
            buf = ctypes.create_string_buffer(ln)
            _lib.rt_result_get(handle, i, buf)
            out.append((buf.raw[:ln], bool(_lib.rt_result_flag(handle, i))))
    finally:
        _lib.rt_result_free(handle)
    return out


_lib.rt_result_count.restype = ctypes.c_int64
_lib.rt_result_count.argtypes = [ctypes.c_void_p]
_lib.rt_parse_sequences.restype = ctypes.c_void_p
_lib.rt_parse_sequences.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_int)]


def parse_sequences_raw(path: str, is_fastq: bool):
    """Parse a (optionally gzipped) FASTA/FASTQ file in C++.

    Returns [(name bytes, data bytes, quality bytes)], quality empty for
    FASTA.  The role bioparser plays in the reference
    (src/polisher.cpp:85-135)."""
    err = ctypes.c_int(0)
    handle = _lib.rt_parse_sequences(path.encode(), 1 if is_fastq else 0,
                                     ctypes.byref(err))
    if not handle:
        if err.value == 2:
            raise RuntimeError(
                f"[racon_tpu::parse_fastq] error: malformed header in {path}")
        raise RuntimeError(
            f"[racon_tpu::rtlib] error: unable to parse {path} "
            f"(code {err.value})")
    out = []
    try:
        for i in range(_lib.rt_result_count(handle)):
            ln = _lib.rt_result_len(handle, i)
            buf = ctypes.create_string_buffer(ln)
            _lib.rt_result_get(handle, i, buf)
            raw = buf.raw
            nl = int.from_bytes(raw[:4], "little")
            name = raw[4:4 + nl]
            off = 4 + nl
            dl = int.from_bytes(raw[off:off + 8], "little")
            data = raw[off + 8:off + 8 + dl]
            off = off + 8 + dl
            ql = int.from_bytes(raw[off:off + 8], "little")
            qual = raw[off + 8:off + 8 + ql]
            out.append((name, data, qual))
    finally:
        _lib.rt_result_free(handle)
    return out


_lib.rt_parse_overlaps.restype = ctypes.c_void_p
_lib.rt_parse_overlaps.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                   ctypes.POINTER(ctypes.c_int)]
_FMT = {"mhap": 0, "paf": 1, "sam": 2}


def _decode_overlap_result(handle, fmt):
    import struct

    out = []
    try:
        for i in range(_lib.rt_result_count(handle)):
            ln = _lib.rt_result_len(handle, i)
            buf = ctypes.create_string_buffer(ln)
            _lib.rt_result_get(handle, i, buf)
            raw = buf.raw
            if fmt == "mhap":
                out.append(struct.unpack("<10q", raw))
            elif fmt == "paf":
                qn = int.from_bytes(raw[:4], "little")
                q_name = raw[4:4 + qn].decode()
                off = 4 + qn
                tn = int.from_bytes(raw[off:off + 4], "little")
                t_name = raw[off + 4:off + 4 + tn].decode()
                off = off + 4 + tn
                strand = chr(raw[off])
                nums = struct.unpack("<7q", raw[off + 1:off + 1 + 56])
                out.append((q_name, t_name, strand) + nums[:6])
            else:
                qn = int.from_bytes(raw[:4], "little")
                q_name = raw[4:4 + qn].decode()
                off = 4 + qn
                tn = int.from_bytes(raw[off:off + 4], "little")
                t_name = raw[off + 4:off + 4 + tn].decode()
                off = off + 4 + tn
                cl = int.from_bytes(raw[off:off + 4], "little")
                cigar = raw[off + 4:off + 4 + cl]
                off = off + 4 + cl
                flag, t_pos = struct.unpack("<2q", raw[off:off + 16])
                out.append((q_name, flag, t_name, t_pos, cigar))
    finally:
        _lib.rt_result_free(handle)
    return out


def parse_overlaps_raw(path: str, fmt: str):
    """Parse a (optionally gzipped) MHAP/PAF/SAM file in C++.

    Returns a list of per-format tuples (see rtlib.cpp record layouts)."""
    err = ctypes.c_int(0)
    handle = _lib.rt_parse_overlaps(path.encode(), _FMT[fmt],
                                    ctypes.byref(err))
    if not handle:
        raise RuntimeError(
            f"[racon_tpu::rtlib] error: unable to parse {path} "
            f"(code {err.value})")
    return _decode_overlap_result(handle, fmt)


_lib.rt_open_ovl_stream.restype = ctypes.c_void_p
_lib.rt_open_ovl_stream.argtypes = [ctypes.c_char_p]
_lib.rt_close_ovl_stream.restype = None
_lib.rt_close_ovl_stream.argtypes = [ctypes.c_void_p]
_lib.rt_ovl_stream_next.restype = ctypes.c_void_p
_lib.rt_ovl_stream_next.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_int)]


def stream_overlaps_raw(path: str, fmt: str, chunk_bytes: int = 1 << 30):
    """Yield lists of per-format overlap tuples parsed from at most
    ~chunk_bytes of file text per chunk (the reference's 1 GiB overlap
    ingest, src/polisher.cpp:311-349)."""
    stream = _lib.rt_open_ovl_stream(path.encode())
    if not stream:
        raise RuntimeError(
            f"[racon_tpu::rtlib] error: unable to open {path}")
    try:
        while True:
            err = ctypes.c_int(0)
            handle = _lib.rt_ovl_stream_next(stream, chunk_bytes,
                                             _FMT[fmt], ctypes.byref(err))
            if not handle:
                raise RuntimeError(
                    f"[racon_tpu::rtlib] error: stream read failed for "
                    f"{path} (code {err.value})")
            recs = _decode_overlap_result(handle, fmt)
            if not recs:
                break
            yield recs
    finally:
        _lib.rt_close_ovl_stream(stream)


_lib.rt_open_seq_stream.restype = ctypes.c_void_p
_lib.rt_open_seq_stream.argtypes = [ctypes.c_char_p, ctypes.c_int]
_lib.rt_close_seq_stream.restype = None
_lib.rt_close_seq_stream.argtypes = [ctypes.c_void_p]
_lib.rt_stream_next.restype = ctypes.c_void_p
_lib.rt_stream_next.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_int)]


def _decode_seq_result(handle):
    out = []
    try:
        for i in range(_lib.rt_result_count(handle)):
            ln = _lib.rt_result_len(handle, i)
            buf = ctypes.create_string_buffer(ln)
            _lib.rt_result_get(handle, i, buf)
            raw = buf.raw
            nl = int.from_bytes(raw[:4], "little")
            name = raw[4:4 + nl]
            off = 4 + nl
            dl = int.from_bytes(raw[off:off + 8], "little")
            data = raw[off + 8:off + 8 + dl]
            off = off + 8 + dl
            ql = int.from_bytes(raw[off:off + 8], "little")
            qual = raw[off + 8:off + 8 + ql]
            out.append((name, data, qual))
    finally:
        _lib.rt_result_free(handle)
    return out


def stream_sequences(path: str, is_fastq: bool,
                     chunk_bytes: int = 1 << 30):
    """Yield lists of (name, data, quality) records, each list holding at
    most chunk_bytes of sequence data — the reference's 1 GiB chunked
    ingest (src/polisher.cpp:30, 200-265), bounding peak memory."""
    stream = _lib.rt_open_seq_stream(path.encode(), 1 if is_fastq else 0)
    if not stream:
        raise RuntimeError(
            f"[racon_tpu::rtlib] error: unable to open {path}")
    try:
        while True:
            err = ctypes.c_int(0)
            handle = _lib.rt_stream_next(stream, chunk_bytes,
                                         ctypes.byref(err))
            if not handle:
                raise RuntimeError(
                    f"[racon_tpu::rtlib] error: parsing {path} "
                    f"(code {err.value})")
            recs = _decode_seq_result(handle)
            if not recs:
                return
            yield recs
    finally:
        _lib.rt_close_seq_stream(stream)


def consensus_batch(packed: dict, skip: np.ndarray, num_threads: int = 1):
    """Heaviest-bundle consensus for a batch of downloaded device graphs.

    packed: the dict produced by fused_chunk.pack_for_download_chunk /
    engine.pack_for_download (numpy arrays).  Returns a list of
    (consensus bytes, coverage int16 array) — None where skip[i] is set.
    """
    codes = np.ascontiguousarray(packed["codes"], dtype=np.int8)
    pred = np.ascontiguousarray(packed["pred"], dtype=np.int16)
    pred_w = np.ascontiguousarray(packed["pred_w"], dtype=np.int32)
    cnt = np.ascontiguousarray(packed["pred_cnt"], dtype=np.int16)
    cov = np.ascontiguousarray(packed["cov"], dtype=np.int16)
    order = np.ascontiguousarray(packed["order"], dtype=np.int16)
    n_nodes = np.ascontiguousarray(packed["n_nodes"], dtype=np.int32)
    skip = np.ascontiguousarray(skip, dtype=np.uint8)
    B, Np1 = codes.shape
    P = pred.shape[2]

    handle = _lib.rt_consensus_batch(
        codes.ctypes.data_as(_I8P), pred.ctypes.data_as(_I16P),
        pred_w.ctypes.data_as(_I32P), cnt.ctypes.data_as(_I16P),
        cov.ctypes.data_as(_I16P), order.ctypes.data_as(_I16P),
        n_nodes.ctypes.data_as(_I32P), skip.ctypes.data_as(_U8P),
        B, Np1, P, max(1, num_threads))
    out = []
    try:
        for i in range(B):
            if skip[i] or not _lib.rt_result_flag(handle, i):
                out.append(None)
                continue
            ln = _lib.rt_result_len(handle, i)
            buf = ctypes.create_string_buffer(ln)
            _lib.rt_result_get(handle, i, buf)
            L = ln // 3
            cons = buf.raw[:L]
            cov_i = np.frombuffer(buf.raw[L:L + 2 * L], dtype="<i2")
            out.append((cons, cov_i))
    finally:
        _lib.rt_result_free(handle)
    return out


class NativeAligner:
    """Batched unit-cost global aligner (CIGAR producer).

    algo: -1 = exact O(ND) wavefront; 0..5 = banded Myers bit-vector with
    traceback preference permutation (edlib-class; reference role:
    src/overlap.cpp:205-224).  Default order 3 (up, left, diag) is
    edlib's exact backward tie priority, and since round 4 the traceback
    is provably band-independent (myers_align re-passes at slack >=
    dist+1), so order 3 reproduces edlib's alignment path bit-exactly
    (gated by tests/test_align_greedy.py).  It is the only order with
    ALL six reference goldens at-or-below the reference values
    (2026-08-19 sweep: fastq+PAF 1309/1312, fasta+PAF 1553/1566,
    w=1000 1284/1289, m1x1g1 1312/1321; SAM configs aligner-independent
    at 1315/1317 and 1770 exact).  Override with RACON_TPU_ALIGN_ALGO
    for experiments.
    """

    def __init__(self, num_threads: int = 1, algo: int = None):
        self.num_threads = max(1, num_threads)
        if algo is None:
            algo = int(os.environ.get("RACON_TPU_ALIGN_ALGO", "3"))
        self.algo = algo

    def __call__(self, q: bytes, t: bytes) -> bytes:
        return self.align_batch([(q, t)])[0]

    def align_batch(self, pairs: Sequence[Tuple[bytes, bytes]]) -> List[bytes]:
        if not pairs:
            return []
        qbuf, qoff = _concat([p[0] for p in pairs])
        tbuf, toff = _concat([p[1] for p in pairs])
        handle = _lib.rt_align_batch(
            qbuf, qoff.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            tbuf, toff.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(pairs), self.num_threads, self.algo)
        out: List[bytes] = []
        try:
            for i in range(len(pairs)):
                n = _lib.rt_result_len(handle, i)
                buf = ctypes.create_string_buffer(n)
                _lib.rt_result_get(handle, i, buf)
                out.append(buf.raw[:n])
        finally:
            _lib.rt_result_free(handle)
        return out


def edit_distance_banded(q: bytes, t: bytes) -> int:
    """Exact edit distance via the banded Myers pass with band doubling —
    use for genome-scale scoring where the full-width automaton is too
    slow."""
    return _lib.rt_edit_distance_banded(q, len(q), t, len(t))


def breaking_points(cigar: bytes, t_begin: int, t_end: int, q_begin: int,
                    q_end: int, q_length: int, strand: bool,
                    window_length: int):
    """Breaking-point pairs from a CIGAR (native walker; exact reference
    semantics, src/overlap.cpp:226-292).  Returns a list of (t, q) tuples.
    """
    cap = 4 * (t_end // max(window_length, 1) + 3)
    buf = (ctypes.c_int64 * cap)()
    n = _lib.rt_breaking_points(cigar, len(cigar), t_begin, t_end, q_begin,
                                q_end, q_length, 1 if strand else 0,
                                window_length, buf, cap)
    if n < 0:  # pragma: no cover - capacity formula covers all windows
        raise RuntimeError("breaking-point buffer overflow")
    return [(buf[i], buf[i + 1]) for i in range(0, n, 2)]

"""ctypes bindings for the native runtime library."""

from __future__ import annotations

import ctypes
from typing import List, Sequence, Tuple

import numpy as np

from racon_tpu.native.build import build

_lib = ctypes.CDLL(build())

_lib.rt_align_batch.restype = ctypes.c_void_p
_lib.rt_align_batch.argtypes = [
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
    ctypes.c_int64, ctypes.c_int,
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


def _concat(seqs: Sequence[bytes]):
    offs = np.zeros(len(seqs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in seqs], out=offs[1:])
    return b"".join(seqs), offs


def edit_distance(q: bytes, t: bytes) -> int:
    return _lib.rt_edit_distance(q, len(q), t, len(t))


class NativeAligner:
    """Batched unit-cost global aligner (CIGAR producer)."""

    def __init__(self, num_threads: int = 1):
        self.num_threads = max(1, num_threads)

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
            len(pairs), self.num_threads)
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

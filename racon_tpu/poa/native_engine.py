"""Native C++ consensus engine: the fast host path.

Same semantics as the NumPy oracle and the batched TPU engine (bit-identical
output); used as the CPU fallback/baseline (reference precedent: GPU-failed
windows re-polished on CPU spoa, src/cuda/cudapolisher.cpp:354-378).
"""

from __future__ import annotations

from typing import List, Tuple

from racon_tpu.core.window import Window


class NativePOAEngine:
    def __init__(self, match: int, mismatch: int, gap: int,
                 num_threads: int = 1):
        self.match = match
        self.mismatch = mismatch
        self.gap = gap
        self.num_threads = num_threads

    def polish_windows(self, windows: List[Window],
                       trim: bool) -> List[Tuple[bytes, bool]]:
        from racon_tpu.native import rtlib
        return rtlib.polish_windows(windows, self.match, self.mismatch,
                                    self.gap, trim, self.num_threads)

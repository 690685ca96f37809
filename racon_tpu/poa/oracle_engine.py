"""Host oracle consensus engine: scalar/NumPy POA per window.

Used for verification and as the fallback for windows the TPU engine cannot
take (reference precedent: GPU-rejected windows re-run on CPU,
src/cuda/cudapolisher.cpp:354-378).
"""

from __future__ import annotations

from typing import List, Tuple

from racon_tpu.core.window import Window
from racon_tpu.poa.consensus import consensus_window


class OraclePOAEngine:
    def __init__(self, match: int, mismatch: int, gap: int):
        self.match = match
        self.mismatch = mismatch
        self.gap = gap

    def polish_windows(self, windows: List[Window],
                       trim: bool) -> List[Tuple[bytes, bool]]:
        return [consensus_window(w, self.match, self.mismatch, self.gap, trim)
                for w in windows]

"""Window: a fixed span of the target backbone plus assigned read layers.

Mirrors the reference window model (reference: src/window.cpp):
  * layer 0 is the backbone (with its quality, or a dummy '!' string),
  * ``add_layer`` validates layer geometry (src/window.cpp:42-63),
  * consensus policy lives in the POA engines; the window only carries data.

Unlike the reference, consensus generation is *not* a method here — windows
are packed into dense megabatches and polished by a batched engine
(racon_tpu.poa).  ``WindowType`` decides end-trimming exactly like the
reference (kTGS trims low-coverage ends, src/window.cpp:125-146).
"""

from __future__ import annotations

import enum
from typing import List, Optional, Tuple


class WindowType(enum.Enum):
    NGS = 0   # short reads: no trimming
    TGS = 1   # long reads: trim low-coverage consensus ends


class Window:
    __slots__ = ("id", "rank", "type", "consensus", "sequences", "qualities",
                 "positions")

    def __init__(self, id: int, rank: int, type: WindowType, backbone: bytes,
                 quality: bytes):
        if len(backbone) == 0 or len(backbone) != len(quality):
            raise RuntimeError(
                "[racon_tpu::Window] error: "
                "empty backbone sequence/unequal quality length!")
        self.id = id
        self.rank = rank
        self.type = type
        self.consensus = b""
        # layer 0 = backbone (reference: src/window.cpp:34-37)
        self.sequences: List[bytes] = [backbone]
        self.qualities: List[Optional[bytes]] = [quality]
        self.positions: List[Tuple[int, int]] = [(0, 0)]

    def add_layer(self, sequence: bytes, quality: Optional[bytes],
                  begin: int, end: int) -> None:
        """(reference: src/window.cpp:42-63)"""
        if len(sequence) == 0 or begin == end:
            return
        if quality is not None and len(sequence) != len(quality):
            raise RuntimeError(
                "[racon_tpu::Window.add_layer] error: unequal quality size!")
        if begin >= end or begin > len(self.sequences[0]) or \
                end > len(self.sequences[0]):
            raise RuntimeError(
                "[racon_tpu::Window.add_layer] error: "
                "layer begin and end positions are invalid!")
        self.sequences.append(sequence)
        self.qualities.append(quality)
        self.positions.append((begin, end))

    @property
    def n_layers(self) -> int:
        return len(self.sequences)

    def __repr__(self) -> str:  # pragma: no cover
        return (f"Window(id={self.id}, rank={self.rank}, "
                f"backbone={len(self.sequences[0])}bp, "
                f"layers={len(self.sequences) - 1})")


def layer_order(window: "Window") -> List[int]:
    """Layer processing order (indices into window.sequences, 1-based
    members): the reference sorts layers by begin with UNSTABLE std::sort
    (src/window.cpp:79-86), whose equal-key permutation changes the POA
    graph — every engine adds layers in this exact order (rt_layer_sort
    replicates the libstdc++ introsort call bit-exactly)."""
    n = len(window.sequences) - 1
    if n <= 0:
        return []
    begins = [window.positions[i][0] for i in range(1, n + 1)]
    try:
        from racon_tpu.native import rtlib
        return [int(i) + 1 for i in rtlib.layer_sort(begins)]
    except Exception:  # pragma: no cover - no compiler available
        return sorted(range(1, n + 1), key=lambda i: begins[i - 1])


def trim_consensus(consensus: bytes, coverages, n_sequences: int,
                   window_id: int, window_rank: int) -> bytes:
    """kTGS end-trim: clip consensus ends whose coverage is below half the
    layer count (reference: src/window.cpp:125-146)."""
    average_coverage = (n_sequences - 1) // 2

    begin, end = 0, len(consensus) - 1
    while begin < len(consensus) and coverages[begin] < average_coverage:
        begin += 1
    while end >= 0 and coverages[end] < average_coverage:
        end -= 1

    if begin >= end:
        import sys
        print(f"[racon_tpu::trim_consensus] warning: contig {window_id} "
              f"might be chimeric in window {window_rank}!", file=sys.stderr)
        return consensus
    return consensus[begin:end + 1]

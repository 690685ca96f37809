"""Per-window consensus policy (host oracle path).

Replicates the reference's window consensus driver
(reference: src/window.cpp:65-149):
  * windows with fewer than 3 sequences return the backbone unpolished,
  * layers are aligned in order of their begin position on the backbone,
  * layers spanning all but 1% of both window edges align against the full
    graph, others against the subgraph between their breaking points,
  * kTGS windows are end-trimmed at coverage < (n_layers)/2.
"""

from __future__ import annotations

from typing import Tuple

from racon_tpu.core.window import (Window, WindowType, layer_order,
                                   trim_consensus)
from racon_tpu.poa.graph import (POAGraph, decode, encode,
                                 weights_from_quality)


def consensus_window(window: Window, match: int, mismatch: int, gap: int,
                     trim: bool) -> Tuple[bytes, bool]:
    """Generate the consensus for one window.  Returns (consensus, polished)."""
    if len(window.sequences) < 3:
        return window.sequences[0], False

    backbone = window.sequences[0]
    graph = POAGraph()
    graph.add_alignment([], encode(backbone),
                        weights_from_quality(window.qualities[0],
                                             len(backbone)))

    order = layer_order(window)

    offset = int(0.01 * len(backbone))
    for i in order:
        seq = encode(window.sequences[i])
        begin, end = window.positions[i]
        if begin < offset and end > len(backbone) - offset:
            alignment = graph.align(seq, match, mismatch, gap)
        else:
            # subgraph between backbone nodes [begin, end]; backbone node
            # ids equal backbone positions since it was added first
            alignment = graph.align(seq, match, mismatch, gap,
                                    begin_node=begin, end_node=end)
        graph.add_alignment(alignment, seq,
                            weights_from_quality(window.qualities[i],
                                                 len(seq)))

    codes, coverages = graph.generate_consensus()
    consensus = decode(codes)

    if window.type == WindowType.TGS and trim:
        consensus = trim_consensus(consensus, coverages,
                                   len(window.sequences), window.id,
                                   window.rank)
    return consensus, True

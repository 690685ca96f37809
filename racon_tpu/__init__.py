"""racon_tpu — a TPU-native consensus-polishing framework.

A from-scratch re-design of the capabilities of lbcb-sci/racon for TPU
hardware: reads + overlaps + target contigs in, polished contigs out.  The
compute core is a batched partial-order-alignment (POA) engine expressed in
JAX/Pallas over dense, length-bucketed window megabatches, sharded across a
`jax.sharding.Mesh`; the host runtime (parsers, CIGAR walking, oracle/fallback
POA) is native C++.

Public surface (mirrors the reference's L3/L6 API, see SURVEY.md §1):
  - create_polisher(...)       factory (reference: src/polisher.cpp:57)
  - Polisher.initialize()      ingest + window binning
  - Polisher.polish(...)       consensus + stitching
  - cli.main()                 racon-compatible command line
"""

from racon_tpu.version import __version__
from racon_tpu.core.sequence import Sequence
from racon_tpu.core.overlap import Overlap
from racon_tpu.core.window import Window, WindowType
from racon_tpu.pipeline import Polisher, PolisherType, create_polisher

__all__ = [
    "__version__",
    "Sequence",
    "Overlap",
    "Window",
    "WindowType",
    "Polisher",
    "PolisherType",
    "create_polisher",
]

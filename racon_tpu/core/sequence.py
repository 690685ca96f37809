"""Sequence record: name + bases + optional qualities, with lazy revcomp.

Behavioral contract mirrors the reference data model
(reference: src/sequence.cpp:19-100):
  * bases are upper-cased on construction,
  * an all-zero quality string (every char '!') is dropped entirely,
  * reverse complement / reversed quality are materialized lazily,
  * ``transmute`` frees unneeded fields and materializes the revcomp.

Data is held as ``bytes`` for zero-copy slicing into window layers.
"""

from __future__ import annotations

_UPPER = bytes.maketrans(
    bytes(range(256)),
    bytes((c - 32) if 97 <= c <= 122 else c for c in range(256)),
)

# A<->T, C<->G; everything else maps to itself (reference: src/sequence.cpp:58-75)
_COMPLEMENT = bytes.maketrans(b"ATCG", b"TAGC")


class Sequence:
    __slots__ = (
        "name",
        "data",
        "quality",
        "reverse_complement",
        "reverse_quality",
    )

    def __init__(self, name: str, data: bytes, quality: bytes = b""):
        self.name = name
        self.data = data.translate(_UPPER)
        # Drop all-zero quality strings (reference: src/sequence.cpp:34-42).
        # strip() runs at C speed: non-empty iff any byte differs from '!'
        # (a per-byte Python scan here cost ~90 s on E. coli-scale reads).
        if quality and quality.strip(b"\x21"):
            self.quality = quality
        else:
            self.quality = b""
        self.reverse_complement = b""
        self.reverse_quality = b""

    def create_reverse_complement(self) -> None:
        if self.reverse_complement:
            return
        self.reverse_complement = self.data[::-1].translate(_COMPLEMENT)
        self.reverse_quality = self.quality[::-1]

    def transmute(self, has_name: bool, has_data: bool, has_reverse_data: bool) -> None:
        """Free unused fields; materialize revcomp when needed.

        (reference: src/sequence.cpp:86-100)
        """
        if not has_name:
            self.name = ""
        if has_reverse_data:
            self.create_reverse_complement()
        if not has_data:
            self.data = b""
            self.quality = b""

    def __repr__(self) -> str:  # pragma: no cover
        return f"Sequence(name={self.name!r}, len={len(self.data)})"

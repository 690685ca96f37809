"""Overlap record: pairwise read<->target overlap + CIGAR breaking points.

Mirrors the reference semantics exactly (reference: src/overlap.cpp):
  * three construction paths (MHAP / PAF / SAM) with the same coordinate
    conventions, including SAM q-extent recovery from CIGAR clips and the
    strand flip of q coordinates (src/overlap.cpp:44-108),
  * ``error = 1 - min(q_span, t_span) / max(q_span, t_span)``,
  * ``transmute``: file-local names/ids -> global sequence indices with
    length validation (src/overlap.cpp:129-177),
  * ``find_breaking_points``: walk the CIGAR and record the (t, q)
    coordinates of the first/last match inside every window span
    (src/overlap.cpp:226-292).  This is the exact geometry that decides
    which read segment lands in which window layer, so it is kept
    behavior-identical.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence as PySequence, Tuple

_CIGAR_RE = re.compile(rb"(\d+)([MIDNSHP=X])")


class LengthMismatchError(RuntimeError):
    pass


class Overlap:
    __slots__ = (
        "q_name", "q_id", "q_begin", "q_end", "q_length",
        "t_name", "t_id", "t_begin", "t_end", "t_length",
        "strand", "length", "error", "cigar",
        "is_valid", "is_transmuted", "breaking_points",
    )

    def __init__(self):
        self.q_name = ""
        self.q_id = 0
        self.q_begin = 0
        self.q_end = 0
        self.q_length = 0
        self.t_name = ""
        self.t_id = 0
        self.t_begin = 0
        self.t_end = 0
        self.t_length = 0
        self.strand = False
        self.length = 0
        self.error = 0.0
        self.cigar = b""
        self.is_valid = True
        self.is_transmuted = False
        self.breaking_points: List[Tuple[int, int]] = []

    # ------------------------------------------------------------------ #
    # construction from the three overlap formats
    # ------------------------------------------------------------------ #

    @classmethod
    def from_mhap(cls, a_id: int, b_id: int, a_rc: int, a_begin: int,
                  a_end: int, a_length: int, b_rc: int, b_begin: int,
                  b_end: int, b_length: int) -> "Overlap":
        """MHAP row; ids are 1-based (reference: src/overlap.cpp:15-27)."""
        o = cls()
        o.q_id = a_id - 1
        o.q_begin, o.q_end, o.q_length = a_begin, a_end, a_length
        o.t_id = b_id - 1
        o.t_begin, o.t_end, o.t_length = b_begin, b_end, b_length
        o.strand = bool(a_rc ^ b_rc)
        o._set_error_from_spans(o.q_end - o.q_begin, o.t_end - o.t_begin)
        return o

    @classmethod
    def from_paf(cls, q_name: str, q_length: int, q_begin: int, q_end: int,
                 orientation: str, t_name: str, t_length: int, t_begin: int,
                 t_end: int) -> "Overlap":
        """PAF row (reference: src/overlap.cpp:29-42)."""
        o = cls()
        o.q_name = q_name
        o.q_begin, o.q_end, o.q_length = q_begin, q_end, q_length
        o.t_name = t_name
        o.t_begin, o.t_end, o.t_length = t_begin, t_end, t_length
        o.strand = orientation == "-"
        o._set_error_from_spans(o.q_end - o.q_begin, o.t_end - o.t_begin)
        return o

    @classmethod
    def from_sam(cls, q_name: str, flag: int, t_name: str, t_pos: int,
                 cigar: bytes) -> "Overlap":
        """SAM row; t_pos is the 1-based POS field
        (reference: src/overlap.cpp:44-108)."""
        o = cls()
        o.q_name = q_name
        o.t_name = t_name
        o.t_begin = t_pos - 1
        o.strand = bool(flag & 0x10)
        o.is_valid = not (flag & 0x4)
        o.cigar = cigar

        if len(cigar) < 2 and o.is_valid:
            raise RuntimeError(
                "[racon_tpu::Overlap.from_sam] error: "
                "missing alignment from SAM object!")

        ops = _CIGAR_RE.findall(cigar)
        # leading clip -> q_begin (reference: src/overlap.cpp:60-69)
        q_begin = 0
        if ops and ops[0][1] in (b"S", b"H"):
            q_begin = int(ops[0][0])

        q_aln = q_clip = t_aln = 0
        for num, op in ops:
            n = int(num)
            if op in (b"M", b"=", b"X"):
                q_aln += n
                t_aln += n
            elif op == b"I":
                q_aln += n
            elif op in (b"D", b"N"):
                t_aln += n
            elif op in (b"S", b"H"):
                q_clip += n

        o.q_begin = q_begin
        o.q_end = q_begin + q_aln
        o.q_length = q_clip + q_aln
        if o.strand:
            o.q_begin, o.q_end = o.q_length - o.q_end, o.q_length - o.q_begin
        o.t_end = o.t_begin + t_aln
        o.t_length = 0  # filled by transmute from the target sequence
        o._set_error_from_spans(q_aln, t_aln)
        return o

    def _set_error_from_spans(self, q_span: int, t_span: int) -> None:
        self.length = max(q_span, t_span)
        if self.length == 0:
            self.error = 1.0
        else:
            self.error = 1.0 - min(q_span, t_span) / float(self.length)

    # ------------------------------------------------------------------ #
    # id resolution
    # ------------------------------------------------------------------ #

    def transmute(self, sequences, name_to_id: Dict[str, int],
                  id_to_id: Dict[int, int]) -> None:
        """Map file-local names/ids to global sequence indices
        (reference: src/overlap.cpp:129-177)."""
        if not self.is_valid or self.is_transmuted:
            return

        if self.q_name:
            key = self.q_name + "q"
            if key not in name_to_id:
                self.is_valid = False
                return
            self.q_id = name_to_id[key]
            self.q_name = ""
        else:
            key = self.q_id << 1 | 0
            if key not in id_to_id:
                self.is_valid = False
                return
            self.q_id = id_to_id[key]

        if self.q_length != len(sequences[self.q_id].data):
            raise LengthMismatchError(
                "[racon_tpu::Overlap.transmute] error: unequal lengths in "
                f"sequence and overlap file for sequence "
                f"{sequences[self.q_id].name}!")

        if self.t_name:
            key = self.t_name + "t"
            if key not in name_to_id:
                self.is_valid = False
                return
            self.t_id = name_to_id[key]
            self.t_name = ""
        else:
            key = self.t_id << 1 | 1
            if key not in id_to_id:
                self.is_valid = False
                return
            self.t_id = id_to_id[key]

        if self.t_length != 0 and self.t_length != len(sequences[self.t_id].data):
            raise LengthMismatchError(
                "[racon_tpu::Overlap.transmute] error: unequal lengths in "
                f"target and overlap file for target "
                f"{sequences[self.t_id].name}!")

        # for SAM input (reference: src/overlap.cpp:173-174)
        self.t_length = len(sequences[self.t_id].data)
        self.is_transmuted = True

    # ------------------------------------------------------------------ #
    # breaking points
    # ------------------------------------------------------------------ #

    def find_breaking_points(self, sequences, window_length: int,
                             aligner=None) -> None:
        """Compute breaking points; align with ``aligner`` when the overlap
        has no CIGAR (reference: src/overlap.cpp:179-203).

        ``aligner(q: bytes, t: bytes) -> bytes`` returns a SAM-style CIGAR of
        the global (NW) alignment of q against t.
        """
        if not self.is_transmuted:
            raise RuntimeError(
                "[racon_tpu::Overlap.find_breaking_points] error: "
                "overlap is not transmuted!")
        if self.breaking_points:
            return

        if not self.cigar:
            seq = sequences[self.q_id]
            if not self.strand:
                q = seq.data[self.q_begin:self.q_end]
            else:
                q = seq.reverse_complement[
                    self.q_length - self.q_end:self.q_length - self.q_begin]
            t = sequences[self.t_id].data[self.t_begin:self.t_end]
            if aligner is None:
                raise RuntimeError(
                    "[racon_tpu::Overlap.find_breaking_points] error: "
                    "no CIGAR and no aligner provided!")
            self.cigar = aligner(q, t)

        self._find_breaking_points_from_cigar(window_length)
        self.cigar = b""

    def _find_breaking_points_from_cigar(self, window_length: int) -> None:
        """CIGAR -> breaking points; the native C++ walker is the hot path
        (rtlib.rt_breaking_points, per-base loops in C), with the Python
        re-expression below as the no-compiler fallback and the parity
        reference for tests."""
        try:
            from racon_tpu.native import rtlib
            self.breaking_points.extend(rtlib.breaking_points(
                bytes(self.cigar), self.t_begin, self.t_end, self.q_begin,
                self.q_end, self.q_length, self.strand, window_length))
            return
        except ImportError:  # pragma: no cover - no compiler available
            pass
        self._find_breaking_points_from_cigar_py(window_length)

    def _find_breaking_points_from_cigar_py(self, window_length: int) -> None:
        """Exact re-expression of the reference walker
        (reference: src/overlap.cpp:226-292).

        Walk the CIGAR over (t, q) coordinates; whenever the t pointer
        crosses a window boundary, record the (t, q) pair of the first match
        and one-past the last match seen inside that window span.
        """
        bps = self.breaking_points
        # window end positions on the target (inclusive coordinates)
        window_ends: List[int] = []
        for i in range(0, self.t_end, window_length):
            if i > self.t_begin:
                window_ends.append(i - 1)
        window_ends.append(self.t_end - 1)

        w = 0
        found_first = False
        first_match = (0, 0)
        last_match = (0, 0)

        q_ptr = (self.q_length - self.q_end if self.strand else self.q_begin) - 1
        t_ptr = self.t_begin - 1

        for num, op in _CIGAR_RE.findall(self.cigar):
            n = int(num)
            if op in (b"M", b"=", b"X"):
                for _ in range(n):
                    q_ptr += 1
                    t_ptr += 1
                    if not found_first:
                        found_first = True
                        first_match = (t_ptr, q_ptr)
                    last_match = (t_ptr + 1, q_ptr + 1)
                    if t_ptr == window_ends[w]:
                        if found_first:
                            bps.append(first_match)
                            bps.append(last_match)
                        found_first = False
                        w += 1
            elif op == b"I":
                q_ptr += n
            elif op in (b"D", b"N"):
                for _ in range(n):
                    t_ptr += 1
                    if t_ptr == window_ends[w]:
                        if found_first:
                            bps.append(first_match)
                            bps.append(last_match)
                        found_first = False
                        w += 1
            # S/H/P: no coordinate movement (already folded into q_begin)

    def __repr__(self) -> str:  # pragma: no cover
        return (f"Overlap(q={self.q_name or self.q_id} "
                f"[{self.q_begin}:{self.q_end}] t={self.t_name or self.t_id} "
                f"[{self.t_begin}:{self.t_end}] strand={int(self.strand)})")

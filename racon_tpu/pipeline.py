"""Pipeline orchestrator: ingest -> window binning -> consensus -> stitch.

The Polisher mirrors the reference orchestrator semantics end to end
(reference: src/polisher.cpp:57-547):
  * extension-dispatched parsers and validation (polisher.cpp:85-135),
  * target-then-reads ingest with dedup of reads that are also targets
    (polisher.cpp:200-265),
  * overlap transmute + error/self filters and, in contig mode, keeping a
    single longest overlap per query run (polisher.cpp:285-351),
  * breaking-point computation (alignment for CIGAR-less formats),
  * per-target windows every ``window_length`` bases, layer assignment with
    the 2%-span and mean-quality filters (polisher.cpp:388-461),
  * stitching with ``LN:i``/``RC:i``/``XC:f`` tags (polisher.cpp:505-531).

The consensus itself is delegated to an engine: the batched TPU engine
(racon_tpu.poa.engine) by default, or the host oracle for verification.
"""

from __future__ import annotations

import enum
import sys
import threading
from typing import Dict, List, Optional, Tuple

from racon_tpu.core.overlap import Overlap
from racon_tpu.core.sequence import Sequence
from racon_tpu.core.window import Window, WindowType
from racon_tpu.io import parsers
from racon_tpu.obs.logger import Logger


class PolisherType(enum.Enum):
    kC = 0   # contig polishing
    kF = 1   # fragment (read) error correction


def create_polisher(sequences_path: str, overlaps_path: str, target_path: str,
                    type: PolisherType = PolisherType.kC,
                    window_length: int = 500, quality_threshold: float = 10.0,
                    error_threshold: float = 0.3, trim: bool = True,
                    match: int = 3, mismatch: int = -5, gap: int = -4,
                    num_threads: int = 1, engine: str = "auto",
                    tpu_align: bool = False,
                    band_width: int = 0, batch_size: int = 32,
                    stream: bool = False) -> "Polisher":
    """Factory with the reference's validation surface
    (reference: src/polisher.cpp:57-163)."""
    if not isinstance(type, PolisherType):
        raise RuntimeError(
            "[racon_tpu::create_polisher] error: invalid polisher type!")
    if window_length == 0:
        raise RuntimeError(
            "[racon_tpu::create_polisher] error: invalid window length!")
    for path, exts, kind in (
            (sequences_path, parsers.SEQUENCE_EXTENSIONS, "sequences"),
            (overlaps_path, parsers.OVERLAP_EXTENSIONS, "overlaps"),
            (target_path, parsers.SEQUENCE_EXTENSIONS, "target")):
        if not path.endswith(exts):
            raise RuntimeError(
                f"[racon_tpu::create_polisher] error: file {path} has "
                f"unsupported format extension (valid extensions: "
                f"{', '.join(exts)})!")
    return Polisher(sequences_path, overlaps_path, target_path, type,
                    window_length, quality_threshold, error_threshold, trim,
                    match, mismatch, gap, num_threads, engine, tpu_align,
                    band_width, batch_size, stream)


class Polisher:
    def __init__(self, sequences_path: str, overlaps_path: str,
                 target_path: str, type: PolisherType, window_length: int,
                 quality_threshold: float, error_threshold: float, trim: bool,
                 match: int, mismatch: int, gap: int, num_threads: int,
                 engine: str = "auto", tpu_align: bool = False,
                 band_width: int = 0, batch_size: int = 32,
                 stream: bool = False):
        self.sequences_path = sequences_path
        self.overlaps_path = overlaps_path
        self.target_path = target_path
        self.type = type
        self.window_length = window_length
        self.quality_threshold = quality_threshold
        self.error_threshold = error_threshold
        self.trim = trim
        self.match = match
        self.mismatch = mismatch
        self.gap = gap
        self.num_threads = num_threads
        self.engine_name = engine
        self.tpu_align = tpu_align
        self.band_width = band_width
        self.batch_size = batch_size
        self.stream = stream
        self._stream_overlaps: Optional[List[Overlap]] = None
        self._id_to_first_window_id: List[int] = []

        self.sequences: List[Sequence] = []
        self.windows: List[Window] = []
        self.targets_size = 0
        self.targets_coverages: List[int] = []
        self.dummy_quality = b"!" * window_length
        self.logger = Logger()

    # ------------------------------------------------------------------ #
    # ingest
    # ------------------------------------------------------------------ #

    def _prewarm_device(self) -> None:
        """Start accelerator backend attach concurrently with ingest/align.

        The reference's GPU path constructs its CUDA batches while the
        host still owns the align phase (src/cuda/cudapolisher.cpp:80-118);
        here the analogous cold cost is the JAX backend init (through a
        remote-TPU tunnel it can dwarf the whole host phase), so kick it
        off on a daemon thread the moment initialize() starts.  polish()
        then finds the backend live.  Host-only engines must never touch
        backend init (CLAUDE.md invariant) — gated on the engine name.
        """
        if self.engine_name not in ("tpu", "auto"):
            return

        def _attach():
            try:
                import jax
                jax.devices()
            except Exception:
                pass

        self._prewarm_thread = threading.Thread(
            target=_attach, daemon=True, name="racon-tpu-prewarm")
        self._prewarm_thread.start()

    def initialize(self) -> None:
        if self.windows:
            print("[racon_tpu::Polisher.initialize] warning: "
                  "object already initialized!", file=sys.stderr)
            return

        self.logger.reset()
        self._prewarm_device()
        self.sequences = parsers.parse_sequences(self.target_path)
        self.targets_size = len(self.sequences)
        if self.targets_size == 0:
            raise RuntimeError("[racon_tpu::Polisher.initialize] error: "
                               "empty target sequences set!")

        name_to_id: Dict[str, int] = {}
        id_to_id: Dict[int, int] = {}
        for i, t in enumerate(self.sequences):
            name_to_id[t.name + "t"] = i
            id_to_id[i << 1 | 1] = i

        has_name = [True] * self.targets_size
        self.logger.log("[racon_tpu::Polisher.initialize] loaded target sequences")

        # reads in 1 GiB chunks, deduping those that are also targets
        # (reference: src/polisher.cpp:226-265, kChunkSize polisher.cpp:30)
        sequences_size = 0
        total_sequences_length = 0
        for chunk in parsers.iter_sequence_chunks(self.sequences_path):
            for r in chunk:
                total_sequences_length += len(r.data)
                tkey = r.name + "t"
                if tkey in name_to_id:
                    tid = name_to_id[tkey]
                    if (len(r.data) != len(self.sequences[tid].data) or
                            len(r.quality) !=
                            len(self.sequences[tid].quality)):
                        raise RuntimeError(
                            "[racon_tpu::Polisher.initialize] error: "
                            f"duplicate sequence {r.name} with unequal data")
                    name_to_id[r.name + "q"] = tid
                    id_to_id[sequences_size << 1 | 0] = tid
                else:
                    idx = len(self.sequences)
                    name_to_id[r.name + "q"] = idx
                    id_to_id[sequences_size << 1 | 0] = idx
                    self.sequences.append(r)
                sequences_size += 1
        if sequences_size == 0:
            raise RuntimeError("[racon_tpu::Polisher.initialize] error: "
                               "empty sequences set!")

        has_name += [False] * (len(self.sequences) - len(has_name))
        window_type = (WindowType.NGS
                       if total_sequences_length / sequences_size <= 1000
                       else WindowType.TGS)
        self.logger.log("[racon_tpu::Polisher.initialize] loaded sequences")

        # overlaps in 1 GiB chunks, transmute/filter interleaved with
        # parsing so raw records never accumulate (reference:
        # src/polisher.cpp:311-349); the kC longest-per-query dedup run
        # stays open across chunk boundaries exactly like the reference's
        # remove_invalid_overlaps calls per chunk
        overlaps: List[Overlap] = []
        run: List[Overlap] = []

        def flush_run():
            kept = [o for o in run
                    if o.error <= self.error_threshold and o.q_id != o.t_id]
            if not kept:
                return
            if self.type == PolisherType.kC:
                # earliest overlap of maximal length wins
                # (reference: src/polisher.cpp:295-307)
                best = kept[0]
                for o in kept[1:]:
                    if o.length > best.length:
                        best = o
                overlaps.append(best)
            else:
                overlaps.extend(kept)

        for chunk in parsers.iter_overlap_chunks(self.overlaps_path):
            for o in chunk:
                o.transmute(self.sequences, name_to_id, id_to_id)
                if not o.is_valid:
                    continue
                if run and run[-1].q_id != o.q_id:
                    flush_run()
                    run = []
                run.append(o)
        flush_run()

        if not overlaps:
            raise RuntimeError("[racon_tpu::Polisher.initialize] error: "
                               "empty overlap set!")

        has_data = [i < self.targets_size for i in range(len(self.sequences))]
        has_reverse_data = [False] * len(self.sequences)
        for o in overlaps:
            if o.strand:
                has_reverse_data[o.q_id] = True
            else:
                has_data[o.q_id] = True

        self.logger.log("[racon_tpu::Polisher.initialize] loaded overlaps")

        for i, s in enumerate(self.sequences):
            s.transmute(has_name[i], has_data[i], has_reverse_data[i])

        if self._streaming_enabled():
            # streamed mode: breaking-point alignment and layer assignment
            # move into polish(), where they overlap device consensus of
            # the completed window frontier — windows (backbones) are
            # built now so len(self.windows) is meaningful to callers
            self._build_windows(window_type)
            self._stream_overlaps = overlaps
            self.logger.log("[racon_tpu::Polisher.initialize] prepared "
                            "windows (align streams into polish)")
            return

        self._find_overlap_breaking_points(overlaps)
        self.logger.log("[racon_tpu::Polisher.initialize] aligned overlaps")

        self._build_windows(window_type)

        # layer assignment (reference: src/polisher.cpp:407-461)
        for o in overlaps:
            self._assign_overlap(o)

        self.logger.log("[racon_tpu::Polisher.initialize] "
                        "transformed data into windows")

    def _streaming_enabled(self) -> bool:
        """Streamed align->consensus overlap: on when requested (ctor flag
        or RACON_TPU_STREAM=1) and running single-host — multi-host shards
        windows globally, which needs the full phased window set up
        front.  The CLI requests it for device-backed engines.  Device
        alignment (--tpu-align) is a phased-only feature: its batched
        kernel wants the whole overlap set at once, so it wins over
        streaming rather than being silently skipped."""
        import os
        env = os.environ.get("RACON_TPU_STREAM", "")
        if env == "0" or (not self.stream and env != "1"):
            return False
        if self.tpu_align or os.environ.get("RACON_TPU_ALIGN") == "1":
            return False
        from racon_tpu.parallel import mesh as M
        return M.process_shard()[1] == 1

    def _build_windows(self, window_type: WindowType) -> None:
        # windows (reference: src/polisher.cpp:388-403)
        id_to_first_window_id = [0] * (self.targets_size + 1)
        for i in range(self.targets_size):
            data = self.sequences[i].data
            quality = self.sequences[i].quality
            k = 0
            for j in range(0, len(data), self.window_length):
                length = min(j + self.window_length, len(data)) - j
                q = (quality[j:j + length] if quality
                     else self.dummy_quality[:length])
                self.windows.append(Window(i, k, window_type,
                                           data[j:j + length], q))
                k += 1
            id_to_first_window_id[i + 1] = id_to_first_window_id[i] + k
        self._id_to_first_window_id = id_to_first_window_id
        self.targets_coverages = [0] * self.targets_size

    def _assign_overlap(self, o: Overlap) -> None:
        """Count coverage and add every breaking-point pair of one overlap
        as window layers (reference: src/polisher.cpp:407-461)."""
        self.targets_coverages[o.t_id] += 1
        for j in range(0, len(o.breaking_points), 2):
            self._assign_layer_pair(o, j)

    def _assign_layer_pair(self, o: Overlap, j: int) -> None:
        """Add breaking-point pair j of overlap o as a window layer,
        applying the 2%-span and mean-quality filters
        (reference: src/polisher.cpp:412-461)."""
        w = self.window_length
        bps = o.breaking_points
        if bps[j + 1][1] - bps[j][1] < 0.02 * w:
            return
        sequence = self.sequences[o.q_id]
        if sequence.quality or sequence.reverse_quality:
            quality = (sequence.reverse_quality if o.strand
                       else sequence.quality)
            # vectorized mean-phred filter (no per-base Python loop; same
            # integer arithmetic as the reference, src/polisher.cpp:424-437)
            import numpy as _np
            span = bps[j + 1][1] - bps[j][1]
            qsum = int(_np.frombuffer(
                quality, _np.uint8
            )[bps[j][1]:bps[j + 1][1]].sum(dtype=_np.int64)) \
                - 33 * span
            if qsum / span < self.quality_threshold:
                return

        window_id = (self._id_to_first_window_id[o.t_id] + bps[j][0] // w)
        window_start = (bps[j][0] // w) * w
        data = (sequence.reverse_complement if o.strand
                else sequence.data)[bps[j][1]:bps[j + 1][1]]
        qual_src = (sequence.reverse_quality if o.strand
                    else sequence.quality)
        qual = qual_src[bps[j][1]:bps[j + 1][1]] if qual_src else None
        self.windows[window_id].add_layer(
            data, qual,
            bps[j][0] - window_start,
            bps[j + 1][0] - window_start - 1)

    def _cigarless_pairs(self, overlaps: List[Overlap]):
        """Overlaps lacking a CIGAR and their strand-aware (query, target)
        byte slices for the batched aligner (reference: the per-overlap
        slicing in src/overlap.cpp:192-224)."""
        need = [o for o in overlaps if not o.cigar]
        pairs = []
        for o in need:
            seq = self.sequences[o.q_id]
            if not o.strand:
                q = seq.data[o.q_begin:o.q_end]
            else:
                q = seq.reverse_complement[
                    o.q_length - o.q_end:o.q_length - o.q_begin]
            t = self.sequences[o.t_id].data[o.t_begin:o.t_end]
            pairs.append((q, t))
        return need, pairs

    def _find_overlap_breaking_points(self, overlaps: List[Overlap]) -> None:
        import os

        from racon_tpu.align.aligner import get_aligner
        aligner = get_aligner(self.num_threads)
        # batch the CIGAR-less overlaps through the aligner
        need, pairs = self._cigarless_pairs(overlaps)
        if need and hasattr(aligner, "align_batch"):
            cigars = [None] * len(pairs)
            if self.tpu_align or os.environ.get("RACON_TPU_ALIGN") == "1":
                # opt-in device alignment (SURVEY.md §7 step 6; like the
                # reference GPU aligner, ties may differ from the host
                # path — src/cuda tests carry divergent goldens)
                try:
                    from racon_tpu.align.pallas_align import PallasAligner
                    pa = PallasAligner(num_threads=self.num_threads,
                                       band_width=self.band_width)
                    cigars = pa.align_batch(pairs)
                    print(f"[racon_tpu::Polisher] tpu-align: "
                          f"{pa.stats['device']} on device, "
                          f"{pa.stats['fallback']} host fallback",
                          file=sys.stderr)
                except Exception as e:  # pragma: no cover
                    print(f"[racon_tpu::Polisher] warning: tpu-align "
                          f"unavailable ({e}); using host aligner",
                          file=sys.stderr)
            host_idx = [i for i, c in enumerate(cigars) if c is None]
            if host_idx:
                host = aligner.align_batch([pairs[i] for i in host_idx])
                for i, c in zip(host_idx, host):
                    cigars[i] = c
            for o, c in zip(need, cigars):
                o.cigar = c
        bar_i = 0
        for k, o in enumerate(overlaps):
            o.find_breaking_points(self.sequences, self.window_length,
                                   aligner=aligner)
            while (k + 1) * 20 > (bar_i + 1) * len(overlaps):
                bar_i += 1
                self.logger.bar("[racon_tpu::Polisher.initialize] "
                                "aligning overlaps")

    # ------------------------------------------------------------------ #
    # consensus + stitch
    # ------------------------------------------------------------------ #

    def _make_engine(self):
        # the prewarm thread overlaps backend attach with ingest/align,
        # but it must never race engine construction/compiles on another
        # thread (concurrent backend init + compile in one process is the
        # kind of jax-internal race that crashes natively) — join it here;
        # on a real TPU this costs nothing polish() wouldn't pay anyway
        t = getattr(self, "_prewarm_thread", None)
        if t is not None:
            t.join()
            self._prewarm_thread = None
        name = self.engine_name
        if name == "auto":
            try:
                import jax
                name = "tpu"
            except Exception:  # pragma: no cover
                name = "oracle"
        if name == "tpu":
            try:
                from racon_tpu.poa.batched import BatchedPOAEngine
                return BatchedPOAEngine(self.match, self.mismatch, self.gap,
                                        batch_size=self.batch_size,
                                        num_threads=self.num_threads)
            except Exception as e:  # pragma: no cover
                # degrade to the fastest host engine (the C++ oracle),
                # mirroring the reference's GPU->CPU fallback tier —
                # the NumPy oracle is the last resort below
                print(f"[racon_tpu::Polisher.polish] warning: TPU engine "
                      f"unavailable ({e}); falling back to the native "
                      f"host engine", file=sys.stderr)
                name = "native"
        if name == "native":
            try:
                from racon_tpu.poa.native_engine import NativePOAEngine
                return NativePOAEngine(self.match, self.mismatch, self.gap,
                                       self.num_threads)
            except Exception as e:  # pragma: no cover - no compiler
                print(f"[racon_tpu::Polisher.polish] warning: native "
                      f"engine unavailable ({e}); falling back to the "
                      f"NumPy oracle", file=sys.stderr)
        from racon_tpu.poa.oracle_engine import OraclePOAEngine
        return OraclePOAEngine(self.match, self.mismatch, self.gap)

    def polish(self, drop_unpolished_sequences: bool = True) -> List[Sequence]:
        from racon_tpu.obs.profiler import Meter, device_trace

        if getattr(self, "_poisoned", False):
            raise RuntimeError(
                "[racon_tpu::Polisher.polish] error: a previous streamed "
                "polish failed mid-run (window layers are partially "
                "assigned); recreate the polisher to retry")
        engine = self._make_engine()
        if hasattr(engine, "progress"):
            bar_state = [0]

            def on_progress(done, total):
                while done * 20 > (bar_state[0] + 1) * total:
                    bar_state[0] += 1
                    self.logger.bar("[racon_tpu::Polisher.polish] "
                                    "generating consensus")

            engine.progress = on_progress
        meter = Meter("polish")
        with device_trace():
            if self._stream_overlaps is not None:
                results = self._polish_streamed(engine)
            else:
                results = self._polish_windows_sharded(engine)
        meter.add(len(results), sum(len(c) for c, _ in results))
        meter.report()
        stats = getattr(engine, "stats", None)
        if stats and (stats.get("host_assist") or stats.get("fallback")):
            print(f"[racon_tpu::Polisher.polish] engine split: "
                  f"{stats.get('device', 0)} device, "
                  f"{stats.get('host_assist', 0)} host-assist, "
                  f"{stats.get('fallback', 0)} fallback, "
                  f"{stats.get('trivial', 0)} trivial", file=sys.stderr)

        dst: List[Sequence] = []
        polished_data = bytearray()
        num_polished_windows = 0

        for i, window in enumerate(self.windows):
            consensus, polished = results[i]
            num_polished_windows += 1 if polished else 0
            polished_data += consensus

            if i == len(self.windows) - 1 or self.windows[i + 1].rank == 0:
                polished_ratio = num_polished_windows / (window.rank + 1)
                if not drop_unpolished_sequences or polished_ratio > 0:
                    tags = "r" if self.type == PolisherType.kF else ""
                    tags += f" LN:i:{len(polished_data)}"
                    tags += f" RC:i:{self.targets_coverages[window.id]}"
                    tags += f" XC:f:{polished_ratio:.6f}"
                    dst.append(Sequence(
                        self.sequences[window.id].name + tags,
                        bytes(polished_data)))
                num_polished_windows = 0
                polished_data = bytearray()

        self.logger.log("[racon_tpu::Polisher.polish] generated consensus")
        # cumulative wall time over every logged phase, printed at the end
        # of the run (reference: ~Polisher, src/polisher.cpp:186-188)
        self.logger.total("[racon_tpu::Polisher.] total =")
        self.windows = []
        self.sequences = []
        return dst

    def _polish_streamed(self, engine):
        """Streamed align->consensus overlap (single host).

        A producer thread computes breaking points in (t_id, t_begin)
        order — the alignment itself is native C++ and releases the GIL —
        while this thread polishes the completed window frontier: window
        ``r`` of target ``t`` can gain no further layers once every
        remaining unaligned overlap of ``t`` starts past its end, so
        completed windows stream to the engine while later overlaps are
        still aligning.  The reference runs these as strictly sequential
        phases (src/polisher.cpp:384, :490); overlapping them hides most
        of the align phase behind device consensus.

        Bit-identity is preserved by construction: each window's layer
        contributions are buffered as (overlap_index, pair_index) and
        applied in sorted order at completion, which replays the phased
        path's exact add order (the replicated unstable layer sort is
        input-order-sensitive)."""
        import queue as _queue

        # per-segment engine calls would each report their own total;
        # this path drives the progress bar itself
        if hasattr(engine, "progress"):
            engine.progress = None
        overlaps = self._stream_overlaps
        self._stream_overlaps = None
        w = self.window_length
        first_win = self._id_to_first_window_id
        n_win = len(self.windows)
        # per-window buffered contributions: (overlap idx, pair idx)
        pending: List[List[Tuple[int, int]]] = [[] for _ in range(n_win)]
        ready: "_queue.Queue[int]" = _queue.Queue()
        order = sorted(range(len(overlaps)),
                       key=lambda k: (overlaps[k].t_id, overlaps[k].t_begin))
        # adaptive producer granularity: 512 amortizes the native batch
        # call at genome scale, but a small input (lambda: 181 overlaps)
        # must still release windows in several waves or nothing overlaps
        ALIGN_BATCH = max(32, min(512, len(order) // 8))
        err: List[BaseException] = []

        def _upto(o: Overlap) -> int:
            # first global window id this overlap can still touch: windows
            # of earlier targets are covered by first_win; within the
            # target, breaking points satisfy t >= o.t_begin, so windows
            # with rank < t_begin // w are out of reach
            return min(first_win[o.t_id] + o.t_begin // w,
                       first_win[o.t_id + 1])

        def _producer() -> None:
            try:
                from racon_tpu.align.aligner import get_aligner
                aligner = get_aligner(self.num_threads)
                done_upto = 0
                for s in range(0, len(order), ALIGN_BATCH):
                    batch = order[s:s + ALIGN_BATCH]
                    need, pairs = self._cigarless_pairs(
                        [overlaps[k] for k in batch])
                    if need and hasattr(aligner, "align_batch"):
                        for o, c in zip(need, aligner.align_batch(pairs)):
                            o.cigar = c
                    for k in batch:
                        o = overlaps[k]
                        o.find_breaking_points(self.sequences, w,
                                               aligner=aligner)
                        self.targets_coverages[o.t_id] += 1
                        bps = o.breaking_points
                        for j in range(0, len(bps), 2):
                            wid = first_win[o.t_id] + bps[j][0] // w
                            pending[wid].append((k, j))
                    nxt = s + ALIGN_BATCH
                    new_upto = (n_win if nxt >= len(order)
                                else _upto(overlaps[order[nxt]]))
                    for wid in range(done_upto, new_upto):
                        ready.put(wid)
                    done_upto = new_upto
                for wid in range(done_upto, n_win):
                    ready.put(wid)
            except BaseException as e:  # pragma: no cover - surfaced below
                err.append(e)
            finally:
                ready.put(-1)

        producer = threading.Thread(target=_producer, daemon=True,
                                    name="racon-stream-align")
        producer.start()
        try:
            return self._stream_consume(engine, overlaps, pending, ready,
                                        producer, err, n_win)
        except BaseException:
            # layer assignment is partially applied: a retried polish()
            # must not silently run the phased path on half-built windows
            self._poisoned = True
            raise

    def _stream_consume(self, engine, overlaps, pending, ready, producer,
                        err, n_win: int):
        import queue as _queue

        results: List = [None] * n_win
        # segments big enough that the engine's depth sort still forms
        # near-homogeneous chunks, small enough to start the device early
        segment_size = max(4 * getattr(engine, "batch_size", 32), 64)
        seg: List[int] = []
        done_ct = 0
        bar_i = 0

        bs = max(1, getattr(engine, "batch_size", 32) or 32)
        # engines with the streaming session API keep launched chunks in
        # flight ACROSS submits (no per-segment launch->collect barrier);
        # legacy engines fall back to one polish_windows call per segment
        session = hasattr(engine, "stream_begin")
        if session:
            engine.stream_begin(self.trim)
            submitted: List[int] = []

        def _consume(wid: int) -> None:
            for k, j in sorted(pending[wid]):
                self._assign_layer_pair(overlaps[k], j)
            pending[wid] = []
            seg.append(wid)

        def _flush(n: int) -> None:
            nonlocal done_ct, bar_i
            take, rest = seg[:n], seg[n:]
            if session:
                engine.stream_submit([self.windows[i] for i in take])
                submitted.extend(take)
            else:
                rs = engine.polish_windows([self.windows[i] for i in take],
                                           self.trim)
                for i, r in zip(take, rs):
                    results[i] = r
            done_ct += len(take)
            seg[:] = rest
            while done_ct * 20 > (bar_i + 1) * n_win:
                bar_i += 1
                self.logger.bar("[racon_tpu::Polisher.polish] "
                                "aligning + generating consensus")

        live = True
        while live:
            wid = ready.get()
            if wid < 0:
                live = False
            else:
                _consume(wid)
            while live:  # drain without blocking
                try:
                    wid = ready.get_nowait()
                except _queue.Empty:
                    break
                if wid < 0:
                    live = False
                else:
                    _consume(wid)
            if not seg:
                continue
            if not live or len(seg) >= segment_size:
                _flush(len(seg))
            elif len(seg) >= bs and ready.empty():
                # nothing else ready right now and the device would
                # otherwise idle: ship whole chunks (launches are async
                # under the session API), keep the ragged tail buffered
                # (segment boundaries cannot change output — windows are
                # independent once their layer adds are replayed)
                _flush(len(seg) // bs * bs)
        if session:
            rs = engine.stream_end()
            for i, r in zip(submitted, rs):
                results[i] = r
        producer.join()
        if err:
            raise err[0]
        return results

    def _polish_windows_sharded(self, engine):
        """Polish this host's window shard and all-gather the rest.

        Multi-host data parallelism over DCN (replaces the reference
        wrapper's *sequential* target chunking, scripts/racon_wrapper.py:
        86-148): windows are dealt round-robin in depth-sorted order
        across JAX processes (balances total layer work per host), each
        host polishes its shard on its local chips,
        and the consensus bytes are all-gathered so every host stitches
        the identical full output."""
        from racon_tpu.parallel import mesh as M

        shard_id, num_shards = M.process_shard()
        if num_shards == 1:
            return engine.polish_windows(self.windows, self.trim)

        # deal windows in depth-sorted order: coverage (layer count)
        # varies wildly across a genome, so plain index round-robin can
        # skew host load — sorting first spreads heavy and light windows
        # evenly, and each host's engine re-sorts its shard by depth
        # anyway for chunk homogeneity
        order = sorted(range(len(self.windows)),
                       key=lambda i: len(self.windows[i].sequences))
        mine = [i for pos, i in enumerate(order)
                if pos % num_shards == shard_id]
        local = engine.polish_windows([self.windows[i] for i in mine],
                                      self.trim)
        # polished flag rides as a one-byte prefix
        pieces = [(i, (b"\x01" if pol else b"\x00") + cons)
                  for i, (cons, pol) in zip(mine, local)]
        gathered = M.allgather_bytes(pieces, shard_id, num_shards)
        if len(gathered) != len(self.windows):  # pragma: no cover
            missing = len(self.windows) - len(gathered)
            raise RuntimeError(f"allgather lost {missing} windows")
        return [(gathered[i][1:], gathered[i][0] == 1)
                for i in range(len(self.windows))]

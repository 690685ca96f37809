"""BatchedPOAEngine: megabatch scheduler feeding the JAX POA engine.

The TPU analog of the reference's CUDA batch scheduler
(reference: src/cuda/cudapolisher.cpp:226-345): windows are packed into
dense, depth-bucketed megabatches with static shapes, the whole bucket runs
as one jitted program per depth bucket, and windows the device flags as
failed (capacity overflow) are re-polished on the host oracle — the same
fallback contract as the reference's GPU->CPU path
(src/cuda/cudapolisher.cpp:354-378).

Unlike the reference there is no mutex work queue: partitioning is static
(sorted by depth into power-of-two buckets) and the batch axis is sharded
over the device mesh for multi-chip runs (racon_tpu/parallel).
"""

from __future__ import annotations

import os
import sys
import threading
import time
from typing import List, Optional, Tuple

import numpy as np

from racon_tpu.core.window import (Window, WindowType, layer_order,
                                   trim_consensus)
from racon_tpu.poa.consensus_host import consensus_from_arrays
from racon_tpu.poa.graph import decode, encode
from racon_tpu.core.window import Window


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Depth is a grid dimension of the chunk kernel, so every distinct padded
# depth is a separate (minutes-long) compile.  Pad to a short ladder: at
# most ~10 shapes ever, and idle layer steps cost only the per-grid-step
# overhead (all phases no-op when the layer is inactive).
_DEPTH_LADDER = (8, 16, 24, 32, 48, 64, 96, 128, 192, 256)


def _depth_ladder(d: int) -> int:
    for v in _DEPTH_LADDER:
        if d <= v:
            return v
    return _round_up(d, 64)


# Core VMEM budget for the chunk kernel: the H scratch plus the
# double-buffered per-stream output blocks (fused_chunk
# vmem_stream_fixed_bytes) must fit in it; layer-tile input blocks are
# small enough to live in the reserve.  (Was a 14.8 MB H-only budget,
# calibrated at K<=2 where the fixed blocks were noise.)
VMEM_BUDGET = int(15.2 * (1 << 20))

# Max layers per device window: node coverage is a 16-bit packed field in
# the chunk kernel's state table (int16 on download), so a node touched by
# every layer must stay < 2^15.  Deeper windows (absurd coverage; the
# reference GPU path caps depth at 200, src/cuda/cudapolisher.cpp:226)
# fall back to the host oracle, which has no cap.
DEPTH_CAP = 30000


class BatchedPOAEngine:
    """Polishes windows with the batched JAX POA engine."""

    def __init__(self, match: int, mismatch: int, gap: int,
                 batch_size: int = 32, p_cap: int = 12,
                 node_factor: float = 3.5, mesh=None,
                 use_pallas: Optional[bool] = None,
                 mode: Optional[str] = None, num_threads: int = 4,
                 devices=None, interleave: Optional[int] = None):
        import os
        self.match = match
        self.num_threads = max(1, num_threads)
        self.mismatch = mismatch
        self.gap = gap
        self.batch_size = batch_size
        self.p_cap = p_cap
        if interleave is None:
            interleave = int(os.environ.get("RACON_TPU_K", "4"))
        # K window streams per grid step share one stacked vector chain in
        # the DP (fused_chunk.py dp_tail).  Default 4 (round 4): with the
        # input-aware SMEM model and per-chunk sub_l rungs the production
        # scheduler compiles and runs K=4 at lambda scale (sub_l=5,
        # band=3: 46.5 w/s vs 43.6 at K=3, bit-identical, fallback=0,
        # 2026-08-19); the per-rung clamp steps K down automatically
        # wherever 4 streams exceed the budget (e.g. sub_l>=6 shapes).
        # Per-batch the scheduler clamps K to the SMEM budget
        # (fused_chunk.smem_stream_bytes); the launch pads the batch up
        # to a multiple of K, so K need not divide batch_size.
        self.interleave = max(1, interleave)
        # banded DP row width in sublanes; "auto" (default) keeps full
        # rows while they fit VMEM at full node capacity and otherwise
        # bands to the widest row that fits (band-edge windows fail to
        # the host, fused_chunk.py code 5 — banding never changes output)
        band_env = os.environ.get("RACON_TPU_BAND", "auto")
        self.band_sub = None if band_env == "auto" else int(band_env)
        self.node_factor = node_factor
        self.mesh = mesh
        if mode is None:
            if use_pallas is not None:
                mode = "pallas" if use_pallas else "xla"
            else:
                # the fused kernel (DP + traceback + graph update in one
                # Pallas call) runs on real TPU backends; the XLA path is
                # the portable fallback (CPU tests, virtual-device dry runs)
                import jax
                mode = "fused" if jax.default_backend() != "cpu" else "xla"
        assert mode in ("fused", "pallas", "xla")
        self.mode = mode
        self.use_pallas = mode == "pallas"
        if devices is None:
            # multi-chip: independent chunks round-robin over the local
            # devices — the TPU-native form of the reference's N batches x
            # M GPUs scheduling (src/cuda/cudapolisher.cpp:165-199), with
            # static placement instead of a mutex queue and zero ICI
            # collectives (windows are embarrassingly parallel)
            import jax
            devices = jax.local_devices()
        self.devices = list(devices)
        self._next_device = 0
        self.progress = None   # optional callable(done_windows, total)
        # device consensus (fused kernel phase 7): heaviest_bundle runs
        # on the resident graph and only the consensus rows download —
        # ~25x fewer bytes + 4 fewer RPCs per chunk, bit-identical
        # (code-6 windows fall back to the host oracle).  A compile
        # rejection degrades this off before K (see _launch_with_degrade).
        self.device_consensus = (
            os.environ.get("RACON_TPU_DEVICE_CONS", "1") != "0")
        self.stats = {"windows": 0, "device": 0, "fallback": 0, "trivial": 0}

    # ------------------------------------------------------------------ #
    # streaming session API
    #
    # polish_windows is a one-submit session; the streamed pipeline
    # (pipeline._polish_streamed) instead opens a session and submits
    # window segments as the aligner completes them.  Chunks launched by
    # earlier submits stay in flight across submit calls, so the device
    # pipeline never drains between segments — the round-3 streamed path
    # called polish_windows per segment and paid a synchronous
    # launch->collect barrier each time (BENCH_r03: 54.8 s streamed vs
    # 11.7 s phased on the same run).
    # ------------------------------------------------------------------ #

    def polish_windows(self, windows: List[Window],
                       trim: bool) -> List[Tuple[bytes, bool]]:
        self.stream_begin(trim)
        self.stream_submit(windows)
        return self.stream_end()  # type: ignore[return-value]

    def stream_begin(self, trim: bool) -> None:
        """Open a streaming polish session.

        Results are returned by stream_end in submission order; all
        device work launched by stream_submit stays asynchronous until
        the in-flight window exceeds the pipeline depth."""
        if getattr(self, "_st", None) is not None:
            raise RuntimeError("stream session already open")
        self._st = {
            "trim": trim,
            "windows": [],       # all submitted windows, in order
            "results": [],       # parallel to windows
            "inflight": [],      # launched, uncollected (chunk, packed)
            "oversize": [],      # global idxs routed to host fallback
            "eligible_all": [],  # global idxs that went to device/assist
            "assist": [],        # assist worker threads to join
        }

    def stream_backlog(self) -> int:
        """Launched-but-uncollected chunks (device-side queue depth)."""
        st = getattr(self, "_st", None)
        return len(st["inflight"]) if st else 0

    def stream_submit(self, windows: List[Window]) -> None:
        st = self._st
        base = len(st["windows"])
        st["windows"].extend(windows)
        st["results"].extend([None] * len(windows))
        allw: List[Window] = st["windows"]
        results: List[Optional[Tuple[bytes, bool]]] = st["results"]
        trim: bool = st["trim"]
        self.stats["windows"] += len(windows)

        # per-kernel sequence cap: the packed DP row holds L+1 <= 1024
        # positions (reference GPU precedent: cudapoa BatchConfig max seq
        # len 1023, src/cuda/cudabatch.cpp); longer layers -> host fallback
        if self.mode in ("fused", "pallas"):
            from racon_tpu.poa.fused_chunk import LANE, MAX_SUB
            l_cap = MAX_SUB * LANE - 1
        else:
            l_cap = 1 << 30

        eligible: List[int] = []
        for li, w in enumerate(windows):
            i = base + li
            if len(w.sequences) < 3:
                results[i] = (w.sequences[0], False)
                self.stats["trivial"] += 1
            elif (max(len(s) for s in w.sequences[1:]) > l_cap
                    or len(w.sequences) - 1 > DEPTH_CAP):
                # depth-capped windows ride the host oracle: per-node
                # coverage lives in a 16-bit packed field on device (and
                # was always downcast to int16 on download)
                st["oversize"].append(i)
            else:
                eligible.append(i)
        if not eligible:
            return
        st["eligible_all"].extend(eligible)

        max_backbone = max(len(allw[i].sequences[0]) for i in eligible)
        max_layer = max(max(len(s) for s in allw[i].sequences[1:])
                        for i in eligible)
        # L is capped at l_cap (= LP-1 on the kernel paths) so a window
        # admitted as eligible always fits the packed DP row; mode is a
        # local decision per call — never mutate self.mode, or one exotic
        # batch would demote every later polish_windows call
        L = min(_round_up(max(max_layer, 16), 128), l_cap)
        L0 = max_backbone
        N = _round_up(max(int(self.node_factor * max_backbone),
                          max_backbone + 256), 256)
        # shape high-water mark: streamed mode submits window segments,
        # and letting (L, N) float with each segment's max would compile a
        # fresh (minutes-long) program per distinct shape — grow-only
        # shapes keep later segments on the already-built program
        L = self._L_hwm = max(L, getattr(self, "_L_hwm", 0))
        N = self._N_hwm = max(N, getattr(self, "_N_hwm", 0))
        L0 = self._L0_hwm = max(L0, getattr(self, "_L0_hwm", 0))
        t_cap = N + L

        # node capacity on the fused path is bounded only by on-chip
        # memory (the DP cell carries no pred-rank payload); big windows
        # (w=1000-class) stay fused with full P (VERDICT round-1 item 5)
        # and windows outgrowing the VMEM-bounded N fail to the host
        mode = self.mode
        p_cap = self.p_cap
        k_eff, band_eff = 1, 0
        N0, sub_l = N, 0
        if mode == "fused":
            from racon_tpu.poa import fused_chunk as FC
            sub_l = -(-(L + 1) // 128)
            k_eff, band_eff, N = self._fused_plan(N0, p_cap, sub_l, L0)
            self.stats["k"] = k_eff
            self.stats["band"] = band_eff
            if not FC.check_capacity(N, self.match, self.mismatch, self.gap,
                                     L, sub_l):
                mode = "xla"
                print("[racon_tpu::BatchedPOAEngine] capacity check failed "
                      f"(N={N} L={L} scores=({self.match},{self.mismatch},"
                      f"{self.gap})); batch degrades to the XLA engine",
                      file=sys.stderr)
                self.stats["degraded"] = self.stats.get("degraded", 0) + 1

        # depth-homogeneous chunks: the compiled program shape is
        # (B, L, N) — independent of depth (layers are sliced dynamically
        # on device) — so no depth bucketing is needed at all; sorting by
        # depth and chunking consecutively makes every chunk run
        # ~min(depth)==max(depth) layer steps with no idle layer slots.
        # Secondary key: max layer length — the DP row width L is chosen
        # PER CHUNK from an even sub_l rung ladder (one long layer must
        # not force every chunk to a wide rung: K interleave streams are
        # SMEM-bounded and a wider rung can cost a whole stream, e.g.
        # lambda sub_l=4 fits K=4 but sub_l=6 only K=3), so clustering
        # similar lengths keeps most chunks on the narrow rung
        if mode == "fused":
            _wmax = {i: max(len(s) for s in allw[i].sequences[1:])
                     for i in eligible}
            eligible.sort(key=lambda i: (len(allw[i].sequences), _wmax[i]))
        else:
            eligible.sort(key=lambda i: len(allw[i].sequences))

        # Host-assist work stealing: while the device crunches a resident
        # chunk the host core is idle (one blocking RPC per chunk), so a
        # native C++ worker polishes windows from the SHALLOW end of the
        # same depth-sorted queue while the device consumes deepest-first
        # — bit-identical output, so mixing engines is free.  Giving the
        # host the cheap windows bounds the end-of-run straggle (the final
        # steal batch is the cheapest work in the queue); the device
        # starts on the deepest chunks, so the slowest device work gets
        # the longest assist overlap.  This inverts the reference's
        # heterogeneous fallback (src/cuda/cudapolisher.cpp:354-378): the
        # CPU is a proactive co-worker, not just a safety net.  Both
        # consumers steal through one cursor pair until they meet, which
        # auto-balances regardless of the per-window cost model.
        #
        # Default: on only when the host has spare cores.  On a 1-core
        # host the native worker starves the device feed loop (the tunnel
        # client is host-bound): measured 2026-08-18 on real TPU, lambda
        # K=2 warm ran 41.5 w/s device-only vs 30.1 w/s with assist.
        _assist_default = "1" if (os.cpu_count() or 1) > 1 else "0"
        _assist_env = os.environ.get("RACON_TPU_HOST_ASSIST",
                                     _assist_default)
        if _assist_env == "force":
            assist_on = bool(eligible)
        elif _assist_env in ("0", "") or mode != "fused":
            assist_on = False
        else:
            from racon_tpu.poa import fused_chunk as _FC
            assist_on = bool(eligible) and not _FC.INTERPRET
        if assist_on:
            try:
                from racon_tpu.native import rtlib as _assist_rtlib
            except Exception:  # pragma: no cover - no compiler available
                assist_on = False

        cursor_lock = threading.Lock()
        cursor = {"front": 0, "back": len(eligible)}

        def _take_front(n: int) -> List[int]:
            with cursor_lock:
                lo = cursor["front"]
                hi = min(lo + n, cursor["back"])
                cursor["front"] = hi
                return eligible[lo:hi]

        def _take_back(n: int) -> List[int]:
            with cursor_lock:
                hi = cursor["back"]
                lo = max(hi - n, cursor["front"])
                cursor["back"] = lo
                return eligible[lo:hi]

        def _assist_worker() -> None:
            # small steal batches bound the end-of-run straggle to a few
            # (shallow = cheap) windows while amortizing the ctypes call
            # overhead; the C++ worker releases the GIL so it runs during
            # device RPC waits
            while True:
                batch = _take_front(4)
                if not batch:
                    return
                try:
                    fb = _assist_rtlib.polish_windows(
                        [allw[i] for i in batch], self.match,
                        self.mismatch, self.gap, trim)
                except Exception:  # pragma: no cover - native call failed
                    return  # un-polished steals ride the final fallback
                for i, r in zip(batch, fb):
                    results[i] = r
                self.stats["host_assist"] = (
                    self.stats.get("host_assist", 0) + len(batch))

        if assist_on:
            t = threading.Thread(target=_assist_worker, daemon=True)
            t.start()
            st["assist"].append(t)

        # Pipeline: launch device work a few chunks ahead, collect behind —
        # the download + host consensus of chunk k overlaps the device
        # compute of chunks k+1.. (the reference overlaps CPU and GPU via
        # batch threads, src/cuda/cudapolisher.cpp:286-345; here JAX async
        # dispatch provides the overlap).  In a streaming session the
        # in-flight list persists across submits: the tail chunks of this
        # segment keep the device busy while the next segment aligns.
        in_flight: List = st["inflight"]
        MAX_IN_FLIGHT = max(3, 2 * len(self.devices))
        while True:
            chunk = _take_back(self.batch_size)
            if not chunk:
                break
            depth = max(len(allw[i].sequences) - 1 for i in chunk)
            L_c, t_cap_c, mode_c = L, t_cap, mode
            sub_c, k_c, band_c, N_c = sub_l, k_eff, band_eff, N
            if mode == "fused":
                # per-chunk L rung: the narrowest even sub_l (>= 4) that
                # holds the chunk's longest layer, independent of other
                # chunks' lengths — narrow-rung chunks keep the full K
                # interleave the SMEM budget allows them
                from racon_tpu.poa import fused_chunk as FC
                ml = max(_wmax[i] for i in chunk)
                raw = -(-(ml + 1) // FC.LANE)        # sublanes needed
                # integer rungs (floor 4): at lambda scale sub_l=5 is the
                # difference between K=4 fitting SMEM (1,017 KB) and not
                # (sub_l=6 K=4 = 1,044 KB > budget) — rounding rungs up
                # to even values costs the 4th stream on most chunks
                sub_c = min(max(4, raw), FC.MAX_SUB)
                L_c = sub_c * FC.LANE - 1
                k_c, band_c, N_c = self._fused_plan(N0, p_cap, sub_c, L0)
                t_cap_c = N_c + L_c
                self.stats["k"] = max(self.stats.get("k", 0), k_c)
                self.stats["band"] = band_c
                if not FC.check_capacity(N_c, self.match, self.mismatch,
                                         self.gap, L_c, sub_c):
                    mode_c = "xla"
                    L_c, t_cap_c, N_c = L, N + L, N
                    self.stats["degraded"] = (
                        self.stats.get("degraded", 0) + 1)
            packed, k_c, band_c, N_c = self._launch_with_degrade(
                chunk, allw, depth=depth, L=L_c, L0=L0, N=N_c, N0=N0,
                t_cap=t_cap_c, mode=mode_c, p_cap=p_cap, sub_l=sub_c,
                k_eff=k_c, band_eff=band_c)
            in_flight.append((chunk, packed))
            while len(in_flight) > MAX_IN_FLIGHT:
                c, p = in_flight.pop(0)
                self._collect_chunk(c, allw, results, trim, p)

    def stream_end(self) -> List[Tuple[bytes, bool]]:
        st = self._st
        self._st = None
        allw, results, trim = st["windows"], st["results"], st["trim"]
        for c, p in st["inflight"]:
            self._collect_chunk(c, allw, results, trim, p)
        for t in st["assist"]:
            t.join()
        if self.progress is not None:
            self.progress(len(allw), len(allw))

        # host fallback for oversize windows and device-flagged failures
        # (native C++ oracle; reference: src/cuda/cudapolisher.cpp:354-378)
        failed = st["oversize"] + [i for i in st["eligible_all"]
                                   if results[i] is None]
        if failed:
            self.stats["fallback"] += len(failed)
            try:
                from racon_tpu.native import rtlib
                fb = rtlib.polish_windows([allw[i] for i in failed],
                                          self.match, self.mismatch,
                                          self.gap, trim)
            except Exception:  # pragma: no cover - no compiler available
                from racon_tpu.poa.consensus import consensus_window
                fb = [consensus_window(allw[i], self.match, self.mismatch,
                                       self.gap, trim) for i in failed]
            for i, r in zip(failed, fb):
                results[i] = r
        return results  # type: ignore[return-value]

    # ------------------------------------------------------------------ #
    # launch planning
    # ------------------------------------------------------------------ #

    def _fused_plan(self, N0: int, p_cap: int, sub_l: int,
                    L0: int = 0) -> Tuple[int, int, int]:
        """(k_eff, band_eff, N) for one fused launch shape.

        Interleave streams are SMEM-bounded (each carries a private state
        table); K is clamped per batch, not failed.  The 16-bit row
        packing (fused_chunk cov+rep / letter pairs) keeps the table at
        24 padded rows for any p_cap in 5..12, so shrinking p_cap can no
        longer rescue K — the old p_cap=9 fallback (and its ~2% >9-pred
        host-fallback tax) is gone.  _k_compile_cap remembers, PER sub_l
        rung, a K the real Mosaic compiler rejected (the SMEM/VMEM budget
        model is an estimate) — never retry a K above it at that rung,
        but a rejection at a wide rung must not cap narrower rungs that
        genuinely fit more streams."""
        from racon_tpu.poa import fused_chunk as FC
        k_eff = min(self.interleave,
                    getattr(self, "_k_compile_cap", {}).get(
                        sub_l, self.interleave))
        while (k_eff > 1 and FC.smem_stream_bytes(N0, p_cap, sub_l, L0)
               * k_eff > FC.SMEM_BUDGET):
            k_eff -= 1
        band_eff, N = self._band_plan(N0, p_cap, sub_l, k_eff)
        return k_eff, band_eff, N

    def _band_plan(self, N0: int, p_cap: int, sub_l: int,
                   k_eff: int) -> Tuple[int, int]:
        """(band_eff, N) for a given K.

        The on-chip H matrix ((N+1) x rows x 512 B per stream x K
        streams) is VMEM-bounded: keep full rows if they fit at full
        node capacity, else band to the widest row that fits, else
        (forced band, or band floor reached) shrink N.  The budget
        charges the double-buffered per-stream output blocks first
        (state + noderow, ~0.8 MB/stream at lambda scale) — at K=4
        they push full H rows past the core limit on their own."""
        from racon_tpu.poa import fused_chunk as FC
        N = N0
        avail = VMEM_BUDGET - k_eff * FC.vmem_stream_fixed_bytes(N, p_cap)
        if self.band_sub is None:
            fit = avail // ((N + 1) * 512 * k_eff)
            band_eff = 0 if fit >= sub_l else max(int(fit), 2)
        else:
            band_eff = self.band_sub
        bs_eff = band_eff if 0 < band_eff < sub_l else sub_l
        while ((N + 1) * bs_eff * 512 * k_eff
               > VMEM_BUDGET - k_eff * FC.vmem_stream_fixed_bytes(
                   N, p_cap)) and N > 1024:
            N -= 256
        return band_eff, N

    @staticmethod
    def _is_transient_error(e: BaseException) -> bool:
        """Tunnel/backend blips to retry at the SAME config — never to be
        misread as Mosaic compile rejections (a degraded-and-capped K
        silently forfeits the interleave speedup for the whole run)."""
        msg = f"{type(e).__name__}: {e}"
        if "Mosaic" in msg or "RESOURCE_EXHAUSTED" in msg:
            return False
        return any(s in msg for s in (
            "TPU backend error", "Connection refused", "Connection reset",
            "UNAVAILABLE", "DEADLINE", "Socket closed",
            "failed to connect"))

    def _launch_with_degrade(self, chunk: List[int], windows: List[Window],
                             depth: int, L: int, L0: int, N: int, N0: int,
                             t_cap: int, mode: str, p_cap: int, sub_l: int,
                             k_eff: int, band_eff: int):
        """Launch one chunk; on failure retry transient errors once at the
        same config, then degrade K (recomputing the auto band and the
        VMEM N-shrink for the smaller K — a K=4-derived band is narrower
        than K=3's own auto band and would raise band-edge fallbacks).
        A K the budget model admits can still fail the real Mosaic
        compile (mirrors the reference's GPU-batch rejection -> retry
        contract); output is K-invariant so degrading only costs speed."""
        transient_left = 1
        while True:
            try:
                packed = self._launch_chunk(chunk, windows,
                                            B=len(chunk), D=depth, L=L,
                                            L0=L0, N=N, t_cap=t_cap,
                                            mode=mode, p_cap=p_cap,
                                            interleave=k_eff,
                                            band_sub=band_eff)
                return packed, k_eff, band_eff, N
            except Exception as e:
                transient = self._is_transient_error(e)
                if transient and transient_left:
                    transient_left -= 1
                    print("[racon_tpu::BatchedPOAEngine] transient backend "
                          f"error ({type(e).__name__}); retrying the same "
                          "launch", file=sys.stderr)
                    time.sleep(2.0)
                    continue
                if not transient and mode == "fused" and \
                        self.device_consensus:
                    # the phase-7 consensus code is the newest compile
                    # surface: shed it before sacrificing interleave
                    # streams (output is identical either way)
                    self.device_consensus = False
                    self.stats["cons_degraded"] = 1
                    print("[racon_tpu::BatchedPOAEngine] chunk launch "
                          f"failed ({type(e).__name__}); retrying with "
                          "device consensus off", file=sys.stderr)
                    continue
                if k_eff <= 1 or mode != "fused":
                    raise
                k_eff -= 1
                if not transient:
                    # persist the cap only for genuine compile rejections,
                    # keyed by the sub_l rung that failed
                    if not hasattr(self, "_k_compile_cap"):
                        self._k_compile_cap = {}
                    self._k_compile_cap[sub_l] = k_eff
                print("[racon_tpu::BatchedPOAEngine] chunk launch "
                      f"failed at K={k_eff + 1} "
                      f"(B={len(chunk)} D={depth} L={L} L0={L0} N={N} "
                      f"band={band_eff} p_cap={p_cap} t_cap={t_cap}): "
                      f"{type(e).__name__}: {str(e)[:400]}", file=sys.stderr)
                band_eff, N = self._band_plan(N0, p_cap, sub_l, k_eff)
                self.stats["k"] = k_eff
                self.stats["band"] = band_eff
                print(f"[racon_tpu::BatchedPOAEngine] retrying at K={k_eff} "
                      f"band={band_eff}", file=sys.stderr)

    # ------------------------------------------------------------------ #

    def _run_chunk(self, chunk: List[int], windows: List[Window], results,
                   trim: bool, B: int, D: int, L: int, L0: int, N: int,
                   t_cap: int) -> None:
        packed = self._launch_chunk(chunk, windows, B=B, D=D, L=L, L0=L0,
                                    N=N, t_cap=t_cap, mode=self.mode)
        self._collect_chunk(chunk, windows, results, trim, packed)

    def _launch_chunk(self, chunk: List[int], windows: List[Window],
                      B: int, D: int, L: int, L0: int, N: int,
                      t_cap: int, mode: Optional[str] = None,
                      p_cap: Optional[int] = None, interleave: int = 1,
                      band_sub: int = 0):
        """Build + dispatch the device program for one chunk; returns the
        (still device-resident) download dict.  Each chunk is placed whole
        on one local device, round-robin — computation follows placement,
        so chunks run concurrently across chips with no collectives."""
        import jax
        import jax.numpy as jnp
        from racon_tpu.poa import engine as E
        from racon_tpu.poa.graph import weights_from_quality

        t_pack0 = time.perf_counter()
        if mode is None:
            mode = self.mode
        if p_cap is None:
            p_cap = self.p_cap
        device = self.devices[self._next_device % len(self.devices)]
        self._next_device += 1
        put = lambda x: jax.device_put(jnp.asarray(x), device)

        # pad the batch to a fixed size for compile reuse, rounded up to a
        # multiple of the interleave so K need not divide batch_size (the
        # extra slots carry no active layers)
        Bp = -(-self.batch_size // max(interleave, 1)) * max(interleave, 1)
        backbone = np.full((Bp, L0), E.PAD_CODE, np.int32)
        backbone_w = np.zeros((Bp, L0), np.int32)
        backbone_len = np.zeros(Bp, np.int32)

        seq = np.full((D, Bp, L), E.PAD_CODE, np.int8)
        wts = np.zeros((D, Bp, L), np.int8)
        length = np.zeros((D, Bp), np.int32)
        begin = np.zeros((D, Bp), np.int32)
        end = np.zeros((D, Bp), np.int32)
        full = np.zeros((D, Bp), bool)
        active = np.zeros((D, Bp), bool)

        for b, i in enumerate(chunk):
            w = windows[i]
            bb = encode(w.sequences[0])
            backbone[b, :len(bb)] = bb
            backbone_w[b, :len(bb)] = weights_from_quality(
                w.qualities[0], len(bb))
            backbone_len[b] = len(bb)
            offset = int(0.01 * len(bb))

            order = layer_order(w)
            for d, k in enumerate(order):
                s = encode(w.sequences[k])
                seq[d, b, :len(s)] = s
                wts[d, b, :len(s)] = weights_from_quality(
                    w.qualities[k], len(s))
                length[d, b] = len(s)
                bg, en = w.positions[k]
                begin[d, b] = bg
                end[d, b] = en
                full[d, b] = bg < offset and en > len(bb) - offset
                active[d, b] = True

        # upload all layers once; the whole chunk (every window's full
        # layer stack) runs as ONE resident-state kernel launch; depth is
        # padded to a multiple of 8 so compile counts stay bounded
        if mode == "fused":
            from racon_tpu.poa import fused_chunk as FC
            sub_l = -(-(L + 1) // 128)
            Dp = _depth_ladder(D)
            metas = np.zeros((Dp, Bp, 8), np.int32)
            metas[:D, :, 0] = begin
            metas[:D, :, 1] = end
            metas[:D, :, 2] = full
            metas[:D, :, 3] = length
            metas[:D, :, 4] = active
            if Dp > D:
                pad = np.zeros((Dp - D, Bp, seq.shape[2]), seq.dtype)
                seq = np.concatenate([seq, pad + E.PAD_CODE], axis=0)
                wts = np.concatenate([wts, np.zeros_like(pad)], axis=0)
            # int8 tiles on the wire (the tunnel is bandwidth-limited;
            # polish_chunk widens to int32 on device): 4x fewer upload
            # bytes than the old astype(np.int32) host-side widening
            seq_t, wts_t = FC.pack_layer_tiles(seq, wts, sub_l)
            dev_cons = self.device_consensus
            # two uploads, not six: the tunnel charges ~27 ms per
            # transfer RPC and the launch loop serializes on them
            bundle = np.concatenate(
                [backbone.ravel(), backbone_w.ravel(), backbone_len,
                 metas.ravel()]).astype(np.int32)
            tiles = np.stack([seq_t, wts_t])
            t_put0 = time.perf_counter()
            st, nr = FC.polish_chunk_packed(
                put(bundle), put(tiles), n_cap=N,
                p_cap=p_cap, sub_l=sub_l, match=self.match,
                mismatch=self.mismatch, gap=self.gap, t_cap=t_cap,
                B=Bp, L0=L0, D=Dp,
                interpret=FC.INTERPRET, interleave=interleave,
                band_sub=band_sub, consensus=dev_cons)
            packed = (FC.pack_consensus_chunk(st) if dev_cons else
                      FC.pack_for_download_chunk(st, nr, p_cap=p_cap))
            # upload + dispatch time (device_put transfers + the jitted
            # launch), separated from host encode/pack — the two need
            # different fixes when they dominate (wire bytes vs Python)
            self.stats["t_put"] = (self.stats.get("t_put", 0.0)
                                   + time.perf_counter() - t_put0)
        else:
            state = E.init_graphs(put(backbone), put(backbone_w),
                                  put(backbone_len), N, self.p_cap)
            layers = E.LayerBatch(
                seq=put(seq.astype(np.int32)),
                weights=put(wts.astype(np.int32)),
                length=put(length), begin=put(begin),
                end=put(end), full=put(full), active=put(active))
            for d in range(D):
                state = E.add_layer_at(state, layers, d, match=self.match,
                                       mismatch=self.mismatch, gap=self.gap,
                                       t_cap=t_cap,
                                       use_pallas=self.use_pallas)
            packed = E.pack_for_download(state)
        # host-phase accounting (dispatch is async, so this is ~pure host
        # pack/encode time); on a 1-core host this bounds throughput
        self.stats["t_pack"] = (self.stats.get("t_pack", 0.0)
                                + time.perf_counter() - t_pack0)
        return packed

    def _collect_chunk(self, chunk: List[int], windows: List[Window],
                       results, trim: bool, packed) -> None:
        """Download one chunk's graphs and run host consensus/trim."""
        t0 = time.perf_counter()
        packed = {k: np.asarray(v) for k, v in packed.items()}
        t1 = time.perf_counter()
        self.stats["t_wait"] = self.stats.get("t_wait", 0.0) + t1 - t0
        if "consfused" in packed:
            from racon_tpu.poa import fused_chunk as FC
            packed = FC.unpack_consensus_chunk(packed["consfused"])
        failed = packed["failed"]
        for code in np.asarray(packed.get("failed_code", failed))[
                :len(chunk)]:
            if code:
                key = {1: "fail_nodes", 2: "fail_preds", 3: "fail_tb",
                       4: "fail_sat", 5: "fail_band",
                       6: "fail_cons"}.get(int(code), "fail_other")
                self.stats[key] = self.stats.get(key, 0) + 1
        n_nodes = packed["n_nodes"]
        Bp = failed.shape[0]
        dev_cons = "cons" in packed

        native = None
        if not dev_cons:
            skip = np.ones(Bp, np.uint8)
            for b, i in enumerate(chunk):
                if not failed[b]:
                    skip[b] = 0
            try:
                from racon_tpu.native import rtlib
                native = rtlib.consensus_batch(packed, skip,
                                               num_threads=self.num_threads)
            except Exception:  # pragma: no cover - no compiler available
                pass

        if self.progress is not None:
            done = (self.stats["device"] + self.stats["trivial"]
                    + self.stats.get("host_assist", 0) + len(chunk))
            self.progress(min(done, self.stats["windows"]),
                          self.stats["windows"])
        for b, i in enumerate(chunk):
            if failed[b]:
                continue  # -> oracle fallback
            if dev_cons:
                # kernel phase 7 lays the path out back-to-front ending
                # at column N: forward consensus = columns [Np1-len, Np1)
                Np1 = packed["cons"].shape[1]
                ln = int(packed["cons_len"][b])
                ccodes = packed["cons"][b, Np1 - ln:Np1]
                ccov = packed["cons_cov"][b, Np1 - ln:Np1].astype(np.int32)
                consensus = decode(ccodes)
            elif native is not None and native[b] is not None:
                consensus, ccov = native[b]
            else:
                ccodes, ccov = consensus_from_arrays(
                    packed["codes"][b], packed["pred"][b],
                    packed["pred_w"][b], packed["pred_cnt"][b],
                    packed["cov"][b], packed["order"][b],
                    packed["rank"][b], int(n_nodes[b]))
                consensus = decode(ccodes)
            w = windows[i]
            if w.type == WindowType.TGS and trim:
                consensus = trim_consensus(consensus, ccov,
                                           len(w.sequences), w.id, w.rank)
            results[i] = (consensus, True)
            self.stats["device"] += 1
        self.stats["t_consensus"] = (self.stats.get("t_consensus", 0.0)
                                     + time.perf_counter() - t1)

"""Pallas TPU kernel for batched pairwise alignment (the edlib/cudaaligner
role, reference: src/overlap.cpp:205-224 and src/cuda/cudaaligner.cpp).

Design (TPU-first, not a translation):

* **Banded anti-diagonal wavefront.**  Unit-cost edit DP over a band of
  W = 1024 offsets packed into one (8,128) int32 tile; the wavefront walks
  n+m anti-diagonals, the band center following the i = a*n/(n+m) line
  (band shifts by 0/1 per step, so the three recurrence inputs are static
  +-1 packed shifts of the two carried rows).  The compared sequence
  windows are carried tiles too, maintained incrementally with one scalar
  SMEM load per step — no gathers anywhere.

* **Snapshot captures instead of traceback.**  (Captures come in pairs
  (a0, a0+1): a diagonal move advances the anti-diagonal index by 2, so an
  optimal path may skip any single anti-diagonal, but must touch one of two
  consecutive ones.)  A full in-kernel traceback
  would serialize one vector->scalar readback per move (~60k moves for a
  30 kb overlap).  Instead the kernel copies the whole wavefront tile to a
  capture buffer every S anti-diagonals (a plain tile copy, zero per-step
  scalar traffic).  The backward pass does the same on the reversed pair
  at mirrored anti-diagonals, and a tiny XLA epilogue computes the optimal
  path's crossing cell on every captured anti-diagonal:
      cross(a0) = argmin_i fwd[a0][i] + bwd[n+m-a0][n-i].
  The host then aligns only the short segments between consecutive
  crossings (with the existing native O(ND) aligner) and concatenates the
  CIGARs — two passes of device DP plus O(S)-sized host alignments replace
  the O(n*m) host DP.

* **Fallback contract** mirrors the reference GPU aligner
  (src/cuda/cudaaligner.cpp:63-71): pairs that exceed the static caps, or
  whose captured crossings are inconsistent with the device edit distance
  (a sign the optimal path left the band), fall back to the host aligner.

Like the reference's GPU path (whose goldens diverge from the CPU's,
test/racon_test.cpp:297-507), segment-wise CIGARs may differ from the
host aligner's in tie choices; the device path is therefore opt-in
(engine="tpu-align") and validated by tolerance tests, while the default
path stays bit-reproducible on the host.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8                   # default band sublanes
LANE = 128
W_DEF = SUB * LANE        # default band width (offsets per anti-diagonal)
INF = 1 << 20
Q_PAD = 254               # padding codes: never equal
T_PAD = 255

# static problem caps (pairs beyond them go to the host aligner)
LQ_CAP = 24576
LT_CAP = 24576
S_CAP = 2048              # capture every S anti-diagonals
NC_CAP = (LQ_CAP + LT_CAP) // S_CAP   # max captures per pair

INTERPRET = False


def _iota2(sub: int = SUB):
    lane = jax.lax.broadcasted_iota(jnp.int32, (sub, LANE), 1)
    sl = jax.lax.broadcasted_iota(jnp.int32, (sub, LANE), 0)
    return sl * LANE + lane


def _shr(x, fill, sub: int = SUB):
    """x'[o] = x[o-1] in the packed (sub,128) layout; x'[0] = fill."""
    a = pltpu.roll(x, 1, axis=1)
    b = pltpu.roll(a, 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (sub, LANE), 1)
    sl = jax.lax.broadcasted_iota(jnp.int32, (sub, LANE), 0)
    out = jnp.where(lane == 0, b, a)
    return jnp.where((lane == 0) & (sl == 0), fill, out)


def _shl(x, fill, sub: int = SUB):
    """x'[o] = x[o+1]; x'[W-1] = fill."""
    a = pltpu.roll(x, LANE - 1, axis=1)
    b = pltpu.roll(a, sub - 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (sub, LANE), 1)
    sl = jax.lax.broadcasted_iota(jnp.int32, (sub, LANE), 0)
    out = jnp.where(lane == LANE - 1, b, a)
    return jnp.where((lane == LANE - 1) & (sl == sub - 1), fill, out)


def _insert(tile, pos, value, sub: int = SUB):
    """tile with tile[pos] = value (packed index)."""
    return jnp.where(_iota2(sub) == pos, value, tile)


def make_align_kernel(S: int, NC: int, sub: int = SUB):
    """Banded wavefront kernel: one pair per grid step.

    meta: (n, m, active, phase0, phase1) — a capture fires when
    a % S equals phase0 (slot 2c) or phase1 (slot 2c+1), c = a // S.
    Outputs: ed (final distance), cap tiles + per-capture band base.
    """

    W = sub * LANE

    def kernel(meta_ref, q_sm, t_sm, qv_ref,
               ed_out, caps, cap_base):
        n = meta_ref[0, 0, 0]
        m = meta_ref[0, 0, 1]
        active = meta_ref[0, 0, 2]
        phase0 = meta_ref[0, 0, 3]
        phase1 = meta_ref[0, 0, 4]
        jidx = _iota2(sub)

        total = n + m

        # a = 0: D(0,0) = 0 at offset 0, rest INF
        row0 = jnp.where(jidx == 0, 0, INF)
        inf_t = jnp.full((sub, LANE), INF, jnp.int32)
        # q window at a=0 (base 0): QW[o] = q[o-1]
        qw0 = _shr(qv_ref[0:sub, 0, 0], jnp.int32(Q_PAD), sub)
        tw0 = jnp.full((sub, LANE), T_PAD, jnp.int32)

        for c in range(2 * NC):
            cap_base[0, 0, c] = jnp.int32(-1)
        ed_out[0, 0, 0] = jnp.int32(-1)

        def body(a, carry):
            prev, prev2, base_p2, base_p, ci, err, qw, tw = carry
            # Bresenham center: ci = floor(a * n / total) without overflow
            err = err + n
            step = (err >= total).astype(jnp.int32)
            ci = ci + step
            err = err - step * total
            lo = jnp.maximum(0, a - m)
            hi = jnp.maximum(0, jnp.minimum(a, n) - W + 1)
            base = jnp.clip(ci - W // 2, lo, jnp.maximum(lo, hi))
            s1 = base - base_p
            s12 = base - base_p2

            # maintain sequence windows:
            #   QW[o] = q[base + o - 1]   (shifts left by s1, insert at end)
            #   TW[o] = t[a - base - o - 1] (shifts right by 1-s1, at front)
            q_new = q_sm[0, 0, jnp.clip(base + W - 2, 0, LQ_CAP - 1)]
            q_new = jnp.where(base + W - 2 < n, q_new, Q_PAD)
            qw = jnp.where(s1 == 1,
                           _insert(_shl(qw, Q_PAD, sub), W - 1, q_new, sub),
                           qw)
            t_idx = a - base - 1
            t_new = t_sm[0, 0, jnp.clip(t_idx, 0, LT_CAP - 1)]
            t_new = jnp.where((t_idx >= 0) & (t_idx < m), t_new, T_PAD)
            tw = jnp.where(s1 == 0,
                           _insert(_shr(tw, T_PAD, sub), 0, t_new, sub),
                           tw)

            # recurrence inputs (packed source-offset shifts)
            vert = jnp.where(s1 == 0, _shr(prev, INF, sub), prev)
            horiz = jnp.where(s1 == 0, prev, _shl(prev, INF, sub))
            diag = jnp.where(
                s12 == 0, _shr(prev2, INF, sub),
                jnp.where(s12 == 1, prev2, _shl(prev2, INF, sub)))

            sub_cost = jnp.where(qw == tw, 0, 1)
            cur = jnp.minimum(diag + sub_cost,
                              jnp.minimum(vert, horiz) + 1)

            i_vec = base + jidx
            j_vec = a - i_vec
            border = (i_vec == 0) | (j_vec == 0)
            valid = (i_vec >= 0) & (i_vec <= n) & (j_vec >= 0) & (j_vec <= m)
            cur = jnp.where(border, a, cur)
            cur = jnp.where(valid, cur, INF)

            amod = a % S
            hit0 = amod == phase0
            hit1 = amod == phase1

            @pl.when((hit0 | hit1) & (a // S < NC))
            def _():
                slot = 2 * (a // S) + jnp.where(hit1, 1, 0)
                caps[pl.ds(slot * sub, sub), 0, 0, :] = cur
                cap_base[0, 0, slot] = base

            return cur, prev, base_p, base, ci, err, qw, tw

        hi_a = jnp.where(active == 1, total + 1, 1)
        cur, prev, _, base_last, _, _, _, _ = jax.lax.fori_loop(
            1, hi_a, body,
            (row0, inf_t, jnp.int32(0), jnp.int32(0), jnp.int32(0),
             jnp.int32(0), qw0, tw0))

        # final cell (n, m) sits at offset n - base(n+m)
        o_fin = jnp.clip(n - base_last, 0, W - 1)
        ed = jnp.max(jnp.where(jidx == o_fin, cur, -1))

        @pl.when(active == 1)
        def _():
            ed_out[0, 0, 0] = ed

    return kernel


@functools.partial(jax.jit, static_argnames=("S", "NC", "interpret",
                                             "sub"))
def wavefront_pass(meta, q_sm, t_sm, qv, S: int = S_CAP, NC: int = NC_CAP,
                   interpret: bool = False, sub: int = SUB):
    """Run the banded wavefront over a batch of pairs.

    meta: [B, 1, 4] i32 (n, m, active, cap_phase)
    q_sm: [B, 1, LQ_CAP] i32; t_sm: [B, 1, LT_CAP] i32
    qv:   [B, LQ_CAP // LANE, LANE] i32 (packed rows of q)

    Returns (ed [B], caps [B, NC*8, 128], cap_base [B, NC]).
    """
    B = meta.shape[0]
    kernel = make_align_kernel(S, NC, sub)
    nrows = LQ_CAP // LANE
    ed, caps, cap_base = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, LQ_CAP), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, LT_CAP), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nrows, 1, 1, LANE), lambda b: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((2 * NC * sub, 1, 1, LANE), lambda b: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * NC), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((2 * NC * sub, B, 1, LANE), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 2 * NC), jnp.int32),
        ],
        interpret=interpret,
    )(meta, q_sm, t_sm, qv.transpose(1, 0, 2)[:, :, None, :])
    return ed[:, 0, 0], caps[:, :, 0, :].transpose(1, 0, 2), cap_base[:, 0, :]


def _pack_inputs(pairs, backward: bool = False):
    """pairs: list of (q bytes, t bytes).  Returns device-ready arrays.

    Forward capture phases are (0, 1) -> anti-diagonals (S*c, S*c + 1);
    backward ones mirror them: a' in (total - S*c - 1, total - S*c)."""
    B = len(pairs)
    meta = np.zeros((B, 1, 8), np.int32)
    q_sm = np.full((B, 1, LQ_CAP), Q_PAD, np.int32)
    t_sm = np.full((B, 1, LT_CAP), T_PAD, np.int32)
    for b, (q, t) in enumerate(pairs):
        n, m = len(q), len(t)
        if backward:
            ph0, ph1 = (n + m - 1) % S_CAP, (n + m) % S_CAP
        else:
            ph0, ph1 = 0, 1
        meta[b, 0, :5] = (n, m, 1, ph0, ph1)
        q_sm[b, 0, :n] = np.frombuffer(q, np.uint8)
        t_sm[b, 0, :m] = np.frombuffer(t, np.uint8)
    qv = q_sm.reshape(B, LQ_CAP // LANE, LANE)
    return meta, q_sm, t_sm, qv


@functools.partial(jax.jit, static_argnames=("S", "NC"))
def _crossings(ed_f, caps_f, base_f, caps_b, base_b, meta, S: int,
               NC: int):
    """Optimal-path crossing cell near every captured anti-diagonal.

    Variant A splits at a0 = S*c (fwd slot 2c, bwd slot 2*cpA+1 at
    a' = total-a0); variant B at a0+1 (fwd slot 2c+1, bwd slot 2*cpB at
    a' = total-a0-1).  An optimal path advances the anti-diagonal by 1 or
    2 per move, so it must touch a0 or a0+1; the variant whose min equals
    the edit distance is the real crossing.

    Returns (cross_i [B, NC], a_used [B, NC], ok [B, NC]).
    """
    B = meta.shape[0]
    n = meta[:, 0, 0]
    m = meta[:, 0, 1]
    total = n + m
    c_idx = jnp.arange(NC, dtype=jnp.int32)[None, :]          # [1, NC]
    W = caps_f.shape[1] * caps_f.shape[2] // (2 * NC)
    F = caps_f.reshape(B, 2 * NC, W)
    Bw = caps_b.reshape(B, 2 * NC, W)

    def variant(a0, f_slot, b_slot):
        valid = (a0 > 0) & (a0 < total[:, None]) & \
            (b_slot >= 0) & (b_slot < 2 * NC)
        fs = jnp.clip(f_slot, 0, 2 * NC - 1)
        bs = jnp.clip(b_slot, 0, 2 * NC - 1)
        Fv = jnp.take_along_axis(
            F, jnp.broadcast_to(fs[:, :, None], (B, NC, W)), axis=1)
        Bv = jnp.take_along_axis(
            Bw, jnp.broadcast_to(bs[:, :, None], (B, NC, W)), axis=1)
        bf = jnp.take_along_axis(base_f, fs, axis=1)
        bb = jnp.take_along_axis(base_b, bs, axis=1)
        valid = valid & (bf >= 0) & (bb >= 0)
        off = n[:, None] - bf - bb
        o_f = jnp.arange(W, dtype=jnp.int32)[None, None, :]
        o_b = off[:, :, None] - o_f
        ob_ok = (o_b >= 0) & (o_b < W)
        Bv_rev = jnp.take_along_axis(Bv, jnp.clip(o_b, 0, W - 1), axis=2)
        sums = jnp.where(ob_ok, Fv + Bv_rev, INF)
        minsum = jnp.min(sums, axis=2)
        o_star = jnp.argmin(sums, axis=2).astype(jnp.int32)
        ok = valid & (minsum == ed_f[:, None]) & (minsum < INF)
        return bf + o_star, ok

    a0A = c_idx * S
    f_slotA = jnp.broadcast_to(2 * c_idx, (B, NC))
    b_slotA = 2 * ((total[:, None] - a0A) // S) + 1
    crossA, okA = variant(jnp.broadcast_to(a0A, (B, NC)), f_slotA, b_slotA)

    a0B = a0A + 1
    f_slotB = f_slotA + 1
    b_slotB = 2 * ((total[:, None] - a0B) // S)
    crossB, okB = variant(jnp.broadcast_to(a0B, (B, NC)), f_slotB, b_slotB)

    cross_i = jnp.where(okA, crossA, crossB)
    a_used = jnp.where(okA, a0A, a0B)
    return cross_i, a_used, okA | okB


class PallasAligner:
    """Batched device aligner producing CIGARs via crossing-segmented host
    alignment.  Falls back (returns None) for pairs that exceed the caps or
    whose band was too narrow."""

    def __init__(self, num_threads: int = 4, interpret: bool = None,
                 batch_size: int = 8, devices=None, band_width: int = 0):
        self.num_threads = num_threads
        self.batch_size = batch_size
        # band auto-sizing follows the reference GPU aligner: 10% of the
        # mean overlap length when no width is given
        # (src/cuda/cudapolisher.cpp:150-163), rounded to the 128-lane
        # tile and clamped to [256, 2048]
        self.band_width = band_width
        if interpret is None:
            interpret = INTERPRET
        self.interpret = interpret
        if devices is None:
            devices = jax.local_devices()
        self.devices = list(devices)
        self._next_device = 0
        self.stats = {"device": 0, "fallback": 0}

    def align_batch(self, pairs):
        """pairs: [(q bytes, t bytes)] -> [cigar bytes or None].

        Measured runtime gate (RACON_TPU_ALIGN_GATE=0 disables): after
        the first (compile-paying) batch, one steady-state device batch
        and one same-size host batch are timed; if the host is faster
        per pair, the remaining pairs are left to the caller's host
        path.  On tunnel-attached single-chip setups the device aligner
        measured 17x slower than the host at genome scale
        (BENCH_scale_r03_tpualign: 1825 s vs 103 s), so an unmeasured
        --tpu-align must never be able to sink a run (reference CPU
        fallback contract: src/cuda/cudaaligner.cpp:63-71)."""
        from racon_tpu.native import rtlib

        out = [None] * len(pairs)
        todo = [i for i, (q, t) in enumerate(pairs)
                if 0 < len(q) <= LQ_CAP and 0 < len(t) <= LT_CAP]
        band = self.band_width
        if band <= 0 and todo:
            mean_len = (sum(max(len(pairs[i][0]), len(pairs[i][1]))
                            for i in todo) / len(todo))
            band = int(mean_len * 0.1)
        sub = min(max(-(-band // LANE), 2), 16)
        self._sub = sub
        gate = (os.environ.get("RACON_TPU_ALIGN_GATE", "1") != "0"
                and len(todo) > 4 * self.batch_size)
        lo = 0
        bi = 0
        while lo < len(todo):
            idxs = todo[lo:lo + self.batch_size]
            t0 = time.perf_counter()
            self._run([pairs[i] for i in idxs], idxs, out)
            dt = time.perf_counter() - t0
            lo += self.batch_size
            bi += 1
            if gate and bi == 2:
                # batch 0 paid the compile; batch 1 is the steady-state
                # device probe.  Host probe on the NEXT batch (its
                # results are kept, so no work is wasted).
                dev_pp = dt / max(len(idxs), 1)
                h_idxs = todo[lo:lo + self.batch_size]
                t0 = time.perf_counter()
                h_cigars = rtlib.NativeAligner(self.num_threads).align_batch(
                    [pairs[i] for i in h_idxs])
                host_pp = ((time.perf_counter() - t0)
                           / max(len(h_idxs), 1))
                for i, c in zip(h_idxs, h_cigars):
                    out[i] = c
                lo += self.batch_size
                if dev_pp > host_pp:
                    n_left = len(todo) - lo
                    print("[racon_tpu::PallasAligner] gate: device "
                          f"{dev_pp * 1e3:.1f} ms/pair > host "
                          f"{host_pp * 1e3:.1f} ms/pair — routing the "
                          f"remaining {n_left} pairs to the host aligner",
                          file=sys.stderr)
                    self.stats["gated"] = n_left
                    break
        self.stats["fallback"] += sum(1 for c in out if c is None)
        return out

    def _run(self, pairs, idxs, out):
        from racon_tpu.native import rtlib

        B = len(pairs)
        meta, q_sm, t_sm, qv = _pack_inputs(pairs)
        meta_r, q_r, t_r, qv_r = _pack_inputs(
            [(q[::-1], t[::-1]) for q, t in pairs], backward=True)

        # batches round-robin over the local chips (as the POA engine does)
        dev = self.devices[self._next_device % len(self.devices)]
        self._next_device += 1
        put = lambda x: jax.device_put(jnp.asarray(x), dev)

        sub = getattr(self, "_sub", SUB)
        ed_f, caps_f, base_f = wavefront_pass(
            put(meta), put(q_sm), put(t_sm), put(qv),
            interpret=self.interpret, sub=sub)
        ed_b, caps_b, base_b = wavefront_pass(
            put(meta_r), put(q_r), put(t_r), put(qv_r),
            interpret=self.interpret, sub=sub)

        cross_i, a_used, ok = _crossings(ed_f, caps_f, base_f, caps_b,
                                         base_b, put(meta),
                                         S=S_CAP, NC=NC_CAP)
        cross_i = np.asarray(cross_i)
        a_used = np.asarray(a_used)
        ok = np.asarray(ok)
        ed_f = np.asarray(ed_f)
        ed_b = np.asarray(ed_b)

        # build segment lists per pair; verify monotonicity
        seg_pairs = []
        seg_meta = []   # (pair index in `idxs`, segment ordinal)
        plans = []
        for b, (q, t) in enumerate(pairs):
            n, m = len(q), len(t)
            if ed_f[b] != ed_b[b] or ed_f[b] < 0:
                plans.append(None)   # band clipped or inactive
                continue
            pts = [(0, 0)]
            good = True
            for c in range(NC_CAP):
                if not (0 < c * S_CAP < n + m):
                    continue
                if not ok[b, c]:
                    good = False
                    break
                i = int(cross_i[b, c])
                j = int(a_used[b, c]) - i
                if i < pts[-1][0] or j < pts[-1][1] or i > n or j > m:
                    good = False
                    break
                pts.append((i, j))
            if not good:
                plans.append(None)
                continue
            pts.append((n, m))
            plans.append(len(pts) - 1)
            for (i0, j0), (i1, j1) in zip(pts, pts[1:]):
                seg_pairs.append((q[i0:i1], t[j0:j1]))
                seg_meta.append(b)

        if seg_pairs:
            aligner = rtlib.NativeAligner(self.num_threads)
            cigars = aligner.align_batch(seg_pairs)
        else:
            cigars = []

        pos = 0
        for b in range(B):
            if plans[b] is None:
                continue
            nseg = plans[b]
            segs = cigars[pos:pos + nseg]
            pos += nseg
            merged = _merge_cigars(segs)
            # soundness check: when the band clips fwd and bwd identically,
            # ed_f == ed_b can hold with a wrong distance; a segmented CIGAR
            # whose total unit cost differs from the device edit distance is
            # suboptimal -> leave None for the exact host aligner
            q, t = pairs[b]
            if _cigar_unit_cost(merged, q, t) != int(ed_f[b]):
                self.stats["cost_mismatch"] = \
                    self.stats.get("cost_mismatch", 0) + 1
                continue
            out[idxs[b]] = merged
            self.stats["device"] += 1


def _merge_cigars(segs):
    """Concatenate CIGAR strings, merging the run across each boundary."""
    ops = []
    for s in segs:
        num = 0
        for ch in s.decode() if isinstance(s, bytes) else s:
            if ch.isdigit():
                num = num * 10 + ord(ch) - 48
            else:
                if ops and ops[-1][1] == ch:
                    ops[-1] = (ops[-1][0] + num, ch)
                else:
                    ops.append((num, ch))
                num = 0
    return "".join(f"{n}{c}" for n, c in ops).encode()


def _cigar_unit_cost(cigar: bytes, q: bytes, t: bytes) -> int:
    """Unit edit cost of a CIGAR over (q, t): #I + #D + mismatches inside
    'M' runs ('M' covers match and substitution, the edlib convention)."""
    import numpy as np
    qa = np.frombuffer(q, np.uint8)
    ta = np.frombuffer(t, np.uint8)
    cost = 0
    num = 0
    i = j = 0
    for ch in cigar.decode():
        if ch.isdigit():
            num = num * 10 + ord(ch) - 48
            continue
        if ch == "M":
            cost += int((qa[i:i + num] != ta[j:j + num]).sum())
            i += num
            j += num
        elif ch in "I=X":
            if ch == "X":
                cost += num
            elif ch == "I":
                cost += num
            i += num
            if ch in "=X":
                j += num
        elif ch == "D":
            cost += num
            j += num
        num = 0
    return cost

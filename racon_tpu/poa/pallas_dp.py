"""Pallas TPU kernel for the POA forward DP + traceback.

Replaces the XLA rank-loop in racon_tpu/poa/engine.py with a single kernel
per window megabatch: the whole score matrix lives in VMEM (no HBM traffic
inside the rank loop), DP rows are packed into dense (8, 128) vector
registers, and the backpointer traceback runs in-kernel, so only the
alignment path leaves the chip.

Semantics are bit-identical to engine._forward_dp/_traceback (same integer
scores, same diag>vert>horiz and pred-insertion-order tie rules, same
earliest-rank sink selection) — asserted by tests against the oracle.

Layout: the DP row of length L+1 (sequence position axis) is stored as an
(8, 128) tile: position j lives at sublane j // 128, lane j % 128.  L is
therefore capped at LP - 1 = 1023 per kernel instance (the reference's GPU
path has the same cap, cudabatch.cpp BatchConfig(1023, ...)).

Grid: one window per grid step; per-window state (H, bp) is VMEM scratch.
Inputs are pre-gathered into rank space by the caller (engine.add_layer):
node codes, predecessor ranks, and the rank->node order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -(1 << 30)   # plain int: jnp constants must not be captured
SUB = 8          # sublanes per DP row tile
LANE = 128       # lanes per sublane
LP = SUB * LANE  # padded row length (max L+1)

# Set True (e.g. by tests on the CPU backend) to run the kernel interpreted.
INTERPRET = False


def _shift_j(x, fill):
    """x' [8,128] with x'[j] = x[j-1] in the packed layout; x'[0] = fill."""
    a = pltpu.roll(x, 1, axis=1)                       # lane shift
    b = pltpu.roll(a, 1, axis=0)                       # sublane carry
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0)
    out = jnp.where(lane == 0, b, a)
    return jnp.where((lane == 0) & (sub == 0), fill, out)


def _cummax_j(x):
    """Prefix max along the packed j axis."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0)
    # in-sublane prefix max (log2(128) = 7 masked shifts)
    for k in (1, 2, 4, 8, 16, 32, 64):
        sh = pltpu.roll(x, k, axis=1)
        x = jnp.where(lane >= k, jnp.maximum(x, sh), x)
    # per-sublane totals -> inclusive prefix max over sublanes -> exclusive
    totalb = jnp.broadcast_to(jnp.max(x, axis=1, keepdims=True), (SUB, LANE))
    inc = totalb
    for k in (1, 2, 4):
        sh = pltpu.roll(inc, k, axis=0)
        inc = jnp.maximum(inc, jnp.where(sub >= k, sh, NEG_INF))
    exc = jnp.where(sub >= 1, pltpu.roll(inc, 1, axis=0), NEG_INF)
    return jnp.maximum(x, exc)


def make_dp_kernel(N: int, P: int, T: int, match: int, mismatch: int,
                   gap: int):
    """Build the kernel body for capacities (N nodes, P pred slots)."""
    PV = P + 1

    def kernel(meta_ref, codes_ref, predr_ref, seq_ref, hsucc_ref,
               prank_ref, ppos_ref, plen_ref,
               H, bp):
        m_i = jnp.int32(match)
        x_i = jnp.int32(mismatch)
        g_i = jnp.int32(gap)
        lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0)
        rb = meta_ref[0, 0, 0]
        re = meta_ref[0, 0, 1]
        ell = meta_ref[0, 0, 2]
        active = meta_ref[0, 0, 3]

        jidx = sub * LANE + lane                          # packed j index
        jgap = jnp.where(jidx <= ell, jidx * g_i, NEG_INF)
        H[N, :, :] = jgap

        seq_tile = seq_ref[0]                             # [8,128]: seq[j-1]

        def dp_body(r, carry):
            @pl.when(active == 1)
            def _():
                code_v = codes_ref[0, 0, r]
                prof = jnp.where(seq_tile == code_v, m_i, x_i)

                row = jnp.full((SUB, LANE), NEG_INF, jnp.int32)
                any_valid = jnp.int32(0)
                pred_row = predr_ref[pl.ds(r, 1), 0, 0, :]    # (1, P)
                for p in range(P):
                    pr = pred_row[0, p]
                    valid = (pr >= rb) & (pr >= 0)
                    prs = jnp.maximum(pr, 0)
                    hp = H[prs, :, :]
                    hp = jnp.where(valid, hp, NEG_INF)
                    any_valid = any_valid | valid.astype(jnp.int32)
                    diag = _shift_j(hp, NEG_INF) + prof
                    row = jnp.maximum(row, jnp.maximum(diag, hp + g_i))
                # virtual source row when no in-range predecessor
                hp = jnp.where(any_valid == 0, jgap, NEG_INF)
                row = jnp.maximum(row, jnp.maximum(
                    _shift_j(hp, NEG_INF) + prof, hp + g_i))
                # horizontal closure
                row = _cummax_j(row - jgap) + jgap
                row = jnp.where(jidx <= ell, row, NEG_INF)
                H[r, :, :] = row

                # backpointers: lowest priority first, overwrite upward
                bp_row = jnp.full((SUB, LANE), 2 * PV, jnp.int32)  # horiz
                hvirt = jnp.where(any_valid == 0, jgap, NEG_INF)
                bp_row = jnp.where(hvirt + g_i == row,
                                   jnp.int32(PV + P), bp_row)
                for p in range(P - 1, -1, -1):
                    pr = pred_row[0, p]
                    valid = (pr >= rb) & (pr >= 0)
                    hp = jnp.where(valid, H[jnp.maximum(pr, 0), :, :], NEG_INF)
                    bp_row = jnp.where(hp + g_i == row,
                                       jnp.int32(PV + p), bp_row)
                dvirt = _shift_j(hvirt, NEG_INF) + prof
                bp_row = jnp.where(dvirt == row, jnp.int32(P), bp_row)
                for p in range(P - 1, -1, -1):
                    pr = pred_row[0, p]
                    valid = (pr >= rb) & (pr >= 0)
                    hp = jnp.where(valid, H[jnp.maximum(pr, 0), :, :], NEG_INF)
                    diag = _shift_j(hp, NEG_INF) + prof
                    bp_row = jnp.where(diag == row, jnp.int32(p), bp_row)
                bp[r, :, :] = bp_row

            return carry

        jax.lax.fori_loop(rb, re + 1, dp_body, 0)

        # ---- sink selection: max H[r][ell], earliest rank on ties -------
        # (dynamic lane offsets can't be scalar-loaded; extract via a
        # masked reduction over the row tile)
        ell_mask = jidx == ell

        def sink_body(r, best):
            best_score, best_r = best
            is_sink = (hsucc_ref[0, 0, r] == 0) & (active == 1)
            score = jnp.max(jnp.where(ell_mask, H[r, :, :], NEG_INF))
            better = is_sink & (score > best_score)
            return (jnp.where(better, score, best_score),
                    jnp.where(better, r, best_r))

        best_score, best_r = jax.lax.fori_loop(
            rb, re + 1, sink_body, (NEG_INF, jnp.int32(N)))

        # ---- traceback (entries beyond the returned length are garbage;
        # the caller masks by path_len) --------------------------------

        def tb_cond(c):
            vr, j, t, done = c
            return (done == 0) & (t < T)

        def tb_body(c):
            vr, j, t, done = c
            at_virtual = vr == N
            jmask = (sub * LANE + lane) == j
            bp_val = jnp.max(jnp.where(jmask, bp[vr, :, :], -1))
            move = jnp.where(at_virtual, 2 * PV, bp_val)
            is_diag = move < PV
            is_vert = (move >= PV) & (move < 2 * PV)
            slot = jnp.where(is_diag, move, move - PV)
            vrow = predr_ref[pl.ds(jnp.minimum(vr, N), 1), 0, 0, :]  # (1, P)
            pidx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
            slot_val = jnp.max(jnp.where(pidx == slot, vrow, -2))
            pred_r = jnp.where(slot == P, N, slot_val)

            prank_ref[0, 0, t] = jnp.where(is_diag | is_vert, vr, -1)
            ppos_ref[0, 0, t] = jnp.where(is_vert, -1, j - 1)

            vr2 = jnp.where(is_diag | is_vert, pred_r, vr)
            j2 = jnp.where(is_vert, j, j - 1)
            done2 = ((vr2 == N) & (j2 == 0)).astype(jnp.int32)
            return vr2, j2, t + 1, done2

        done0 = jnp.where(active == 1, 0, 1).astype(jnp.int32)
        t0 = jnp.int32(0)
        vr0 = jnp.where(active == 1, best_r, N)
        j0 = jnp.where(active == 1, ell, 0)
        vr, j, t, done = jax.lax.while_loop(
            tb_cond, tb_body, (vr0, j0, t0, done0))
        plen_ref[0, 0, 0] = jnp.where(done == 1, t, -1)   # -1 = overrun

    return kernel


@functools.partial(jax.jit, static_argnames=("N", "P", "T", "match",
                                             "mismatch", "gap", "interpret"))
def dp_traceback(meta, codes_r, predr, seq_shift, has_succ_r, N: int,
                 P: int, T: int, match: int, mismatch: int, gap: int,
                 interpret: bool = False):
    """Run the DP+traceback kernel over a window batch.

    meta:      [B, 4] i32 (rb, re, ell, active)
    has_succ_r: [B, N+1] i32, 1 = rank r's node has an in-range successor
    codes_r:   [B, N+1] i32 rank-ordered node codes
    predr:     [B, N+1, P] i32 predecessor ranks (-1 = none/invalid)
    seq_shift: [B, 8, 128] i32, packed layout: seq[j-1] at
               (j // 128, j % 128); pad at j = 0

    Returns (path_rank [B, T], path_pos [B, T], path_len [B]) — the path in
    REVERSE order (traceback order), path_len = -1 on overrun.
    """
    B = meta.shape[0]
    kernel = make_dp_kernel(N, P, T, match, mismatch, gap)

    path_rank, path_pos, path_len = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, N + 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((N + 1, 1, 1, P), lambda b: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N + 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, T), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, T), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N + 1, SUB, LANE), jnp.int32),   # H
            pltpu.VMEM((N + 1, SUB, LANE), jnp.int32),   # bp
        ],
    )(meta.reshape(B, 1, 4), codes_r.reshape(B, 1, N + 1),
      predr.transpose(1, 0, 2)[:, :, None, :], seq_shift,
      has_succ_r.reshape(B, 1, N + 1))
    return path_rank[:, 0], path_pos[:, 0], path_len[:, 0, 0]

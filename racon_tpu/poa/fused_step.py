"""Fully fused Pallas TPU kernel for one POA layer step.

One kernel = forward DP + traceback + graph update + re-rank, per window
megabatch.  This replaces the split pipeline (Pallas DP kernel + XLA
gather/scatter/lexsort glue) in racon_tpu/poa/engine.py: profiling showed the
XLA glue (rank-space pre-gathers, the vectorized graph update, and the
per-layer lexsort) costs ~100 ms per layer step at B=32/N=1792 on TPU while
the DP itself is cheap.  Here the whole step runs in one kernel with the
graph resident on-chip, so the only HBM traffic per step is the dense block
copies of the state (no gathers, no scatters, no sort).

Semantics are bit-identical to engine.add_layer (same integer scores, the
same diag>vert>horiz / lowest-pred-slot tie rules, the same earliest-rank
sink selection, the same insertion-key interpolation), asserted by tests
against the XLA engine in interpret mode.

Design notes (what made it fast)
--------------------------------

* Sequential kernel loops cost ~10 cycles/iteration when they touch only
  SMEM scalars, but 25-60x that when each iteration round-trips
  vector->scalar (lane extracts / masked reductions have long readback
  latency that a serial loop cannot hide).  The layout below is chosen so
  the three long per-window loops (DP over ranks, traceback, graph update)
  do almost no vector->scalar readbacks:

  - Per-node scalars the loops read every iteration (topological order,
    node ranks, dense column per rank, codes, pred counts, coverage, rep,
    the first two pred slots + weights, the column letter table) live in
    SMEM.  Only the rare pred-slot overflow (slots >= 2) lives in a VMEM
    per-node row.

  - Each DP cell packs score, move code, and the *predecessor rank* into
    one int32: ``packed = (score << 16) | ((31 - code) << 11) | pred_rank``.
    Move codes order exactly by tie priority (diag slot 0..P-1,
    diag-virtual, vert slots, vert-virtual, horiz), so a plain running
    ``max`` over packed candidates reproduces the reference tie-breaking
    (score dominates; on equal scores the larger inverted code = the
    preferred move wins; equal score+code implies the same candidate).
    Traceback therefore needs ONE vector extract per step and no graph
    lookups at all: the next rank is in the payload.

  - The update pass defers all mutations of pre-existing nodes (coverage,
    edge insert/accumulate) into small delta lists; the re-rank merge loop
    doubles as the state copy (old nodes copy in->out as they are emitted,
    new nodes were already written), and the deltas are applied after.
    This removes every standalone copy loop.

* Re-ranking is a stable two-stream merge, not a sort: all nodes created by
  one layer carry strictly increasing insertion keys (anchors are column
  keys, inserted runs get interpolated keys strictly between their
  anchors), so merging (old ranks, new nodes) by key with old-first ties is
  exactly the (key, rep, id) lexsort the XLA engine performs — see the
  correctness argument in tests/test_fused_step.py.

Capacity limits (checked by the caller, host fallback otherwise):
L+1 <= 1024 (packed DP row; reference GPU has the same 1023 cap,
src/cuda/cudabatch.cpp BatchConfig), N <= 2046 (11-bit rank payload),
|score| < 30000 (16-bit score field).

Reference parity: this kernel is the TPU-native replacement of cudapoa's
batched POA (reference: src/cuda/cudabatch.cpp, src/cuda/cudapolisher.cpp);
windows it flags as failed fall back to the host oracle exactly like the
reference GPU->CPU path (src/cuda/cudapolisher.cpp:354-378).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from racon_tpu.poa.engine import (ALPHABET, KEY_SCALE, PAD_CODE, GraphState,
                                  LayerBatch)

NEG = -30000              # score -inf sentinel (16-bit score field)
SCORE_LIMIT = 30000       # |score| bound for the 16-bit field
RANK_BITS = 11            # pred-rank payload -> N <= 2046
RANK_MASK = (1 << RANK_BITS) - 1
INT_MIN = -(2 ** 31) + 1
INT_MAX = (2 ** 31) - 1
BIG_RANK = 2 ** 30        # rank sentinel, matches engine
SUB = 8
LANE = 128
NR_LANE = 32              # per-node overflow-row width (>= 2*P)
LP = SUB * LANE           # packed DP row capacity (max L+1), as in pallas_dp

# Set True (tests on the CPU backend) to run the kernel interpreted.
INTERPRET = False


def _lane_layout(P: int):
    """Lane indices inside the per-node VMEM overflow row: pred ids at
    [0,P) and pred weights at [P,2P) (slots 0 and 1 unused — their truth
    lives in the SMEM mirrors)."""
    assert 2 * P < NR_LANE
    return 0, P


def _iota2():
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0)
    return sub * LANE + lane


def _shift_j(x, fill):
    """x'[j] = x[j-1] in the packed (8,128) layout; x'[0] = fill."""
    a = pltpu.roll(x, 1, axis=1)
    b = pltpu.roll(a, 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0)
    out = jnp.where(lane == 0, b, a)
    return jnp.where((lane == 0) & (sub == 0), fill, out)


def _cummax_j(x):
    """Prefix max along the packed j axis (as in pallas_dp)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0)
    for k in (1, 2, 4, 8, 16, 32, 64):
        sh = pltpu.roll(x, k, axis=1)
        x = jnp.where(lane >= k, jnp.maximum(x, sh), x)
    inc = jnp.broadcast_to(jnp.max(x, axis=1, keepdims=True), (SUB, LANE))
    for k in (1, 2, 4):
        sh = pltpu.roll(inc, k, axis=0)
        inc = jnp.maximum(inc, jnp.where(sub >= k, sh, NEG))
    exc = jnp.where(sub >= 1, pltpu.roll(inc, 1, axis=0), NEG)
    return jnp.maximum(x, exc)


def _extract_packed(tile, jj):
    """Scalar value of an (8,128)-packed row at packed index jj."""
    return jnp.max(jnp.where(_iota2() == jj, tile, INT_MIN))


def _extract_lane(row, idx):
    """Scalar value of a (1, NR_LANE) row at lane idx."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, NR_LANE), 1)
    return jnp.max(jnp.where(lane == idx, row, INT_MIN))


def _extract_lane128(row, idx):
    """Scalar value of a (1, LANE) row at lane idx."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    return jnp.max(jnp.where(lane == idx, row, INT_MIN))


def make_fused_kernel(N: int, P: int, t_cap: int, match: int, mismatch: int,
                      gap: int, stop_phase: int = 9):
    """Kernel body for one layer step at capacities (N nodes, P pred slots).

    Move codes: diag via pred slot p -> p; diag via virtual source -> P;
    vert via slot p -> P+1+p; vert virtual -> 2P+1; horiz -> 2P+2.

    stop_phase truncates the kernel after phase k (profiling only):
    0=copies, 1=DP, 2=sink, 3=traceback, 4=update, 5=merge (full).
    """
    assert N <= RANK_MASK - 1, f"N={N} exceeds rank payload capacity"
    LN_PRED, LN_PREDW = _lane_layout(P)
    HORIZ = 2 * P + 2
    HZ_PAYLOAD = ((31 - HORIZ) << RANK_BITS) | RANK_MASK

    def kernel(meta_ref, nn_in, order_in, rank_in, col_in, codes_in, cnt_in,
               cov_in, rep_in, p0_in, p1_in, pw0_in, pw1_in, letn_in,
               noderow_in, seq_ref, seq_s, wts_s,
               nn_out, order_out, rank_out, col_out, codes_out, cnt_out,
               cov_out, rep_out, p0_out, p1_out, pw0_out, pw1_out, letn_out,
               noderow_out,
               H, hs, pnode, ppos, ins_node, ins_key,
               d_node, d_tail, d_w, d_slot, d_flag):
        m_i = jnp.int32(match)
        x_i = jnp.int32(mismatch)
        g_i = jnp.int32(gap)
        begin = meta_ref[0, 0, 0]
        end = meta_ref[0, 0, 1]
        full = meta_ref[0, 0, 2]
        ell = jnp.clip(meta_ref[0, 0, 3], 0, LP - 1)
        layer_active = meta_ref[0, 0, 4]
        nn0 = nn_in[0, 0, 0]
        failed0 = nn_in[0, 0, 1]
        act0 = (layer_active == 1) & (failed0 == 0)

        jidx = _iota2()
        jgapm = jnp.where(jidx <= ell, jidx * g_i, NEG)     # masked j*gap
        seq_tile = seq_ref[0]
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, NR_LANE), 1)
        # constant overflow row for freshly created nodes
        empty_row = jnp.where((lane1 >= LN_PRED) & (lane1 < LN_PRED + P),
                              N, 0)

        # ---- phase 0: bulk copy + sentinels ----------------------------- #
        if stop_phase >= 0:
            noderow_out[...] = noderow_in[...]
        order_out[0, 0, N] = jnp.int32(N)
        rank_out[0, 0, N] = jnp.int32(BIG_RANK)
        codes_out[0, 0, N] = jnp.int32(PAD_CODE)
        cnt_out[0, 0, N] = jnp.int32(0)
        cov_out[0, 0, N] = jnp.int32(0)
        rep_out[0, 0, N] = jnp.int32(N)
        p0_out[0, 0, N] = jnp.int32(N)
        p1_out[0, 0, N] = jnp.int32(N)
        pw0_out[0, 0, N] = jnp.int32(0)
        pw1_out[0, 0, N] = jnp.int32(0)
        for l in range(ALPHABET):
            letn_out[0, l, N] = jnp.int32(-1)

        # ---- rank range ------------------------------------------------ #
        rb_real = jnp.where(full == 1, 0,
                            rank_in[0, 0, jnp.clip(begin, 0, N - 1)])
        re_real = jnp.where(full == 1, nn0 - 1,
                            rank_in[0, 0, jnp.clip(end, 0, N - 1)])
        rb = jnp.where(act0, jnp.clip(rb_real, 0, N - 1), 1)
        re = jnp.where(act0, jnp.clip(re_real, 0, N - 1), 0)

        # ---- phase 1: forward DP ---------------------------------------- #
        def zero_hs(r, _):
            hs[r] = jnp.int32(0)
            return 0

        if stop_phase >= 1:
            jax.lax.fori_loop(rb, re + 1, zero_hs, 0)

        # Per-pred packed rows q_p = (score << 16) | (31-slot) << 11 | rank
        # combine under max FIRST (score dominates; equal scores keep the
        # lowest slot), then derive diag/vert from the single winner:
        #   diag = shift_j(q) + prof << 16            (payload intact)
        #   vert = q + (gap << 16) - ((P+1) << 11)    (slot code p -> P+1+p)
        # The virtual source uses the same constant offset (P -> 2P+1).
        VOFF = (P + 1) << RANK_BITS

        def _qrow(cnt_need, pid):
            prr = rank_in[0, 0, jnp.clip(pid, 0, N)]
            valid = cnt_need & (pid < N) & (prr >= rb)
            prs = jnp.where(valid, prr, N)
            hs[prs] = jnp.int32(1)
            hps = jnp.where(valid,
                            jax.lax.shift_right_arithmetic(
                                H[pl.ds(prs * SUB, SUB)], jnp.int32(16)),
                            NEG)
            return hps, prs, valid

        def dp_body(r, _):
            v = order_in[0, 0, r]
            cntv = cnt_in[0, 0, v]
            code_v = codes_in[0, 0, v]
            prof16 = jnp.where(seq_tile == code_v, m_i << 16, x_i << 16)

            hps0, prs0, valid0 = _qrow(cntv >= 1, p0_in[0, 0, v])
            q = hps0 * 65536 + (((31 - 0) << RANK_BITS) | prs0)
            hps1, prs1, valid1 = _qrow(cntv >= 2, p1_in[0, 0, v])
            q = jnp.maximum(q, hps1 * 65536 + (((31 - 1) << RANK_BITS) | prs1))
            anyv = valid0 | valid1

            def tail_body(p, carry):
                q, anyv = carry
                vrow = noderow_out[v, 0]
                pid = _extract_lane(vrow, LN_PRED + p)
                hps, prs, valid = _qrow(True, pid)
                q = jnp.maximum(
                    q, hps * 65536 + (((31 - p) << RANK_BITS) | prs))
                return q, anyv | valid

            q, anyv = jax.lax.fori_loop(2, cntv, tail_body, (q, anyv))

            virt = jnp.where(~anyv, jgapm, NEG)
            q = jnp.maximum(
                q, virt * 65536 + (((31 - P) << RANK_BITS) | N))

            diag = _shift_j(q, NEG * 65536) + prof16
            vert = q + (g_i << 16) - VOFF
            acc = jnp.maximum(diag, vert)

            pre = jax.lax.shift_right_arithmetic(acc, jnp.int32(16))
            closed = _cummax_j(pre - jgapm) + jgapm
            codebits = jnp.where(closed > pre, HZ_PAYLOAD, acc & 0xFFFF)
            packed = jnp.where(jidx <= ell, closed * 65536 + codebits,
                               NEG * 65536)
            H[pl.ds(r * SUB, SUB)] = packed
            return 0

        if stop_phase >= 1:
            jax.lax.fori_loop(rb, re + 1, dp_body, 0)

        # ---- phase 2: sink selection (max score, earliest rank) --------- #
        ell_sub = ell // LANE
        ell_lane = ell - ell_sub * LANE

        def sink_body(r, best):
            bs, br = best
            row = H[pl.ds(r * SUB + ell_sub, 1)]
            score = jax.lax.shift_right_arithmetic(
                _extract_lane128(row, ell_lane), jnp.int32(16))
            better = (hs[r] == 0) & (score > bs)
            return (jnp.where(better, score, bs), jnp.where(better, r, br))

        if stop_phase >= 2:
            _, best_r = jax.lax.fori_loop(rb, re + 1, sink_body,
                                          (jnp.int32(NEG), jnp.int32(N)))
        else:
            best_r = jnp.int32(N)

        # ---- phase 3: traceback; store consumed entries only ------------ #
        def tb_cond(c):
            vr, j, t, ts, done = c
            return (done == 0) & (t < t_cap)

        def tb_body(c):
            vr, j, t, ts, done = c
            at_virtual = vr == N
            vs = jnp.clip(vr, 0, N) * SUB + j // LANE
            packed = _extract_lane128(H[pl.ds(vs, 1)], j % LANE)
            move = jnp.where(
                at_virtual, HORIZ,
                31 - (jax.lax.shift_right_arithmetic(
                    packed, jnp.int32(RANK_BITS)) & 31))
            prr = packed & RANK_MASK
            is_vert = (move > P) & (move < HORIZ)
            is_horiz = move == HORIZ
            store = ~is_vert

            @pl.when(store)
            def _():
                pnode[ts] = jnp.where(is_horiz, -1,
                                      order_in[0, 0, jnp.clip(vr, 0, N)])
                ppos[ts] = j - 1

            ts2 = ts + store.astype(jnp.int32)
            j2 = jnp.where(is_vert, j, j - 1)
            vr2 = jnp.where(is_horiz, vr, prr)
            done2 = ((vr2 == N) & (j2 == 0)).astype(jnp.int32)
            return vr2, j2, t + 1, ts2, done2

        done0 = jnp.where(act0, 0, 1).astype(jnp.int32)
        vr0 = jnp.where(act0, best_r, N)
        j0 = jnp.where(act0, ell, 0)
        if stop_phase >= 3:
            vr, j, t, ts, done = jax.lax.while_loop(
                tb_cond, tb_body, (vr0, j0, jnp.int32(0), jnp.int32(0),
                                   done0))
        else:
            vr, j, t, ts, done = (vr0, j0, jnp.int32(0), jnp.int32(0),
                                  jnp.int32(1))
        overrun = (done == 0) & act0
        failed_tb = jnp.where(overrun, 1, failed0)
        ts = jnp.where(overrun | ~act0, 0, ts)

        # ---- phase 4: graph update (forward walk over stored entries) --- #
        # Old-node mutations (coverage, edges) go to the delta lists and are
        # applied after the merge; new-node state is written immediately.
        n_cols0 = col_in[0, 0, jnp.clip(nn0 - 1, 0, N)] + 1

        def upd_body(i, carry):
            (prev_res, prev_w, c, k_ins, n_new, pend, lo_key, lo_cnum,
             failed) = carry
            idx = ts - 1 - i
            act = failed == 0
            v = pnode[jnp.clip(idx, 0, LP - 1)]
            pos = ppos[jnp.clip(idx, 0, LP - 1)]
            jj = jnp.clip(pos + 1, 0, LP - 1)
            letter = seq_s[0, 0, jj]
            wt = wts_s[0, 0, jj]
            lclip = jnp.clip(letter, 0, ALPHABET - 1)
            c2 = jnp.where(act, c + 1, c)

            matched = v >= 0
            vsafe = jnp.where(matched, v, N)
            code_v = codes_in[0, 0, vsafe]
            rep_n = rep_in[0, 0, vsafe]
            sib = letn_in[0, lclip, jnp.clip(rep_n, 0, N)]

            same = matched & (code_v == letter)
            use_sib = matched & ~same & (sib >= 0)
            create = ~same & ~use_sib
            created_matched = create & matched

            new_raw = nn0 + n_new
            overflow_n = create & (new_raw >= N)
            new_id = jnp.minimum(new_raw, N)
            resolved = jnp.where(same, vsafe,
                                 jnp.where(use_sib, sib, new_id))

            # anchor key = column key of the matched node
            ak = col_in[0, 0, jnp.clip(rank_in[0, 0, vsafe], 0, N)] * KEY_SCALE
            do_close = act & matched & (pend >= 0)

            @pl.when(do_close)
            def _():
                k_run = jnp.maximum(c2 - lo_cnum - 1, 0)
                kp1 = jnp.maximum(k_run + 1, 1)
                span = ak - lo_key
                q_div = span // kp1
                rem = span - q_div * kp1

                def fix(kk, _):
                    m1 = kk + 1
                    ins_key[pend + kk] = \
                        (lo_key + q_div * m1 + (rem * m1) // kp1) | 1
                    return 0

                jax.lax.fori_loop(0, k_ins - pend, fix, 0)

            has_tail = prev_res >= 0
            ew = prev_w + wt

            # new node: write state immediately (merge skips new ids)
            @pl.when(act & create)
            def _():
                codes_out[0, 0, new_id] = letter
                cnt_out[0, 0, new_id] = jnp.int32(0)
                cov_out[0, 0, new_id] = jnp.int32(0)  # +1 via delta below
                rep_out[0, 0, new_id] = jnp.where(created_matched, rep_n,
                                                  new_id)
                p0_out[0, 0, new_id] = jnp.int32(N)
                p1_out[0, 0, new_id] = jnp.int32(N)
                pw0_out[0, 0, new_id] = jnp.int32(0)
                pw1_out[0, 0, new_id] = jnp.int32(0)
                for l in range(ALPHABET):
                    letn_out[0, l, new_id] = jnp.int32(-1)
                noderow_out[new_id, 0] = empty_row
                ins_node[jnp.clip(k_ins, 0, LP - 1)] = new_id
                ins_key[jnp.clip(k_ins, 0, LP - 1)] = ak  # run keys fixed later

            # register the letter on the column representative.  For a new
            # column the rep is the new node itself (letn_out row just
            # initialized above); for a join it is the existing rep, whose
            # letn_out row is only written at merge time — so record the
            # registration in the delta list instead.
            @pl.when(act & create & ~matched)
            def _():
                letn_out[0, lclip, new_id] = new_id

            # edge slot resolution against pre-layer state (heads are
            # touched at most once per layer, so reads from *_in are exact)
            cnt_h = jnp.where(create, 0, cnt_in[0, 0, resolved])
            hit0 = has_tail & (cnt_h >= 1) & \
                (p0_in[0, 0, resolved] == prev_res)
            hit1 = has_tail & (cnt_h >= 2) & \
                (p1_in[0, 0, resolved] == prev_res)

            def scan_body(p, found):
                hrow = noderow_out[jnp.clip(resolved, 0, N), 0]
                pid = _extract_lane(hrow, LN_PRED + p)
                return jnp.where((pid == prev_res) & (found < 0), p, found)

            deep0 = jnp.where(has_tail & ~hit0 & ~hit1, jnp.int32(-1),
                              jnp.int32(-2))
            deep = jax.lax.fori_loop(2, jnp.where(deep0 == -1, cnt_h, 0),
                                     scan_body, deep0)
            slot = jnp.where(hit0, 0, jnp.where(hit1, 1,
                             jnp.where(deep >= 0, deep, -1)))
            overflow_p = act & has_tail & (slot < 0) & (cnt_h >= P)

            @pl.when(act)
            def _():
                d_node[jnp.clip(idx, 0, LP - 1)] = resolved
                d_flag[jnp.clip(idx, 0, LP - 1)] = \
                    jnp.where(create, 0, 1) + 2 * jnp.where(
                        created_matched, 1, 0)
                d_tail[jnp.clip(idx, 0, LP - 1)] = \
                    jnp.where(has_tail, prev_res, -1)
                d_w[jnp.clip(idx, 0, LP - 1)] = ew
                # stash rep/letter for deferred column registration
                d_slot[jnp.clip(idx, 0, LP - 1)] = jnp.where(
                    created_matched,
                    slot * 8 * (N + 1) + rep_n * 8 + lclip,
                    slot * 8 * (N + 1))

            failed2 = jnp.where(act & (overflow_n | overflow_p), 1, failed)
            k_ins2 = jnp.where(act & create, k_ins + 1, k_ins)
            n_new2 = jnp.where(act & create, n_new + 1, n_new)
            pend2 = jnp.where(
                act & matched, -1,
                jnp.where(act & create & ~matched & (pend < 0), k_ins, pend))
            lo_key2 = jnp.where(act & matched, ak, lo_key)
            lo_cnum2 = jnp.where(act & matched, c2, lo_cnum)
            prev_res2 = jnp.where(act, resolved, prev_res)
            prev_w2 = jnp.where(act, wt, prev_w)
            return (prev_res2, prev_w2, c2, k_ins2, n_new2, pend2, lo_key2,
                    lo_cnum2, failed2)

        upd_init = (jnp.int32(-1), jnp.int32(0), jnp.int32(0), jnp.int32(0),
                    jnp.int32(0), jnp.int32(-1), jnp.int32(-KEY_SCALE),
                    jnp.int32(0), failed_tb)
        if stop_phase >= 4:
            (prev_res, prev_w, c_tot, k_ins, n_new, pend, lo_key, lo_cnum,
             failed_u) = jax.lax.fori_loop(0, ts, upd_body, upd_init)
        else:
            (prev_res, prev_w, c_tot, k_ins, n_new, pend, lo_key, lo_cnum,
             failed_u) = upd_init

        # trailing run: no next anchor
        @pl.when((pend >= 0) & (failed_u == 0))
        def _():
            hi_key = (n_cols0 + 1) * KEY_SCALE
            hi_cnum = c_tot + 1
            k_run = jnp.maximum(hi_cnum - lo_cnum - 1, 0)
            kp1 = jnp.maximum(k_run + 1, 1)
            span = hi_key - lo_key
            q_div = span // kp1
            rem = span - q_div * kp1

            def fix(kk, _):
                m1 = kk + 1
                ins_key[pend + kk] = \
                        (lo_key + q_div * m1 + (rem * m1) // kp1) | 1
                return 0

            jax.lax.fori_loop(0, k_ins - pend, fix, 0)

        ok = act0 & (failed_u == 0)
        n_ins = jnp.where(ok, k_ins, 0)
        n_nodes2 = jnp.where(ok, nn0 + n_new, nn0)

        # ---- phase 5: merge re-rank + old-node state copy --------------- #
        def merge_body(nr, carry):
            q, k, newcol, prev_key = carry
            qs = jnp.clip(q, 0, N)
            old_key = jnp.where(q < nn0, col_in[0, 0, qs] * KEY_SCALE,
                                INT_MAX)
            ik = jnp.where(k < n_ins,
                           ins_key[jnp.clip(k, 0, LP - 1)], INT_MAX)
            take_ins = ik < old_key
            node = jnp.where(take_ins,
                             ins_node[jnp.clip(k, 0, LP - 1)],
                             order_in[0, 0, qs])
            key = jnp.where(take_ins, ik, old_key)
            newcol2 = newcol + (key != prev_key).astype(jnp.int32)
            order_out[0, 0, nr] = node
            rank_out[0, 0, jnp.clip(node, 0, N)] = nr
            col_out[0, 0, nr] = newcol2

            @pl.when(~take_ins)
            def _():
                # copy the old node's scalar state in -> out
                nd = jnp.clip(node, 0, N)
                codes_out[0, 0, nd] = codes_in[0, 0, nd]
                cnt_out[0, 0, nd] = cnt_in[0, 0, nd]
                cov_out[0, 0, nd] = cov_in[0, 0, nd]
                rep_out[0, 0, nd] = rep_in[0, 0, nd]
                p0_out[0, 0, nd] = p0_in[0, 0, nd]
                p1_out[0, 0, nd] = p1_in[0, 0, nd]
                pw0_out[0, 0, nd] = pw0_in[0, 0, nd]
                pw1_out[0, 0, nd] = pw1_in[0, 0, nd]
                for l in range(ALPHABET):
                    letn_out[0, l, nd] = letn_in[0, l, nd]

            return (q + (1 - take_ins.astype(jnp.int32)),
                    k + take_ins.astype(jnp.int32), newcol2, key)

        if stop_phase >= 5:
            jax.lax.fori_loop(0, n_nodes2, merge_body,
                              (jnp.int32(0), jnp.int32(0), jnp.int32(-1),
                               jnp.int32(INT_MIN)))

        # ---- phase 6: apply deferred deltas ------------------------------ #
        def apply_body(i, _):
            idx = i
            head = d_node[jnp.clip(idx, 0, LP - 1)]
            flag = d_flag[jnp.clip(idx, 0, LP - 1)]
            tail = d_tail[jnp.clip(idx, 0, LP - 1)]
            w = d_w[jnp.clip(idx, 0, LP - 1)]
            packed_slot = d_slot[jnp.clip(idx, 0, LP - 1)]
            slot = packed_slot // (8 * (N + 1))
            cov_out[0, 0, head] = cov_out[0, 0, head] + 1

            @pl.when(flag >= 2)   # deferred column-letter registration
            def _():
                rl = packed_slot - slot * 8 * (N + 1)
                rep_n = rl // 8
                lclip = rl - rep_n * 8
                letn_out[0, jnp.clip(lclip, 0, ALPHABET - 1),
                         jnp.clip(rep_n, 0, N)] = head

            @pl.when(tail >= 0)
            def _():
                cnt_h = cnt_out[0, 0, head]
                new_slot = jnp.where(slot >= 0, slot, cnt_h)

                @pl.when(new_slot == 0)
                def _():
                    p0_out[0, 0, head] = tail
                    pw0_out[0, 0, head] = pw0_out[0, 0, head] + w

                @pl.when(new_slot == 1)
                def _():
                    p1_out[0, 0, head] = tail
                    pw1_out[0, 0, head] = pw1_out[0, 0, head] + w

                @pl.when(new_slot >= 2)
                def _():
                    hrow = noderow_out[jnp.clip(head, 0, N), 0]
                    h2 = jnp.where(lane1 == LN_PRED + new_slot, tail, hrow)
                    h2 = jnp.where(lane1 == LN_PREDW + new_slot, h2 + w, h2)
                    noderow_out[jnp.clip(head, 0, N), 0] = h2

                cnt_out[0, 0, head] = cnt_h + jnp.where(slot < 0, 1, 0)

            return 0

        if stop_phase >= 6:

            @pl.when(ok)
            def _():
                jax.lax.fori_loop(0, ts, apply_body, 0)

        nn_out[0, 0, 0] = n_nodes2
        nn_out[0, 0, 1] = jnp.where(act0, failed_u, failed0)

    return kernel


# --------------------------------------------------------------------- #
# host-side state packing / kernel invocation
# --------------------------------------------------------------------- #


class FusedState(NamedTuple):
    """Packed per-window graph state for the fused kernel.

    Scalar arrays are [B, 1, N+1] (SMEM blocks); noderow is the VMEM
    pred-overflow row per node (slots >= 2); letn is the per-column letter
    table indexed [letter, node-of-rep]."""
    noderow: jnp.ndarray   # [N+1, B, 1, 128] i32
    order: jnp.ndarray     # [B, 1, N+1] i32 (rank -> node)
    rank: jnp.ndarray      # [B, 1, N+1] i32 (node -> rank)
    col: jnp.ndarray       # [B, 1, N+1] i32 (rank -> dense column)
    codes: jnp.ndarray     # [B, 1, N+1] i32
    cnt: jnp.ndarray       # [B, 1, N+1] i32
    cov: jnp.ndarray       # [B, 1, N+1] i32
    rep: jnp.ndarray       # [B, 1, N+1] i32
    p0: jnp.ndarray        # [B, 1, N+1] i32 pred slot 0 (N = empty)
    p1: jnp.ndarray        # [B, 1, N+1] i32 pred slot 1
    pw0: jnp.ndarray       # [B, 1, N+1] i32
    pw1: jnp.ndarray       # [B, 1, N+1] i32
    letn: jnp.ndarray      # [B, ALPHABET, N+1] i32
    nn: jnp.ndarray        # [B, 1, 2] i32 (n_nodes, failed)


def check_capacity(N: int, match: int, mismatch: int, gap: int,
                   L: int) -> bool:
    """True when shapes/scores fit the kernel's packed-int32 cells."""
    worst = max(abs(match), abs(mismatch), abs(gap)) * (L + 1 + N + 1)
    return N <= RANK_MASK - 1 and L + 1 <= LP and worst < SCORE_LIMIT


def pack_state(state: GraphState) -> FusedState:
    """GraphState (engine layout) -> fused kernel layout."""
    B, Np1, P = state.pred.shape
    N = Np1 - 1
    LN_PRED, LN_PREDW = _lane_layout(P)

    noderow = jnp.zeros((B, Np1, NR_LANE), jnp.int32)
    noderow = noderow.at[:, :, LN_PRED:LN_PRED + P].set(state.pred)
    noderow = noderow.at[:, :, LN_PREDW:LN_PREDW + P].set(state.pred_w)
    # slots 0 and 1 are mirrored in SMEM; keep the rows canonical (empty)
    noderow = noderow.at[:, :, LN_PRED:LN_PRED + 2].set(N)
    noderow = noderow.at[:, :, LN_PREDW:LN_PREDW + 2].set(0)
    noderow = noderow.transpose(1, 0, 2)[:, :, None, :]

    b2 = jnp.arange(B)[:, None]
    order_safe = jnp.clip(state.order, 0, N)
    key_r = state.key[b2, order_safe]          # [B, N] rank-ordered keys
    col = jnp.concatenate(
        [key_r // KEY_SCALE, jnp.zeros((B, 1), jnp.int32)], axis=1)
    order = jnp.concatenate(
        [state.order, jnp.full((B, 1), N, jnp.int32)], axis=1)
    nn = jnp.stack([state.n_nodes, state.failed.astype(jnp.int32)], axis=1)
    return FusedState(
        noderow=noderow,
        order=order[:, None, :],
        rank=state.rank[:, None, :],
        col=col[:, None, :],
        codes=state.codes[:, None, :],
        cnt=state.pred_cnt[:, None, :],
        cov=state.cov[:, None, :],
        rep=state.rep[:, None, :],
        p0=state.pred[:, None, :, 0],
        p1=state.pred[:, None, :, 1],
        pw0=state.pred_w[:, None, :, 0],
        pw1=state.pred_w[:, None, :, 1],
        letn=state.letter_node.transpose(0, 2, 1),
        nn=nn[:, None, :])


def unpack_state(fs: FusedState, P: int) -> GraphState:
    """Fused layout -> GraphState (engine layout), normalized: entries for
    nodes/ranks >= n_nodes are set to the engine's sentinel values so the
    result is comparable bit-for-bit with the XLA engine state."""
    LN_PRED, LN_PREDW = _lane_layout(P)
    noderow = fs.noderow[:, :, 0, :].transpose(1, 0, 2)   # [B, N+1, 128]
    B, Np1, _ = noderow.shape
    N = Np1 - 1
    n = fs.nn[:, 0, 0]
    failed = fs.nn[:, 0, 1] > 0
    node_ar = jnp.arange(Np1, dtype=jnp.int32)[None, :]
    node_ok = node_ar < n[:, None]                         # [B, N+1]
    rank_ok = node_ar < n[:, None]

    pred = noderow[:, :, LN_PRED:LN_PRED + P]
    pred = pred.at[:, :, 0].set(fs.p0[:, 0, :])
    pred = pred.at[:, :, 1].set(fs.p1[:, 0, :])
    pred_w = noderow[:, :, LN_PREDW:LN_PREDW + P]
    pred_w = pred_w.at[:, :, 0].set(fs.pw0[:, 0, :])
    pred_w = pred_w.at[:, :, 1].set(fs.pw1[:, 0, :])
    # mask pred slots beyond cnt to the engine's sentinels (the kernel's
    # overflow rows keep stale values in never-used slots)
    slot_ar = jnp.arange(P, dtype=jnp.int32)[None, None, :]
    slot_ok = slot_ar < fs.cnt[:, 0, :, None]
    pred = jnp.where(node_ok[:, :, None] & slot_ok, pred, N)
    pred_w = jnp.where(node_ok[:, :, None] & slot_ok, pred_w, 0)

    letter_node = jnp.where(node_ok[:, :, None],
                            fs.letn.transpose(0, 2, 1), -1)
    rep = jnp.where(node_ok, fs.rep[:, 0, :], N)
    cov = jnp.where(node_ok, fs.cov[:, 0, :], 0)
    codes = jnp.where(node_ok, fs.codes[:, 0, :], PAD_CODE)
    cnt = jnp.where(node_ok, fs.cnt[:, 0, :], 0)
    rank = jnp.where(node_ok, fs.rank[:, 0, :], BIG_RANK)
    order = jnp.where(rank_ok, fs.order[:, 0, :], N)[:, :N]
    key = jnp.where(rank_ok, fs.col[:, 0, :] * KEY_SCALE, 2 ** 30)
    # engine keys are node-indexed: scatter rank-ordered keys back to nodes
    b2 = jnp.arange(B)[:, None]
    key_n = jnp.full((B, Np1), 2 ** 30, jnp.int32)
    key_n = key_n.at[b2, jnp.where(rank_ok, fs.order[:, 0, :], N)].set(
        jnp.where(rank_ok, key, 2 ** 30))
    key_n = jnp.where(node_ok, key_n, 2 ** 30)

    return GraphState(codes=codes, key=key_n, pred=pred, pred_w=pred_w,
                      pred_cnt=cnt, cov=cov, rep=rep,
                      letter_node=letter_node, order=order, rank=rank,
                      n_nodes=n, failed=failed)


@functools.partial(jax.jit, static_argnames=("p_cap",))
def pack_for_download_fused(fs: FusedState, p_cap: int):
    """Downcast the fused state for host download (the device tunnel is
    bandwidth-limited); layout matches engine.pack_for_download."""
    P = p_cap
    LN_PRED, LN_PREDW = _lane_layout(P)
    noderow = fs.noderow[:, :, 0, :].transpose(1, 0, 2)   # [B, N+1, 128]
    pred = noderow[:, :, LN_PRED:LN_PRED + P]
    pred = pred.at[:, :, 0].set(fs.p0[:, 0, :])
    pred = pred.at[:, :, 1].set(fs.p1[:, 0, :])
    pred_w = noderow[:, :, LN_PREDW:LN_PREDW + P]
    pred_w = pred_w.at[:, :, 0].set(fs.pw0[:, 0, :])
    pred_w = pred_w.at[:, :, 1].set(fs.pw1[:, 0, :])
    return dict(
        codes=fs.codes[:, 0, :].astype(jnp.int8),
        pred=pred.astype(jnp.int16),
        pred_w=pred_w,
        pred_cnt=fs.cnt[:, 0, :].astype(jnp.int16),
        cov=fs.cov[:, 0, :].astype(jnp.int16),
        order=fs.order[:, 0, :-1].astype(jnp.int16),
        rank=jnp.minimum(fs.rank[:, 0, :],
                         jnp.int32(2 ** 15 - 1)).astype(jnp.int16),
        n_nodes=fs.nn[:, 0, 0],
        failed=fs.nn[:, 0, 1] > 0,
    )


def pack_layer_tiles(seq: np.ndarray, wts: np.ndarray):
    """Host packing of layer sequences/weights into shifted (8,128) tiles.

    seq/wts: [D, B, L] int arrays (PAD_CODE / 0 beyond length).  Packed
    layout: packed[j] = seq[j-1] (pad at j=0), as in pallas_dp.
    """
    D, B, L = seq.shape
    assert L + 1 <= LP, f"layer length {L} exceeds fused row cap {LP - 1}"
    seq_t = np.full((D, B, LP), PAD_CODE, np.int32)
    seq_t[:, :, 1:L + 1] = seq
    wts_t = np.zeros((D, B, LP), np.int32)
    wts_t[:, :, 1:L + 1] = wts
    return (seq_t.reshape(D, B, SUB, LANE), wts_t.reshape(D, B, SUB, LANE))


@functools.partial(jax.jit, static_argnames=("p_cap", "match", "mismatch",
                                             "gap", "t_cap", "interpret",
                                             "stop_phase"),
                   donate_argnums=(0,))
def fused_layer_step(fs: FusedState, meta, seq_t, wts_t, p_cap: int,
                     match: int, mismatch: int, gap: int, t_cap: int,
                     interpret: bool = False,
                     stop_phase: int = 9) -> FusedState:
    """Run one fused layer step over the window batch.

    meta:  [B, 1, 8] i32 (begin, end, full, length, active, 0, 0, 0)
    seq_t: [B, 8, 128] i32 shifted layer codes
    wts_t: [B, 8, 128] i32 shifted layer weights
    """
    Np1, B = fs.noderow.shape[0], fs.noderow.shape[1]
    N = Np1 - 1
    P = p_cap
    kernel = make_fused_kernel(N, P, t_cap, match, mismatch, gap,
                               stop_phase=stop_phase)
    seq_s = seq_t.reshape(B, 1, LP)
    wts_s = wts_t.reshape(B, 1, LP)

    smem = lambda w: pl.BlockSpec((1, 1, w), lambda b: (b, 0, 0),
                                  memory_space=pltpu.SMEM)
    smem_let = pl.BlockSpec((1, ALPHABET, Np1), lambda b: (b, 0, 0),
                            memory_space=pltpu.SMEM)
    vrow = pl.BlockSpec((Np1, 1, 1, NR_LANE), lambda b: (0, b, 0, 0),
                        memory_space=pltpu.VMEM)
    sds = jax.ShapeDtypeStruct
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            smem(8),                                      # meta
            smem(2),                                      # nn
            smem(Np1), smem(Np1), smem(Np1),              # order rank col
            smem(Np1), smem(Np1), smem(Np1), smem(Np1),   # codes cnt cov rep
            smem(Np1), smem(Np1), smem(Np1), smem(Np1),   # p0 p1 pw0 pw1
            smem_let,                                     # letn
            vrow,                                         # noderow
            pl.BlockSpec((1, SUB, LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),        # seq tile
            smem(LP), smem(LP),                           # seq_s wts_s
        ],
        out_specs=[
            smem(2),                                      # nn
            smem(Np1), smem(Np1), smem(Np1),              # order rank col
            smem(Np1), smem(Np1), smem(Np1), smem(Np1),   # codes cnt cov rep
            smem(Np1), smem(Np1), smem(Np1), smem(Np1),   # p0 p1 pw0 pw1
            smem_let,                                     # letn
            vrow,                                         # noderow
        ],
        out_shape=[
            sds((B, 1, 2), jnp.int32),
        ] + [sds((B, 1, Np1), jnp.int32)] * 11 + [
            sds((B, ALPHABET, Np1), jnp.int32),
            sds((Np1, B, 1, NR_LANE), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Np1 * SUB, LANE), jnp.int32),     # H (packed)
            pltpu.SMEM((Np1,), jnp.int32),                # hs
            pltpu.SMEM((LP,), jnp.int32),                 # pnode
            pltpu.SMEM((LP,), jnp.int32),                 # ppos
            pltpu.SMEM((LP,), jnp.int32),                 # ins_node
            pltpu.SMEM((LP,), jnp.int32),                 # ins_key
            pltpu.SMEM((LP,), jnp.int32),                 # d_node
            pltpu.SMEM((LP,), jnp.int32),                 # d_tail
            pltpu.SMEM((LP,), jnp.int32),                 # d_w
            pltpu.SMEM((LP,), jnp.int32),                 # d_slot
            pltpu.SMEM((LP,), jnp.int32),                 # d_flag
        ],
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5, 7: 6,
                              8: 7, 9: 8, 10: 9, 11: 10, 12: 11, 13: 12,
                              14: 13},
        interpret=interpret,
    )(meta, fs.nn, fs.order, fs.rank, fs.col, fs.codes, fs.cnt, fs.cov,
      fs.rep, fs.p0, fs.p1, fs.pw0, fs.pw1, fs.letn, fs.noderow,
      seq_t, seq_s, wts_s)
    (nn, order, rank, col, codes, cnt, cov, rep, p0, p1, pw0, pw1, letn,
     noderow) = outs
    return FusedState(noderow=noderow, order=order, rank=rank, col=col,
                      codes=codes, cnt=cnt, cov=cov, rep=rep, p0=p0, p1=p1,
                      pw0=pw0, pw1=pw1, letn=letn, nn=nn)


@functools.partial(jax.jit, static_argnames=("p_cap", "match", "mismatch",
                                             "gap", "t_cap", "interpret"),
                   donate_argnums=(0,))
def fused_layer_step_at(fs: FusedState, metas, seqs, wtss, d, p_cap: int,
                        match: int, mismatch: int, gap: int, t_cap: int,
                        interpret: bool = False) -> FusedState:
    """One fused step, slicing layer ``d`` out of stacked [D, B, ...] arrays
    on device — one host->device upload per bucket."""
    sl = lambda x: jax.lax.dynamic_index_in_dim(x, d, axis=0, keepdims=False)
    return fused_layer_step(fs, sl(metas), sl(seqs), sl(wtss), p_cap=p_cap,
                            match=match, mismatch=mismatch, gap=gap,
                            t_cap=t_cap, interpret=interpret)




@functools.partial(jax.jit, static_argnames=("n_cap", "p_cap"))
def init_fused(backbone: jnp.ndarray, backbone_w: jnp.ndarray,
               backbone_len: jnp.ndarray, n_cap: int,
               p_cap: int) -> FusedState:
    """Initialize the fused state directly from the backbone chain
    (equivalent to engine.init_graphs + pack_state, without the scatters).

    backbone: [B, L0] i32 codes; backbone_w: [B, L0] i32; backbone_len: [B].
    """
    B, L0 = backbone.shape
    N = n_cap
    P = p_cap
    ar = jnp.arange(N + 1, dtype=jnp.int32)
    valid = ar[None, :] < backbone_len[:, None]            # [B, N+1]
    first = ar[None, :] == 0

    pad = jnp.full((B, N + 1 - L0), PAD_CODE, jnp.int32)
    codes = jnp.concatenate(
        [jnp.where(valid[:, :L0], backbone, PAD_CODE), pad], axis=1)
    zpad = jnp.zeros((B, N + 1 - L0), jnp.int32)
    w_edge = backbone_w + jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), backbone_w[:, :-1]], axis=1)
    pw0 = jnp.concatenate(
        [jnp.where(valid[:, :L0] & ~first[:, :L0], w_edge, 0), zpad], axis=1)

    order = jnp.where(valid, ar[None, :], N)
    order = order.at[:, N].set(N)
    rank = jnp.where(valid, ar[None, :], BIG_RANK)
    col = jnp.where(valid, ar[None, :], 0)
    cnt = (valid & ~first).astype(jnp.int32)
    cov = valid.astype(jnp.int32)
    rep = jnp.where(valid, ar[None, :], N)
    p0 = jnp.where(valid & ~first, ar[None, :] - 1, N)

    lclip = jnp.clip(codes, 0, ALPHABET - 1)
    letn = jnp.stack(
        [jnp.where(valid & (lclip == l), ar[None, :], -1)
         for l in range(ALPHABET)], axis=1)                # [B, A, N+1]

    LN_PRED, LN_PREDW = _lane_layout(P)
    lane = jnp.arange(NR_LANE, dtype=jnp.int32)
    empty_row = jnp.where((lane >= LN_PRED) & (lane < LN_PRED + P), N, 0)
    noderow = jnp.broadcast_to(empty_row[None, None, None, :],
                               (N + 1, B, 1, NR_LANE)).astype(jnp.int32)

    nn = jnp.stack([backbone_len.astype(jnp.int32),
                    jnp.zeros((B,), jnp.int32)], axis=1)[:, None, :]
    full_n = jnp.full((B, 1, N + 1), N, jnp.int32)
    return FusedState(
        noderow=noderow, order=order[:, None, :], rank=rank[:, None, :],
        col=col[:, None, :], codes=codes[:, None, :], cnt=cnt[:, None, :],
        cov=cov[:, None, :], rep=rep[:, None, :], p0=p0[:, None, :],
        p1=full_n, pw0=pw0[:, None, :],
        pw1=jnp.zeros((B, 1, N + 1), jnp.int32), letn=letn, nn=nn)

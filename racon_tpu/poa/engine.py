"""Batched POA engine: dense, static-shape partial-order alignment in JAX.

This is the TPU-native replacement for the reference's consensus kernels
(spoa's SIMD DP, reference: src/window.cpp:65-149, and cudapoa's batched GPU
POA, reference: src/cuda/cudabatch.cpp) — redesigned for XLA rather than
translated:

  * windows are packed into dense length/depth buckets; the whole bucket is
    one jitted program (scan over layers),
  * the graph lives in fixed-capacity arrays: codes/pred-lists/edge-weights/
    coverage/column-keys, batch axis leading — shardable over a device mesh
    with `jax.sharding` (the batch axis is the framework's data-parallel
    axis, SURVEY.md §2d),
  * per layer: NW-on-DAG forward DP (sequential over topological ranks,
    vectorized over batch x sequence; the horizontal closure is a prefix
    max), backpointer traceback (while_loop), and a fully *vectorized*
    graph update — the key design point: resolution of matched letters into
    existing nodes / column siblings / new nodes, insertion-key
    interpolation, edge insertion, and rank re-sorting are all conflict-free
    vector ops because each column, node, and edge-head is touched at most
    once per layer,
  * windows that exceed capacity (nodes, predecessor slots) are flagged and
    re-polished on the host oracle, mirroring the reference's GPU->CPU
    fallback (src/cuda/cudapolisher.cpp:354-378).

Scores are exact int32, and the topological ordering uses the same scaled
integer column keys as the host oracle (racon_tpu/poa/graph.py), so engine
and oracle build bit-identical graphs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.int32(-(1 << 30))
KEY_SCALE = 1 << 16
ALPHABET = 5          # A C G T other
PAD_CODE = 7          # never matches


class GraphState(NamedTuple):
    """Batched POA graph; all arrays have leading batch axis B.

    Node capacity N; slot N is a dummy target for masked scatters.
    """
    codes: jnp.ndarray        # [B, N+1] i32, base code per node
    key: jnp.ndarray          # [B, N+1] i32, scaled column sort key
    pred: jnp.ndarray         # [B, N+1, P] i32, in-edge tails (N = empty)
    pred_w: jnp.ndarray       # [B, N+1, P] i32, in-edge total weights
    pred_cnt: jnp.ndarray     # [B, N+1] i32
    cov: jnp.ndarray          # [B, N+1] i32, sequences touching node
    rep: jnp.ndarray          # [B, N+1] i32, column representative node
    letter_node: jnp.ndarray  # [B, N+1, ALPHABET] i32, column member per letter (-1)
    order: jnp.ndarray        # [B, N] i32, rank -> node
    rank: jnp.ndarray         # [B, N+1] i32, node -> rank (N -> huge)
    n_nodes: jnp.ndarray      # [B] i32
    failed: jnp.ndarray       # [B] bool, capacity overflow -> host fallback


class LayerBatch(NamedTuple):
    """One layer (read segment) per window, padded to L."""
    seq: jnp.ndarray      # [B, L] i32 codes (PAD_CODE beyond length)
    weights: jnp.ndarray  # [B, L] i32
    length: jnp.ndarray   # [B] i32
    begin: jnp.ndarray    # [B] i32 backbone node id of layer begin
    end: jnp.ndarray      # [B] i32 backbone node id of layer end
    full: jnp.ndarray     # [B] bool, align against the full graph
    active: jnp.ndarray   # [B] bool, window has this layer


def init_graphs(backbone: jnp.ndarray, backbone_w: jnp.ndarray,
                backbone_len: jnp.ndarray, n_cap: int,
                p_cap: int) -> GraphState:
    """Initialize per-window graphs from the backbone chain.

    backbone: [B, L0] i32 codes; backbone_w: [B, L0] i32 weights;
    backbone_len: [B] i32.
    """
    B, L0 = backbone.shape
    N = n_cap
    ar = jnp.arange(N, dtype=jnp.int32)
    valid = ar[None, :] < backbone_len[:, None]            # [B, N]

    codes = jnp.full((B, N + 1), PAD_CODE, jnp.int32)
    codes = codes.at[:, :L0].set(jnp.where(valid[:, :L0], backbone, PAD_CODE))

    key = jnp.full((B, N + 1), jnp.int32(2**30), jnp.int32)
    key = key.at[:, :N].set(jnp.where(valid, ar * KEY_SCALE, jnp.int32(2**30)))

    pred = jnp.full((B, N + 1, 1), N, jnp.int32)
    pred = jnp.broadcast_to(pred, (B, N + 1, p_cap)).copy()
    first = ar[None, :L0] == 0
    chain_pred = jnp.where(valid[:, :L0] & ~first, ar[None, :L0] - 1, N)
    pred = pred.at[:, :L0, 0].set(chain_pred)

    pred_w = jnp.zeros((B, N + 1, p_cap), jnp.int32)
    w_edge = backbone_w + jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), backbone_w[:, :-1]], axis=1)
    pred_w = pred_w.at[:, :L0, 0].set(
        jnp.where(valid[:, :L0] & ~first, w_edge, 0))

    pred_cnt = jnp.zeros((B, N + 1), jnp.int32)
    pred_cnt = pred_cnt.at[:, :L0].set(
        jnp.where(valid[:, :L0] & ~first, 1, 0))

    cov = jnp.zeros((B, N + 1), jnp.int32)
    cov = cov.at[:, :L0].set(valid[:, :L0].astype(jnp.int32))

    rep = jnp.full((B, N + 1), N, jnp.int32)
    rep = rep.at[:, :N].set(jnp.where(valid, ar, N))

    letter_node = jnp.full((B, N + 1, ALPHABET), -1, jnp.int32)
    lcode = jnp.clip(codes[:, :L0], 0, ALPHABET - 1)
    letter_node = letter_node.at[
        jnp.arange(B)[:, None], ar[None, :L0], lcode].set(
        jnp.where(valid[:, :L0], ar[None, :L0], -1))

    order = jnp.where(valid, ar, N)
    rank = jnp.full((B, N + 1), jnp.int32(2**30), jnp.int32)
    rank = rank.at[:, :N].set(jnp.where(valid, ar, jnp.int32(2**30)))

    return GraphState(codes=codes, key=key, pred=pred, pred_w=pred_w,
                      pred_cnt=pred_cnt, cov=cov, rep=rep,
                      letter_node=letter_node, order=order, rank=rank,
                      n_nodes=backbone_len.astype(jnp.int32),
                      failed=jnp.zeros((B,), bool))


# --------------------------------------------------------------------- #
# forward DP
# --------------------------------------------------------------------- #

def _forward_dp(state: GraphState, layer: LayerBatch, match: int,
                mismatch: int, gap: int, rb: jnp.ndarray, re: jnp.ndarray):
    """NW-on-DAG forward pass over topological ranks.

    Score/backpointer rows are indexed by RANK, not node id, so the per-step
    write is a pure dynamic_update_slice at a batch-uniform index (fast,
    in-place in the loop) rather than a scatter.  Pred rows are gathered by
    rank.  Slot N is the virtual source row.

    Returns (H [N+1,B,L+1] i32, bp [N+1,B,L+1] i8, has_succ [B,N+1] bool —
    has_succ indexed by node id).
    Backpointer encoding: diag via pred slot p -> p; vertical -> PV + p;
    horizontal -> 2*PV; slot P means the virtual source row.
    """
    B, Np1, P = state.pred.shape
    N = Np1 - 1
    L = layer.seq.shape[1]
    PV = P + 1
    barange = jnp.arange(B)

    jgap = gap * jnp.arange(L + 1, dtype=jnp.int32)          # [L+1]
    H0 = jnp.full((N + 1, B, L + 1), NEG_INF, jnp.int32)
    H0 = H0.at[N].set(jnp.broadcast_to(jgap, (B, L + 1)))
    bp0 = jnp.zeros((N + 1, B, L + 1), jnp.int8)

    has_succ = _compute_has_succ(state, layer, rb, re)

    m_i = jnp.int32(match)
    x_i = jnp.int32(mismatch)
    g_i = jnp.int32(gap)

    def body(r, carry):
        H, bp = carry
        v = state.order[:, r]                                # [B]
        process = layer.active & ~state.failed & (rb <= r) & (r <= re)

        pred_ids = state.pred[barange[:, None], v[:, None],
                              jnp.arange(P)[None, :]]        # [B, P]
        pr = state.rank[barange[:, None], pred_ids]          # [B, P]
        valid = (pred_ids < N) & (pr >= rb[:, None]) & (pr <= re[:, None])
        use_virtual = ~valid.any(axis=1)                     # [B]

        # gather pred rows by rank from the flat [(N+1)*B, L+1] view
        pr_safe = jnp.where(valid, pr, N)
        flat = H.reshape((N + 1) * B, L + 1)
        rows = flat[pr_safe * B + barange[:, None]]          # [B, P, L+1]
        rows = jnp.where(valid[:, :, None], rows, NEG_INF)
        vrow = jnp.where(use_virtual[:, None], jgap[None, :], NEG_INF)
        rows = jnp.concatenate([rows, vrow[:, None, :]], axis=1)  # [B,PV,L+1]

        code_v = state.codes[barange, v]                     # [B]
        prof = jnp.where(layer.seq == code_v[:, None], m_i, x_i)  # [B, L]

        diag = rows[:, :, :-1] + prof[:, None, :]            # [B, PV, L]
        vert = rows + g_i                                    # [B, PV, L+1]

        row = jnp.max(vert, axis=1)                          # [B, L+1]
        row = row.at[:, 1:].max(jnp.max(diag, axis=1))
        # horizontal closure: prefix max of (row - j*gap) + j*gap
        row = jax.lax.cummax(row - jgap[None, :], axis=1) + jgap[None, :]

        # backpointers (priority: diag by slot, vert by slot, horiz)
        diag_ok = jnp.concatenate(
            [jnp.zeros((B, PV, 1), bool), diag == row[:, None, 1:]], axis=2)
        vert_ok = vert == row[:, None, :]
        any_diag = diag_ok.any(axis=1)
        any_vert = vert_ok.any(axis=1)
        bp_row = jnp.where(
            any_diag, jnp.argmax(diag_ok, axis=1),
            jnp.where(any_vert, PV + jnp.argmax(vert_ok, axis=1), 2 * PV))
        bp_row = bp_row.astype(jnp.int8)

        old_row = jax.lax.dynamic_slice(H, (r, 0, 0), (1, B, L + 1))[0]
        old_bp = jax.lax.dynamic_slice(bp, (r, 0, 0), (1, B, L + 1))[0]
        H = jax.lax.dynamic_update_slice(
            H, jnp.where(process[:, None], row, old_row)[None], (r, 0, 0))
        bp = jax.lax.dynamic_update_slice(
            bp, jnp.where(process[:, None], bp_row, old_bp)[None], (r, 0, 0))
        return H, bp

    r_lo = jnp.min(jnp.where(layer.active & ~state.failed, rb, jnp.int32(N)))
    r_hi = jnp.max(jnp.where(layer.active & ~state.failed, re, jnp.int32(-1)))
    H, bp = jax.lax.fori_loop(r_lo, r_hi + 1, body, (H0, bp0))
    return H, bp, has_succ


def _compute_has_succ(state: GraphState, layer: LayerBatch, rb, re):
    """has_succ[b, v]: node v has an in-range successor (vectorized pass;
    used for sink detection in both the XLA and Pallas paths)."""
    B, Np1, P = state.pred.shape
    N = Np1 - 1
    barange = jnp.arange(B)
    u_in_range = (state.rank[:, :N] >= rb[:, None]) & \
                 (state.rank[:, :N] <= re[:, None]) & \
                 (layer.active & ~state.failed)[:, None]      # [B, N]
    pred_all = state.pred[:, :N, :]                           # [B, N, P]
    p_rank = jnp.take_along_axis(
        state.rank, pred_all.reshape(B, N * P), axis=1).reshape(B, N, P)
    edge_ok = (pred_all < N) & (p_rank >= rb[:, None, None]) & \
              (p_rank <= re[:, None, None]) & u_in_range[:, :, None]
    has_succ = jnp.zeros((B, N + 1), bool)
    has_succ = has_succ.at[
        barange[:, None, None],
        jnp.where(edge_ok, pred_all, N)].set(True)
    return has_succ


# --------------------------------------------------------------------- #
# traceback
# --------------------------------------------------------------------- #

def _traceback(state: GraphState, layer: LayerBatch, H, bp, has_succ,
               rb, re, t_cap: int):
    """Walk backpointers from the best sink; returns the alignment path in
    forward order: path_node [B, T] (-1 = none), path_pos [B, T] (-1 = none),
    path_len [B]."""
    B, Np1, P = state.pred.shape
    N = Np1 - 1
    L = layer.seq.shape[1]
    PV = P + 1
    barange = jnp.arange(B)

    node_rank = state.rank[:, :N]                             # [B, N]
    in_range = (node_rank >= rb[:, None]) & (node_rank <= re[:, None])
    sink_ok = in_range & ~has_succ[:, :N]
    # H is rank-indexed [N+1, B, L+1]: fetch H[rank(v), b, length(b)]
    hflat = H.reshape(-1)
    rank_safe = jnp.where(sink_ok, node_rank, N)
    hidx = (rank_safe * B + barange[:, None]) * (L + 1) + \
        layer.length[:, None]
    Hl = hflat[hidx]                                          # [B, N]
    comp = jnp.where(sink_ok, Hl * jnp.int32(4096) +
                     (jnp.int32(N - 1) - node_rank), jnp.int32(-2**31 + 1))
    best_v = jnp.argmax(comp, axis=1).astype(jnp.int32)       # [B]

    path_node = jnp.full((B, t_cap), -1, jnp.int32)
    path_pos = jnp.full((B, t_cap), -1, jnp.int32)

    def cond(c):
        v, j, t, done, pn, pp = c
        return jnp.any(~done & (t < t_cap))

    bpflat = bp.reshape(-1)

    def step(c):
        v, j, t, done, pn, pp = c
        at_virtual = v == N
        vr = state.rank[barange, v]                           # rank of v
        vr = jnp.where(at_virtual, N, vr)
        b = bpflat[(vr * B + barange) * (L + 1) + j]          # [B] i8
        move = b.astype(jnp.int32)
        is_diag = ~at_virtual & (move < PV)
        is_vert = ~at_virtual & (move >= PV) & (move < 2 * PV)
        is_horiz = at_virtual | (move == 2 * PV)

        slot = jnp.where(is_diag, move, move - PV)            # pred slot
        slot = jnp.clip(slot, 0, P)
        pred_id = jnp.where(slot == P, N,
                            state.pred[barange, v, jnp.clip(slot, 0, P - 1)])

        emit_node = jnp.where(is_horiz, -1, v)
        emit_pos = jnp.where(is_vert, -1, j - 1)

        act = ~done & (t < t_cap)
        tw = jnp.where(act, t, t_cap - 1)
        pn = pn.at[barange, tw].set(jnp.where(act, emit_node, pn[barange, tw]))
        pp = pp.at[barange, tw].set(jnp.where(act, emit_pos, pp[barange, tw]))

        v2 = jnp.where(is_horiz, v, pred_id)
        j2 = jnp.where(is_vert, j, j - 1)
        v = jnp.where(act, v2, v)
        j = jnp.where(act, j2, j)
        t = jnp.where(act, t + 1, t)
        done = done | ((v == N) & (j == 0)) | ~layer.active | state.failed
        return v, j, t, done, pn, pp

    done0 = ~layer.active | state.failed
    v0 = jnp.where(done0, N, best_v)
    j0 = jnp.where(done0, 0, layer.length)
    t0 = jnp.zeros((B,), jnp.int32)
    v, j, t, done, pn, pp = jax.lax.while_loop(
        cond, step, (v0, j0, t0, done0, path_node, path_pos))

    # a window that exhausted t_cap without finishing is a failure
    overrun = ~done
    # reverse each path into forward order
    idx = t[:, None] - 1 - jnp.arange(t_cap)[None, :]
    gather = jnp.clip(idx, 0, t_cap - 1)
    fpn = jnp.where(idx >= 0, pn[barange[:, None], gather], -1)
    fpp = jnp.where(idx >= 0, pp[barange[:, None], gather], -1)
    return fpn, fpp, t, overrun


# --------------------------------------------------------------------- #
# vectorized graph update
# --------------------------------------------------------------------- #

def _update_graph(state: GraphState, layer: LayerBatch, path_node, path_pos,
                  path_len, overrun) -> GraphState:
    """Fuse the aligned layer into the graph — fully vectorized.

    Conflict-freedom within one layer (each guaranteed by the path being a
    simple rank-monotone walk): every column gains at most one member, every
    head node gains at most one in-edge, every node's coverage rises at most
    once, so all scatters are collision-free.
    """
    B, Np1, P = state.pred.shape
    N = Np1 - 1
    T = path_node.shape[1]
    barange = jnp.arange(B)
    b2 = barange[:, None]
    tar = jnp.arange(T)[None, :]

    active = layer.active & ~state.failed & ~overrun

    consumed = (path_pos >= 0) & active[:, None]              # [B, T]
    pos_safe = jnp.clip(path_pos, 0, layer.seq.shape[1] - 1)
    letter = layer.seq[b2, pos_safe]                          # [B, T]
    lclip = jnp.clip(letter, 0, ALPHABET - 1)
    wts = layer.weights[b2, pos_safe]

    matched = consumed & (path_node >= 0)
    node_safe = jnp.where(matched, path_node, N)
    node_code = state.codes[b2, node_safe]
    same = matched & (node_code == letter)

    rep_n = state.rep[b2, node_safe]                          # [B, T]
    sib = state.letter_node[b2, rep_n, lclip]                 # [B, T]
    use_sib = matched & ~same & (sib >= 0)

    create = consumed & ~same & ~use_sib
    new_off = jnp.cumsum(create, axis=1, dtype=jnp.int32)
    new_id = state.n_nodes[:, None] + new_off - 1             # valid where create

    resolved = jnp.where(same, path_node,
                         jnp.where(use_sib, sib,
                                   jnp.where(create, new_id, -1)))

    # --- keys -----------------------------------------------------------
    node_key = state.key[b2, node_safe]
    anchor = consumed & (same | use_sib | (create & matched))  # key known
    anchor_key = jnp.where(matched, node_key, 0)

    cnum = jnp.cumsum(consumed, axis=1, dtype=jnp.int32)      # consumed index+1
    # forward fill: last anchor position/key/cnum up to (and incl.) each t
    a_idx = jnp.where(anchor, tar, -1)
    prev_idx = jax.lax.cummax(a_idx, axis=1)
    has_prev = prev_idx >= 0
    prev_gather = jnp.clip(prev_idx, 0, T - 1)
    lo = jnp.where(has_prev, anchor_key[b2, prev_gather], -KEY_SCALE)
    lo_cnum = jnp.where(has_prev, cnum[b2, prev_gather], 0)
    # backward fill: next anchor
    a_idx_r = jnp.where(anchor, T - 1 - tar, -1)
    next_rev = jax.lax.cummax(a_idx_r[:, ::-1], axis=1)[:, ::-1]
    has_next = next_rev >= 0
    next_idx = jnp.clip(T - 1 - next_rev, 0, T - 1)
    # number of columns before this layer = n_nodes' column count; the
    # renormalized keys are dense, so max key / SCALE + 1 = column count
    n_cols = jnp.max(jnp.where(
        jnp.arange(N)[None, :] < state.n_nodes[:, None],
        state.key[:, :N], 0), axis=1) // KEY_SCALE + 1
    hi = jnp.where(has_next, anchor_key[b2, next_idx],
                   (n_cols[:, None] + 1) * KEY_SCALE)
    hi_cnum = jnp.where(has_next, cnum[b2, next_idx],
                        jnp.max(cnum, axis=1, keepdims=True) + 1)

    m_pos = cnum - lo_cnum - 1                                # 0-based in run
    k_run = jnp.maximum(hi_cnum - lo_cnum - 1, 0)
    # lo + (hi-lo)*(m+1)//(k+1) without int64:
    #   = lo + q*(m+1) + (rem*(m+1))//(k+1),  q,rem = divmod(hi-lo, k+1)
    kp1 = jnp.maximum(k_run + 1, 1)
    span = hi - lo
    q_div = span // kp1
    rem = span - q_div * kp1
    # forced ODD so run keys never collide with (even) column keys
    interp = (lo + q_div * (m_pos + 1) + (rem * (m_pos + 1)) // kp1) | 1

    created_unmatched = create & ~matched
    created_matched = create & matched
    new_key = jnp.where(created_matched, node_key, interp)

    # --- apply new nodes -------------------------------------------------
    new_total = new_off[:, -1]
    n_nodes2 = state.n_nodes + jnp.where(active, new_total, 0)
    failed = state.failed | (n_nodes2 > N) | (overrun & layer.active)
    ok = ~failed & active

    widx = jnp.where(create & ok[:, None] & (new_id < N), new_id, N)  # [B, T]
    codes = state.codes.at[b2, widx].set(
        jnp.where(widx < N, letter, state.codes[b2, widx]))
    key = state.key.at[b2, widx].set(
        jnp.where(widx < N, new_key, state.key[b2, widx]))
    new_rep = jnp.where(created_matched, rep_n, new_id)
    rep = state.rep.at[b2, widx].set(
        jnp.where(widx < N, new_rep, state.rep[b2, widx]))
    # register letter in the column table (column touched once per layer)
    ln_row = jnp.where(create & ok[:, None], new_rep, N)
    letter_node = state.letter_node.at[b2, ln_row, lclip].set(
        jnp.where(ln_row < N, new_id, state.letter_node[b2, ln_row, lclip]))

    # --- coverage ---------------------------------------------------------
    cov_idx = jnp.where(consumed & ok[:, None], resolved, N)
    cov = state.cov.at[b2, cov_idx].add(
        jnp.where(cov_idx < N, 1, 0))

    # --- edges -------------------------------------------------------------
    # tail = previous consumed entry's resolved node (forward fill)
    c_idx = jnp.where(consumed, tar, -1)
    prev_c = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32),
         jax.lax.cummax(c_idx, axis=1)[:, :-1]], axis=1)
    has_tail = prev_c >= 0
    tail = jnp.where(has_tail,
                     resolved[b2, jnp.clip(prev_c, 0, T - 1)], -1)
    is_edge = consumed & has_tail & ok[:, None]
    head = jnp.where(is_edge, resolved, N)
    tailc = jnp.where(is_edge, tail, N)
    w_prev = jnp.where(has_tail,
                       wts[b2, jnp.clip(prev_c, 0, T - 1)], 0)
    e_w = jnp.where(is_edge, w_prev + wts, 0)

    # existing slot?
    head_preds = state.pred[b2, head]                          # [B, T, P]
    slot_hit = head_preds == tailc[:, :, None]
    exists = slot_hit.any(axis=2) & is_edge
    hit_slot = jnp.argmax(slot_hit, axis=2)

    cnt = state.pred_cnt[b2, head]
    new_slot = jnp.clip(cnt, 0, P - 1)
    slot = jnp.where(exists, hit_slot, new_slot)
    slot_overflow = is_edge & ~exists & (cnt >= P)
    failed = failed | slot_overflow.any(axis=1)
    oke = is_edge & ~slot_overflow

    headw = jnp.where(oke, head, N)
    pred = state.pred.at[b2, headw, slot].set(
        jnp.where(oke & ~exists, tailc, state.pred[b2, headw, slot]))
    pred_w = state.pred_w.at[b2, headw, slot].add(
        jnp.where(oke, e_w, 0))
    pred_cnt = state.pred_cnt.at[b2, headw].add(
        jnp.where(oke & ~exists, 1, 0))

    # --- re-rank ------------------------------------------------------------
    ar = jnp.arange(N, dtype=jnp.int32)
    node_valid = ar[None, :] < n_nodes2[:, None]
    rep_v = jnp.where(node_valid, rep[:, :N], N)
    key_v = jnp.where(node_valid, key[:, :N], jnp.int32(2**30))
    ids = jnp.broadcast_to(ar[None, :], (B, N))
    # lexicographic (key, rep, id); jnp.lexsort's last key is primary
    order_raw = jnp.lexsort((ids, rep_v, key_v), axis=1).astype(jnp.int32)
    rank = jnp.zeros((B, N), jnp.int32)
    rank = rank.at[b2, order_raw].set(jnp.broadcast_to(ar[None, :], (B, N)))
    rank = jnp.where(node_valid, rank, jnp.int32(2**30))
    rank_full = jnp.concatenate(
        [rank, jnp.full((B, 1), jnp.int32(2**30))], axis=1)
    valid_sorted = ar[None, :] < n_nodes2[:, None]
    order = jnp.where(valid_sorted, order_raw, N)

    # renormalize keys to dense column indices
    key_sorted = key[b2, order]          # key[N] is the 2**30 sentinel
    changed = jnp.concatenate(
        [jnp.ones((B, 1), jnp.int32),
         (key_sorted[:, 1:] != key_sorted[:, :-1]).astype(jnp.int32)], axis=1)
    col_idx = jnp.cumsum(jnp.where(valid_sorted, changed, 0), axis=1) - 1
    new_keys_sorted = jnp.where(valid_sorted, col_idx * KEY_SCALE,
                                key_sorted)
    key2 = key.at[b2, order].set(new_keys_sorted)

    # only commit for active windows
    def keep(new, old):
        mask = ok
        extra = (1,) * (new.ndim - 1)
        return jnp.where(mask.reshape((B,) + extra), new, old)

    return GraphState(
        codes=keep(codes, state.codes),
        key=keep(key2, state.key),
        pred=keep(pred, state.pred),
        pred_w=keep(pred_w, state.pred_w),
        pred_cnt=keep(pred_cnt, state.pred_cnt),
        cov=keep(cov, state.cov),
        rep=keep(rep, state.rep),
        letter_node=keep(letter_node, state.letter_node),
        order=keep(order, state.order),
        rank=keep(rank_full, state.rank),
        n_nodes=jnp.where(ok, n_nodes2, state.n_nodes),
        failed=failed)


# --------------------------------------------------------------------- #
# layer step + bucket runner
# --------------------------------------------------------------------- #

def add_layer(state: GraphState, layer: LayerBatch, match: int, mismatch: int,
              gap: int, t_cap: int, use_pallas: bool = False) -> GraphState:
    B, Np1, P = state.pred.shape
    N = Np1 - 1
    begin_rank = state.rank[jnp.arange(B), jnp.clip(layer.begin, 0, N - 1)]
    end_rank = state.rank[jnp.arange(B), jnp.clip(layer.end, 0, N - 1)]
    rb = jnp.where(layer.full, 0, begin_rank)
    re = jnp.where(layer.full, state.n_nodes - 1, end_rank)

    if use_pallas:
        pn, pp, plen, overrun = _align_pallas(state, layer, match, mismatch,
                                              gap, rb, re, t_cap)
    else:
        H, bp, has_succ = _forward_dp(state, layer, match, mismatch, gap,
                                      rb, re)
        pn, pp, plen, overrun = _traceback(state, layer, H, bp, has_succ,
                                           rb, re, t_cap)
    return _update_graph(state, layer, pn, pp, plen, overrun)


def _align_pallas(state: GraphState, layer: LayerBatch, match: int,
                  mismatch: int, gap: int, rb, re, t_cap: int):
    """DP + traceback through the Pallas kernel (racon_tpu/poa/pallas_dp.py):
    pre-gather the graph into rank space, run the kernel, map the reversed
    rank path back to node ids in forward order."""
    from racon_tpu.poa import pallas_dp as PK

    B, Np1, P = state.pred.shape
    N = Np1 - 1
    L = layer.seq.shape[1]
    if L + 1 > PK.LP:
        raise ValueError(f"layer length {L} exceeds Pallas row cap {PK.LP - 1}")
    barange = jnp.arange(B)
    b2 = barange[:, None]

    order_safe = jnp.clip(state.order, 0, N)                  # [B, N]
    codes_r = jnp.concatenate(
        [state.codes[b2, order_safe],
         jnp.full((B, 1), PAD_CODE, jnp.int32)], axis=1)      # [B, N+1]
    pred_n = state.pred[b2, order_safe]                       # [B, N, P]
    predr_n = jnp.where(
        pred_n < N,
        jnp.take_along_axis(state.rank, pred_n.reshape(B, N * P),
                            axis=1).reshape(B, N, P), -1)
    predr = jnp.concatenate(
        [predr_n, jnp.full((B, 1, P), -1, jnp.int32)], axis=1)

    seq_shift = jnp.full((B, PK.LP), PAD_CODE, jnp.int32)
    seq_shift = seq_shift.at[:, 1:L + 1].set(layer.seq)
    seq_shift = seq_shift.reshape(B, PK.SUB, PK.LANE)

    active_b = layer.active & ~state.failed
    active = active_b.astype(jnp.int32)
    # inactive windows carry garbage ranks; give them an empty loop range
    # (the kernel's per-window fori would otherwise index out of bounds)
    rb_k = jnp.where(active_b, jnp.clip(rb, 0, N - 1), 1)
    re_k = jnp.where(active_b, jnp.clip(re, 0, N - 1), 0)
    meta = jnp.stack([rb_k, re_k, layer.length, active],
                     axis=1).astype(jnp.int32)

    # sink candidates, in rank space
    has_succ = _compute_has_succ(state, layer, rb, re)        # [B, N+1]
    hs_r = jnp.concatenate(
        [has_succ[b2, order_safe],
         jnp.ones((B, 1), bool)], axis=1).astype(jnp.int32)   # [B, N+1]

    path_rank, path_pos, plen = PK.dp_traceback(
        meta, codes_r, predr, seq_shift, hs_r, N=N, P=P, T=t_cap,
        match=match, mismatch=mismatch, gap=gap, interpret=PK.INTERPRET)

    overrun = plen < 0
    t = jnp.where(overrun, 0, plen)
    # rank -> node id
    pr_safe = jnp.clip(path_rank, 0, N - 1)
    pn_rev = jnp.where((path_rank >= 0) & (path_rank < N),
                       state.order[b2, pr_safe], -1)
    # reverse into forward order
    T = t_cap
    idx = t[:, None] - 1 - jnp.arange(T)[None, :]
    gather = jnp.clip(idx, 0, T - 1)
    pn = jnp.where(idx >= 0, pn_rev[b2, gather], -1)
    pp = jnp.where(idx >= 0, path_pos[b2, gather], -1)
    return pn, pp, t, overrun


add_layer_jit = functools.partial(
    jax.jit,
    static_argnames=("match", "mismatch", "gap", "t_cap", "use_pallas"),
    donate_argnums=(0,))(add_layer)


@functools.partial(
    jax.jit,
    static_argnames=("match", "mismatch", "gap", "t_cap", "use_pallas"),
    donate_argnums=(0,))
def add_layer_at(state: GraphState, layers: LayerBatch, d, match: int,
                 mismatch: int, gap: int, t_cap: int,
                 use_pallas: bool = False) -> GraphState:
    """One layer step, slicing layer ``d`` out of stacked [D, B, ...] arrays
    on device — keeps the host->device traffic to one upload per bucket."""
    layer = jax.tree_util.tree_map(
        lambda x: jax.lax.dynamic_index_in_dim(x, d, axis=0, keepdims=False),
        layers)
    return add_layer(state, layer, match, mismatch, gap, t_cap, use_pallas)


@jax.jit
def pack_for_download(state: GraphState):
    """Downcast the graph state for host download (the tunnel to the device
    is bandwidth-limited); node ids fit int16 for N < 32768."""
    return dict(
        codes=state.codes.astype(jnp.int8),
        pred=state.pred.astype(jnp.int16),
        pred_w=state.pred_w,
        pred_cnt=state.pred_cnt.astype(jnp.int16),
        cov=state.cov.astype(jnp.int16),
        order=state.order.astype(jnp.int16),
        rank=jnp.minimum(state.rank, jnp.int32(2**15 - 1)).astype(jnp.int16),
        n_nodes=state.n_nodes,
        failed=state.failed,
    )


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap",
                                             "t_cap"))
def run_layers(state: GraphState, layers: LayerBatch, match: int,
               mismatch: int, gap: int, t_cap: int) -> GraphState:
    """Scan over the depth axis: layers arrays are [D, B, ...]."""
    def step(s, layer):
        return add_layer(s, layer, match, mismatch, gap, t_cap), None

    state, _ = jax.lax.scan(step, state, layers)
    return state

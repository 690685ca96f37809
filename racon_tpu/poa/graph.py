"""Partial-order-alignment (POA) graph: the consensus core, NumPy oracle.

This is a from-scratch POA implementation with the capabilities the
reference gets from spoa 4.0.8 (reference call sites: src/window.cpp:65-149,
src/polisher.cpp:179-183):

  * global (NW) alignment of a sequence to the graph, linear gap, integer
    match/mismatch/gap scores,
  * incremental graph build: matched letters fuse into existing nodes or
    aligned-column siblings, mismatches open new column members, gaps open
    insertion chains,
  * per-base weights from phred qualities (q - 33) or 1 without qualities;
    edge weights accumulate w[i-1] + w[i] per traversing sequence,
  * subgraph alignment for partial-span layers (rank-range restriction),
  * heaviest-bundle consensus with branch completion, plus per-base
    coverage (number of sequences whose path touches the node).

Topological order is maintained *incrementally and deterministically* via
column sort keys: every aligned column carries one key; new columns are
interpolated between their path anchors and keys are renormalized to dense
integers after every added alignment.  This gives a valid topological order
with aligned columns contiguous in rank — the property the subgraph
extraction relies on — without any DFS, and it is the exact ordering the
batched TPU engine (racon_tpu.poa.engine) reproduces with static shapes.

Tie-breaking is deterministic and documented at each decision point; the
reference's own accelerated path (cudapoa) diverges from its CPU path, so
exact spoa bit-parity is not assumed — accuracy is validated against the
reference's golden edit distances (test/racon_test.cpp:86-294).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

NEG_INF = np.int32(-(1 << 30))

# base encoding: A,C,G,T -> 0..3, everything else -> 4
_CODE = np.full(256, 4, dtype=np.int8)
for _i, _c in enumerate(b"ACGT"):
    _CODE[_c] = _i


def encode(seq: bytes) -> np.ndarray:
    return _CODE[np.frombuffer(seq, dtype=np.uint8)]


_DECODE = np.frombuffer(b"ACGTN", dtype=np.uint8)


def decode(codes: np.ndarray) -> bytes:
    return _DECODE[codes].tobytes()


def weights_from_quality(quality: Optional[bytes], length: int) -> np.ndarray:
    """Per-base weights: phred quality - 33, or 1 without qualities."""
    if quality is None:
        return np.ones(length, dtype=np.int32)
    w = np.frombuffer(quality, dtype=np.uint8).astype(np.int32) - 33
    return w


# Column sort keys are integers scaled by 2**16: renormalized column keys
# are (column_index << 16); interpolated keys for insertion chains divide
# the gap with integer arithmetic.  The batched TPU engine
# (racon_tpu/poa/engine.py) uses the identical integer scheme, so oracle and
# engine produce bit-identical graphs.
KEY_SCALE = 1 << 16


class POAGraph:
    """Dynamic POA graph (host oracle).  Node storage grows per layer."""

    def __init__(self):
        self.codes: List[int] = []          # per node: base code
        self.preds: List[List[int]] = []    # per node: in-edge tails (insertion order)
        self.pred_w: List[List[int]] = []   # per node: in-edge total weights
        self.succs: List[List[int]] = []    # per node: out-edge heads
        self.succ_w: List[List[int]] = []   # per node: out-edge total weights
        self.cov: List[int] = []            # per node: #sequences touching node
        self.col: List[int] = []            # per node: column id
        self.col_key: dict = {}             # column id -> sort key (int, scaled)
        self.col_members: dict = {}         # column id -> ordered member node ids
        self.n_sequences = 0
        # rank caches (rebuilt after every add_alignment)
        self.order: np.ndarray = np.zeros(0, dtype=np.int64)   # rank -> node
        self.rank: np.ndarray = np.zeros(0, dtype=np.int64)    # node -> rank

    # ------------------------------------------------------------------ #
    # construction
    # ------------------------------------------------------------------ #

    def _add_node(self, code: int, key: int) -> int:
        nid = len(self.codes)
        self.codes.append(int(code))
        self.preds.append([])
        self.pred_w.append([])
        self.succs.append([])
        self.succ_w.append([])
        self.cov.append(0)
        self.col.append(nid)
        self.col_key[nid] = key
        self.col_members[nid] = [nid]
        return nid

    def _add_edge(self, tail: int, head: int, weight: int) -> None:
        try:
            k = self.preds[head].index(tail)
            self.pred_w[head][k] += weight
            k2 = self.succs[tail].index(head)
            self.succ_w[tail][k2] += weight
        except ValueError:
            self.preds[head].append(tail)
            self.pred_w[head].append(weight)
            self.succs[tail].append(head)
            self.succ_w[tail].append(weight)

    def _rebuild_ranks(self) -> None:
        """Sort columns by (key, col_id); emit members in insertion order;
        renormalize column keys to dense integers."""
        cols = sorted(self.col_key, key=lambda c: (self.col_key[c], c))
        order = []
        for new_key, c in enumerate(cols):
            self.col_key[c] = new_key * KEY_SCALE
            order.extend(self.col_members[c])
        self.order = np.asarray(order, dtype=np.int64)
        self.rank = np.zeros(len(order), dtype=np.int64)
        self.rank[self.order] = np.arange(len(order))

    def add_alignment(self, alignment: List[Tuple[int, int]],
                      seq: np.ndarray, weights: np.ndarray) -> None:
        """Fuse an aligned sequence into the graph.

        ``alignment`` is a list of (node_id, seq_pos) pairs with -1 for
        gaps, in path order; empty for the first sequence (backbone).
        """
        n = len(seq)
        if n == 0:
            return

        # keys of matched anchors, for interpolating new-node keys
        def node_key(nid: int) -> int:
            return self.col_key[self.col[nid]]

        # resolve each consumed seq position to a node id (creating nodes),
        # in two passes: first find anchor keys, then create with keys.
        consumed: List[Tuple[int, int]] = []  # (seq_pos, node_id_or_-1)
        if alignment:
            first = min(p for _, p in alignment if p != -1)
            last = max(p for _, p in alignment if p != -1)
            for p in range(0, first):
                consumed.append((p, -1))
            for nid, p in alignment:
                if p == -1:
                    continue
                consumed.append((p, nid))
            for p in range(last + 1, n):
                consumed.append((p, -1))
        else:
            consumed = [(p, -1) for p in range(n)]

        # pass 1 (read-only): per consumed entry, the column key if matched
        # (-1 marker otherwise) — interpolation anchors are known before any
        # node is created, because matched letters always land in an
        # existing column (as the node, a sibling, or a new member).
        hi_sentinel = (len(self.col_key) + 1) * KEY_SCALE
        lo_sentinel = -KEY_SCALE
        anchor_keys = [node_key(nid) if nid != -1 else None
                       for _, nid in consumed]

        def run_bounds(i: int):
            """lo/hi keys and length of the unmatched run starting at i."""
            j = i
            while j < len(consumed) and anchor_keys[j] is None:
                j += 1
            lo = anchor_keys[i - 1] if i > 0 else lo_sentinel
            hi = anchor_keys[j] if j < len(consumed) else hi_sentinel
            return lo, hi, j - i

        # pass 2: resolve/create nodes in single-pass path order (node ids
        # are allocated in path order — the batched engine does the same).
        resolved: List[int] = []
        run_lo = run_hi = run_k = run_m = 0
        for idx, (p, nid) in enumerate(consumed):
            letter = int(seq[p])
            if nid != -1:
                if self.codes[nid] == letter:
                    resolved.append(nid)
                    continue
                # search the column for a member with this letter
                c = self.col[nid]
                found = -1
                for member in self.col_members[c]:
                    if self.codes[member] == letter:
                        found = member
                        break
                if found != -1:
                    resolved.append(found)
                else:
                    new_id = self._add_node(letter, 0)
                    # join the existing column
                    del self.col_key[new_id]
                    del self.col_members[new_id]
                    self.col[new_id] = c
                    self.col_members[c].append(new_id)
                    resolved.append(new_id)
            else:
                if idx == 0 or anchor_keys[idx - 1] is not None:
                    run_lo, run_hi, run_k = run_bounds(idx)
                    run_m = 0
                # inserted-run keys are forced ODD: renormalized column
                # keys are even multiples of KEY_SCALE, so an interpolated
                # key can never collide with an existing column's key (a
                # collision would merge/reorder columns differently across
                # the engines -- see fused_chunk.py merge correctness note)
                key = (run_lo
                       + (run_hi - run_lo) * (run_m + 1) // (run_k + 1)) | 1
                run_m += 1
                resolved.append(self._add_node(letter, key))

        # pass 3: edges + coverage
        prev = -1
        for idx, (p, _) in enumerate(consumed):
            cur = resolved[idx]
            self.cov[cur] += 1
            if prev != -1:
                self._add_edge(prev, cur,
                               int(weights[p - 1]) + int(weights[p]))
            prev = cur

        self.n_sequences += 1
        self._rebuild_ranks()

    # ------------------------------------------------------------------ #
    # alignment (NW on DAG, linear gap)
    # ------------------------------------------------------------------ #

    def align(self, seq: np.ndarray, match: int, mismatch: int, gap: int,
              begin_node: Optional[int] = None,
              end_node: Optional[int] = None) -> List[Tuple[int, int]]:
        """Global alignment of ``seq`` to the graph (or to the rank range
        spanned by ``begin_node``..``end_node`` — the subgraph used for
        partial-span layers, reference: src/window.cpp:98-107).

        Returns the alignment as (node_id, seq_pos) pairs; -1 marks gaps.

        Recurrence (per node v in topological order, j in 1..L):
          H[v][j] = max over predecessors p (or the virtual source row):
                      H[p][j-1] + s(v, seq[j-1]),  H[p][j] + gap
          then      H[v][j] = max(H[v][j], H[v][j-1] + gap)
        with H[src][j] = j*gap.  The horizontal closure is computed as a
        prefix max of (H[v][j] - j*gap) — the same associative-scan form the
        TPU engine uses.
        """
        L = len(seq)
        n = len(self.codes)
        if begin_node is None:
            rb, re = 0, n - 1
        else:
            rb = int(self.rank[begin_node])
            re = int(self.rank[end_node])
            if rb > re:
                rb, re = re, rb

        ranks = self.order[rb:re + 1]
        in_range = np.zeros(n, dtype=bool)
        in_range[ranks] = True

        jgap = gap * np.arange(L + 1, dtype=np.int32)
        virtual = jgap.copy()

        H = np.full((n, L + 1), NEG_INF, dtype=np.int32)

        codes_arr = np.asarray(self.codes, dtype=np.int8)
        prof_match = np.where(codes_arr[:, None] == seq[None, :],
                              np.int32(match), np.int32(mismatch))

        has_succ_in_range = np.zeros(n, dtype=bool)

        for v in ranks:
            v = int(v)
            prof = prof_match[v]
            row = np.full(L + 1, NEG_INF, dtype=np.int32)
            preds_in = [p for p in self.preds[v] if in_range[p]]
            rows = [H[p] for p in preds_in] if preds_in else [virtual]
            for hp in rows:
                diag = hp[:-1] + prof
                np.maximum(row[1:], diag, out=row[1:])
                np.maximum(row, hp + gap, out=row)
            # horizontal closure: prefix max of (row[j] - j*gap) + j*gap
            row = np.maximum.accumulate(row - jgap) + jgap
            H[v] = row
            for p in preds_in:
                has_succ_in_range[p] = True

        # best sink (no successor in range); ties -> earliest rank
        best_v, best_score = -1, NEG_INF
        for v in ranks:
            v = int(v)
            if has_succ_in_range[v]:
                continue
            if H[v][L] > best_score:
                best_score = H[v][L]
                best_v = v

        # traceback: diagonal first (predecessors in insertion order), then
        # vertical, then horizontal
        alignment: List[Tuple[int, int]] = []
        v, j = best_v, L
        at_virtual = False
        while not at_virtual or j > 0:
            if at_virtual:
                alignment.append((-1, j - 1))
                j -= 1
                continue
            preds_in = [p for p in self.preds[v] if in_range[p]]
            rows = [(p, H[p]) for p in preds_in] if preds_in \
                else [(-1, virtual)]
            moved = False
            if j > 0:
                prof_vj = prof_match[v][j - 1]
                for p, hp in rows:
                    if H[v][j] == hp[j - 1] + prof_vj:
                        alignment.append((v, j - 1))
                        j -= 1
                        if p == -1:
                            at_virtual = True
                        else:
                            v = p
                        moved = True
                        break
            if moved:
                continue
            for p, hp in rows:
                if H[v][j] == hp[j] + gap:
                    alignment.append((v, -1))
                    if p == -1:
                        at_virtual = True
                    else:
                        v = p
                    moved = True
                    break
            if moved:
                if at_virtual and j == 0:
                    break
                continue
            if j > 0 and H[v][j] == H[v][j - 1] + gap:
                alignment.append((-1, j - 1))   # insertion: seq char, no node
                j -= 1
                continue
            raise AssertionError("POA traceback failed")  # pragma: no cover

        alignment.reverse()
        # strip leading/trailing pure-gap entries on the virtual row
        return [(nid, p) for nid, p in alignment if not (nid == -1 and p == -1)]

    # ------------------------------------------------------------------ #
    # consensus
    # ------------------------------------------------------------------ #

    def generate_consensus(self) -> Tuple[np.ndarray, np.ndarray]:
        """Heaviest-bundle traversal with branch completion.

        Returns (consensus codes, per-base coverage).  Scoring: each node's
        best in-edge by total weight (ties broken toward the predecessor
        with the higher path score, then earlier edge insertion order);
        path score accumulates; the global best end node is extended to a
        sink by re-scoring with competing branches suppressed.
        """
        from racon_tpu.poa.consensus_host import heaviest_bundle
        path = heaviest_bundle(len(self.codes), self.order, self.preds,
                               self.pred_w, self.succs, self.rank)
        codes = np.asarray([self.codes[v] for v in path], dtype=np.int8)
        cov = np.asarray([self.cov[v] for v in path], dtype=np.int32)
        return codes, cov

"""Heaviest-bundle consensus from array-form graphs.

Shared by the NumPy oracle (racon_tpu/poa/graph.py) and the batched TPU
engine (whose final graph state is downloaded once per window): one
implementation, one semantics.  Mirrors the reference's consensus policy
(spoa GenerateConsensus with coverage summary; call site
src/window.cpp:122-123).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def heaviest_bundle(n_nodes: int, order: np.ndarray, preds: List[List[int]],
                    pred_w: List[List[int]], succs: List[List[int]],
                    rank: np.ndarray) -> List[int]:
    """Best-scoring path: per node, the max-weight in-edge (ties toward the
    higher-scoring predecessor, then earlier edge insertion order); extended
    to a sink via branch completion."""
    scores = np.full(n_nodes, -1, dtype=np.int64)
    pred_choice = np.full(n_nodes, -1, dtype=np.int64)

    max_v = -1
    for r in range(n_nodes):
        v = int(order[r])
        for p, w in zip(preds[v], pred_w[v]):
            if scores[v] < w or (scores[v] == w and
                                 scores[pred_choice[v]] <= scores[p]):
                scores[v] = w
                pred_choice[v] = p
        if pred_choice[v] != -1:
            scores[v] += scores[pred_choice[v]]
        if max_v == -1 or scores[max_v] < scores[v]:
            max_v = v

    while succs[max_v]:
        scores_bc = scores.copy()
        for h in succs[max_v]:
            for p in preds[h]:
                if p != max_v:
                    scores_bc[p] = -1
        best2, best2_score = -1, -1
        r0 = int(rank[max_v])
        for r in range(r0 + 1, n_nodes):
            v = int(order[r])
            scores_bc[v] = -1
            pred_choice[v] = -1
            for p, w in zip(preds[v], pred_w[v]):
                if scores_bc[p] == -1:
                    continue
                if scores_bc[v] < w or (scores_bc[v] == w and
                                        scores_bc[pred_choice[v]] <= scores_bc[p]):
                    scores_bc[v] = w
                    pred_choice[v] = p
            if pred_choice[v] != -1:
                scores_bc[v] += scores_bc[pred_choice[v]]
            if best2_score < scores_bc[v]:
                best2_score = scores_bc[v]
                best2 = v
        if best2 == -1:  # pragma: no cover
            break
        scores = scores_bc
        max_v = best2

    path = []
    v = max_v
    while v != -1:
        path.append(v)
        v = int(pred_choice[v])
    path.reverse()
    return path


def consensus_from_arrays(codes: np.ndarray, pred: np.ndarray,
                          pred_w: np.ndarray, pred_cnt: np.ndarray,
                          cov: np.ndarray, order: np.ndarray,
                          rank: np.ndarray, n_nodes: int
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Consensus + per-base coverage from the TPU engine's packed graph
    arrays (one window).  pred uses node-capacity N as the empty sentinel."""
    N = pred.shape[0] - 1
    preds: List[List[int]] = [[] for _ in range(n_nodes)]
    pw: List[List[int]] = [[] for _ in range(n_nodes)]
    succs: List[List[int]] = [[] for _ in range(n_nodes)]
    for v in range(n_nodes):
        for s in range(int(pred_cnt[v])):
            p = int(pred[v, s])
            if p >= N:
                continue
            preds[v].append(p)
            pw[v].append(int(pred_w[v, s]))
            succs[p].append(v)

    path = heaviest_bundle(n_nodes, order, preds, pw, succs, rank)
    out_codes = codes[path].astype(np.int8)
    out_cov = cov[path].astype(np.int32)
    return out_codes, out_cov

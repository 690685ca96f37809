#!/usr/bin/env python
"""Steady-state A/B of the chunk kernel's K-window interleave on real TPU.

Runs the SAME lambda-class chunk at each requested K, timing only warm
steady-state iterations (forced readback through the tunnel), and checks
the failure flags so a "speedup" from silently failing windows is caught
(CLAUDE.md timing trap).

Usage: python scripts/ab_k.py [--ks 1,2,4] [--d 22] [--reps 4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from racon_tpu.poa import engine as E
from racon_tpu.poa import fused_chunk as FC
from tests.test_fused_chunk import build_chunk_inputs, random_problem


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="1,2")
    ap.add_argument("--d", type=int, default=22)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--n", type=int, default=1791)
    ap.add_argument("--p", type=int, default=12)
    args = ap.parse_args()
    ks = [int(k) for k in args.ks.split(",")]

    B, L0, L, N, P, D = 32, 500, 640, args.n, args.p, args.d
    sub_l = -(-(L + 1) // 128)
    t_cap = N + L

    state0, layers = random_problem(B, L0, L, D, N, P, seed=0, partial=False)
    codes0 = np.asarray(state0.codes)
    blen = np.asarray(state0.n_nodes)
    bb = codes0[:, :L0].astype(np.int32)
    rng = np.random.RandomState(99)
    bw = rng.randint(1, 50, size=(B, L0)).astype(np.int32)
    for b in range(B):
        bb[b, blen[b]:] = E.PAD_CODE
        bw[b, blen[b]:] = 0
    metas, seq_t, wts_t = build_chunk_inputs(layers, sub_l)
    ar = (jnp.asarray(bb), jnp.asarray(bw), jnp.asarray(blen),
          jnp.asarray(metas), jnp.asarray(seq_t), jnp.asarray(wts_t))
    kw = dict(n_cap=N, p_cap=P, sub_l=sub_l, match=3, mismatch=-5, gap=-4,
              t_cap=t_cap)
    print(f"backend={jax.default_backend()} B={B} N={N} L={L} "
          f"sub_l={sub_l} D={D} P={P}", flush=True)

    base = None
    for K in ks:
        t0 = time.time()
        st, nr = FC.polish_chunk(*ar, interleave=K, **kw)
        flags = np.asarray(st[:, FC.R_MISC, 1])
        print(f"K={K}: compile+run {time.time() - t0:.1f}s "
              f"failed={int((flags > 0).sum())}", flush=True)
        t0 = time.time()
        for _ in range(args.reps):
            st, nr = FC.polish_chunk(*ar, interleave=K, **kw)
        _ = np.asarray(st[:, FC.R_MISC, :2])
        dt = (time.time() - t0) / args.reps
        sp = "" if base is None else f"  speedup vs K=1: {base / dt:.2f}x"
        if base is None:
            base = dt
        print(f"K={K}: {dt * 1e3:8.2f} ms/chunk, "
              f"{dt / D * 1e3:7.3f} ms/layer-step{sp}", flush=True)


if __name__ == "__main__":
    main()

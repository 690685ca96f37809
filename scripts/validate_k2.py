#!/usr/bin/env python
"""Real-TPU validation of the K-interleaved chunk kernel after the
round-3 memory-safety fixes (clamped/masked indices on guard-false
streams; state table moved to single-buffered SMEM scratch + DMA'd out).

Stages (each prints a PASS/FAIL line; run under `timeout`):
  1. device probe (trivial jnp.sum)
  2. tiny chunk: K=2 vs K=1 bit-identical download, real work
  3. the old abort repro size (B=8, N=512, D=4, active layers)
  4. (optional, --big) lambda-class shapes B=32, N=1791, sub_l=4, K=2

Usage: python scripts/validate_k2.py [--big] [K]
"""
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

K = 2
for a in sys.argv[1:]:
    if a.isdigit():
        K = int(a)
BIG = "--big" in sys.argv


def probe():
    t = time.time()
    v = float(np.asarray(jnp.sum(jnp.arange(1024.0))))
    assert v == 1024 * 1023 / 2
    print(f"probe: PASS ({time.time() - t:.1f}s)", flush=True)


def run_case(name, B, L0, L, N, P, D, sub_l, seed=0, partial=True):
    t_cap = N + L
    state0, layers = random_problem(B, L0, L, D, N, P, seed=seed,
                                    partial=partial)
    codes0 = np.asarray(state0.codes)
    blen = np.asarray(state0.n_nodes)
    bb = codes0[:, :L0].astype(np.int32)
    rng = np.random.RandomState(99)
    bw = rng.randint(1, 50, size=(B, L0)).astype(np.int32)
    for b in range(B):
        bb[b, blen[b]:] = E.PAD_CODE
        bw[b, blen[b]:] = 0
    metas, seq_t, wts_t = build_chunk_inputs(layers, sub_l)
    args = (jnp.asarray(bb), jnp.asarray(bw), jnp.asarray(blen), metas,
            seq_t, wts_t)
    kw = dict(n_cap=N, p_cap=P, sub_l=sub_l, match=3, mismatch=-5, gap=-4,
              t_cap=t_cap,
              interpret=bool(os.environ.get("RACON_VALIDATE_INTERPRET")))
    t = time.time()
    st1, nr1 = FC.polish_chunk(*args, interleave=1, **kw)
    g1 = jax.tree.map(np.asarray,
                      FC.unpack_chunk_state(st1, nr1, p_cap=P))
    t1 = time.time() - t
    t = time.time()
    stk, nrk = FC.polish_chunk(*args, interleave=K, **kw)
    gk = jax.tree.map(np.asarray,
                      FC.unpack_chunk_state(stk, nrk, p_cap=P))
    tk = time.time() - t
    fc1 = np.asarray(st1)[:, FC.R_MISC, 1].tolist()
    fck = np.asarray(stk)[:, FC.R_MISC, 1].tolist()
    # compare normalized (stale entries beyond n_nodes masked) downloads
    diffs = [f for f in g1._fields
             if not np.array_equal(getattr(g1, f), getattr(gk, f))]
    same = not diffs
    ok = same and fc1 == fck
    if diffs:
        print(f"  differing fields: {diffs}", flush=True)
    print(f"{name}: {'PASS' if ok else 'FAIL'} K=1 {t1:.1f}s K={K} {tk:.1f}s"
          f" failed_codes K1={fc1} K{K}={fck} bit_identical={same}",
          flush=True)
    return ok


probe()
ok = run_case("tiny", B=4, L0=40, L=96, N=160, P=8, D=3, sub_l=1)
probe()
if ok:
    ok = run_case("abort-repro", B=8, L0=120, L=255, N=512, P=8, D=4,
                  sub_l=2, seed=1)
    probe()
if ok and BIG:
    ok = run_case("lambda-class", B=32, L0=512, L=511, N=1791, P=12, D=8,
                  sub_l=4, seed=2)
    probe()
print("ALL PASS" if ok else "FAILED", flush=True)

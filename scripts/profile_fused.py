#!/usr/bin/env python
"""Time the fused step and the host consensus on the bench workload."""
import os
import time

import numpy as np

from racon_tpu.pipeline import PolisherType, create_polisher

DATA = os.environ.get("RACON_TPU_BENCH_DATA", "/root/reference/test/data")

p = create_polisher(
    f"{DATA}/sample_reads.fastq.gz", f"{DATA}/sample_overlaps.paf.gz",
    f"{DATA}/sample_layout.fasta.gz",
    PolisherType.kC, 500, 10.0, 0.3, True, 5, -4, -8, num_threads=1,
    engine="tpu")
p.initialize()
windows = p.windows
eng = p._make_engine()

# instrument _run_chunk phases
import racon_tpu.poa.batched as BMOD
from racon_tpu.poa import fused_step as F
import jax

orig_step = F.fused_layer_step_at
orig_pack = F.pack_state
orig_dl = F.pack_for_download_fused

t_step = [0.0]
t_pack = [0.0]
t_dl = [0.0]
n_steps = [0]


def timed_step(fs, *a, **k):
    t0 = time.time()
    out = orig_step(fs, *a, **k)
    jax.block_until_ready(out.nn)
    t_step[0] += time.time() - t0
    n_steps[0] += 1
    return out


def timed_pack(s):
    t0 = time.time()
    out = orig_pack(s)
    jax.block_until_ready(out.nn)
    t_pack[0] += time.time() - t0
    return out


def timed_dl(fs, p_cap):
    t0 = time.time()
    out = orig_dl(fs, p_cap)
    jax.block_until_ready(list(out.values()))
    t_dl[0] += time.time() - t0
    return out


F.fused_layer_step_at = timed_step
F.pack_state = timed_pack
F.pack_for_download_fused = timed_dl

# warm
eng.polish_windows(windows, p.trim)
t_step[0] = t_pack[0] = t_dl[0] = 0.0
n_steps[0] = 0

t0 = time.time()
res = eng.polish_windows(windows, p.trim)
total = time.time() - t0
print(f"total          {total:7.2f} s   ({len(windows)/total:.1f} w/s)")
print(f"fused steps    {t_step[0]:7.2f} s   ({n_steps[0]} steps, "
      f"{t_step[0]/max(n_steps[0],1)*1e3:.1f} ms/step)")
print(f"pack_state     {t_pack[0]:7.2f} s")
print(f"download       {t_dl[0]:7.2f} s")
print(f"host (rest)    {total - t_step[0] - t_pack[0] - t_dl[0]:7.2f} s")

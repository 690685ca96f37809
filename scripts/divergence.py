#!/usr/bin/env python
"""Per-window divergence harness (VERDICT round-2 item: localize which
windows/engines diverge instead of guessing from end-to-end ED).

Builds the lambda windows through the real pipeline, polishes them with
two engines, and reports every window whose consensus differs, plus the
device engine's failure statistics.

Usage:
  python scripts/divergence.py [--engine-a native] [--engine-b tpu]
                               [--reads fastq|fasta] [--overlaps paf|sam]
                               [--dump-dir DIR]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

D = "/root/reference/test/data"


def make_engine(name, m, x, g, threads):
    if name == "native":
        from racon_tpu.poa.native_engine import NativePOAEngine
        return NativePOAEngine(m, x, g, num_threads=threads)
    if name == "oracle":
        from racon_tpu.poa.oracle_engine import OraclePOAEngine
        return OraclePOAEngine(m, x, g)
    from racon_tpu.poa.batched import BatchedPOAEngine
    return BatchedPOAEngine(m, x, g, num_threads=threads)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine-a", default="native")
    ap.add_argument("--engine-b", default="tpu")
    ap.add_argument("--reads", default="fastq", choices=["fastq", "fasta"])
    ap.add_argument("--overlaps", default="paf", choices=["paf", "sam"])
    ap.add_argument("--window-length", type=int, default=500)
    ap.add_argument("--scores", default="5,-4,-8")
    ap.add_argument("--dump-dir", default="")
    args = ap.parse_args()
    m, x, g = map(int, args.scores.split(","))

    from racon_tpu.pipeline import PolisherType, create_polisher
    p = create_polisher(
        f"{D}/sample_reads.{args.reads}.gz",
        f"{D}/sample_overlaps.{args.overlaps}.gz",
        f"{D}/sample_layout.fasta.gz", PolisherType.kC,
        args.window_length, 10.0, 0.3, True, m, x, g, num_threads=4,
        engine="native")
    p.initialize()
    windows = p.windows
    print(f"{len(windows)} windows", flush=True)

    res = {}
    for name in (args.engine_a, args.engine_b):
        eng = make_engine(name, m, x, g, 4)
        res[name] = eng.polish_windows(windows, p.trim)
        stats = getattr(eng, "stats", {})
        print(f"engine {name}: stats={stats}", flush=True)

    a, b = res[args.engine_a], res[args.engine_b]
    n_diff = 0
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra == rb:
            continue
        n_diff += 1
        ca, cb = ra[0], rb[0]
        # locate the first differing base
        k = next((j for j in range(min(len(ca), len(cb)))
                  if ca[j] != cb[j]), min(len(ca), len(cb)))
        w = windows[i]
        print(f"DIFF window {i} (rank {w.rank}, {len(w.sequences) - 1} "
              f"layers, backbone {len(w.sequences[0])}): len "
              f"{len(ca)} vs {len(cb)}, first diff at {k}", flush=True)
        if args.dump_dir:
            os.makedirs(args.dump_dir, exist_ok=True)
            with open(f"{args.dump_dir}/w{i}.txt", "w") as f:
                f.write(f"{args.engine_a}: {ca!r}\n{args.engine_b}: {cb!r}\n")
    print(f"{n_diff} differing windows", flush=True)


if __name__ == "__main__":
    main()

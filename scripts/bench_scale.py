#!/usr/bin/env python
"""Scale benchmark: synthetic genome -> noisy long reads -> polish.

Measures end-to-end and consensus-phase throughput at genome scales beyond
the bundled lambda set (SURVEY.md §6: throughput baselines must be measured
on E. coli-scale data).  Reads are sampled uniformly with configurable
coverage and error; overlaps are emitted as exact-position PAF (no CIGARs,
so the alignment phase is exercised too).

Usage:
  python scripts/bench_scale.py [--genome-mb 0.5] [--coverage 30]
                                [--error 0.1] [--engine tpu] [--threads 4]
                                [--tpu-align]
"""

import argparse
import gzip
import os
import sys
import tempfile
import time

import numpy as np

# runnable from any cwd / without PYTHONPATH (the repo root is the package
# root); keep the axon sitecustomize reachable via the ambient sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def synthesize(tmpdir: str, genome_bp: int, coverage: int, error: float,
               read_len: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    genome = bases[rng.randint(0, 4, genome_bp)]

    # backbone "assembly" = genome with light noise (1% substitutions)
    backbone = genome.copy()
    nsub = genome_bp // 100
    pos = rng.choice(genome_bp, nsub, replace=False)
    backbone[pos] = bases[rng.randint(0, 4, nsub)]

    tpath = os.path.join(tmpdir, "target.fasta")
    with open(tpath, "w") as f:
        f.write(">ctg\n")
        f.write(backbone.tobytes().decode())
        f.write("\n")

    n_reads = genome_bp * coverage // read_len
    rpath = os.path.join(tmpdir, "reads.fasta")
    opath = os.path.join(tmpdir, "overlaps.paf")
    with open(rpath, "w") as fr, open(opath, "w") as fo:
        for i in range(n_reads):
            start = rng.randint(0, genome_bp - read_len)
            seg = genome[start:start + read_len]
            # substitutions + indels at the requested error rate
            r = rng.rand(read_len)
            keep = r >= error / 3                       # deletions
            sub = (r >= error / 3) & (r < 2 * error / 3)
            seg = seg.copy()
            seg[sub] = bases[rng.randint(0, 4, int(sub.sum()))]
            seg = seg[keep]
            ins_mask = rng.rand(len(seg)) < error / 3   # insertions
            if ins_mask.any():
                out = np.empty(len(seg) + int(ins_mask.sum()), np.uint8)
                j = 0
                ins_at = np.flatnonzero(ins_mask)
                prev = 0
                for k in ins_at:
                    out[j:j + k - prev] = seg[prev:k]
                    j += k - prev
                    out[j] = bases[rng.randint(0, 4)]
                    j += 1
                    prev = k
                out[j:] = seg[prev:]
                seg = out
            fr.write(f">r{i}\n{seg.tobytes().decode()}\n")
            fo.write(f"r{i}\t{len(seg)}\t0\t{len(seg)}\t+\tctg\t{genome_bp}"
                     f"\t{start}\t{start + read_len}\t{read_len}\t{read_len}"
                     f"\t60\n")
    return rpath, opath, tpath, genome


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=0.5)
    ap.add_argument("--coverage", type=int, default=30)
    ap.add_argument("--error", type=float, default=0.10)
    ap.add_argument("--read-len", type=int, default=10000)
    ap.add_argument("--engine", default="tpu")
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--tpu-align", action="store_true")
    ap.add_argument("--stream", action="store_true",
                    help="streamed align->consensus overlap (the CLI "
                         "default for device engines); polish_sec then "
                         "covers both phases and windows/s is e2e-based")
    ap.add_argument("--out", default="",
                    help="also write the JSON record to this file "
                         "(checked-in BENCH_scale_rN.json artifacts)")
    ap.add_argument("--workdir", default="",
                    help="persistent dataset dir: reuse the synthesized "
                         "genome/reads/overlaps if already present "
                         "(generation is seeded, so reuse is exact)")
    args = ap.parse_args()

    genome_bp = int(args.genome_mb * 1e6)
    import contextlib
    ctx = (contextlib.nullcontext(args.workdir) if args.workdir
           else tempfile.TemporaryDirectory())
    with ctx as tmpdir:
        os.makedirs(tmpdir, exist_ok=True)
        gpath = os.path.join(tmpdir, f"genome_{genome_bp}_{args.coverage}.npy")
        t0 = time.time()
        if args.workdir and os.path.exists(gpath):
            genome = np.load(gpath)
            rpath = os.path.join(tmpdir, "reads.fasta")
            opath = os.path.join(tmpdir, "overlaps.paf")
            tpath = os.path.join(tmpdir, "target.fasta")
            print(f"[scale] reusing cached dataset in {tmpdir}",
                  file=sys.stderr)
        else:
            rpath, opath, tpath, genome = synthesize(
                tmpdir, genome_bp, args.coverage, args.error, args.read_len)
            if args.workdir:
                np.save(gpath, genome)
            print(f"[scale] synthesized {genome_bp/1e6:.2f} Mb genome, "
                  f"{args.coverage}x reads in {time.time()-t0:.1f}s",
                  file=sys.stderr)

        from racon_tpu.pipeline import PolisherType, create_polisher
        from racon_tpu.native import rtlib

        t0 = time.time()
        p = create_polisher(rpath, opath, tpath, PolisherType.kC,
                            500, 10.0, 0.3, True, 3, -5, -4,
                            num_threads=args.threads, engine=args.engine,
                            tpu_align=args.tpu_align, stream=args.stream)
        p.initialize()
        t_init = time.time() - t0
        n_windows = len(p.windows)

        engine_holder = []
        orig = p._make_engine

        def capture():
            eng = orig()
            engine_holder.append(eng)
            return eng

        p._make_engine = capture
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "")
        n_cached0 = (len(os.listdir(cache_dir))
                     if os.path.isdir(cache_dir) else 0)
        t0 = time.time()
        res = p.polish()
        t_polish = time.time() - t0
        n_cached1 = (len(os.listdir(cache_dir))
                     if os.path.isdir(cache_dir) else 0)
        stats = getattr(engine_holder[0], "stats", {}) if engine_holder \
            else {}

        polished = res[0].data
        ed = rtlib.edit_distance_banded(polished, genome.tobytes())
        print(f"[scale] genome={genome_bp/1e6:.2f}Mb cov={args.coverage} "
              f"err={args.error} engine={args.engine} "
              f"tpu_align={args.tpu_align}", file=sys.stderr)
        print(f"[scale] initialize {t_init:.1f}s, polish {t_polish:.1f}s "
              f"(e2e {t_init + t_polish:.1f}s, stream={args.stream}; "
              f"{n_windows} windows, {n_windows/t_polish:.1f} w/s), "
              f"ED vs truth {ed} ({ed/genome_bp*100:.3f}%) stats={stats}",
              file=sys.stderr)
        import json
        rec = {
            "metric": "scale_polish_windows_per_sec",
            "value": round(n_windows / t_polish, 3),
            "unit": "windows/s",
            "genome_mb": args.genome_mb,
            "coverage": args.coverage,
            "engine": args.engine,
            "threads": args.threads,
            "init_sec": round(t_init, 1),
            "polish_sec": round(t_polish, 1),
            "e2e_sec": round(t_init + t_polish, 1),
            "stream": args.stream,
            "windows": n_windows,
            "ed_pct": round(ed / genome_bp * 100, 4),
            "fresh_compiles": n_cached1 - n_cached0,
            "stats": {k: (round(v, 2) if isinstance(v, float) else int(v))
                      for k, v in stats.items()},
        }
        print(json.dumps(rec))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(rec, f, indent=1)
                f.write("\n")


if __name__ == "__main__":
    main()

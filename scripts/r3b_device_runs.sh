#!/bin/bash
# Round-3 session-3 follow-up worklist: re-drive the verify surfaces after
# the production-default changes (K=3, host-assist gated on cpu_count,
# K compile-failure degrade), plus the K=4 band=3 compile repro.
# Run only after r3_device_runs.sh has finished (one device user at a time).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
LOG=/tmp/r3_logs
mkdir -p "$LOG"

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout "$TMO" "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name exit $? ($(date +%H:%M:%S)) ==="
}

# 1. K=4 band=3 repro + production lambda at new defaults (K ladder incl.
#    the K=4 degrade path) + e2e ED checks
TMO=7200 run session3 python scripts/device_session.py ab4b3 lambda ed edstream

# 2. verify surface 1: the CLI
TMO=1800 run cli python -m racon_tpu.cli -t 4 --engine tpu \
  /root/reference/test/data/sample_reads.fastq.gz \
  /root/reference/test/data/sample_overlaps.paf.gz \
  /root/reference/test/data/sample_layout.fasta.gz
# the polished record lands in the log; check the header line

# 3. verify surface 2: the driver benchmark at the new defaults
TMO=3600 run bench2 python bench.py

# 4. streamed E. coli run (failed earlier on the missing sys.path fix)
TMO=7200 run scale_stream2 python scripts/bench_scale.py --genome-mb 4.6 \
  --coverage 30 --engine tpu --threads 4 --stream --workdir /root/scale_ws \
  --out BENCH_scale_r03_stream.json

# 5. VERDICT item 6: the device aligner at E. coli scale (bench or park)
TMO=7200 run scale_tpualign python scripts/bench_scale.py --genome-mb 4.6 \
  --coverage 30 --engine tpu --threads 4 --tpu-align --workdir /root/scale_ws \
  --out BENCH_scale_r03_tpualign.json

echo "ALL DONE ($(date +%H:%M:%S))"

#!/bin/bash
# Round-3 device worklist: run the full TPU validation + benchmark set
# sequentially with logs under /tmp/r3_logs.  Each python process pays the
# axon tunnel attach once; device_session bundles verification stages
# into ONE process (CLAUDE.md).  Run only after a probe succeeds.
#
# Ordered by value under time pressure: production-config validation and
# the headline benchmarks first, K/band exploration after.
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

# 1. production-config validation: real-lambda K configs (compiles the
#    w500 shapes bench needs), host-assist A/B, e2e ED check
TMO=10800 run session1 python scripts/device_session.py lambda assist ed edstream

# 2. the driver's benchmark (fresh process, warm compile cache):
#    K=2 + host assist + streamed e2e
TMO=3600 run bench python bench.py

# 3. streamed + host-assist production config at E. coli scale (align
#    overlapped with device consensus, CPU co-polishing): headline e2e
TMO=7200 run scale_stream python scripts/bench_scale.py --genome-mb 4.6 \
  --coverage 30 --engine tpu --threads 4 --stream --workdir /root/scale_ws \
  --out BENCH_scale_r03_stream.json

# 4. K/band exploration: K=3 (B=33), K=4 at full p_cap=12 (16-bit packed
#    state rows), w=1000 banding, w=1000 e2e ED
TMO=10800 run session2 python scripts/device_session.py ab3 abk4 w1000 edw1000

# 5. phased E. coli run (comparable to the round-2 table) and the
#    device-aligner variant (VERDICT item 6: bench --tpu-align or park)
TMO=7200 run scale python scripts/bench_scale.py --genome-mb 4.6 \
  --coverage 30 --engine tpu --threads 4 --workdir /root/scale_ws \
  --out BENCH_scale_r03.json
TMO=7200 run scale_tpualign python scripts/bench_scale.py --genome-mb 4.6 \
  --coverage 30 --engine tpu --threads 4 --tpu-align --workdir /root/scale_ws \
  --out BENCH_scale_r03_tpualign.json

echo "ALL DONE ($(date +%H:%M:%S))"

#!/bin/bash
# Round-3 device worklist: run the full TPU validation + benchmark set
# sequentially with logs under /tmp/r3_logs.  Each python process pays the
# axon tunnel attach once; device_session bundles all verification stages
# into ONE process (CLAUDE.md).  Run only after a probe succeeds.
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

# 1. validation stages: K=3 (B=33) and K=4 at full p_cap=12 (16-bit
#    packed state rows) A/Bs, real-lambda configs incl. K=3/K=4 auto,
#    w=1000 banding, e2e EDs (one process)
TMO=10800 run session python scripts/device_session.py ab3 abk4 lambda w1000 assist ed edw1000

# 2. the driver's benchmark (fresh process, warm compile cache)
TMO=3600 run bench python bench.py

# 3. E. coli-scale benchmark -> checked-in artifact (VERDICT item 8)
TMO=7200 run scale python scripts/bench_scale.py --genome-mb 4.6 --coverage 30 \
  --engine tpu --threads 4 --workdir /root/scale_ws --out BENCH_scale_r03.json

# 4. device-aligner variant at scale (VERDICT item 6: bench --tpu-align
#    or park it)
TMO=7200 run scale_tpualign python scripts/bench_scale.py --genome-mb 4.6 \
  --coverage 30 --engine tpu --threads 4 --tpu-align --workdir /root/scale_ws \
  --out BENCH_scale_r03_tpualign.json

# 5. streamed + host-assist production config at scale (align overlapped
#    with device consensus, CPU co-polishing): the headline e2e config
TMO=7200 run scale_stream python scripts/bench_scale.py --genome-mb 4.6 \
  --coverage 30 --engine tpu --threads 4 --stream --workdir /root/scale_ws \
  --out BENCH_scale_r03_stream.json

echo "ALL DONE ($(date +%H:%M:%S))"

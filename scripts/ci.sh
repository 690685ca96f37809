#!/usr/bin/env bash
# One-command check (reference analog: .github/workflows/racon.yml runs
# the gtest binary per compiler).  Builds the native runtime, runs the
# fast pytest tier, the quick lambda golden through the CLI surface, and
# the multi-chip dryrun — everything CPU-side; device validation lives in
# scripts/device_session.py.
#
# Usage: scripts/ci.sh [--slow]   (--slow adds the pinned golden tier)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native runtime build =="
python -c "from racon_tpu.native import rtlib; print('librtlib OK')"

echo "== fast test tier =="
python -m pytest tests/ -q

if [[ "${1:-}" == "--slow" ]]; then
  echo "== slow golden tier =="
  python -m pytest tests/ -q -m slow
fi

echo "== CLI quick golden (lambda, native engine) =="
DATA=/root/reference/test/data
if [[ -d "$DATA" ]]; then
  python -m racon_tpu.cli -t 4 --engine native -m 5 -x -4 -g -8 \
    "$DATA/sample_reads.fastq.gz" "$DATA/sample_overlaps.paf.gz" \
    "$DATA/sample_layout.fasta.gz" > /tmp/ci_polished.fasta
  python - <<'EOF'
from racon_tpu.io.parsers import parse_sequences
from racon_tpu.native import rtlib
res = parse_sequences("/tmp/ci_polished.fasta")
truth = parse_sequences("/root/reference/test/data/sample_reference.fasta.gz")[0]
s = res[0]; s.create_reverse_complement()
ed = rtlib.edit_distance(s.reverse_complement, truth.data)
assert ed == 1309, f"lambda ED {ed} != pinned 1309"
print(f"lambda ED {ed} == pinned 1309 OK")
EOF
else
  echo "(reference test data not present; skipping)"
fi

echo "== multi-chip dryrun (8 virtual CPU devices) =="
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun OK')"

echo "CI PASS"

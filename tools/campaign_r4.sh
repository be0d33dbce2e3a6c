#!/bin/bash
# Round-4 on-chip measurement campaign (run after the conformance gate).
# Ordered so the most important artifacts land first if the tunnel dies.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/campaign_r4.log
run() {
  echo "=== $* === $(date)" | tee -a "$LOG"
  timeout 2400 "$@" 2>&1 | tail -40 | tee -a "$LOG"
}

# 0. liveness (fail fast)
timeout 180 python -c "import jax; print(jax.devices())" || exit 1

# 1. intra-floor-kernel bisection (VERDICT r3 #3 analog for the floor
#    bucket — the largest non-structural phase after REV_MXU landed)
run python tools/bisect_floor.py

# 2. e2e at both stream counts (VERDICT r3 #6)
run python bench.py --e2e --streams 64
run python bench.py --e2e --streams 256

# 3. serve at both scales
run python bench.py --serve --streams 48
run python bench.py --serve --streams 128

# 4. transfer budget for the e2e analysis (bytes + per-stage rates)
run python tools/e2e_profile.py --streams 64

# 5. per-surface artifacts for PERF_r4.json
run python tools/perf_record.py --round 4 \
  --surfaces synthesis,check,e2e,serve,frontend,cpu_bench

echo "campaign r4 done $(date)" | tee -a "$LOG"

#!/bin/bash
# Round-3 on-chip measurement campaign — run when the TPU tunnel is back.
# Each step appends to /tmp/campaign_r3.log; steps are ordered so the most
# important artifacts land first if the tunnel dies again.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/campaign_r3.log
run() {
  echo "=== $* === $(date)" | tee -a "$LOG"
  timeout 2400 "$@" 2>&1 | tail -40 | tee -a "$LOG"
}

# 0. liveness (fail fast)
timeout 180 python -c "import jax; print(jax.devices())" || exit 1

# 1. conformance gate on the committed default (must stay green)
run python bench.py --check

# 2. headline at the default config
run python bench.py

# 3. chunk-time bisection (corrected knockouts)
run python tools/bisect_synth.py

# 4. Wang-split A/B: throughput, then the gate AT the split config
run python bench.py --dct4-split
run python bench.py --dct4-split --check
run python tools/split_diff.py --crafted f1_bs8192

# 4b. scan-dispatch A/B (amortized dispatch latency)
run python bench.py --scan 4
run python bench.py --scan 4 --dct4-split

# 4c. precision lab (limb-split diagnosis; VERDICT r2 #1 step 2)
run python tools/precision_lab.py

# 5. per-surface artifacts for PERF_r3.json (synthesis/check rerun cheap)
run python tools/perf_record.py --round 3 --surfaces synthesis,check,e2e,serve

echo "campaign done $(date)" | tee -a "$LOG"

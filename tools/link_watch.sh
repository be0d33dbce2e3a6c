#!/bin/bash
# Healthy-window watcher for the transfer-bound PERF surfaces.
#
# The dev environment's device link is bursty (16-1700 MB/s minute to
# minute, CLAUDE.md "Environment quirks"), and e2e/serve throughput is a
# link statement: numbers recorded in a degraded window under-represent
# the pipeline. This script probes the link every --interval seconds and,
# the first time both one-way rates beat --min-mb-s, re-records the e2e
# and serve rows of PERF_r{N}.json (tools/perf_record.py merges
# incrementally), then exits. The artifacts still carry their own in-run
# probes, so a reader can always tell what window a number came from.
#
# Usage: tools/link_watch.sh ROUND [MIN_MB_S] [PROBES] [INTERVAL_S]
set -u
ROUND="${1:?usage: link_watch.sh ROUND [MIN_MB_S] [PROBES] [INTERVAL_S]}"
MIN="${2:-30}"
PROBES="${3:-40}"
INTERVAL="${4:-540}"
cd "$(dirname "$0")/.."
for i in $(seq 1 "$PROBES"); do
  timeout 240 python -c "
import sys; sys.path.insert(0, '.')
from bench import probe_link
h, d = probe_link(mb=16, reps=2)
print(f'probe h2d={h:.1f} d2h={d:.1f} MB/s')
exit(0 if d > $MIN and h > $MIN else 3)
"
  if [ "$?" = "0" ]; then
    echo "healthy window - re-recording e2e,serve into PERF_r${ROUND}.json"
    timeout 1800 python tools/perf_record.py --round "$ROUND" \
      --surfaces e2e,serve
    exit $?
  fi
  sleep "$INTERVAL"
done
echo "no window above ${MIN} MB/s in ${PROBES} probes"
exit 1

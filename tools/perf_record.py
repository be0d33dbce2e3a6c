"""Per-round perf artifact: run every bench surface, write PERF_r{N}.json.

VERDICT r2 weak #8 / next-step #6: e2e/serve/frontend numbers lived only
in PERF.md prose, so regressions in non-headline surfaces were invisible
round over round. This runner executes each surface as a subprocess (the
same commands a human would run), parses the one-line JSON each emits,
and writes one machine-readable artifact per round next to BENCH_r{N}.json.

    python tools/perf_record.py --round 3 [--surfaces synthesis,check,...]

Surfaces: synthesis (bench.py, REAL TPU), check (bench.py --check, REAL
TPU), e2e (bench.py --e2e), serve (bench.py --serve), frontend
(bench.py --frontend, host only), cpu_bench (tools/cmp.py bench, host).
Each surface records the JSON line (or parsed summary), the exact
command, and wall time; failures are recorded as {"error": ...} rather
than aborting the rest.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SURFACES: dict[str, list[str]] = {
    "synthesis": [sys.executable, "bench.py"],
    "check": [sys.executable, "bench.py", "--check"],
    "e2e": [sys.executable, "bench.py", "--e2e", "--streams", "64"],
    "serve": [sys.executable, "bench.py", "--serve", "--streams", "48"],
    "frontend": [sys.executable, "bench.py", "--frontend"],
    "cpu_bench": [sys.executable, "tools/cmp.py", "bench",
                  "--backend", "native"],
}


def _last_json_line(text: str):
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def run_surface(name: str, timeout: int) -> dict:
    cmd = SURFACES[name]
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                              timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"command": " ".join(cmd), "error": f"timeout {timeout}s"}
    wall = round(time.time() - t0, 1)
    rec: dict = {"command": " ".join(cmd), "wall_s": wall}
    if proc.returncode != 0:
        rec["error"] = (proc.stderr or proc.stdout).strip()[-500:]
        return rec
    j = _last_json_line(proc.stdout)
    if j is not None:
        rec["result"] = j
    elif name == "cpu_bench":  # cmp prints prose; keep the aggregate line
        for line in proc.stdout.splitlines():
            if line.startswith("aggregate"):
                rec["result"] = {"raw": line.strip()}
    else:
        rec["error"] = "no JSON line in output"
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--surfaces", default=",".join(SURFACES))
    ap.add_argument("--timeout", type=int, default=2400,
                    help="per-surface timeout (s); --check decodes the "
                    "whole corpus on chip and is the slow one")
    args = ap.parse_args()
    names = [s for s in args.surfaces.split(",") if s]
    unknown = set(names) - set(SURFACES)
    if unknown:
        ap.error(f"unknown surfaces: {sorted(unknown)}")
    out_path = os.path.join(ROOT, f"PERF_r{args.round}.json")
    # incremental: merge into an existing artifact so chip-dependent and
    # host-only surfaces can be recorded at different times
    record: dict = {"round": args.round, "surfaces": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            record = json.load(f)
    record["date"] = time.strftime("%Y-%m-%d %H:%M:%S")
    for name in names:
        print(f"[perf_record] {name} ...", flush=True)
        record["surfaces"][name] = run_surface(name, args.timeout)
        with open(out_path, "w") as f:
            json.dump(record, f, indent=1)
            f.write("\n")
        print(f"[perf_record]   -> {record['surfaces'][name]}", flush=True)
    print(f"[perf_record] wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Record BENCH_BASELINE.json — the committed per-query regression
reference for bench.py.

Runs the bench harness with N>=5 round-robin passes (median per query,
noop sink — the honest-timing protocol) and writes the result with
provenance. Run it in an IDLE window: the shared host shows ±30-60%
CPU-steal noise under load (PERFORMANCE.md), and a noisy baseline
poisons every future delta.

Usage: python tools/bench_baseline.py [N]
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    env = dict(os.environ, SPARK_GRAFT_BENCH_N=str(n))
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    bench = json.loads(line)
    baseline = {
        "recorded_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "n": bench["n"],
        "sf": bench["sf"],
        "protocol": "v3: untimed warm pass, then noop-sink full "
                    "evaluation, round-robin, median of n passes "
                    "(see bench.py docstring)",
        "headline_total_sec": bench["value"],
        "calibration_sec": bench.get("calibration_sec"),
        "queries": {**bench["queries"], **bench.get("non_headline", {})},
    }
    path = os.path.join(ROOT, "BENCH_BASELINE.json")
    with open(path, "w") as f:
        json.dump(baseline, f, indent=2, sort_keys=True)
    print(f"wrote {path}: {len(baseline['queries'])} queries, "
          f"headline total {bench['value']}s (n={bench['n']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

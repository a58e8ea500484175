"""Perf leg for the round stamp — run ``bench.py`` and REFUSE on a
timing regression, the way ``shuffle_audit`` already refuses on a
shuffle-shape regression.

Until round 11 bench was advisory: `run_gates.py` excluded it (it
needs an idle host) and a wall-time regression could never block a
stamp — the r10 verdict called that the missing half of the perf
gate. This tool closes it:

1. runs ``bench.py`` (protocol v3: untimed warm pass, noop-sink,
   median of N) and captures its one-line JSON;
2. sanity-checks ``host_factor`` — the calibration probe's ratio vs
   the baseline host. Outside [0.5, 1.25] the host is not comparable
   (co-tenancy, thermal, wrong box) and the verdict is UNUSABLE, not
   pass/fail: rerun idle or stamp with an explicit
   ``--bench-waiver`` (which `run_gates.py` records);
3. fails on any HOST-NORMALIZED per-query ratio > --max-ratio
   (default 1.5 — the same threshold bench.py itself flags at);
4. writes the full bench JSON plus the verdict to ``BENCH_local.json``
   at the repo root — the builder-side bench artifact the stamp
   includes, sibling to ``CORRECTNESS_local.json``.

The host-normalization mirrors bench.py's flagging rule (r9: raw
ratios spam phantom flags on a slow host and mask real regressions on
a fast one); the raw ratios stay in the artifact.

Usage: python tools/bench_gate.py [--max-ratio 1.5] [--skip-run]
``--skip-run`` re-judges the newest existing bench JSON on disk
(BENCH_local.json) without re-running bench — for re-adjudicating a
finished run, never for dodging one.
"""

from __future__ import annotations

import argparse
import datetime as _dt
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(ROOT, "BENCH_local.json")

HOST_FACTOR_WINDOW = (0.5, 1.25)


def _judge(doc: dict, max_ratio: float) -> list[str]:
    fails: list[str] = []
    hf = doc.get("host_factor")
    if hf is None:
        fails.append("no host_factor (missing BENCH_BASELINE.json "
                     "calibration?) — cannot normalize, refusing")
        hf = 1.0
    elif not (HOST_FACTOR_WINDOW[0] <= hf <= HOST_FACTOR_WINDOW[1]):
        fails.append(
            f"host_factor {hf} outside {list(HOST_FACTOR_WINDOW)} — host "
            "not idle/comparable; rerun on an idle box or stamp with "
            "--bench-waiver")
    divisor = hf if hf and hf > 0.1 else 1.0
    for name, r in sorted(doc.get("vs_baseline", {}).items(),
                          key=lambda kv: -kv[1]):
        if r / divisor > max_ratio:
            fails.append(f"{name}: {r:.2f}x baseline "
                         f"({r / divisor:.2f}x host-normalized) > "
                         f"{max_ratio}x")
    if not doc.get("vs_baseline"):
        fails.append("vs_baseline empty — bench ran without a baseline; "
                     "nothing was actually gated")
    return fails


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-ratio", type=float, default=1.5)
    ap.add_argument("--skip-run", action="store_true",
                    help="re-judge the existing BENCH_local.json")
    args = ap.parse_args()

    if args.skip_run:
        if not os.path.exists(ARTIFACT):
            print("bench_gate: --skip-run but no BENCH_local.json")
            return 1
        doc = json.load(open(ARTIFACT))
    else:
        p = subprocess.run([sys.executable, "bench.py"], cwd=ROOT,
                           capture_output=True, text=True)
        sys.stderr.write(p.stderr)
        json_lines = [ln for ln in p.stdout.splitlines()
                      if ln.startswith("{")]
        if p.returncode != 0 or not json_lines:
            print(f"bench_gate: bench.py rc={p.returncode}, "
                  f"{len(json_lines)} JSON lines — run failed")
            sys.stdout.write(p.stdout[-2000:])
            return 1
        doc = json.loads(json_lines[-1])

    fails = _judge(doc, args.max_ratio)
    doc["gate"] = {
        "verdict": "pass" if not fails else "fail",
        "fails": fails,
        "max_ratio": args.max_ratio,
        "host_factor_window": list(HOST_FACTOR_WINDOW),
        "judged_utc": _dt.datetime.now(_dt.timezone.utc)
        .isoformat(timespec="seconds"),
    }
    with open(ARTIFACT, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    worst = max(doc.get("vs_baseline", {}).values(), default=None)
    print(f"bench_gate: host_factor={doc.get('host_factor')} "
          f"worst_ratio={worst} -> "
          f"{'PASS' if not fails else 'FAIL'} ({ARTIFACT})")
    for f_ in fails:
        print(f"  | {f_}")
    return 0 if not fails else 1


if __name__ == "__main__":
    sys.exit(main())

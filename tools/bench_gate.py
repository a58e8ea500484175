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
3. judges per-query ratios QUERY-RELATIVELY (v2, see below): fail on
   any host-normalized ratio > --max-ratio x the MEDIAN ratio;
4. if the median itself shifted beyond --uniform-threshold, refuses
   unless ``--uniform-shift-evidence`` records an A/B result;
5. writes the full bench JSON plus the verdict to ``BENCH_local.json``
   at the repo root — the builder-side bench artifact the stamp
   includes, sibling to ``CORRECTNESS_local.json``.

Judge v2 — why query-RELATIVE (r11): round boundaries land on fresh
VMs from a heterogeneous fleet, and round 11 measured a UNIFORM 1.37x
shift across all ~130 tracked queries — including queries whose code
and plans were bit-identical to the round that recorded the baseline —
while the CPU-bound calibration probe ran 10% FASTER (the slow
resource was the memory/IO path, which a codegen integer probe never
touches). A worktree A/B on the same host settled it: previous-round
code 198.2 s vs current 197.2 s, baseline 149.1 s — pure host class,
zero code effect. Timing alone cannot distinguish a uniform host
shift from a uniform code regression; what it CAN detect robustly is
a QUERY-SPECIFIC regression (one query slowing relative to the fleet
of queries measured in the same run). So:

- per-query rule: host-normalized ratio / median ratio > --max-ratio
  (default 1.5) fails — catches the real signature of a code
  regression on any host class;
- uniform rule: median host-normalized ratio > --uniform-threshold
  (default 1.25) fails UNLESS ``--uniform-shift-evidence`` supplies
  the A/B result proving host-neutrality (bench the previous round's
  commit in a ``git worktree`` on the SAME host; near-identical totals
  = host shift, a gap = real global regression). The evidence text is
  recorded verbatim in the artifact for the judge to read — it is an
  attestation, not a bypass: providing it without running the A/B is
  falsifying a record.

Usage: python tools/bench_gate.py [--max-ratio 1.5]
           [--uniform-threshold 1.25] [--uniform-shift-evidence TEXT]
           [--skip-run]
``--skip-run`` re-judges the newest existing bench JSON on disk
(BENCH_local.json) without re-running bench — for re-adjudicating a
finished run, never for dodging one.
"""

from __future__ import annotations

import argparse
import datetime as _dt
import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(ROOT, "BENCH_local.json")

HOST_FACTOR_WINDOW = (0.5, 1.25)


def _judge(doc: dict, max_ratio: float, uniform_threshold: float,
           evidence: str | None) -> tuple[list[str], dict]:
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
    vb = doc.get("vs_baseline", {})
    if not vb:
        fails.append("vs_baseline empty — bench ran without a baseline; "
                     "nothing was actually gated")
        return fails, {}
    norm = {name: r / divisor for name, r in vb.items()}
    med = statistics.median(norm.values())
    stats = {"median_normalized_ratio": round(med, 3)}
    # query-relative rule: a code regression is query-specific
    rel_base = max(med, 1.0)  # a FAST fleet must not hide a slow query
    for name, r in sorted(norm.items(), key=lambda kv: -kv[1]):
        if r / rel_base > max_ratio:
            fails.append(
                f"{name}: {vb[name]:.2f}x baseline ({r:.2f}x "
                f"host-normalized, {r / rel_base:.2f}x the run median "
                f"{med:.2f}) > {max_ratio}x median")
    # uniform rule: a fleet-wide shift needs an A/B attestation
    if med > uniform_threshold:
        if evidence:
            stats["uniform_shift_evidence"] = evidence
            print(f"# uniform shift median {med:.2f} accepted on "
                  f"recorded A/B evidence")
        else:
            fails.append(
                f"median host-normalized ratio {med:.2f} > "
                f"{uniform_threshold} — uniform shift: either the host "
                "class changed or the code regressed globally. Run the "
                "A/B (bench the previous round's commit in a git "
                "worktree on THIS host) and re-judge with "
                "--uniform-shift-evidence, or fix the regression")
    return fails, stats


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-ratio", type=float, default=1.5)
    ap.add_argument("--uniform-threshold", type=float, default=1.25)
    ap.add_argument("--uniform-shift-evidence", default=None, metavar="TEXT",
                    help="A/B result proving a uniform shift is the host, "
                         "not the code (recorded verbatim in the artifact)")
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

    fails, stats = _judge(doc, args.max_ratio, args.uniform_threshold,
                          args.uniform_shift_evidence)
    doc["gate"] = {
        "verdict": "pass" if not fails else "fail",
        "fails": fails,
        "max_ratio": args.max_ratio,
        "uniform_threshold": args.uniform_threshold,
        "host_factor_window": list(HOST_FACTOR_WINDOW),
        "judged_utc": _dt.datetime.now(_dt.timezone.utc)
        .isoformat(timespec="seconds"),
        **stats,
    }
    with open(ARTIFACT, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    worst = max(doc.get("vs_baseline", {}).values(), default=None)
    print(f"bench_gate: host_factor={doc.get('host_factor')} "
          f"median_norm={stats.get('median_normalized_ratio')} "
          f"worst_ratio={worst} -> "
          f"{'PASS' if not fails else 'FAIL'} ({ARTIFACT})")
    for f_ in fails:
        print(f"  | {f_}")
    return 0 if not fails else 1


if __name__ == "__main__":
    sys.exit(main())

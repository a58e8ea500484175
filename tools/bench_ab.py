"""Same-host worktree A/B bench — machine-generated uniform-shift
evidence for ``tools/bench_gate.py`` (r12; VERDICT r11 item 6).

When a round's bench shows a UNIFORM median shift vs BENCH_BASELINE,
timing alone cannot distinguish a slower host class from a global code
regression. The discriminating experiment (first run by hand in r11):
bench a KNOWN-GOOD ref — normally the previous round's commit — in a
``git worktree`` on THIS host, back-to-back with HEAD. Near-identical
totals ⇒ the shift is the host; a gap ⇒ a real regression. This tool
runs that experiment and writes a JSON artifact ``bench_gate``
consumes directly via ``--uniform-shift-evidence-file`` (it validates
the neutral ratio, the HEAD match, and freshness), so the attestation
is measured, not prose.

Usage: python tools/bench_ab.py REF [--out BENCH_AB.json]
           [--neutral 0.9 1.1] [--keep-worktree]

REF is any commit-ish (e.g. the previous round's stamp commit). Both
runs use bench.py's own protocol (warm pass, noop sink, median of N —
honor SPARK_GRAFT_* env). Needs an idle host, like bench.py itself.
Exit 0 = neutral A/B (valid host-shift evidence); exit 1 = the A/B
itself shows a code regression (the artifact is still written — it is
evidence FOR the regression); exit 2 = harness failure.
"""

from __future__ import annotations

import argparse
import datetime as _dt
import json
import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(cwd: str) -> dict:
    p = subprocess.run([sys.executable, "bench.py"], cwd=cwd,
                       capture_output=True, text=True)
    sys.stderr.write(p.stderr[-2000:])
    lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    if p.returncode != 0 or not lines:
        raise RuntimeError(f"bench.py rc={p.returncode} in {cwd}: "
                           f"{p.stdout[-500:]}")
    return json.loads(lines[-1])


def _git(*args: str) -> str:
    return subprocess.run(["git", *args], cwd=ROOT, capture_output=True,
                          text=True, check=True).stdout.strip()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("ref", help="known-good commit-ish to bench against "
                                "(normally the previous round's commit)")
    ap.add_argument("--out", default=os.path.join(ROOT, "BENCH_AB.json"))
    ap.add_argument("--neutral", nargs=2, type=float, default=[0.9, 1.1],
                    metavar=("LO", "HI"),
                    help="head/ref total ratio window that counts as "
                         "host-neutral")
    ap.add_argument("--keep-worktree", action="store_true")
    args = ap.parse_args()

    ref_commit = _git("rev-parse", args.ref)
    head_commit = _git("rev-parse", "HEAD")
    wt = f"/tmp/bench_ab_{ref_commit[:12]}"
    if os.path.exists(wt):
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=ROOT, capture_output=True)
        shutil.rmtree(wt, ignore_errors=True)
    _git("worktree", "add", "--detach", wt, ref_commit)
    try:
        # ref first, HEAD second, back-to-back on the same host — the
        # order matters less than the adjacency
        print(f"# bench_ab: benching ref {ref_commit[:12]} in {wt}")
        ref_doc = _run_bench(wt)
        print(f"# bench_ab: benching HEAD {head_commit[:12]}")
        head_doc = _run_bench(ROOT)
    except RuntimeError as exc:
        print(f"bench_ab: {exc}")
        return 2
    finally:
        if not args.keep_worktree:
            subprocess.run(["git", "worktree", "remove", "--force", wt],
                           cwd=ROOT, capture_output=True)

    ratio = round(head_doc["value"] / ref_doc["value"], 4)
    doc = {
        "ref_commit": ref_commit,
        "head_commit": head_commit,
        "ref_total_sec": ref_doc["value"],
        "head_total_sec": head_doc["value"],
        "head_over_ref_ratio": ratio,
        "ref_calibration_sec": ref_doc.get("calibration_sec"),
        "head_calibration_sec": head_doc.get("calibration_sec"),
        "ref_host_factor": ref_doc.get("host_factor"),
        "head_host_factor": head_doc.get("host_factor"),
        "neutrality_window": args.neutral,
        "sf": head_doc.get("sf"),
        "recorded_utc": _dt.datetime.now(_dt.timezone.utc)
        .isoformat(timespec="seconds"),
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    neutral = args.neutral[0] <= ratio <= args.neutral[1]
    print(f"bench_ab: ref {ref_doc['value']}s vs HEAD {head_doc['value']}s "
          f"ratio {ratio} -> {'NEUTRAL (host shift)' if neutral else 'GAP (code regression)'} "
          f"({args.out})")
    return 0 if neutral else 1


if __name__ == "__main__":
    sys.exit(main())

"""Round-end gate runner — executes every check in the right order and
stamps the round snapshot ONLY when all of them are green.

Three rounds running, the round-end sequence itself produced the
artifacts' only defects (round 7: a stale mid-round ``_rNN`` snapshot
and a property test committed without a post-edit run; round 8: a
session died mid gate-refresh leaving regenerated artifacts
uncommitted). The fix is the same as for any other multi-step invariant
in this repo: make it ONE deterministic program.

Order (each regenerates its committed artifact as a side effect):

1. ``ansi_audit``      — static lint, fails fast, costs nothing
2. ``oracle_check``    — full-registry Spark-vs-DuckDB attestation at
                         sf0.01; REWRITES ``CORRECTNESS_local.json``
3. ``plan_audit``      — executes every plan; regenerates ``PLANS.md``
4. ``shuffle_audit``   — REST-measured amplification; ``SHUFFLE.md``
5. ``skew_sweep``      — power-law straggler gate
6. ``contract_fuzz``   — full oracle battery on degraded data with ALL
                         dials on (NULL/empty + duplicate-id clones +
                         NaN/-inf + conflicting same-id clones) — the
                         cross-engine contract gate; the r8 recon dials
                         were closed in r9, the conflict dial in r10,
                         all run combined in one pass
7. ``scale_study``     — sf0.01→sf0.1 scaling exponents
8. ``pytest``          — the full unit/pipeline/property suite
9. ``stamp_round N``   — byte-copies the canonical attestation to
                         ``CORRECTNESS_local_r{NN}.json`` (only with
                         ``--round N``, only when 1-7 all passed)

``--sf01`` additionally runs the full oracle battery at sf0.1
(artifact ``CORRECTNESS_sf01.json``) — correctness was historically
attested only at sf0.01 while bench runs at sf0.1, so scale-dependent
divergence (sketch escapes, hot-cap engagement, AQE plan changes) was
invisible. Off by default for mid-round iteration (it roughly doubles
gate wall-clock) — but STAMPING implies it: ``--round N`` adds the
sf0.1 leg automatically and refuses to stamp without it green (r9
verdict #5: the sf0.1 first run caught three real divergences; a gate
that has caught bugs must not be skippable on the round stamp).

``bench.py`` is deliberately NOT here: it needs an idle host and the
driver runs it independently; use ``tools/bench_baseline.py`` for
deliberate baseline updates.

All gates run even after a failure (one pass diagnoses everything);
the stamp step alone is withheld unless everything is green. Per-gate
output streams to ``/tmp/gate_<name>.log``; failures print the tail.

Usage: python tools/run_gates.py [--round N] [--skip pytest,...]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GATES = [
    ("ansi_audit", [sys.executable, "tools/ansi_audit.py"]),
    ("oracle_check", [sys.executable, "tools/oracle_check.py",
                      "/root/testdata/sf0.01"]),
    ("plan_audit", [sys.executable, "tools/plan_audit.py"]),
    ("shuffle_audit", [sys.executable, "tools/shuffle_audit.py"]),
    ("skew_sweep", [sys.executable, "tools/skew_sweep.py", "--json"]),
    ("contract_fuzz", [sys.executable, "tools/contract_fuzz.py",
                       "--dup-rate", "0.02", "--nan-rate", "0.02",
                       "--conflict-rate", "0.02"]),
    ("scale_study", [sys.executable, "tools/scale_study.py"]),
    ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"]),
]


def run_gate(name: str, cmd: list[str]) -> tuple[bool, float]:
    log = f"/tmp/gate_{name}.log"
    t0 = time.time()
    with open(log, "w") as f:
        rc = subprocess.run(cmd, cwd=ROOT, stdout=f,
                            stderr=subprocess.STDOUT).returncode
    dt = time.time() - t0
    ok = rc == 0
    print(f"{'PASS' if ok else 'FAIL'}  {name:<14} {dt:7.1f}s  ({log})")
    if not ok:
        tail = open(log).read().splitlines()[-15:]
        for line in tail:
            print(f"    | {line}")
    return ok, dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None,
                    help="stamp CORRECTNESS_local_r{NN}.json if all green")
    ap.add_argument("--skip", default="",
                    help="comma-separated gate names to skip")
    ap.add_argument("--sf01", action="store_true",
                    help="also attest the full registry at sf0.1 "
                         "(writes CORRECTNESS_sf01.json)")
    args = ap.parse_args()
    skip = {s.strip() for s in args.skip.split(",") if s.strip()}

    gates = list(GATES)
    if args.sf01 or args.round is not None:
        gates.insert(3, ("oracle_sf01",
                         [sys.executable, "tools/oracle_check.py",
                          "/root/testdata/sf0.1",
                          "--json", "CORRECTNESS_sf01.json"]))
    results: dict[str, bool] = {}
    for name, cmd in gates:
        if name in skip:
            print(f"SKIP  {name}")
            continue
        results[name], _ = run_gate(name, cmd)

    all_green = bool(results) and all(results.values())
    print(f"\ngates: {sum(results.values())}/{len(results)} green")
    if args.round is not None:
        # Stamping requires the FULL battery: a skipped gate is not a
        # green gate, and all() over an empty dict is vacuously true —
        # without this check `--skip <everything> --round N` would
        # stamp a snapshot with zero checks run.
        ran = set(results)
        # stamping requires every default gate PLUS the sf0.1 leg
        missing = [n for n, _ in gates if n not in ran]
        if missing:
            print(f"NOT stamping round {args.round}: skipped gates "
                  f"{missing} — stamping requires the full battery")
            return 1
        if not all_green:
            print(f"NOT stamping round {args.round}: red gates "
                  f"{[n for n, ok in results.items() if not ok]}")
            return 1
        rc = subprocess.run(
            [sys.executable, "tools/stamp_round.py", str(args.round)],
            cwd=ROOT).returncode
        if rc != 0:
            return rc
        print(f"stamped round {args.round}")
    return 0 if all_green else 1


if __name__ == "__main__":
    sys.exit(main())

"""Two-scale scaling study: run oracle queries at two sf dirs and
report per-query medians, the 10x wall ratio, and the scaling exponent
``log10(t_big / t_small)`` (1.0 = linear, > 1 super-linear).

This is the harness behind PERFORMANCE.md's two-scale table — run it
after operator changes so the table never drifts from measurement.

Usage:
  python tools/scale_study.py [--small DIR] [--big DIR] [--n 3]
      [--top-bench N] [--synth-big] [query ...]

Defaults: sf0.01 -> sf0.1, median of 3, all bench HEADLINE queries.
Emits a markdown table on stdout (paste-ready) and one JSON line on
stderr for tooling.

Third decade (r12, VERDICT r11 #4): the sf0.01→sf0.1 window is too
narrow to see super-linear onset (the r10 tfidf df-cap OOM was only
visible at the synthesized third decade), so ``run_gates`` now also
runs ``--small /root/testdata/sf0.1 --big /tmp/sf1_synth --synth-big
--top-bench 10``: the 10 most expensive bench queries (by
BENCH_BASELINE seconds) measured sf0.1 → synth-sf1. ``--synth-big``
builds the fixture via ``tools/synth_scale.py`` when the dir is
missing; ``--top-bench N`` selects the N largest-baseline tracked
queries. The exponent gate (exit 1 when any window goes super-linear)
applies unchanged.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.01")
    ap.add_argument("--big", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--top-bench", type=int, default=None, metavar="N",
                    help="run the N most expensive tracked queries by "
                         "BENCH_BASELINE.json seconds (third-decade set)")
    ap.add_argument("--synth-big", action="store_true",
                    help="build --big via tools/synth_scale.py if the "
                         "directory is missing")
    ap.add_argument("--cores-leg", type=int, default=None, metavar="C",
                    help="after the two-scale table, re-time the --big "
                         "queries in a fresh local[C] session (shuffle "
                         "partitions scaled to C) and gate core-scaling: "
                         "sub-second sf0.1 queries cannot distinguish "
                         "parallel from serial work (r13 verdict: every "
                         "8-vs-32-core ratio sat at ~1), so this leg "
                         "belongs on the synthetic third decade where "
                         "per-query work is tens of seconds")
    ap.add_argument("--cores-floor", type=float, default=10.0,
                    help="gate only queries whose low-core time is at "
                         "least this many seconds (smaller ones are "
                         "fixed-cost dominated)")
    ap.add_argument("--cores-min-speedup", type=float, default=2.0,
                    help="minimum t_low/t_high speedup for gated "
                         "queries (4x the cores should buy >= 2x)")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.synth_big and not os.path.isdir(args.big):
        import subprocess
        print(f"# building synthetic fixture {args.big} "
              f"(tools/synth_scale.py)", flush=True)
        subprocess.run([sys.executable,
                        os.path.join(root, "tools", "synth_scale.py"),
                        "--out", args.big], check=True, cwd=root)
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(root, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    bench_spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(root, "bench.py"))
    bench = importlib.util.module_from_spec(bench_spec)
    bench_spec.loader.exec_module(bench)

    from zacks_estimates_financial_statements_spark.session import get_spark
    extra = {"spark.ui.enabled": "false",
             "spark.ui.showConsoleProgress": "false",
             # headroom for the synthesized-sf1 decade; the
             # session factory deliberately keeps the bench
             # default at 1g (see session.py measurement note)
             "spark.driver.memory":
                 os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g")}
    if os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS"):
        # more, smaller tasks for oversized runs — same env contract as
        # tools/oracle_check.py (AQE re-coalesces, so this only bounds
        # per-task memory)
        extra["spark.sql.shuffle.partitions"] = \
            os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"]
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf=extra)

    qs = mod.queries()
    if args.top_bench:
        base = json.load(open(os.path.join(root, "BENCH_BASELINE.json")))
        secs = dict(base.get("queries", {}))
        secs.update(base.get("non_headline", {}))
        names = [q for q, _ in
                 sorted(secs.items(), key=lambda kv: -kv[1])
                 if q in qs][:args.top_bench]
    else:
        names = args.queries or [q for q in bench.HEADLINE if q in qs]
    out = {}
    print("| query | small s | big s | ratio | exp |")
    print("|---|---|---|---|---|")
    for name in names:
        med = {}
        for sf in (args.small, args.big):
            def force():
                df = qs[name](spark, sf)
                df.write.format("noop") \
                    .mode("overwrite").save()  # full eval, no count-pruning
                # bench.py's per-pass honesty rule: release internal
                # persists or pass N measures pass N-1's cache
                # (CacheManager matches canonicalized plans)
                release = getattr(df, "release_cache", None)
                if release is not None:
                    try:
                        release()
                    except Exception:  # noqa: BLE001
                        pass
                spark.catalog.clearCache()
            force()  # warm (plan + page cache)
            ts = []
            for _ in range(args.n):
                t0 = time.time()
                force()
                ts.append(time.time() - t0)
            med[sf] = statistics.median(ts)
        ratio = med[args.big] / med[args.small]
        exp = math.log10(ratio)
        out[name] = {"small_s": round(med[args.small], 3),
                     "big_s": round(med[args.big], 3),
                     "ratio": round(ratio, 2), "exp": round(exp, 2)}
        print(f"| {name} | {med[args.small]:.2f} | {med[args.big]:.2f} "
              f"| {ratio:.2f}x | {exp:.2f} |", flush=True)
    doc = {"small": args.small, "big": args.big,
           "n": args.n, "queries": out}
    rc = 0 if max(out.values(), key=lambda d: d["exp"])["exp"] <= 1.0 \
        else 1

    if args.cores_leg:
        # Fresh low-core session for the SAME --big queries. Shuffle
        # partitions scale with the core count in BOTH directions of
        # the comparison (a constant tuned for either count would
        # penalize the other; AQE re-coalesces, so the number only
        # sets the pre-coalesce task grain).
        high_cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        spark.stop()
        low = get_spark(
            master=f"local[{args.cores_leg}]",
            extra_conf={**extra,
                        "spark.sql.shuffle.partitions":
                            str(max(args.cores_leg * 2, 8))})
        cores_out = {}
        print(f"\n| query | t{args.cores_leg}c | t{high_cores}c "
              f"| speedup |")
        print("|---|---|---|---|")
        for name in names:
            def force_low():
                df = qs[name](low, args.big)
                df.write.format("noop").mode("overwrite").save()
                release = getattr(df, "release_cache", None)
                if release is not None:
                    try:
                        release()
                    except Exception:  # noqa: BLE001
                        pass
                low.catalog.clearCache()
            force_low()   # warm
            ts = []
            for _ in range(args.n):
                t0 = time.time()
                force_low()
                ts.append(time.time() - t0)
            t_low = statistics.median(ts)
            t_high = out[name]["big_s"]
            speedup = t_low / t_high if t_high else float("nan")
            gated = t_low >= args.cores_floor
            cores_out[name] = {"t_low": round(t_low, 3),
                               "t_high": t_high,
                               "speedup": round(speedup, 2),
                               "gated": gated}
            flag = ""
            if gated and speedup < args.cores_min_speedup:
                rc = 1
                flag = "  <-- FAIL core-scaling gate"
            print(f"| {name} | {t_low:.2f} | {t_high:.2f} "
                  f"| {speedup:.2f}x |{flag}", flush=True)
        doc["cores_leg"] = {"low_cores": args.cores_leg,
                            "high_cores": high_cores,
                            "floor_s": args.cores_floor,
                            "min_speedup": args.cores_min_speedup,
                            "queries": cores_out}

    print(json.dumps(doc), file=sys.stderr)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())

"""Row-level diff between a registry query and its oracle twin.

``oracle_check`` answers PASS/FAIL; this answers WHY — it canonicalizes
both result sets exactly the way ``oracle_check.table_hash`` does, then
prints the multiset symmetric difference (rows only one engine
produced), capped per side. The triage tool for contract-fuzz rounds:
point it at the fuzzed dir and the divergent rows name the contract.

Usage: python tools/oracle_diff.py <sf_dir> <query> [--cap 10]
"""

from __future__ import annotations

import importlib.util
import os
import sys
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_check import TABLES, canon  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cap = 10
    if "--cap" in sys.argv:
        cap = int(sys.argv[sys.argv.index("--cap") + 1])
    sf_dir, name = args[0], args[1]

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from zacks_estimates_financial_statements_spark.session import get_spark
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    sdf = mod.queries()[name](spark, sf_dir)
    scols = sdf.columns
    order = sorted(range(len(scols)), key=lambda i: scols[i])
    hdr = " | ".join(scols[i] for i in order)
    srows = Counter("\x01".join(canon(tuple(r)[i]) for i in order)
                    for r in sdf.collect())
    tbl = con.execute(mod.oracle_sql()[name]).arrow()
    dcols = list(tbl.column_names)
    dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
    drows = Counter("\x01".join(canon(tuple(d[c] for c in dcols)[i])
                                for i in dorder)
                    for d in tbl.to_pylist())
    spark.stop()

    s_only = srows - drows
    d_only = drows - srows
    print(f"spark={sum(srows.values())} duckdb={sum(drows.values())} "
          f"spark-only={sum(s_only.values())} "
          f"duckdb-only={sum(d_only.values())}")
    print(f"cols: {hdr}")
    for label, diff in (("spark-only", s_only), ("duckdb-only", d_only)):
        for i, (row, n) in enumerate(sorted(diff.items())):
            if i >= cap:
                print(f"  {label}: ... {len(diff) - cap} more distinct")
                break
            print(f"  {label} x{n}: {row.replace(chr(1), ' | ')[:300]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Pipeline-throughput harness: generates a synthetic fixture raw zone
(estimates and/or statements), runs the real transform-load pipelines,
and prints one JSON line per stage — the reproducible source of the
PERFORMANCE.md throughput numbers.

Usage: python tools/throughput.py [n_docs] [--sequential]
"""

from __future__ import annotations

import itertools
import json
import os
import shutil
import string
import sys
import tempfile
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))


def _write_raw(base: str, n_docs: int) -> None:
    from fixtures import (
        _INCOME_FIELDS,
        balance_sheet_page,
        cash_flow_page,
        estimate_page,
        income_statement_page,
    )

    from zacks_estimates_financial_statements_spark.parse.statements import BALANCE_COLS
    from zacks_estimates_financial_statements_spark.schemas import CASH_FLOW_STATEMENT_COLS

    ad2 = ["12/31/23", "12/31/22", "12/31/21", "12/31/20", "12/31/19"]
    qd2 = ["3/31/24", "12/31/23", "9/30/23", "6/30/23", "3/31/23"]
    ad4 = ["12/31/2023", "12/31/2022", "12/31/2021", "12/31/2020",
           "12/31/2019"]
    qd4 = ["3/31/2024", "12/31/2023", "9/30/2023", "6/30/2023", "3/31/2023"]

    def vals(fields, base_v=100):
        return {f: [str(base_v + i * 1000 + c) for c in range(5)]
                for i, f in enumerate(fields)}

    pages = {
        "estimates": (".detailed-estimates.html", estimate_page()),
        "income-statement": (".income-statement.html", income_statement_page(
            ad2, qd2, vals(_INCOME_FIELDS), vals(_INCOME_FIELDS, 500))),
        "balance-sheet": (".balance-sheet.html", balance_sheet_page(
            ad4, qd4, vals(BALANCE_COLS), vals(BALANCE_COLS, 500))),
        "cash-flow-statement": (".cash-flow-statement.html", cash_flow_page(
            ad4, qd4, vals(CASH_FLOW_STATEMENT_COLS),
            vals(CASH_FLOW_STATEMENT_COLS, 500))),
    }
    syms = ["".join(p) for p in itertools.islice(
        itertools.product(string.ascii_uppercase, repeat=3), n_docs)]
    for ds, (suffix, html) in pages.items():
        d = os.path.join(base, ds, "2024-06-01")
        os.makedirs(d, exist_ok=True)
        for s in syms:
            with open(os.path.join(d, f"{s}{suffix}"), "w") as fh:
                fh.write(html)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(args[0]) if args else 100
    parallel = "--sequential" not in sys.argv

    from zacks_estimates_financial_statements_spark import runner
    from zacks_estimates_financial_statements_spark.session import get_spark

    work = tempfile.mkdtemp(prefix="zacks-throughput-")
    raw = os.path.join(work, "raw")
    _write_raw(raw, n_docs)

    spark = get_spark(app_name="zacks-throughput",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    try:
        # untimed warmup on a fresh store, then the timed runs
        runner.run_estimates(spark, raw, os.path.join(work, "warm"),
                             "2024-06-01")
        for stage, fn in [
            ("estimates", lambda t: runner.run_estimates(
                spark, raw, t, "2024-06-01")),
            ("statements", lambda t: runner.run_statements(
                spark, raw, t, "2024-06-01", parallel=parallel)),
        ]:
            tables = os.path.join(work, stage)
            t0 = time.time()
            result = fn(tables)
            dt = time.time() - t0
            print(json.dumps({
                "stage": stage, "n_docs": n_docs, "sec": round(dt, 2),
                "docs_per_sec": round(n_docs / dt, 2),
                "parallel": parallel, "result": result}))
        return 0
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())

"""Full-lifecycle integration: fetcher → raw zone → transform-load →
windowed dolt dump → publish argv — the reference's whole cron day in
one test, no hand-placed files."""

from __future__ import annotations

import datetime

from fixtures import estimate_page

from zacks_estimates_financial_statements_spark import export as X
from zacks_estimates_financial_statements_spark import ingest, runner

DATE = "2024-06-01"


def test_estimates_day_end_to_end(spark, tmp_path, capsys):
    raw = str(tmp_path / "raw")
    tables = str(tmp_path / "tables")
    out = str(tmp_path / "dolt")

    # 1. ingest: politeness-scheduled fetch (fixture HTML, no sleeping)
    jobs = ingest.estimate_schedule(
        ["AAPL", "MSFT", "ZZZZ"], raw, datetime.date.fromisoformat(DATE))
    assert [j.delay_s for j in jobs] == [0, 10, 20]
    written = ingest.run_schedule(
        jobs, fetch=lambda url: estimate_page().encode(),
        sleep=lambda s: None)
    assert len(written) == 3

    # 2. transform-load: parse + validity gate + 6-table fan-out
    result = runner.run_estimates(spark, raw, tables, DATE)
    assert result == {"attempted": 3, "loaded": 3, "failed": 0}

    # 3. replay is a no-op (W1 idempotent upsert)
    result = runner.run_estimates(spark, raw, tables, DATE)
    assert result["attempted"] == 3

    # 4. dump with the reference's default same-day window
    from zacks_estimates_financial_statements_spark.operators.writer import TableStore
    start, end = X.default_dump_window("eps_estimate", end_date=DATE)
    assert (start, end) == (DATE, DATE)
    files = X.dump_dolt(TableStore(spark, tables, "eps_estimate").read(),
                        "eps_estimate", out, start, end)
    assert [f.split("/")[-1] for f in files] == [f"{DATE}.csv"]
    lines = open(files[0]).read().strip().split("\n")
    assert lines[0].startswith("date,act_symbol,period")
    # 3 symbols x 4 periods with data from the fixture page
    assert len(lines) > 3

    # 5. publish sequence (dry run) matches the reference argv chain
    cmds = X.publish("eps_estimate", files, out, end, dry_run=True)
    assert [c[:3] for c in cmds] == [
        ["dolt", "table", "import"], ["dolt", "add", "eps_estimate"],
        ["dolt", "commit", "-m"], ["dolt", "push", "--silent"]]
    assert "DRY-RUN" in capsys.readouterr().out

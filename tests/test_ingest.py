"""Thin ingest fetcher (S1-S3): politeness schedule, raw-zone layout,
per-document error isolation, and round-trip into the Spark raw-zone
readers."""

from __future__ import annotations

import datetime

from fixtures import estimate_page

from zacks_estimates_financial_statements_spark import ingest
from zacks_estimates_financial_statements_spark.sources.raw_zone import read_documents

D = datetime.date(2026, 8, 13)


def test_estimate_schedule_cadence_and_layout(tmp_path):
    jobs = ingest.estimate_schedule(["AAPL", "MSFT", "ZZZZ"],
                                    str(tmp_path), D)
    assert [j.delay_s for j in jobs] == [0, 10, 20]
    assert jobs[0].url.endswith("/stock/quote/AAPL/detailed-earning-estimates")
    assert jobs[1].path == (f"{tmp_path}/estimates/2026-08-13/"
                            "MSFT.detailed-estimates.html")


def test_statement_schedule_stagger():
    jobs = ingest.statement_schedule(["A", "B"], "/raw", D)
    delays = {(j.path.split("/")[3], j.path.split("/")[-1]): j.delay_s
              for j in jobs}
    assert delays[("2026-08-13", "A.income-statement.html")] == 0
    assert delays[("2026-08-13", "A.balance-sheet.html")] == 4
    assert delays[("2026-08-13", "A.cash-flow-statement.html")] == 8
    assert delays[("2026-08-13", "B.income-statement.html")] == 12
    assert delays[("2026-08-13", "B.cash-flow-statement.html")] == 20
    # url page segment for cash flow is plural; dataset dir singular
    cf = [j for j in jobs if j.path.endswith("A.cash-flow-statement.html")][0]
    assert cf.url.endswith("/stock/quote/A/cash-flow-statements")
    assert "/cash-flow-statement/" in cf.path


def test_calendar_schedule_posix_6am_and_window():
    jobs = ingest.calendar_schedule("earnings", "/raw", D)
    assert len(jobs) == 42  # six weeks ahead
    assert jobs[0].url.endswith(
        "calltype=eventscal&type=1&date=" + str(ingest.posix_6am(D)))
    assert ingest.posix_6am(D) == int(datetime.datetime(
        2026, 8, 13, 6, tzinfo=datetime.timezone.utc).timestamp())
    assert jobs[1].path == "/raw/earnings-calendar/2026-08-13/2026-08-14.json"
    div = ingest.calendar_schedule(
        "dividend", "/raw", D, start_date=D,
        end_date=D + datetime.timedelta(days=2))
    assert len(div) == 2
    assert "type=5" in div[0].url
    assert div[0].path.startswith("/raw/dividend-calendar/")


def test_run_schedule_writes_sleeps_and_isolates_errors(tmp_path, capsys):
    jobs = ingest.estimate_schedule(["AAA", "BBB", "CCC"], str(tmp_path), D)
    sleeps: list[float] = []

    def fake_fetch(url: str) -> bytes:
        if "BBB" in url:
            raise OSError("boom")
        return estimate_page().encode()

    written = ingest.run_schedule(jobs, fetch=fake_fetch,
                                  sleep=sleeps.append)
    # inter-job gaps, not absolute delays
    assert sleeps == [10, 10]
    assert [p.split("/")[-1] for p in written] == [
        "AAA.detailed-estimates.html", "CCC.detailed-estimates.html"]
    assert "Encountered error for" in capsys.readouterr().out
    assert (tmp_path / "estimates" / "2026-08-13"
            / "AAA.detailed-estimates.html").read_bytes() \
        == estimate_page().encode()


def test_dry_run_prints_without_fetching(tmp_path, capsys):
    jobs = ingest.estimate_schedule(["AAA"], str(tmp_path), D)

    def explode(url: str) -> bytes:
        raise AssertionError("dry run must not fetch")

    written = ingest.run_schedule(jobs, fetch=explode, dry_run=True)
    assert written == []
    out = capsys.readouterr().out
    assert "GET https://www.zacks.com/stock/quote/AAA" in out
    assert not (tmp_path / "estimates").exists()


def test_cli_dry_run_end_to_end(tmp_path, capsys):
    syms = tmp_path / "syms.txt"
    syms.write_text("MSFT\nAAPL\nZZZZ\n")
    rc = ingest.main(["estimates", "--base", str(tmp_path / "raw"),
                      "--symbols-file", str(syms),
                      "--first-symbol", "AAPL", "--last-symbol", "MSFT",
                      "--date", "2026-08-13", "--dry-run"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "AAPL" in out and "MSFT" in out and "ZZZZ" not in out


def test_fetched_raw_zone_round_trips_into_spark_reader(spark, tmp_path):
    jobs = ingest.estimate_schedule(["AAPL", "MSFT"], str(tmp_path), D)
    ingest.run_schedule(jobs, fetch=lambda url: estimate_page().encode(),
                        sleep=lambda s: None)
    docs = read_documents(spark, str(tmp_path), "estimates", "2026-08-13")
    rows = {r["act_symbol"] for r in docs.select("act_symbol").collect()}
    assert rows == {"AAPL", "MSFT"}

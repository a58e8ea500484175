"""Thin politeness-scheduled raw-zone fetcher — SURVEY §2.1 S1-S3 (+ F11).

Deliberately NOT a Spark job: the reference's extract stage is a
rate-limited single-threaded HTTP crawl (one document every 10-12 s),
so there is nothing to distribute — the engine proper starts at the
raw zone this script writes. Behavior mirrors the reference scripts:

- estimates   — one page per symbol, 10 s cadence
  (estimate-extract.rkt:13-24, delay-interval at :91)
- statements  — three pages per symbol (income / balance / cash-flow)
  staggered +0/+4/+8 s inside a 12 s per-symbol slot
  (financial-statement-extract.rkt:13-53, :118-127)
- calendars   — one JSON per event date, 10 s cadence, six weeks ahead,
  URL keyed by the event date's 06:00 posix stamp — F11
  (earnings-calendar-extract.rkt:14-29,:31,:45; dividend variant
  type=5, dividend-calendar-extract.rkt:24-25)

Raw-zone layout written (the exact layout ``sources.raw_zone`` scans)::

    <base>/estimates/<run-date>/<SYM>.detailed-estimates.html
    <base>/income-statement/<run-date>/<SYM>.income-statement.html
    <base>/balance-sheet/<run-date>/<SYM>.balance-sheet.html
    <base>/cash-flow-statement/<run-date>/<SYM>.cash-flow-statement.html
    <base>/earnings-calendar/<run-date>/<event-date>.json
    <base>/dividend-calendar/<run-date>/<event-date>.json

Per-document failures are logged and skipped, never fatal (the
reference wraps each download in a handler that prints
"Encountered error for <key>" and moves on). ``--dry-run`` prints the
schedule without sleeping or fetching, so the end-to-end story is
testable offline; tests inject a ``fetch`` callable serving fixture
HTML and a no-op ``sleep``.
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys
import time
from dataclasses import dataclass
from collections.abc import Callable, Iterable

BASE_URL = "https://www.zacks.com"

ESTIMATE_DELAY_S = 10        # estimate-extract.rkt:91
STATEMENT_DELAY_S = 12       # financial-statement-extract.rkt:118
STATEMENT_STAGGER_S = (0, 4, 8)  # financial-statement-extract.rkt:122-127
CALENDAR_DELAY_S = 10        # earnings-calendar-extract.rkt:45
CALENDAR_WEEKS_AHEAD = 6     # earnings-calendar-extract.rkt:31

#: (url page segment, raw dataset dir, filename suffix) per statement page
STATEMENT_PAGES = (
    ("income-statement", "income-statement", ".income-statement.html"),
    ("balance-sheet", "balance-sheet", ".balance-sheet.html"),
    ("cash-flow-statements", "cash-flow-statement", ".cash-flow-statement.html"),
)

#: calendar kind → the URL's `type` parameter
CALENDAR_TYPES = {"earnings": 1, "dividend": 5}


@dataclass(frozen=True)
class FetchJob:
    delay_s: int   #: seconds after schedule start
    url: str
    path: str      #: destination file in the raw zone


def posix_6am(d: datetime.date) -> int:
    """F11: the reference keys calendar URLs by the event date's 06:00
    posix timestamp (earnings-calendar-extract.rkt:25, ``->posix`` on a
    tz-free datetime ≡ UTC)."""
    return int(datetime.datetime.combine(
        d, datetime.time(6), tzinfo=datetime.timezone.utc).timestamp())


def estimate_schedule(symbols: Iterable[str], base: str,
                      run_date: datetime.date) -> list[FetchJob]:
    return [FetchJob(
        i * ESTIMATE_DELAY_S,
        f"{BASE_URL}/stock/quote/{s}/detailed-earning-estimates",
        f"{base}/estimates/{run_date.isoformat()}/{s}.detailed-estimates.html")
        for i, s in enumerate(symbols)]


def statement_schedule(symbols: Iterable[str], base: str,
                       run_date: datetime.date) -> list[FetchJob]:
    jobs = []
    for i, s in enumerate(symbols):
        for off, (page, dataset, suffix) in zip(STATEMENT_STAGGER_S,
                                                STATEMENT_PAGES):
            jobs.append(FetchJob(
                i * STATEMENT_DELAY_S + off,
                f"{BASE_URL}/stock/quote/{s}/{page}",
                f"{base}/{dataset}/{run_date.isoformat()}/{s}{suffix}"))
    return jobs


def calendar_schedule(kind: str, base: str, run_date: datetime.date,
                      start_date: datetime.date | None = None,
                      end_date: datetime.date | None = None) -> list[FetchJob]:
    """One JSON per event day in [start, end); defaults today → +6 weeks."""
    cal_type = CALENDAR_TYPES[kind]
    start = start_date or run_date
    end = end_date or start + datetime.timedelta(weeks=CALENDAR_WEEKS_AHEAD)
    jobs = []
    for i in range((end - start).days):
        d = start + datetime.timedelta(days=i)
        jobs.append(FetchJob(
            i * CALENDAR_DELAY_S,
            f"{BASE_URL}/includes/classes/z2_class_calendarfunctions_data.php"
            f"?calltype=eventscal&type={cal_type}&date={posix_6am(d)}",
            f"{base}/{kind}-calendar/{run_date.isoformat()}/{d.isoformat()}.json"))
    return jobs


def _default_fetch(url: str) -> bytes:
    import urllib.request
    req = urllib.request.Request(url, headers={"User-Agent": "Mozilla/5.0"})
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.read()


def run_schedule(jobs: list[FetchJob],
                 fetch: Callable[[str], bytes] | None = None,
                 sleep: Callable[[float], None] = time.sleep,
                 dry_run: bool = False,
                 log: Callable[[str], None] = print) -> list[str]:
    """Execute the schedule in delay order; returns paths written.

    Sleeps the inter-job gap (not the absolute delay), fetches, writes.
    A failed fetch logs "Encountered error for <path>" and continues —
    the reference's per-document handler semantics."""
    fetch = fetch or _default_fetch
    written: list[str] = []
    elapsed = 0
    for job in sorted(jobs, key=lambda j: j.delay_s):
        if dry_run:
            log(f"[+{job.delay_s:>5d}s] GET {job.url} -> {job.path}")
            continue
        if job.delay_s > elapsed:
            sleep(job.delay_s - elapsed)
            elapsed = job.delay_s
        try:
            body = fetch(job.url)
        except Exception as exc:  # noqa: BLE001 — per-doc isolation
            log(f"Encountered error for {job.path}")
            log(str(exc))
            continue
        os.makedirs(os.path.dirname(job.path), exist_ok=True)
        with open(job.path, "wb") as out:
            out.write(body)
        written.append(job.path)
    return written


def _read_symbols(path: str, first: str, last: str) -> list[str]:
    """Symbol list (one per line) bounded by the resumable [first, last]
    range — the reference's -f/-l flags (estimate-extract.rkt:36-47).
    The full universe filter itself is the engine's ``symbol_universe``
    query; feed its output here."""
    with open(path) as fh:
        syms = sorted({ln.strip() for ln in fh if ln.strip()})
    return [s for s in syms
            if (not first or s >= first) and (not last or s <= last)]


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="zacks_estimates_financial_statements_spark.ingest",
        description="politeness-scheduled raw-zone fetcher (S1-S3)")
    ap.add_argument("dataset", choices=["estimates", "statements",
                                        "earnings-calendar",
                                        "dividend-calendar"])
    ap.add_argument("--base", required=True, help="raw zone root")
    ap.add_argument("--symbols-file",
                    help="file of symbols, one per line (document datasets)")
    ap.add_argument("--first-symbol", default="", help="resume range start")
    ap.add_argument("--last-symbol", default="", help="resume range end")
    ap.add_argument("--date", help="run/folder date (default: today)")
    ap.add_argument("--start-date", help="calendar window start")
    ap.add_argument("--end-date", help="calendar window end (exclusive)")
    ap.add_argument("--dry-run", action="store_true",
                    help="print the schedule; no sleeping, no fetching")
    args = ap.parse_args(argv)

    run_date = (datetime.date.fromisoformat(args.date) if args.date
                else datetime.date.today())
    if args.dataset in ("estimates", "statements"):
        if not args.symbols_file:
            ap.error(f"{args.dataset} requires --symbols-file")
        syms = _read_symbols(args.symbols_file, args.first_symbol,
                             args.last_symbol)
        build = estimate_schedule if args.dataset == "estimates" \
            else statement_schedule
        jobs = build(syms, args.base, run_date)
    else:
        kind = args.dataset.removesuffix("-calendar")
        jobs = calendar_schedule(
            kind, args.base, run_date,
            datetime.date.fromisoformat(args.start_date)
            if args.start_date else None,
            datetime.date.fromisoformat(args.end_date)
            if args.end_date else None)
    written = run_schedule(jobs, dry_run=args.dry_run)
    print(f"{len(jobs)} scheduled, {len(written)} written", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Estimate HTML parser tests (T2-T4), both layout eras."""

from __future__ import annotations

import datetime

from tests.fixtures import estimate_page
from zacks_estimates_financial_statements_spark.parse.estimates import (
    parse_estimate_doc,
    parse_estimates,
)

D = datetime.date


def test_parse_doc_current_era():
    html = estimate_page()
    row = parse_estimate_doc("AAPL", D(2025, 1, 15), html)
    assert row["parse_error"] is None
    assert row["rank"] == "Hold"          # "3-Hold" -> substring(2)
    assert (row["value"], row["growth"], row["momentum"], row["vgm"]) == \
        ("A", "B", "C", "D")
    # periods map to columns 2-5
    assert row["cq_eps_date"] == "12/2024"
    assert row["ny_eps_date"] == "12/2025"
    assert row["cq_sales_consensus"] == "1.5B"
    assert row["ny_sales_year_ago"] == "6B"
    assert row["cq_eps_recent"] == "1.12"
    assert row["ny_eps_year_ago"] == "4.40"
    assert row["cq_up_7"] == "1"
    assert row["ny_down_60"] == "1"
    assert row["cq_most_accurate"] == "1.11"
    # surprise quarters
    assert row["lq_date"] == "9/2024"
    assert row["q4_estimate"] == "0.85"


def test_parse_doc_previous_era():
    html = estimate_page(era="pre-hero")
    row = parse_estimate_doc("AAPL", D(2024, 1, 15), html)  # < 2024-11-10
    assert row["parse_error"] is None
    assert row["rank"] == "Hold"
    assert row["vgm"] == "D"


def test_parse_doc_failure_marks_error():
    row = parse_estimate_doc("AAPL", D(2025, 1, 15), "<html><body>nope</body></html>")
    assert row["parse_error"] is not None
    assert row["rank"] is None


def test_parse_estimates_mapinpandas(spark):
    html = estimate_page()
    docs = spark.createDataFrame(
        [("AAPL", D(2025, 1, 15), html),
         ("MSFT", D(2025, 1, 15), html),
         ("BAD", D(2025, 1, 15), "<html/>")],
        "act_symbol string, folder_date date, content string")
    out = parse_estimates(docs)
    rows = {r["act_symbol"]: r for r in out.collect()}
    assert rows["AAPL"]["cq_eps_consensus"] == "1.10"
    assert rows["MSFT"]["rank"] == "Hold"
    assert rows["BAD"]["parse_error"] is not None

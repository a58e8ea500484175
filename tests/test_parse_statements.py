"""Statement HTML parser tests (T5-T7): positional maps, recency gate,
quarterly-NULL income columns, legacy cash-flow layout."""

from __future__ import annotations

import datetime

from tests.fixtures import (
    _INCOME_FIELDS,
    balance_sheet_page,
    cash_flow_page,
    income_statement_page,
)
from zacks_estimates_financial_statements_spark.parse.statements import (
    BALANCE_COLS,
    parse_statement_doc,
    parse_statements,
)
from zacks_estimates_financial_statements_spark.schemas import CASH_FLOW_STATEMENT_COLS

D = datetime.date


def _vals(fields, base=100):
    """field -> 5 distinct per-column strings (most-recent..fifth)."""
    return {f: [str(base + i * 1000 + c) for c in range(5)]
            for i, f in enumerate(fields)}


ANNUAL_DATES_Y = ["12/31/23", "12/31/22", "12/31/21", "12/31/20", "12/31/19"]
QTR_DATES_Y = ["3/31/24", "12/31/23", "9/30/23", "6/30/23", "3/31/23"]
ANNUAL_DATES = ["12/31/2023", "12/31/2022", "12/31/2021", "12/31/2020", "12/31/2019"]
QTR_DATES = ["3/31/2024", "12/31/2023", "9/30/2023", "6/30/2023", "3/31/2023"]


def test_income_parse_and_quarterly_nulls():
    av, qv = _vals(_INCOME_FIELDS), _vals(_INCOME_FIELDS, 500)
    html = income_statement_page(ANNUAL_DATES_Y, QTR_DATES_Y, av, qv)
    rows = parse_statement_doc("AAPL", D(2024, 6, 1), html, "income")
    assert len(rows) == 10 and all(r["parse_error"] is None for r in rows)
    by_key = {(r["period"], r["date_raw"]): r for r in rows}
    a = by_key[("annual", "12/31/23")]
    assert a["sales"] == "100" and a["net_income"] == "14100"
    assert a["income_before_depreciation_and_amortization"] == "15100"
    assert a["average_shares"] == "17100"
    assert a["diluted_net_eps"] == "19100"
    a5 = by_key[("annual", "12/31/19")]
    assert a5["sales"] == "104"
    q = by_key[("quarterly", "3/31/24")]
    assert q["sales"] == "500"
    # annual-only columns are None for quarterly (insert CASE)
    assert q["income_before_depreciation_and_amortization"] is None
    assert q["depreciation_and_amortization"] is None
    assert q["average_shares"] == "17500"


def test_income_recency_gate():
    av, qv = _vals(_INCOME_FIELDS), _vals(_INCOME_FIELDS, 500)
    html = income_statement_page(ANNUAL_DATES_Y, QTR_DATES_Y, av, qv)
    # folder date within 15 days of most-recent quarterly date 3/31/24
    rows = parse_statement_doc("AAPL", D(2024, 4, 10), html, "income")
    assert len(rows) == 1 and rows[0]["parse_error"] == "recency_gate"
    # exactly 16 days later passes
    rows = parse_statement_doc("AAPL", D(2024, 4, 16), html, "income")
    assert len(rows) == 10


def test_balance_parse_row_offsets():
    av, qv = _vals(BALANCE_COLS), _vals(BALANCE_COLS, 500)
    html = balance_sheet_page(ANNUAL_DATES, QTR_DATES, av, qv)
    rows = parse_statement_doc("AAPL", D(2024, 6, 1), html, "balance")
    assert len(rows) == 10 and all(r["parse_error"] is None for r in rows)
    by_key = {(r["period"], r["date_raw"]): r for r in rows}
    a = by_key[("annual", "12/31/2023")]
    assert a["cash_and_equivalents"] == "100"       # assets start row 2
    assert a["total_assets"] == "12100"
    assert a["notes_payable"] == "13100"            # liabilities row 1
    assert a["total_liabilities"] == "28100"
    assert a["preferred_stock"] == "29100"          # equity row 1
    assert a["total_liabilities_and_equity"] == "36100"
    assert a["shares_outstanding"] == "37100"       # equity row 10 (9 skipped)
    assert a["book_value_per_share"] == "38100"     # equity row 11


def test_cash_flow_current_and_legacy():
    av, qv = _vals(CASH_FLOW_STATEMENT_COLS), _vals(CASH_FLOW_STATEMENT_COLS, 500)
    html = cash_flow_page(ANNUAL_DATES, QTR_DATES, av, qv)
    rows = parse_statement_doc("AAPL", D(2024, 6, 1), html, "cash_flow")
    assert len(rows) == 10
    by_key = {(r["period"], r["date_raw"]): r for r in rows}
    a = by_key[("annual", "12/31/2023")]
    assert a["net_income"] == "100"                 # part 1 row 2
    assert a["net_cash_from_investing_activities"] == "10100"
    assert a["issuance_of_capital_stock"] == "11100"  # part 2 row 1
    assert a["diluted_net_eps"] == "21100"

    legacy = cash_flow_page(ANNUAL_DATES, QTR_DATES, av, qv, legacy=True)
    lrows = parse_statement_doc("AAPL", D(2024, 6, 1), legacy, "cash_flow_legacy")
    assert len(lrows) == 5 and {r["period"] for r in lrows} == {"annual"}
    l = {r["date_raw"]: r for r in lrows}["12/31/2023"]
    assert l["net_income"] == "100" and l["diluted_net_eps"] == "21100"


def test_parse_statements_mapinpandas(spark):
    av, qv = _vals(_INCOME_FIELDS), _vals(_INCOME_FIELDS, 500)
    html = income_statement_page(ANNUAL_DATES_Y, QTR_DATES_Y, av, qv)
    docs = spark.createDataFrame(
        [("AAPL", D(2024, 6, 1), html), ("BAD", D(2024, 6, 1), "<html/>")],
        "act_symbol string, folder_date date, content string")
    out = parse_statements(docs, "income").collect()
    ok = [r for r in out if r["act_symbol"] == "AAPL"]
    bad = [r for r in out if r["act_symbol"] == "BAD"]
    assert len(ok) == 10 and all(r["parse_error"] is None for r in ok)
    assert len(bad) == 1 and bad[0]["parse_error"].startswith("date_extract")

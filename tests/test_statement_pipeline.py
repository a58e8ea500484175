"""Statement lifecycle: typing/scaling, sni copy-bug guard incl. the
intra-batch sequential chain and quarterly IS-NULL logic (FIXTURES
scenario 2), balance three-table transaction."""

from __future__ import annotations

import datetime
from decimal import Decimal

import pytest

from tests.fixtures import _INCOME_FIELDS, balance_sheet_page, income_statement_page
from zacks_estimates_financial_statements_spark.operators.writer import TableStore
from zacks_estimates_financial_statements_spark.parse.statements import (
    BALANCE_COLS,
    parse_statements,
)
from zacks_estimates_financial_statements_spark.pipelines import statement_pipeline as pipe

D = datetime.date

ANNUAL_DATES_Y = ["12/31/23", "12/31/22", "12/31/21", "12/31/20", "12/31/19"]
QTR_DATES_Y = ["3/31/24", "12/31/23", "9/30/23", "6/30/23", "3/31/23"]
ANNUAL_DATES = ["12/31/2023", "12/31/2022", "12/31/2021", "12/31/2020", "12/31/2019"]
QTR_DATES = ["3/31/2024", "12/31/2023", "9/30/2023", "6/30/2023", "3/31/2023"]


def _vals(fields, base=100):
    return {f: [str(base + i * 1000 + c) for c in range(5)]
            for i, f in enumerate(fields)}


def _income_raw(spark, docs):
    df = spark.createDataFrame(
        docs, "act_symbol string, folder_date date, content string")
    return parse_statements(df, "income")


@pytest.fixture()
def income_store(spark, tmp_path):
    return {"income_statement": TableStore(spark, str(tmp_path), "income_statement")}


def test_income_load_types_and_scaling(spark, income_store):
    av, qv = _vals(_INCOME_FIELDS), _vals(_INCOME_FIELDS, 500)
    html = income_statement_page(ANNUAL_DATES_Y, QTR_DATES_Y, av, qv)
    pipe.load_statement(_income_raw(spark, [("AAPL", D(2024, 6, 1), html)]),
                        "income", income_store)
    rows = income_store["income_statement"].read().collect()
    assert len(rows) == 10
    by_key = {(r["period"], r["date"]): r for r in rows}
    a = by_key[("Year", D(2023, 12, 31))]
    assert a["sales"] == Decimal("100000000")             # x1e6
    assert a["diluted_net_eps"] == Decimal("19100")       # unscaled
    q = by_key[("Quarter", D(2024, 3, 31))]
    assert q["income_before_depreciation_and_amortization"] is None
    assert q["average_shares"] == Decimal("17500000000")


def test_sni_suppresses_copied_year_intra_batch(spark, income_store):
    """Two annual columns with identical values: the newer one must be
    suppressed (Zacks copy bug), evaluated within one batch."""
    av = _vals(_INCOME_FIELDS)
    for f in _INCOME_FIELDS:
        av[f][0] = av[f][1]  # most-recent == second-most-recent
    qv = _vals(_INCOME_FIELDS, 500)
    html = income_statement_page(ANNUAL_DATES_Y, QTR_DATES_Y, av, qv)
    pipe.load_statement(_income_raw(spark, [("AAPL", D(2024, 6, 1), html)]),
                        "income", income_store)
    annual = income_store["income_statement"].read() \
        .filter("period = 'Year'").collect()
    dates = sorted(r["date"] for r in annual)
    # 2023-12-31 suppressed; 2019-2022 inserted
    assert dates == [D(2019, 12, 31), D(2020, 12, 31), D(2021, 12, 31),
                     D(2022, 12, 31)]
    # quarterly untouched
    assert income_store["income_statement"].read() \
        .filter("period = 'Quarter'").count() == 5


def test_sni_against_stored_and_one_diff_col_inserts(spark, income_store):
    av, qv = _vals(_INCOME_FIELDS), _vals(_INCOME_FIELDS, 500)
    html1 = income_statement_page(ANNUAL_DATES_Y, QTR_DATES_Y, av, qv)
    pipe.load_statement(_income_raw(spark, [("AAPL", D(2024, 6, 1), html1)]),
                        "income", income_store)
    # next year's page: 2024 column identical to stored 2023 -> suppressed
    av2 = {f: [av[f][0]] + av[f][:4] for f in _INCOME_FIELDS}
    html2 = income_statement_page(
        ["12/31/24"] + ANNUAL_DATES_Y[:4], ["3/31/25"] + QTR_DATES_Y[:4],
        av2, {f: [qv[f][0]] + qv[f][:4] for f in _INCOME_FIELDS})
    pipe.load_statement(_income_raw(spark, [("AAPL", D(2025, 6, 1), html2)]),
                        "income", income_store)
    assert income_store["income_statement"].read() \
        .filter("period = 'Year' and date = '2024-12-31'").count() == 0
    # same page but one column differs -> inserted
    av3 = dict(av2)
    av3["sales"] = ["999"] + av["sales"][:4]
    html3 = income_statement_page(
        ["12/31/24"] + ANNUAL_DATES_Y[:4], ["3/31/25"] + QTR_DATES_Y[:4],
        av3, {f: [qv[f][0]] + qv[f][:4] for f in _INCOME_FIELDS})
    pipe.load_statement(_income_raw(spark, [("AAPL", D(2025, 6, 2), html3)]),
                        "income", income_store)
    got = income_store["income_statement"].read() \
        .filter("period = 'Year' and date = '2024-12-31'").collect()
    assert len(got) == 1 and got[0]["sales"] == Decimal("999000000")


def test_balance_three_table_transaction(spark, tmp_path):
    stores = {t: TableStore(spark, str(tmp_path), t)
              for t in ("balance_sheet_assets", "balance_sheet_liabilities",
                        "balance_sheet_equity")}
    av, qv = _vals(BALANCE_COLS), _vals(BALANCE_COLS, 500)
    # copy bug ONLY in the assets section: most-recent == second-most-recent
    for f in BALANCE_COLS[:13]:
        av[f][0] = av[f][1]
    html = balance_sheet_page(ANNUAL_DATES, QTR_DATES, av, qv)
    df = spark.createDataFrame([("AAPL", D(2024, 6, 1), html)],
                               "act_symbol string, folder_date date, content string")
    pipe.load_statement(parse_statements(df, "balance"), "balance", stores)
    # assets sni fired for 2023-12-31 -> ALL THREE tables lack that row
    for t in stores:
        dates = sorted(r["date"] for r in stores[t].read()
                       .filter("period = 'Year'").collect())
        assert D(2023, 12, 31) not in dates, t
        assert len(dates) == 4, t
    # scaling: book_value_per_share unscaled
    eq = stores["balance_sheet_equity"].read() \
        .filter("period = 'Year' and date = '2022-12-31'").collect()[0]
    assert eq["book_value_per_share"] == Decimal("38101")
    assert eq["shares_outstanding"] == Decimal("37101000000")


def test_uncastable_cell_drops_row_only(spark, income_store):
    av, qv = _vals(_INCOME_FIELDS), _vals(_INCOME_FIELDS, 500)
    av["sales"][0] = "NA"   # most-recent annual has NA -> that row fails
    html = income_statement_page(ANNUAL_DATES_Y, QTR_DATES_Y, av, qv)
    pipe.load_statement(_income_raw(spark, [("AAPL", D(2024, 6, 1), html)]),
                        "income", income_store)
    rows = income_store["income_statement"].read().collect()
    assert len(rows) == 9
    assert not [r for r in rows
                if r["period"] == "Year" and r["date"] == D(2023, 12, 31)]


def test_legacy_cash_flow_load(spark, tmp_path):
    from tests.fixtures import cash_flow_page
    from zacks_estimates_financial_statements_spark.schemas import CASH_FLOW_STATEMENT_COLS
    from decimal import Decimal
    stores = {"cash_flow_statement": TableStore(spark, str(tmp_path), "cash_flow_statement")}
    av = _vals(CASH_FLOW_STATEMENT_COLS)
    html = cash_flow_page(ANNUAL_DATES, QTR_DATES, av, av, legacy=True)
    df = spark.createDataFrame([("AAPL", D(2024, 6, 1), html)],
                               "act_symbol string, folder_date date, content string")
    pipe.load_statement(parse_statements(df, "cash_flow_legacy"),
                        "cash_flow_legacy", stores)
    rows = stores["cash_flow_statement"].read().collect()
    assert len(rows) == 5 and {r["period"] for r in rows} == {"Year"}
    r23 = [r for r in rows if r["date"] == D(2023, 12, 31)][0]
    assert r23["net_income"] == Decimal("100000000")
    assert r23["diluted_net_eps"] == Decimal("21100")

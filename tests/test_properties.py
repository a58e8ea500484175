"""Property tests (SURVEY §5.2.3 / §7.4.2): date-arithmetic parity with
Postgres-interval semantics (via DuckDB) on random dates incl. month ends,
and loader invariance properties."""

from __future__ import annotations

import datetime

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from zacks_estimates_financial_statements_spark.functions import expressions as E

DATES = st.dates(min_value=datetime.date(1990, 1, 1),
                 max_value=datetime.date(2035, 12, 31))


@pytest.fixture(scope="module")
def ddb():
    return duckdb.connect()


@settings(max_examples=30, deadline=None)
@given(d=DATES)
def test_prior_quarter_matches_interval_semantics(spark, ddb, d):
    """Quarter: date + 1 day - 3 months - 1 day (month-end-safe trick)."""
    got = spark.range(1).select(
        E.prior_period_date(F.lit(d), F.lit("Quarter")).alias("p")
    ).collect()[0]["p"]
    want = ddb.execute(
        "SELECT CAST(CAST(? AS DATE) + INTERVAL 1 DAY - INTERVAL 3 MONTH "
        "- INTERVAL 1 DAY AS DATE)", [d]).fetchone()[0]
    assert got == want, (d, got, want)


@settings(max_examples=30, deadline=None)
@given(d=DATES)
def test_prior_year_matches_interval_semantics(spark, ddb, d):
    got = spark.range(1).select(
        E.prior_period_date(F.lit(d), F.lit("Year")).alias("p")
    ).collect()[0]["p"]
    want = ddb.execute(
        "SELECT CAST(CAST(? AS DATE) - INTERVAL 1 YEAR AS DATE)",
        [d]).fetchone()[0]
    assert got == want, (d, got, want)


@settings(max_examples=30, deadline=None)
@given(d=DATES)
def test_next_quarter_end_matches_interval_semantics(spark, ddb, d):
    got = spark.range(1).select(
        E.next_quarter_end(F.lit(d)).alias("p")).collect()[0]["p"]
    want = ddb.execute(
        "SELECT CAST(CAST(? AS DATE) + INTERVAL 1 DAY + INTERVAL 3 MONTH "
        "- INTERVAL 1 DAY AS DATE)", [d]).fetchone()[0]
    assert got == want, (d, got, want)


@settings(max_examples=20, deadline=None)
@given(m=st.integers(1, 12), y=st.integers(1990, 2035))
def test_month_end_parity(spark, ddb, m, y):
    """F8: "M/YYYY" cell → month-end (both single- and double-digit)."""
    cell = f"{m}/{y}"
    got = spark.range(1).select(
        E.month_end_from_mm_yyyy(F.lit(cell)).alias("p")).collect()[0]["p"]
    want = ddb.execute(
        "SELECT last_day(make_date(?, ?, 1))", [y, m]).fetchone()[0]
    assert got == want, (cell, got, want)

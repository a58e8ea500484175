"""Financial-statement lifecycle — SURVEY §3.2: typed candidate rows, the
``should_not_insert`` (sni) copy-bug guard, and per-table upserts.

sni semantics (W2/A2/J1; income-statement-transform-load.rkt:116-228):
for each candidate (symbol, date, period) row, look up the row at the
*prior period key* (annual: date − 1 year; quarterly: the
``+1d −3mo −1d`` quarter-end trick) and compute ``bool_and`` of value
equality over the table's compare columns. sni TRUE → the insert is
aborted (Zacks copied last period's numbers); sni NULL (no prior row, or
any NULL comparison) → insert proceeds — three-valued logic is
load-bearing (SURVEY §7.4.3).

The reference iterates (period × fifth…most-recent) SEQUENTIALLY and each
insert's CTE reads rows landed earlier in the same run
(income-statement-transform-load.rkt:275-276: oldest column first) — so a
fresh bulk load must evaluate the chain *within* the batch, not only
against stored rows. That per-(symbol, period) sequential fold is a
custom stateful operator: ``applyInPandas`` over tiny groups (≤5
candidate rows + the symbol's stored rows), shuffled once on the natural
key (act_symbol, period).

Balance-sheet pages land three tables in ONE transaction per (period,
date) (balance-sheet-transform-load.rkt:139-460: assets → liabilities →
equity); any of the three snis firing rolls back all three rows — handled
by evaluating the chain over the concatenated compare-column set with
per-table sni OR'd together.

Cast semantics: the reference has NO 'NA' handling in statement inserts —
an uncastable cell throws and rolls back that (period, date) row. Row
validity below reproduces that: every raw cell must either be absent
(the forced-NULL quarterly income columns) or cast cleanly.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zacks_estimates_financial_statements_spark.functions import expressions as E
from zacks_estimates_financial_statements_spark.operators.writer import TableStore
from zacks_estimates_financial_statements_spark.schemas import (
    BALANCE_SHEET_ASSETS_COLS,
    BALANCE_SHEET_EQUITY_COLS,
    BALANCE_SHEET_LIABILITIES_COLS,
    CASH_FLOW_STATEMENT_COLS,
    INCOME_STATEMENT_COLS,
)

_DATE_FMT = {"income": "M/dd/yy", "balance": "M/dd/yyyy",
             "cash_flow": "M/dd/yyyy", "cash_flow_legacy": "M/dd/yyyy"}

_KIND_COLS = {
    "income": INCOME_STATEMENT_COLS,
    "balance": (BALANCE_SHEET_ASSETS_COLS + BALANCE_SHEET_LIABILITIES_COLS
                + BALANCE_SHEET_EQUITY_COLS),
    "cash_flow": CASH_FLOW_STATEMENT_COLS,
    "cash_flow_legacy": CASH_FLOW_STATEMENT_COLS,
}

#: unscaled (per-share) columns per kind — everything else is ×1e6 (F7)
_UNSCALED = {
    "income": {"diluted_eps_before_non_recurring_items", "diluted_net_eps"},
    "balance": {"book_value_per_share"},
    "cash_flow": {"diluted_net_eps"},
    "cash_flow_legacy": {"diluted_net_eps"},
}

#: income columns compared as IS NULL for quarterly candidates
#: (income-statement-transform-load.rkt:141-148)
_INCOME_NULL_QUARTERLY = ("income_before_depreciation_and_amortization",
                          "depreciation_and_amortization")


def typed_candidates(raw: DataFrame, kind: str) -> DataFrame:
    """Parsed raw rows → typed, scaled candidate rows with reference cast
    validity applied (invalid rows dropped = per-row rollback)."""
    cols = _KIND_COLS[kind]
    unscaled = _UNSCALED[kind]
    date_col = E.parse_statement_date(F.col("date_raw"), _DATE_FMT[kind])
    period_col = E.decode_statement_period(
        F.when(F.col("period") == "annual", "annual").otherwise("quarterly"))

    validity = F.col("parse_error").isNull() & date_col.isNotNull()
    for c in cols:
        cast_ok = E.clean_statement_cell(F.col(c)).isNotNull()
        validity = validity & (F.col(c).isNull() | cast_ok)

    typed = [
        (E.clean_statement_cell(F.col(c)) if c in unscaled
         else E.scale_millions(E.clean_statement_cell(F.col(c)))).alias(c)
        for c in cols
    ]
    return (raw.filter(validity)
            .select(F.col("act_symbol"), date_col.alias("date"),
                    period_col.alias("period"), *typed))


def _sni_compare_sets(kind: str) -> list[list[str]]:
    """Column groups with independent sni guards whose failures share one
    transaction. income/cash_flow: one group; balance: three (assets,
    liabilities, equity) OR'd together."""
    if kind == "balance":
        return [list(BALANCE_SHEET_ASSETS_COLS),
                list(BALANCE_SHEET_LIABILITIES_COLS),
                list(BALANCE_SHEET_EQUITY_COLS)]
    return [list(_KIND_COLS[kind])]


def _prior_date(d: datetime.date, period: str) -> datetime.date:
    if period == "Year":
        # add_months(date, -12) with month-end clamping
        m, y = d.month, d.year - 1
        day = min(d.day, _days_in_month(y, m))
        return datetime.date(y, m, day)
    # date + 1 day - 3 months - 1 day
    nxt = d + datetime.timedelta(days=1)
    m = nxt.month - 3
    y = nxt.year
    while m < 1:
        m += 12
        y -= 1
    day = min(nxt.day, _days_in_month(y, m))
    return datetime.date(y, m, day) - datetime.timedelta(days=1)


def _days_in_month(y: int, m: int) -> int:
    if m == 12:
        return 31
    return (datetime.date(y, m + 1, 1) - datetime.timedelta(days=1)).day


def _three_valued_all(pairs) -> bool | None:
    """bool_and of SQL equality comparisons: False dominates, else NULL,
    else True."""
    saw_null = False
    for ok in pairs:
        if ok is False:
            return False
        if ok is None:
            saw_null = True
    return None if saw_null else True


def apply_sni_chain(candidates: DataFrame, stored: DataFrame,
                    kind: str) -> DataFrame:
    """Sequential sni evaluation per (act_symbol, period) group, oldest
    date first, against stored ∪ previously-accepted rows. Returns the
    accepted candidate rows."""
    import pandas as pd

    from zacks_estimates_financial_statements_spark.util import ensure_package_on_executors

    ensure_package_on_executors(candidates.sparkSession)

    cols = _KIND_COLS[kind]
    compare_sets = _sni_compare_sets(kind)
    out_schema = candidates.schema

    # only stored rows of symbols present in the batch matter; semi-join
    # keeps the shuffled state small at scale
    stored_slim = stored.join(
        F.broadcast(candidates.select("act_symbol").distinct()),
        "act_symbol", "left_semi")

    tagged = (candidates.withColumn("__src", F.lit("cand"))
              .unionByName(stored_slim.withColumn("__src", F.lit("stored"))))

    def process(pdf: "pd.DataFrame") -> "pd.DataFrame":
        cand = pdf[pdf["__src"] == "cand"].sort_values("date")
        landed: dict[tuple, dict] = {}
        for _, r in pdf[pdf["__src"] == "stored"].iterrows():
            landed[(r["date"], r["period"])] = r
        accepted = []
        for _, r in cand.iterrows():
            key = (r["date"], r["period"])
            if key in landed:
                continue  # ON CONFLICT DO NOTHING
            prior = landed.get((_prior_date(r["date"], r["period"]), r["period"]))
            sni_any = False
            if prior is not None:
                for group in compare_sets:
                    pairs = []
                    for c in group:
                        if (kind == "income" and r["period"] == "Quarter"
                                and c in _INCOME_NULL_QUARTERLY):
                            pairs.append(prior[c] is None)
                            continue
                        a, b = prior[c], r[c]
                        pairs.append(None if (a is None or b is None) else a == b)
                    if _three_valued_all(pairs) is True:
                        sni_any = True
                        break
            if not sni_any:
                accepted.append(r)
                landed[key] = r
        if not accepted:
            return pd.DataFrame(columns=list(pdf.columns)).drop(columns="__src")
        return pd.DataFrame(accepted).drop(columns="__src")

    grouped = tagged.groupBy("act_symbol", "period").applyInPandas(
        lambda pdf: process(pdf), schema=out_schema)
    return grouped.select(*[f.name for f in out_schema.fields])


def load_statement(raw: DataFrame, kind: str,
                   stores: dict[str, TableStore]) -> None:
    """One loader run: type the batch, run the sni chain against stored
    state, split into destination tables, upsert each."""
    candidates = typed_candidates(raw, kind)

    if kind == "balance":
        # stored compare state: join the three balance tables back into the
        # page-shaped wide row on the shared PK. INNER joins, not outer
        # (r10 crash-recovery find): a PK counts as "landed" (sni chain's
        # ON CONFLICT DO NOTHING) only when ALL THREE tables carry it —
        # a mid-fan-out crash leaves a PARTIAL row (e.g. assets written,
        # liabilities/equity not), and an outer-joined wide row made the
        # replay skip the candidate, stranding the row incomplete
        # forever. With inner joins the partial PK is not "landed", the
        # replay re-accepts the candidate, the already-written table's
        # PK upsert is a no-op, and the missing tables complete — the
        # module recovery contract tests/test_streaming.py pins. In
        # crash-free operation the three tables always carry equal PK
        # sets, so inner == outer there.
        a = stores["balance_sheet_assets"].read()
        li = stores["balance_sheet_liabilities"].read()
        eq = stores["balance_sheet_equity"].read()
        pk = ["act_symbol", "date", "period"]
        stored = a.join(li, pk).join(eq, pk)
        accepted = apply_sni_chain(candidates, stored, kind)
        accepted = accepted.persist()
        try:
            accepted.count()
            base = ["act_symbol", "date", "period"]
            stores["balance_sheet_assets"].upsert_ignore(
                accepted.select(*base, *BALANCE_SHEET_ASSETS_COLS))
            stores["balance_sheet_liabilities"].upsert_ignore(
                accepted.select(*base, *BALANCE_SHEET_LIABILITIES_COLS))
            stores["balance_sheet_equity"].upsert_ignore(
                accepted.select(*base, *BALANCE_SHEET_EQUITY_COLS))
        finally:
            accepted.unpersist()
        return

    table = "income_statement" if kind == "income" else "cash_flow_statement"
    stored = stores[table].read()
    accepted = apply_sni_chain(candidates, stored, kind)
    stores[table].upsert_ignore(accepted)

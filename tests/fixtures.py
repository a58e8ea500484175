"""Synthetic HTML fixtures shaped like the reference's Zacks pages
(FIXTURES.md §B1/§B2). Values are injected so tests control every cell."""

from __future__ import annotations


def _table(rows_thead: list[list[str]], rows_tbody: list[list[str]]) -> str:
    def tr(cells, tag):
        return "<tr>" + "".join(f"<{tag}>{c}</{tag}>" for c in cells) + "</tr>"
    head = "".join(tr(r, "th") for r in rows_thead)
    body = "".join(tr(r, "td") for r in rows_tbody)
    return f"<table><thead>{head}</thead><tbody>{body}</tbody></table>"


def estimate_page(rank_text: str = "3-Hold",
                  scores: tuple = ("A", "B", "C", "D"),
                  dates: tuple = ("12/2024", "3/2025", "12/2024", "12/2025"),
                  sales: dict | None = None,
                  eps: dict | None = None,
                  rev: dict | None = None,
                  upside: dict | None = None,
                  surprise_dates: tuple = ("9/2024", "6/2024", "3/2024", "12/2023"),
                  surprise: dict | None = None,
                  era: str = "current") -> str:
    """Current-era (>= 2024-11-10) or previous-era detailed-estimates page.

    ``sales``/``eps``/``rev``/``upside``/``surprise``: dict entry -> list of
    4 per-period (or per-quarter) cell strings.
    """
    sales = sales or {
        "consensus": ["1.5B", "1.6B", "6B", "6.5B"],
        "count": ["5", "5", "6", "6"],
        "high": ["1.6B", "1.7B", "6.2B", "6.8B"],
        "low": ["1.4B", "1.5B", "5.8B", "6.2B"],
        "year_ago": ["1.3B", "1.4B", "5.5B", "6B"],
    }
    eps = eps or {
        "consensus": ["1.10", "1.20", "4.50", "5.00"],
        "count": ["7", "7", "8", "8"],
        "recent": ["1.12", "1.22", "4.55", "5.05"],
        "high": ["1.20", "1.30", "4.70", "5.20"],
        "low": ["1.00", "1.10", "4.30", "4.80"],
        "year_ago": ["0.95", "1.05", "4.00", "4.40"],
    }
    rev = rev or {
        "up_7": ["1", "2", "3", "4"], "up_30": ["2", "3", "4", "5"],
        "up_60": ["3", "4", "5", "6"], "down_7": ["0", "1", "0", "1"],
        "down_30": ["1", "0", "1", "0"], "down_60": ["0", "0", "1", "1"],
    }
    upside = upside or {"most_accurate": ["1.11", "1.21", "4.52", "5.02"]}
    surprise = surprise or {
        "reported": ["1.05", "0.98", "0.92", "0.88"],
        "estimate": ["1.00", "0.95", "0.90", "0.85"],
    }

    sales_tbl = _table([["Item"] + list(dates)],
                       [[e] + sales[k] for k, e in
                        [("consensus", "Zacks Consensus Estimate"),
                         ("count", "# of Estimates"),
                         ("high", "High Estimate"),
                         ("low", "Low Estimate"),
                         ("year_ago", "Year ago Sales")]])
    eps_tbl = _table([["Item"] + list(dates)],
                     [[e] + eps[k] for k, e in
                      [("consensus", "Zacks Consensus Estimate"),
                       ("count", "# of Estimates"),
                       ("recent", "Most Recent Consensus"),
                       ("high", "High Estimate"),
                       ("low", "Low Estimate"),
                       ("year_ago", "Year ago EPS")]])
    rev_tbl = _table([["Item"] + list(dates)],
                     [[e] + rev[k] for k, e in
                      [("up_7", "Up Last 7 Days"), ("up_30", "Up Last 30 Days"),
                       ("up_60", "Up Last 60 Days"), ("down_7", "Down Last 7 Days"),
                       ("down_30", "Down Last 30 Days"), ("down_60", "Down Last 60 Days")]])
    up_tbl = _table([["Item"] + list(dates)],
                    [["Most Accurate Estimate"] + upside["most_accurate"]])
    sur_tbl = _table([["Item"] + list(surprise_dates)],
                     [["Reported"] + surprise["reported"],
                      ["Estimate"] + surprise["estimate"]])

    spans = "".join(
        f"<span>{s}</span><span> | </span>" for s in scores).rstrip()
    ribbon = (
        '<section id="quote_ribbon_v2">'
        "<div><p>other</p></div>"
        "<div>"
        f"<div><p>Zacks Rank <strong>#</strong>{rank_text}</p></div>"
        f"<div><p>Style Scores: {spans}</p></div>"
        "</div>"
        "</section>")
    if era == "current":
        hero = f'<section class="quote_page_hero_section">{ribbon}</section>'
    else:
        hero = ribbon

    return f"""<html><body id="home">
<div id="main_content"><div id="right_content">
{hero}
<section id="detailed_earnings_estimates"><h2>Estimates</h2>{sales_tbl}{eps_tbl}</section>
<section id="agreement_estimate">{rev_tbl}</section>
<section id="quote_upside">{up_tbl}</section>
<section id="surprised_reported">{sur_tbl}</section>
</div></div></body></html>"""


def _statement_div(div_id: str, tables: list[tuple[list[str], list[list[str]]]],
                   nested_divs: bool = False) -> str:
    """tables: list of (thead_dates, tbody rows). nested_divs wraps each
    table in its own <div> (cash-flow current layout)."""
    parts = []
    for dates, body in tables:
        t = _table([["Item"] + dates], body)
        parts.append(f"<div>{t}</div>" if nested_divs else t)
    return f'<div id="{div_id}">{"".join(parts)}</div>'


def income_statement_page(annual_dates, quarterly_dates,
                          annual_values, quarterly_values) -> str:
    """values: dict field -> list of 5 strings (cols most-recent..fifth).
    Fields: the 20 income-statement columns (income_before/d&a ignored for
    the quarterly div — pass anyway, they populate table 2)."""
    def divs(div_id, dates, v, annual):
        t1 = [[f"row{r}"] + v[f] for f, r in
              [(f, i + 1) for i, f in enumerate(_INCOME_FIELDS[:15])]]
        t2 = [["Income Before D&A"] + v["income_before_depreciation_and_amortization"],
              ["D&A"] + v["depreciation_and_amortization"]]
        t3 = [["Average Shares"] + v["average_shares"],
              ["Diluted EPS Before Non-Recurring Items"] + v["diluted_eps_before_non_recurring_items"],
              ["Diluted Net EPS"] + v["diluted_net_eps"]]
        tables = [(dates, t1), (dates, t2), (dates, t3)] if annual \
            else [(dates, t1), (dates, t3)]
        return _statement_div(div_id, tables)

    return ("<html><body>"
            + divs("annual_income_statement", annual_dates, annual_values, True)
            + divs("quarterly_income_statement", quarterly_dates,
                   quarterly_values, False)
            + "</body></html>")


_INCOME_FIELDS = [
    "sales", "cost_of_goods", "gross_profit",
    "selling_administrative_depreciation_amortization_expenses",
    "income_after_depreciation_and_amortization", "non_operating_income",
    "interest_expense", "pretax_income", "income_taxes", "minority_interest",
    "investment_gains", "other_income", "income_from_continuing_operations",
    "extras_and_discontinued_operations", "net_income",
    "income_before_depreciation_and_amortization",
    "depreciation_and_amortization", "average_shares",
    "diluted_eps_before_non_recurring_items", "diluted_net_eps",
]


def balance_sheet_page(annual_dates, quarterly_dates,
                       annual_values, quarterly_values) -> str:
    """values: dict field -> list of 5 strings; fields = 13 assets + 16
    liabilities + 10 equity (equity rows 1-8 then a spacer row 9 then
    rows 10-11)."""
    from zacks_estimates_financial_statements_spark.schemas import (
        BALANCE_SHEET_ASSETS_COLS,
        BALANCE_SHEET_EQUITY_COLS,
        BALANCE_SHEET_LIABILITIES_COLS,
    )

    def divs(div_id, dates, v):
        assets = [["Header Row"]] + [[f] + v[f] for f in BALANCE_SHEET_ASSETS_COLS]
        liab = [[f] + v[f] for f in BALANCE_SHEET_LIABILITIES_COLS]
        eq = ([[f] + v[f] for f in BALANCE_SHEET_EQUITY_COLS[:8]]
              + [["-- spacer --"]]
              + [[f] + v[f] for f in BALANCE_SHEET_EQUITY_COLS[8:]])
        return _statement_div(div_id, [(dates, assets), (dates, liab), (dates, eq)])

    return ("<html><body>"
            + divs("annual_income_statement", annual_dates, annual_values)
            + divs("quarterly_income_statement", quarterly_dates, quarterly_values)
            + "</body></html>")


def cash_flow_page(annual_dates, quarterly_dates, annual_values,
                   quarterly_values, legacy: bool = False) -> str:
    from zacks_estimates_financial_statements_spark.schemas import CASH_FLOW_STATEMENT_COLS

    def divs(div_id, dates, v, nested):
        part1 = [["Header"]] + [[f] + v[f] for f in CASH_FLOW_STATEMENT_COLS[:11]]
        part2 = [[f] + v[f] for f in CASH_FLOW_STATEMENT_COLS[11:]]
        return _statement_div(div_id, [(dates, part1), (dates, part2)],
                              nested_divs=nested)

    if legacy:
        # two top-level sections, annual only, tables NOT div-nested
        part1 = [["Header"]] + [[f] + annual_values[f]
                                for f in CASH_FLOW_STATEMENT_COLS[:11]]
        part2 = [[f] + annual_values[f] for f in CASH_FLOW_STATEMENT_COLS[11:]]
        s1 = f'<section id="cash_flow_operation">{_table([["Item"] + annual_dates], part1)}</section>'
        s2 = f'<section id="cash_flow_use">{_table([["Item"] + annual_dates], part2)}</section>'
        return f"<html><body>{s1}{s2}</body></html>"

    return ("<html><body>"
            + divs("annual_cash_flow_statement", annual_dates, annual_values, True)
            + divs("quarterly_cash_flow_statement", quarterly_dates,
                   quarterly_values, True)
            + "</body></html>")

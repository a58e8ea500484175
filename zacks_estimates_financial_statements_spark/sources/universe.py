"""Symbol-universe selection — SURVEY §2.1 S4 / §2.2 P1-P5.

The reference's universe query (estimate-extract.rkt:57-83, identical in
financial-statement-extract.rkt:86-114) over the ``nasdaq.symbol``
dimension: boolean flag filters, regex predicates, a CASE predicate for
5th-letter share classes, latest-snapshot scalar subquery, and an optional
resumable symbol range.

At scale the dimension is small (≤ tens of thousands of rows) — the
latest-snapshot max is a broadcast scalar; every predicate pushes to the
Parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 5th-letter classes that are not common stock when the symbol matches
#: ``[A-Z]{4}[L-Z]`` (estimate-extract.rkt:68-70)
_CLASS_NAME_RE = "(Note|Preferred|Right|Unit|Warrant)"
_BAD_SYMBOL_RE = r"[-$+*#!@%^=~]"


def symbol_universe(symbols: DataFrame, first_symbol: str = "",
                    last_symbol: str = "") -> DataFrame:
    """Active common-stock universe, ordered by act_symbol."""
    latest = symbols.select(F.max("last_seen").alias("m"))
    cond = (
        (F.col("is_etf") == False)  # noqa: E712 — tri-valued SQL equality
        & (F.col("is_test_issue") == False)  # noqa: E712
        & (F.col("is_next_shares") == False)  # noqa: E712
        & ~F.col("security_name").rlike("ETN")
        & ~F.col("nasdaq_symbol").rlike(_BAD_SYMBOL_RE)
        & F.when(F.col("nasdaq_symbol").rlike("[A-Z]{4}[L-Z]"),
                 ~F.col("security_name").rlike(_CLASS_NAME_RE))
         .otherwise(F.lit(True))
    )
    if first_symbol:
        cond = cond & (F.col("act_symbol") >= first_symbol)
    if last_symbol:
        cond = cond & (F.col("act_symbol") <= last_symbol)
    return (symbols
            .join(F.broadcast(latest), F.col("last_seen") == F.col("m"))
            .drop("m")
            .filter(cond)
            .select("act_symbol")
            .orderBy("act_symbol"))

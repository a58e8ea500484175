"""Calendar JSON parsing — SURVEY §2.3 T8-T10, pure Spark SQL (no UDFs).

The raw payload is the Zacks calendar API response, possibly carrying a
``window.app_data = `` prefix, embedded HTML tags, and ``"XYZ Quick
Quote"`` strings. Cleanup order follows the reference exactly
(earnings-calendar-transform-load.rkt:64-69):

1. strip HTML tags ``<.*?>``
2. strip ``[A-Z.]+ Quick Quote``
3. strip the ``window.app_data = `` prefix
4. parse JSON, take ``.data`` (array of positional string arrays)

then explode and project positionally (T9/T10):

- earnings  (earnings-calendar-transform-load.rkt:70-105): row[0] =
  act_symbol, row[3] = 'amc' | 'bmo' | '--'; the event date is the source
  *filename*, not the payload.
- dividends (dividend-calendar-transform-load.rkt:104-107): row[0] =
  act_symbol, row[3] = amount "$x.yz", row[5] = ex_date, row[7] =
  payable_date or '--'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from zacks_estimates_financial_statements_spark.functions import expressions as E
from zacks_estimates_financial_statements_spark.schemas import DEC

_PAYLOAD_SCHEMA = StructType(
    [StructField("data", ArrayType(ArrayType(StringType())), True)]
)


def clean_payload(col):
    """T8 cleanup chain (order matters; see module docstring)."""
    c = F.regexp_replace(col, "<.*?>", "")
    c = F.regexp_replace(c, r"[A-Z.]+ Quick Quote", "")
    c = F.regexp_replace(c, r"^window\.app_data = ", "")
    return c


def parse_calendar_rows(files: DataFrame) -> DataFrame:
    """(event_date, content, path) → one row per positional array, with
    ``row_idx`` preserving within-file order (the reference iterates rows
    sequentially and later rows win deletes — see pipelines.calendar)."""
    parsed = files.select(
        "event_date", "path",
        F.from_json(clean_payload(F.col("content")), _PAYLOAD_SCHEMA).alias("j"),
    )
    return parsed.select(
        "event_date", "path",
        F.posexplode_outer(F.col("j.data")).alias("row_idx", "row"),
    ).filter(F.col("row").isNotNull())


def earnings_rows(files: DataFrame) -> DataFrame:
    """T9 — earnings_calendar-shaped rows (+ ordering metadata)."""
    rows = parse_calendar_rows(files)
    return rows.select(
        F.col("row")[0].alias("act_symbol"),
        F.col("event_date").alias("date"),
        E.decode_when(F.col("row")[3]).alias("when"),
        F.col("path"), F.col("row_idx"),
    )


def dividend_rows(files: DataFrame) -> DataFrame:
    """T10 — dividend_calendar-shaped rows (+ ordering metadata).

    NULL contract: the payload cells are scraped strings, so every parse
    degrades PER ROW instead of aborting the job under ANSI —
    ``try_to_date``/``try_cast`` yield NULL for malformed dates/amounts,
    and the loader (pipelines.calendar_pipeline.load_dividend_calendar)
    drops rows with NULL act_symbol/ex_date/amount, mirroring the
    reference's per-file transaction where an unparseable row cannot
    load. ``payable_date`` stays nullable ('--' and malformed → NULL).
    """
    rows = parse_calendar_rows(files)
    return rows.select(
        F.col("row")[0].alias("act_symbol"),
        F.try_to_date(F.col("row")[5]).alias("ex_date"),
        E.strip_dollar(F.col("row")[3]).try_cast(DEC).alias("amount"),
        F.when(F.col("row")[7] == "--", F.lit(None).cast("date"))
         .otherwise(F.try_to_date(F.col("row")[7])).alias("payable_date"),
        F.col("path"), F.col("row_idx"),
    )

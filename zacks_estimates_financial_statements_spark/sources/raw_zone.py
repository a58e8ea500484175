"""Raw-zone readers — SURVEY §2.1 S5 (dated-directory scan).

The raw zone mirrors the reference layout::

    <base>/<dataset>/<yyyy-MM-dd>/<SYM>.detailed-estimates.html
    <base>/<dataset>/<yyyy-MM-dd>/<SYM>.income-statement.html
    <base>/<dataset>/<yyyy-MM-dd>/<yyyy-MM-dd>.json       # calendars

(estimate-extract.rkt:15, financial-statement-extract.rkt:19-47,
earnings-calendar-extract.rkt:15-17.)

Files are read distributed via ``spark.read.format("binaryFile")`` — at
100 TB of raw HTML the scan parallelizes across executors and the
filename-derived columns (symbol, event date, folder date) come from
``input_file_name()``-style path columns, not a driver-side listing.
Small-file pressure is the real scale risk here; ``wholeTextFiles``-style
consolidation or upstream tar-batching is the documented mitigation, but
the operator surface below is unchanged either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: filename suffix per dataset (reference extract writers)
SUFFIXES = {
    "estimates": ".detailed-estimates.html",
    "income-statement": ".income-statement.html",
    "balance-sheet": ".balance-sheet.html",
    "cash-flow-statement": ".cash-flow-statement.html",
}


def read_dated_folder(spark: SparkSession, folder: str,
                      suffix: str) -> DataFrame:
    """Scan one dated folder; returns (path, content, file_stem) where
    ``file_stem`` is the filename with ``suffix`` removed (the symbol for
    document datasets, the event date for calendars)."""
    df = (spark.read.format("binaryFile")
          .option("pathGlobFilter", f"*{suffix}")
          .load(folder))
    stem = F.regexp_extract(F.col("path"), rf"([^/]+){suffix.replace('.', chr(92) + '.')}$", 1)
    return df.select(
        F.col("path"),
        F.col("content").cast("string").alias("content"),
        stem.alias("file_stem"),
    )


def read_documents(spark: SparkSession, base: str, dataset: str,
                   folder_date: str) -> DataFrame:
    """HTML documents for one (dataset, folder_date): (symbol, content)."""
    folder = f"{base}/{dataset}/{folder_date}"
    return (read_dated_folder(spark, folder, SUFFIXES[dataset])
            .withColumnRenamed("file_stem", "act_symbol")
            .withColumn("folder_date", F.lit(folder_date).cast("date")))


def read_calendar_files(spark: SparkSession, base: str, dataset: str,
                        folder_date: str) -> DataFrame:
    """Calendar JSON day-files: (event_date, content, row order preserved
    via path). The event date is the file stem, NOT part of the payload
    (earnings-calendar-transform-load.rkt:55-56)."""
    folder = f"{base}/{dataset}/{folder_date}"
    return (read_dated_folder(spark, folder, ".json")
            .withColumn("event_date", F.to_date(F.col("file_stem"), "yyyy-MM-dd"))
            .withColumn("folder_date", F.lit(folder_date).cast("date"))
            .drop("file_stem"))

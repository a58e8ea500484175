"""Regression test for the events-table physical-type drift.

The driver regenerates ``events.parquet`` between rounds and has already
flipped the ``ts`` column's physical parquet type once (INT64
TIMESTAMP(NANOS) → TIMESTAMP(MICROS), which silently broke every
events-backed query in round 3).  ``__spark_entry__._events`` must
dispatch on the schema Spark reads, not on an assumed physical type:
this test writes both variants of a tiny events file and asserts the
reader produces identical epoch-microsecond values for each.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

_BASE_US = [
    1_700_000_000_000_000,
    1_700_000_000_123_456,
    1_700_086_400_654_321,
]


def _write_events(tmp_path, name: str, unit: str) -> str:
    """Write a minimal events.parquet with ts in the given pyarrow unit."""
    d = tmp_path / name
    d.mkdir()
    if unit == "ns":
        ts = pa.array([v * 1000 + 789 for v in _BASE_US],
                      type=pa.timestamp("ns"))
    else:
        # naive (NTZ) UTC wall-clock datetimes, built via timedelta so the
        # microsecond component survives exactly (float seconds would not)
        epoch = datetime.datetime(1970, 1, 1)
        ts = pa.array(
            [epoch + datetime.timedelta(microseconds=v) for v in _BASE_US],
            type=pa.timestamp("us"))
    # the full TABLE_COLUMNS["events"] contract: since the r13 reader
    # projection, _t() selects these by name, so the fixture must
    # carry them all (the former minimal fixture stopped resolving)
    table = pa.table({
        "event_id": pa.array([1, 2, 3], type=pa.int64()),
        "user_id": pa.array([10, 10, 20], type=pa.int64()),
        "ts": ts,
        "event_type": pa.array(["view", "click", "view"],
                               type=pa.string()),
        "value": pa.array([1.0, 2.5, 3.25], type=pa.float64()),
        "props": pa.array(['{"a":1}', '{"a":2}', '{"a":3}'],
                          type=pa.string()),
    })
    # version 2.6 keeps TIMESTAMP(NANOS) as nanos instead of coercing
    pq.write_table(table, str(d / "events.parquet"), version="2.6")
    return str(d)


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_events_reader_handles_both_physical_types(spark, tmp_path, unit):
    # the NTZ micros file is interpreted in the session timezone when cast
    # to TIMESTAMP — production callers pin UTC via _t(), mirror that here
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sf_dir = _write_events(tmp_path, f"events_{unit}", unit)
    df = entry._events(spark, sf_dir)
    assert dict(df.dtypes)["ts"] == "timestamp"
    rows = (df.select("event_id",
                      F.unix_micros("ts").alias("us"))
            .orderBy("event_id").collect())
    # nanos sub-microsecond precision truncates (DIV 1000), so both
    # variants must land on the exact same epoch-µs values
    assert [r.us for r in rows] == _BASE_US


def test_events_reader_ns_and_us_agree(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ns_dir = _write_events(tmp_path, "agree_ns", "ns")
    us_dir = _write_events(tmp_path, "agree_us", "us")
    a = {r.event_id: r.us for r in
         entry._events(spark, ns_dir)
         .select("event_id", F.unix_micros("ts").alias("us")).collect()}
    b = {r.event_id: r.us for r in
         entry._events(spark, us_dir)
         .select("event_id", F.unix_micros("ts").alias("us")).collect()}
    assert a == b

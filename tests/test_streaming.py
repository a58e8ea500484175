"""Structured Streaming extension: incremental calendar file pickup,
watermarked windowed aggregation, stateful sessionization."""

from __future__ import annotations

import datetime
import json

from zacks_estimates_financial_statements_spark.streaming import raw_zone_stream as S

D = datetime.datetime


def _write_day_file(base, folder, event_date, rows):
    d = base / folder
    d.mkdir(parents=True, exist_ok=True)
    (d / f"{event_date}.json").write_text(
        "window.app_data = " + json.dumps({"data": rows}))


def test_stream_calendar_incremental_pickup(spark, tmp_path):
    raw = tmp_path / "earnings-calendar"
    _write_day_file(raw, "2024-05-10", "2024-05-15", [["AAPL", "", "", "amc"]])
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        rows = S.stream_calendar_rows(spark, str(raw) + "/*/")
        q = (rows.selectExpr("event_date", "row[0] as act_symbol")
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {(r["event_date"], r["act_symbol"])
                for r in spark.read.parquet(out).collect()}

    got = run_once()
    assert got == {(datetime.date(2024, 5, 15), "AAPL")}
    # second day-file arrives; only the new file is processed on rerun
    _write_day_file(raw, "2024-05-11", "2024-05-16", [["MSFT", "", "", "bmo"]])
    got = run_once()
    assert got == {(datetime.date(2024, 5, 15), "AAPL"),
                   (datetime.date(2024, 5, 16), "MSFT")}


def test_windowed_event_counts_batch_parity(spark):
    events = spark.createDataFrame(
        [(1, D(2024, 5, 1, 10, 5), "click", 1.0),
         (2, D(2024, 5, 1, 10, 55), "click", 2.0),
         (3, D(2024, 5, 1, 11, 5), "view", 3.0)],
        "event_id long, ts timestamp, event_type string, value double")
    out = {(str(r["window_start"]), r["event_type"]): (r["n"], str(r["sum_value"]))
           for r in S.windowed_event_counts(events).collect()}
    assert out[("2024-05-01 10:00:00", "click")] == (2, "3.000000")
    assert out[("2024-05-01 11:00:00", "view")] == (1, "3.000000")


def test_sessionize_events_stream(spark, tmp_path):
    src = tmp_path / "events_src"
    src.mkdir()
    events = spark.createDataFrame(
        [(1, D(2024, 5, 1, 10, 0)), (1, D(2024, 5, 1, 10, 10)),
         (1, D(2024, 5, 1, 12, 0)),   # > 30 min gap -> new session
         (2, D(2024, 5, 1, 9, 0))],
        "user_id long, ts timestamp")
    events.write.parquet(str(src / "batch1"))

    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .parquet(str(src) + "/*"))
    sessions = S.sessionize_events(stream, gap_seconds=1800)
    q = (sessions.writeStream.format("memory").queryName("sessions")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((r["user_id"], str(r["session_start"]), r["n_events"])
                 for r in spark.sql("select * from sessions").collect())
    # the 10:00-10:10 session closed when the 12:00 event arrived; the
    # still-open sessions (12:00 and user 2) remain in state
    assert got == [(1, "2024-05-01 10:00:00", 2)]


def test_dedup_events_stream_and_batch(spark, tmp_path):
    events = spark.createDataFrame(
        [(1, D(2024, 5, 1, 10, 0), "click", 1.0),
         (1, D(2024, 5, 1, 10, 0), "click", 1.0),   # exact replay
         (2, D(2024, 5, 1, 10, 1), "view", 2.0),
         (2, D(2024, 5, 1, 10, 2), "view", 2.0),    # same key, later ts
         (3, D(2024, 5, 1, 10, 3), "click", 3.0)],
        "event_id long, ts timestamp, event_type string, value double")
    # batch path (unified semantics)
    assert S.dedup_events(events).count() == 3
    # streaming path: file source -> dedup -> memory sink
    src = str(tmp_path / "events")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (S.dedup_events(stream).writeStream.format("memory")
         .queryName("dedup_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select event_id from dedup_out").collect()
    assert sorted(r["event_id"] for r in got) == [1, 2, 3]

"""Writer-library semantics: W1 idempotent upsert, W4 windowed replace,
W6 delete-via-join, validation split (FIXTURES.md scenarios 1-3)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from zacks_estimates_financial_statements_spark.operators.writer import TableStore, split_valid

D = datetime.date


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path), "earnings_calendar")


def _rows(store):
    return sorted((r["act_symbol"], r["date"], r["when"])
                  for r in store.read().collect())


def test_upsert_ignore_idempotent(spark, store):
    batch = spark.createDataFrame(
        [("AAPL", D(2024, 5, 1), "After market close"),
         ("MSFT", D(2024, 5, 2), None)],
        "act_symbol string, date date, `when` string")
    store.upsert_ignore(batch)
    first = _rows(store)
    # re-run: no-op (FIXTURES scenario 1)
    store.upsert_ignore(batch)
    assert _rows(store) == first
    # conflicting second write for same PK: first wins (ON CONFLICT DO NOTHING)
    batch2 = spark.createDataFrame(
        [("AAPL", D(2024, 5, 1), "Before market open"),
         ("NVDA", D(2024, 5, 3), "Before market open")],
        "act_symbol string, date date, `when` string")
    store.upsert_ignore(batch2)
    rows = _rows(store)
    assert ("AAPL", D(2024, 5, 1), "After market close") in rows
    assert ("NVDA", D(2024, 5, 3), "Before market open") in rows
    assert len(rows) == 3


def test_upsert_batch_dedup_deterministic(spark, store):
    # two rows with same PK in ONE batch: order_by picks the winner
    batch = spark.createDataFrame(
        [("AAPL", D(2024, 5, 1), "Before market open", 2),
         ("AAPL", D(2024, 5, 1), "After market close", 1)],
        "act_symbol string, date date, `when` string, seq int")
    store.upsert_ignore(batch, pk=("act_symbol", "date"),
                        order_by=[F.col("seq")])
    rows = store.read().drop("seq").collect()
    assert len(rows) == 1
    assert rows[0]["when"] == "After market close"


def test_replace_window(spark, store):
    folder_date = D(2024, 5, 10)
    store.upsert_ignore(spark.createDataFrame(
        [("AAPL", D(2024, 5, 5), None),     # past: kept
         ("MSFT", D(2024, 5, 15), None),    # future: replaced
         ("NVDA", D(2024, 6, 1), None)],    # future: replaced
        "act_symbol string, date date, `when` string"))
    new = spark.createDataFrame(
        [("MSFT", D(2024, 5, 16), "Before market open")],
        "act_symbol string, date date, `when` string")
    # W4: delete stored date >= folder_date, then insert the new horizon
    store.replace_window(new, keep_condition=F.col("date") < F.lit(folder_date))
    rows = _rows(store)
    assert rows == [("AAPL", D(2024, 5, 5), None),
                    ("MSFT", D(2024, 5, 16), "Before market open")]


def test_delete_where_equi_and_condition(spark, store):
    store.upsert_ignore(spark.createDataFrame(
        [("AAPL", D(2024, 5, 1), None), ("AAPL", D(2024, 8, 1), None),
         ("MSFT", D(2024, 5, 2), None)],
        "act_symbol string, date date, `when` string"))
    condemned = spark.createDataFrame([("AAPL", D(2024, 5, 1))],
                                      "act_symbol string, date date")
    store.delete_where(condemned, on=["act_symbol", "date"])
    assert _rows(store) == [("AAPL", D(2024, 8, 1), None),
                            ("MSFT", D(2024, 5, 2), None)]


def test_delete_where_size_gated_broadcast(spark, store):
    """The condemned-key broadcast hint is size-gated: with
    broadcasting disabled (the stand-in for a key set too large to
    ship) delete_where degrades to an un-hinted join with identical
    results — the forced-broadcast OOM class closed repo-wide in r11."""
    from zacks_estimates_financial_statements_spark.util import maybe_broadcast

    store.upsert_ignore(spark.createDataFrame(
        [("AAPL", D(2024, 5, 1), None), ("MSFT", D(2024, 5, 2), None)],
        "act_symbol string, date date, `when` string"))
    condemned = spark.createDataFrame([("AAPL", D(2024, 5, 1))],
                                      "act_symbol string, date date")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # direct helper check: no hint when broadcasting is disabled
        probe = maybe_broadcast(condemned)
        assert "UnresolvedHint" not in \
            probe._jdf.queryExecution().logical().toString()
        store.delete_where(condemned, on=["act_symbol", "date"])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert _rows(store) == [("MSFT", D(2024, 5, 2), None)]
    # and under the normal regime the hint IS applied
    hinted = maybe_broadcast(condemned)
    assert "UnresolvedHint broadcast" in \
        hinted._jdf.queryExecution().logical().toString()


def test_split_valid_enum_and_not_null(spark):
    df = spark.createDataFrame(
        [("AAPL", D(2024, 5, 1), "After market close"),   # valid
         ("MSFT", D(2024, 5, 2), None),                   # valid (when nullable)
         ("BAD", D(2024, 5, 3), "at noon"),               # enum violation
         (None, D(2024, 5, 4), None)],                    # NOT NULL violation
        "act_symbol string, date date, `when` string")
    valid, quarantined = split_valid(df, "earnings_calendar")
    assert valid.count() == 2
    q = [(r["act_symbol"]) for r in quarantined.collect()]
    assert sorted(q, key=str) == ["BAD", None]


def test_read_empty_table_has_declared_schema(spark, tmp_path):
    store = TableStore(spark, str(tmp_path), "rank_score")
    df = store.read()
    assert df.count() == 0
    assert df.schema.fieldNames() == ["act_symbol", "date", "rank", "value",
                                      "growth", "momentum", "vgm"]


def test_upsert_antijoin_prunes_stored_side_to_batch_partitions(spark, tmp_path):
    # W1 at scale: the stored side of the anti-join must be partition-
    # pruned to the batch's own dates (metadata-bounded scan), never a
    # forced broadcast of the full stored PK history.
    store = TableStore(spark, str(tmp_path), "rank_score")
    schema = ("act_symbol string, date date, rank string, value string, "
              "growth string, momentum string, vgm string")
    store.upsert_ignore(spark.createDataFrame(
        [("AAPL", D(2024, 5, 1), "Hold", "A", "B", "C", "D"),
         ("MSFT", D(2024, 5, 8), "Buy", "A", "A", "A", "A")], schema))
    batch = spark.createDataFrame(
        [("NVDA", D(2024, 5, 8), "Buy", "A", "A", "A", "A"),
         ("MSFT", D(2024, 5, 8), "Sell", "F", "F", "F", "F")], schema)
    fresh = store._fresh_rows(batch, ("act_symbol", "date"))
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    # stored scan pruned to the batch's date only
    assert "PartitionFilters: [" in plan and "2024-05-08" in plan
    assert "2024-05-01" not in plan
    # no hint forces the stored history through the driver
    assert "ResolvedHint" not in plan
    # semantics unchanged: existing PK skipped, new PK survives
    assert [(r.act_symbol, r.rank) for r in fresh.collect()] == \
        [("NVDA", "Buy")]
    # end-to-end: append only the fresh key
    store.upsert_ignore(batch)
    assert store.read().count() == 3
    assert store.read().filter("act_symbol='MSFT'").first().rank == "Buy"


def test_partitioned_layout_and_pruning(spark, tmp_path):
    import os
    store = TableStore(spark, str(tmp_path), "rank_score")
    batch = spark.createDataFrame(
        [("AAPL", D(2024, 5, 1), "Hold", "A", "B", "C", "D"),
         ("MSFT", D(2024, 5, 8), "Buy", "A", "A", "A", "A")],
        "act_symbol string, date date, rank string, value string, "
        "growth string, momentum string, vgm string")
    store.upsert_ignore(batch)
    live = store._live_dir()
    assert sorted(e for e in os.listdir(live) if e.startswith("date=")) == \
        ["date=2024-05-01", "date=2024-05-08"]
    # read restores declared column order
    assert store.read().columns[:2] == ["act_symbol", "date"]
    # a date filter prunes partitions
    plan = store.read().filter("date = '2024-05-08'") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "2024-05-08" in plan
    # incremental append touches only the new partition
    store.upsert_ignore(spark.createDataFrame(
        [("NVDA", D(2024, 5, 9), "Hold", "A", "B", "C", "D")], batch.schema))
    assert store.read().count() == 3
    assert "date=2024-05-09" in os.listdir(live)


def test_concurrent_writer_detected_and_lock_released(spark, store):
    from zacks_estimates_financial_statements_spark.operators.writer import (
        ConcurrentWriteError,
    )
    df = spark.createDataFrame(
        [("MSFT", D(2025, 1, 15), "Before market open")],
        "act_symbol string, date date, when string")
    store.overwrite(df)

    # a second store over the same table dir, mid-write (lock held)
    other = TableStore(spark, store.root, store.name)
    with store.write_lock():
        with pytest.raises(ConcurrentWriteError, match="locked by another"):
            other.overwrite(df)
        with pytest.raises(ConcurrentWriteError):
            other.upsert_ignore(df)
        with pytest.raises(ConcurrentWriteError):
            other.delete_where(df.select("act_symbol", "date"),
                               on=["act_symbol", "date"])
    # lock released on exit -> writes proceed again, data intact
    other.upsert_ignore(spark.createDataFrame(
        [("AAPL", D(2025, 1, 15), "After market close")], df.schema))
    assert len(_rows(store)) == 2
    # failed attempts never flipped the pointer or corrupted the table
    assert store.read().count() == 2


def test_empty_partitioned_write_reads_back_empty(spark, tmp_path):
    # a load where every row was filtered writes a version dir with no
    # parquet files; read() must fall back to the declared schema
    store = TableStore(spark, str(tmp_path), "eps_estimate")  # partitioned
    empty = spark.createDataFrame(
        [], TableStore(spark, str(tmp_path), "eps_estimate").read().schema)
    store.overwrite(empty)
    assert store.exists()
    assert store.read().count() == 0
    # and the table recovers on the next real write
    import datetime as dt
    from decimal import Decimal
    store.upsert_ignore(spark.createDataFrame(
        [("MSFT", dt.date(2025, 1, 15), "Current Quarter",
          dt.date(2024, 12, 31), Decimal("1.5"), Decimal("1.5"), 5,
          Decimal("1.6"), Decimal("1.4"), Decimal("1.3"))],
        store.read().schema))
    assert store.read().count() == 1


def test_compact_consolidates_small_files(spark, tmp_path):
    import glob
    store = TableStore(spark, str(tmp_path), "earnings_calendar")
    for i in range(5):  # each upsert appends its own files
        store.upsert_ignore(spark.createDataFrame(
            [(f"SYM{i}{j}", D(2025, 1, 10 + i), "Before market open")
             for j in range(3)],
            "act_symbol string, date date, when string"))
    live = store._live_dir()
    before = len(glob.glob(f"{live}/**/*.parquet", recursive=True))
    assert before >= 5
    rows_before = _rows(store)
    store.compact()
    after = len(glob.glob(f"{store._live_dir()}/**/*.parquet",
                          recursive=True))
    assert after < before
    assert _rows(store) == rows_before


def test_version_retention_and_time_travel(spark, tmp_path):
    store = TableStore(spark, str(tmp_path), "earnings_calendar",
                       keep_versions=2)
    df1 = spark.createDataFrame(
        [("AAA", D(2025, 1, 1), "Before market open")],
        "act_symbol string, date date, when string")
    store.overwrite(df1)
    v1 = store.current_version()
    store.overwrite(df1.withColumn("when", F.lit("After market close")))
    # previous version still readable (time travel within the window)
    assert store.versions()[-1] == store.current_version()
    assert v1 in store.versions()
    assert store.read(version=v1).collect()[0]["when"] == "Before market open"
    assert store.read().collect()[0]["when"] == "After market close"
    # third write evicts v1
    store.overwrite(df1)
    assert v1 not in store.versions()
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not retained"):
        store.read(version=v1)


def test_stale_lock_reclaimed_live_lock_respected(spark, store):
    import os
    from zacks_estimates_financial_statements_spark.operators.writer import (
        ConcurrentWriteError, _LOCK, _HOSTNAME,
    )
    df = spark.createDataFrame(
        [("MSFT", D(2025, 1, 15), "Before market open")],
        "act_symbol string, date date, when string")
    os.makedirs(store.path, exist_ok=True)
    lock = os.path.join(store.path, _LOCK)

    # 1) same host, dead pid -> reclaimed without manual removal
    with open(lock, "w") as fh:
        fh.write(f"pid=999999999 host={_HOSTNAME} "
                 f"at=2026-01-01T00:00:00+00:00")
    store.overwrite(df)                      # takes over, then releases
    assert not os.path.exists(lock)
    assert store.read().count() == 1

    # 2) unknown host, expired lease -> reclaimed
    with open(lock, "w") as fh:
        fh.write("pid=1 host=elsewhere at=2020-01-01T00:00:00+00:00")
    store.upsert_ignore(spark.createDataFrame(
        [("AAPL", D(2025, 1, 15), "After market close")], df.schema))
    assert store.read().count() == 2

    # 3) unknown host, fresh lease -> still fails fast
    import datetime as _dt
    now = _dt.datetime.now(_dt.timezone.utc).isoformat()
    with open(lock, "w") as fh:
        fh.write(f"pid=1 host=elsewhere at={now}")
    with pytest.raises(ConcurrentWriteError, match="locked by another"):
        store.overwrite(df)
    os.unlink(lock)

    # 4) same host, LIVE pid (ours) -> fails fast even though lease fresh
    with open(lock, "w") as fh:
        fh.write(f"pid={os.getpid()} host={_HOSTNAME} at={now}")
    with pytest.raises(ConcurrentWriteError):
        store.overwrite(df)
    os.unlink(lock)


def test_version_diff_added_removed_changed(spark, tmp_path):
    store = TableStore(spark, str(tmp_path), "earnings_calendar",
                       keep_versions=3)
    df1 = spark.createDataFrame(
        [("AAA", D(2025, 1, 1), "Before market open"),
         ("BBB", D(2025, 1, 2), "After market close"),
         ("CCC", D(2025, 1, 3), "Before market open")],
        "act_symbol string, date date, when string")
    store.overwrite(df1)
    v1 = store.current_version()
    df2 = spark.createDataFrame(
        [("AAA", D(2025, 1, 1), "Before market open"),   # unchanged
         ("BBB", D(2025, 1, 2), "Before market open"),   # changed
         ("DDD", D(2025, 1, 4), "After market close")],  # added; CCC gone
        "act_symbol string, date date, when string")
    store.overwrite(df2)

    got = {(r.act_symbol, r.change)
           for r in store.diff(v1).collect()}
    assert got == {("BBB", "changed"), ("CCC", "removed"),
                   ("DDD", "added")}
    # diffing a version against itself is empty
    assert store.diff(v1, v1).count() == 0


def test_merge_upsert_last_write_wins(spark, tmp_path):
    store = TableStore(spark, str(tmp_path), "earnings_calendar",
                       keep_versions=2)
    df1 = spark.createDataFrame(
        [("AAA", D(2025, 1, 1), "Before market open"),
         ("BBB", D(2025, 1, 2), "After market close")],
        "act_symbol string, date date, when string")
    store.merge_upsert(df1, pk=("act_symbol", "date"))
    v1 = store.current_version()

    # batch updates AAA, inserts CCC, and carries an intra-batch tie on
    # CCC resolved by order_by
    df2 = spark.createDataFrame(
        [("AAA", D(2025, 1, 1), "After market close"),
         ("CCC", D(2025, 1, 3), "loser"),
         ("CCC", D(2025, 1, 3), "winner")],
        "act_symbol string, date date, when string")
    store.merge_upsert(df2, pk=("act_symbol", "date"),
                       order_by=[F.desc("when")])
    got = {r.act_symbol: r.when for r in store.read().collect()}
    assert got == {"AAA": "After market close",
                   "BBB": "After market close",
                   "CCC": "winner"}
    # the merge is a version flip: diff audits exactly what changed
    d = {(r.act_symbol, r.change) for r in store.diff(v1).collect()}
    assert d == {("AAA", "changed"), ("CCC", "added")}
    # idempotent replay: merging the same batch again changes nothing
    store.merge_upsert(df2, pk=("act_symbol", "date"),
                       order_by=[F.desc("when")])
    assert {r.act_symbol: r.when
            for r in store.read().collect()} == got


def test_diff_spans_schema_evolution(spark, tmp_path):
    store = TableStore(spark, str(tmp_path), "earnings_calendar",
                       keep_versions=3, partition_by=None)
    v1df = spark.createDataFrame(
        [("AAA", D(2025, 1, 1), "x", "extra")],
        "act_symbol string, date date, when string, note string")
    store.overwrite(v1df)
    v1 = store.current_version()
    # v2 drops `note`: same surviving values, but the row must read as
    # changed (a column it had is gone), not crash or read equal
    store.overwrite(spark.createDataFrame(
        [("AAA", D(2025, 1, 1), "x")],
        "act_symbol string, date date, when string"))
    d = {(r.act_symbol, r.change)
         for r in store.diff(v1, pk=("act_symbol", "date")).collect()}
    assert d == {("AAA", "changed")}


def test_optimize_zorder_and_file_manifest(spark, tmp_path):
    """OPTIMIZE ZORDER rewrites the live version so BOTH clustered
    columns' row-group ranges become prunable, data survives
    bit-identical, and the manifest reports the tightened stats."""
    from pyspark.sql import functions as F

    from zacks_estimates_financial_statements_spark.operators import layout
    from zacks_estimates_financial_statements_spark.operators.writer import TableStore

    store = TableStore(spark, str(tmp_path), "zopt", partition_by=None,
                       keep_versions=2)
    df = (spark.range(1 << 13)
          .select(F.col("id"),
                  (F.col("id") % 128).alias("x"),
                  (F.hash("id") % 128 + 128).alias("yr"))
          .withColumn("y", F.col("yr") % 128).drop("yr"))
    store.overwrite(df)
    before = {tuple(r) for r in store.read().collect()}

    store.optimize_zorder([("x", 0, 127), ("y", 0, 127)], bits=7,
                          n_files=16)
    live = store._live_dir()
    assert {tuple(r) for r in store.read().collect()} == before
    assert layout.rowgroup_prune_fraction(live, "x", 10, 30) > 0.3
    assert layout.rowgroup_prune_fraction(live, "y", 10, 30) > 0.3

    man = store.file_manifest()
    rows = man.filter(F.col("column") == "x").collect()
    assert len(rows) >= 16          # one row per (row group, column)
    assert all(r["n_rows"] > 0 and r["bytes"] > 0 for r in rows)
    # stats are tight: at least one group's x-range excludes [10, 30]
    assert any(int(r["max_value"]) < 10 or int(r["min_value"]) > 30
               for r in rows)


def test_version_tags_snapshot_reads(spark, tmp_path):
    from pyspark.sql import functions as F

    from zacks_estimates_financial_statements_spark.operators.writer import TableStore

    store = TableStore(spark, str(tmp_path), "tagged", partition_by=None,
                       keep_versions=3)
    store.overwrite(spark.range(5).select(F.col("id")))
    store.tag("run-a")
    store.overwrite(spark.range(9).select(F.col("id")))
    assert store.read().count() == 9
    assert store.read_tag("run-a").count() == 5   # snapshot survives
    assert store.tags()["run-a"].startswith("v-")

    import pytest

    with pytest.raises(ValueError):
        store.read_tag("missing")
    with pytest.raises(ValueError):
        store.tag("bad name!")
    with pytest.raises(ValueError):
        store.tag("run.tmp-1")   # temp-file marker: would never list
    # vacuum past the tag: dangling is reported, read refuses
    store.keep_versions = 1
    store.overwrite(spark.range(2).select(F.col("id")))
    store.overwrite(spark.range(3).select(F.col("id")))
    assert store.tags()["run-a"].startswith("!")
    with pytest.raises(ValueError):
        store.read_tag("run-a")


def test_purge_rows_across_stores(spark, tmp_path):
    from pyspark.sql import functions as F

    from zacks_estimates_financial_statements_spark.operators.writer import (
        TableStore,
        purge_rows,
    )

    a = TableStore(spark, str(tmp_path), "ev_a", partition_by=None)
    b = TableStore(spark, str(tmp_path), "ev_b", partition_by=None)
    c = TableStore(spark, str(tmp_path), "no_user", partition_by=None)
    a.overwrite(spark.range(10).select(F.col("id").alias("user_id"),
                                       (F.col("id") * 2).alias("v")))
    b.overwrite(spark.range(20).select((F.col("id") % 5).alias("user_id"),
                                       F.col("id").alias("event")))
    c.overwrite(spark.range(4).select(F.col("id").alias("other")))
    condemned = spark.createDataFrame([(1,), (3,), (3,)], "user_id long")
    removed = purge_rows([a, b, c], condemned, on=["user_id"])
    assert removed == {"ev_a": 2, "ev_b": 8, "no_user": -1}
    assert a.read().filter("user_id in (1, 3)").count() == 0
    assert b.read().filter("user_id in (1, 3)").count() == 0
    assert c.read().count() == 4
    # idempotent: a replayed purge is a no-op
    again = purge_rows([a, b], condemned, on=["user_id"])
    assert again == {"ev_a": 0, "ev_b": 0}


def test_snapshot_pin_survives_flip_and_gc(spark, tmp_path):
    """A reader that pinned version N keeps reading N across a
    concurrent writer's pointer flip + vacuum (keep_versions=1); once
    the pin is released, the next GC reclaims the old version."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from zacks_estimates_financial_statements_spark.operators.writer import TableStore

    store = TableStore(spark, str(tmp_path), "pinned", partition_by=None,
                       keep_versions=1)
    store.overwrite(spark.range(5).select(F.col("id")))
    with store.snapshot() as snap:
        v0 = snap.version
        assert snap.read().count() == 5
        # concurrent writer flips twice; GC runs after each flip but
        # must retain the pinned version
        store.overwrite(spark.range(9).select(F.col("id")))
        store.overwrite(spark.range(3).select(F.col("id")))
        assert os.path.isdir(os.path.join(store.path, v0))
        assert snap.read().count() == 5          # still the snapshot
        assert store.read().count() == 3         # live moved on
    # pin released: the next writer GC reclaims v0
    store.overwrite(spark.range(7).select(F.col("id")))
    assert not os.path.isdir(os.path.join(store.path, v0))
    with pytest.raises(ValueError):
        store.snapshot(version=v0).__enter__()


def test_snapshot_stale_pin_is_reaped(spark, tmp_path):
    """A pin left by a provably-dead reader (same host, pid gone) does
    not hold retention hostage: GC reaps it and vacuums the version."""
    import os

    from pyspark.sql import functions as F

    from zacks_estimates_financial_statements_spark.operators.writer import (
        _HOSTNAME,
        TableStore,
    )

    store = TableStore(spark, str(tmp_path), "stalepin", partition_by=None,
                       keep_versions=1)
    store.overwrite(spark.range(5).select(F.col("id")))
    v0 = store.current_version()
    # forge a pin from a dead pid on this host
    pin = os.path.join(store.path, f"_PIN_{v0}.deadbeef")
    with open(pin, "w") as f:
        f.write(f"pid=999999999 host={_HOSTNAME} "
                f"at=2020-01-01T00:00:00+00:00")
    store.overwrite(spark.range(9).select(F.col("id")))
    assert not os.path.exists(pin)
    assert not os.path.isdir(os.path.join(store.path, v0))

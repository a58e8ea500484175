"""CSV export tests (W8): per-date files, headers, ordering, NULL
rendering, not-null gate, decimal text trimming."""

from __future__ import annotations

import datetime
import os
from decimal import Decimal

from zacks_estimates_financial_statements_spark import export as X

D = datetime.date


def _eps_estimate_df(spark):
    return spark.createDataFrame(
        [("MSFT", D(2025, 1, 15), "Current Quarter", D(2024, 12, 31),
          Decimal("1.5"), Decimal("1.52"), 5, Decimal("1.6"), Decimal("1.4"),
          Decimal("1.3")),
         ("AAPL", D(2025, 1, 15), "Current Quarter", D(2024, 12, 31),
          Decimal("2.25"), None, 7, Decimal("2.4"), Decimal("2.1"),
          Decimal("2.0")),
         ("AAPL", D(2025, 1, 22), "Current Quarter", D(2024, 12, 31),
          Decimal("2.30"), Decimal("2.31"), 7, Decimal("2.5"), Decimal("2.2"),
          Decimal("2.0"))],
        "act_symbol string, date date, period string, period_end_date date, "
        "consensus decimal(38,6), recent decimal(38,6), count short, "
        "high decimal(38,6), low decimal(38,6), year_ago decimal(38,6)")


def test_dump_dat_not_null_gate_and_per_date_files(spark, tmp_path):
    out = str(tmp_path / "dat")
    files = X.dump_dat(_eps_estimate_df(spark), "eps_estimate", out)
    assert [f.split("/")[-1] for f in files] == ["2025-01-15.csv", "2025-01-22.csv"]
    lines = open(files[0]).read().strip().split("\n")
    # AAPL row dropped by the recent-is-null gate; header preserved
    assert lines[0] == "act_symbol,date,period,period_end_date,consensus,recent,count,high,low,year_ago"
    assert lines[1:] == ["MSFT,2025-01-15,Current Quarter,2024-12-31,1.5,1.52,5,1.6,1.4,1.3"]


def test_dump_dolt_coalesces_null_and_orders(spark, tmp_path):
    out = str(tmp_path / "dolt")
    files = X.dump_dolt(_eps_estimate_df(spark), "eps_estimate", out)
    lines = open(files[0]).read().strip().split("\n")
    assert lines[0].startswith("date,act_symbol,period")
    # AAPL sorts first; its NULL recent renders as empty string
    assert lines[1] == "2025-01-15,AAPL,Current Quarter,2024-12-31,2.25,,7,2.4,2.1,2"
    assert lines[2].startswith("2025-01-15,MSFT")


def test_decimal_text_trims_trailing_zeros(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(Decimal("1.500000"),), (Decimal("2.000000"),), (Decimal("0.123456"),),
         (None,)], "x decimal(38,6)")
    vals = [r[0] for r in df.select(X.decimal_text(F.col("x")).alias("t")).collect()]
    assert vals == ["1.5", "2", "0.123456", None]


def test_reexport_earnings_calendar(spark, tmp_path):
    import datetime
    df = spark.createDataFrame(
        [("AAPL", datetime.date(2024, 5, 9), "After market close"),
         ("MSFT", datetime.date(2024, 5, 1), None),      # outside window
         ("NVDA", datetime.date(2024, 5, 20), None)],
        "act_symbol string, date date, `when` string")
    target, cmds = X.reexport_earnings_calendar(df, str(tmp_path), "2024-05-10")
    lines = open(target).read().strip().split("\n")
    assert lines[0] == "act_symbol,date,when"
    assert lines[1:] == ["AAPL,2024-05-09,After market close",
                         "NVDA,2024-05-20,"]
    assert cmds[0][:2] == ["dolt", "sql"]
    assert any("table" in c for c in cmds[1])


# ---------------------------------------------------------------------------
# Reference dump windows + W9 publish
# ---------------------------------------------------------------------------


def test_default_dump_window_statements_250_days():
    today = D(2026, 8, 13)
    start, end = X.default_dump_window("income_statement", today=today)
    assert end == "2026-08-13"
    assert start == (today - datetime.timedelta(days=250)).isoformat()
    # explicit end anchors the lookback
    start, end = X.default_dump_window("balance_sheet_assets",
                                       end_date="2025-01-01")
    assert (start, end) == ("2024-04-26", "2025-01-01")


def test_default_dump_window_snapshot_and_eps_history():
    today = D(2026, 8, 13)
    assert X.default_dump_window("rank_score", today=today) == \
        ("2026-08-13", "2026-08-13")
    # eps_history widens start by 6 months even when start is explicit
    assert X.default_dump_window("eps_history", today=today) == \
        ("2026-02-13", "2026-08-13")
    assert X.default_dump_window("eps_history", start_date="2025-03-31",
                                 end_date="2025-06-30") == \
        ("2024-09-30", "2025-06-30")
    # month-end clamp (May 31 - 3 months style edge)
    assert X._months_back(D(2025, 3, 31), 1) == D(2025, 2, 28)


def test_publish_sequence_matches_reference_argv():
    cmds = X.publish_sequence(
        "eps_estimate", ["/d/2025-01-15.csv", "/d/2025-01-22.csv"],
        "2025-01-22")
    assert cmds == [
        ["dolt", "table", "import", "-u", "--continue", "eps_estimate",
         "/d/2025-01-15.csv"],
        ["dolt", "table", "import", "-u", "--continue", "eps_estimate",
         "/d/2025-01-22.csv"],
        ["dolt", "add", "eps_estimate"],
        ["dolt", "commit", "-m", "eps_estimate 2025-01-22 update"],
        ["dolt", "push", "--silent"],
    ]


def test_publish_dry_run_and_injected_runner(capsys):
    ran = []
    X.publish("rank_score", ["/d/a.csv"], "/dolt", "2025-01-22",
              run=ran.append)
    assert [c[0:2] for c in ran] == [["dolt", "table"], ["dolt", "add"],
                                     ["dolt", "commit"], ["dolt", "push"]]
    ran.clear()
    X.publish("rank_score", ["/d/a.csv"], "/dolt", "2025-01-22",
              dry_run=True, run=ran.append)
    assert ran == []
    out = capsys.readouterr().out
    assert "DRY-RUN [/dolt] dolt table import -u --continue rank_score" in out
    assert "dolt push --silent" in out


def test_runner_publish_subcommand_dry_run(tmp_path, capsys):
    from zacks_estimates_financial_statements_spark import runner
    (tmp_path / "2025-01-15.csv").write_text("a,b\n1,2\n")
    (tmp_path / "2025-01-22.csv").write_text("a,b\n3,4\n")
    rc = runner.main(["publish", "--table", "eps_estimate",
                      "--out", str(tmp_path), "--dolt-dir", "/var/dolt",
                      "--end-date", "2025-01-22", "--dry-run"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("dolt table import") == 2
    assert "eps_estimate 2025-01-22 update" in out
    assert '"csv_files": 2' in out


def test_publish_gc_appended():
    cmds = X.publish_sequence("income_statement", ["/d/a.csv"],
                              "2025-01-22", gc=True)
    assert cmds[-1] == ["dolt", "gc"]
    assert cmds[-2] == ["dolt", "push", "--silent"]


def test_publish_resolves_relative_csv_paths(capsys):
    # commands run with cwd=dolt_dir: a relative dump path must be
    # resolved before it lands in the import argv, or dolt looks for the
    # file under the dolt dir and the publish aborts
    ran = []
    X.publish("rank_score", ["rel/a.csv"], "/dolt", "2025-01-22",
              run=ran.append)
    assert ran[0][-1] == os.path.abspath("rel/a.csv")
    assert os.path.isabs(ran[0][-1])


def test_runner_dump_dolt_forwards_gc(monkeypatch, tmp_path):
    # the dump-dolt --publish branch must forward --gc like the
    # standalone publish subcommand does (the reference's statements dump
    # ends with one 'dolt gc', dump-dolt-statements.rkt:326)
    from zacks_estimates_financial_statements_spark import runner
    seen = {}

    def fake_publish(table, files, dolt_dir, end, dry_run=False, gc=False,
                     run=None):
        seen["gc"] = gc
        return []

    monkeypatch.setattr(runner.X, "publish", fake_publish)
    monkeypatch.setattr(runner.X, "dump_dolt",
                        lambda df, t, out, s, e: [])
    monkeypatch.setattr(runner, "get_spark",
                        lambda **kw: __import__("types").SimpleNamespace(
                            stop=lambda: None))
    monkeypatch.setattr(runner, "TableStore",
                        lambda spark, root, name:
                        __import__("types").SimpleNamespace(read=lambda: None))
    rc = runner.main(["dump-dolt", "--table", "eps_estimate",
                      "--tables", str(tmp_path), "--out", str(tmp_path),
                      "--publish", "--gc", "--dry-run",
                      "--start-date", "2025-01-01",
                      "--end-date", "2025-01-22"])
    assert rc == 0 and seen["gc"] is True


def test_write_training_shards_deterministic(spark, tmp_path):
    from zacks_estimates_financial_statements_spark import export as E

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text", "source").limit(200)
    out1 = str(tmp_path / "shards1")
    paths = E.write_training_shards(docs, out1, "doc_id", shards=4)
    assert [os.path.basename(p) for p in paths] == \
        [f"shard-{i:05d}.jsonl.gz" for i in range(4)]

    import gzip
    import json as J
    seen = {}
    for i, p in enumerate(paths):
        with gzip.open(p, "rt") as fh:
            rows = [J.loads(line) for line in fh]
        ids = [r["doc_id"] for r in rows]
        assert ids == sorted(ids)          # in-shard order by id
        for r in rows:
            seen[r["doc_id"]] = i
    assert len(seen) == 200                # no loss, no dup

    # determinism: a second run shards identically
    out2 = str(tmp_path / "shards2")
    paths2 = E.write_training_shards(docs.repartition(7), out2,
                                     "doc_id", shards=4)
    for i, p in enumerate(paths2):
        with gzip.open(p, "rt") as fh:
            for line in fh:
                assert seen[J.loads(line)["doc_id"]] == i


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    from zacks_estimates_financial_statements_spark import export as E
    from zacks_estimates_financial_statements_spark.sources import jsonl

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text", "source").limit(50)
    out = str(tmp_path / "shards")
    E.write_training_shards(docs, out, "doc_id", shards=2)

    schema = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType()),
                         StructField("source", StringType())])
    # shards written by the engine read back loss-free
    good, quar, release = jsonl.read_jsonl(spark, out + "/*.jsonl.gz",
                                           schema)
    assert good.count() == 50 and quar.count() == 0
    a = {r.doc_id: r.text for r in good.collect()}
    b = {r.doc_id: r.text for r in docs.collect()}
    assert a == b
    # the scratch copy persists DISK_ONLY (never steals executor memory)
    # and release() drops it. Other fixtures may hold their own cached
    # RDDs in the shared session, so assert on the DELTA: at least one
    # disk-only, zero-memory entry exists now and is gone after release.
    def disk_only_ids():
        return {info.id() for info in
                spark.sparkContext._jsc.sc().getRDDStorageInfo()
                if info.storageLevel().useDisk()
                and not info.storageLevel().useMemory()}
    before = disk_only_ids()
    assert before
    release()
    assert disk_only_ids() < before

    # damaged delivery: parseable rows flow, broken lines quarantine RAW
    bad = tmp_path / "damaged.jsonl"
    bad.write_text('{"doc_id": 1, "text": "ok", "source": "s"}\n'
                   '{"doc_id": 2, "text": "trunca\n'
                   'not json at all\n'
                   '{"doc_id": 3, "text": "fine", "source": "s"}\n')
    good2, quar2, release2 = jsonl.read_jsonl(spark, str(bad), schema)
    assert {r.doc_id for r in good2.collect()} == {1, 3}
    raws = sorted(r.raw_line for r in quar2.collect())
    assert raws == ['not json at all', '{"doc_id": 2, "text": "trunca']
    release2()

    import pytest as _pytest
    poisoned = StructType(list(schema.fields)
                          + [StructField("_corrupt_record", StringType())])
    with _pytest.raises(ValueError, match="_corrupt_record"):
        jsonl.read_jsonl(spark, str(bad), poisoned)


def test_write_training_shards_emits_empty_shards(spark, tmp_path):
    import gzip

    from zacks_estimates_financial_statements_spark import export as E

    docs = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                                 ["doc_id", "text"])
    out = str(tmp_path / "sparse")
    paths = E.write_training_shards(docs, out, "doc_id", shards=8)
    # contract: exactly `shards` files, positionally indexable
    assert [os.path.basename(p) for p in paths] == \
        [f"shard-{i:05d}.jsonl.gz" for i in range(8)]
    total = 0
    for p in paths:
        with gzip.open(p, "rt") as fh:   # empty shards are valid gzip
            total += sum(1 for _ in fh)
    assert total == 3


def test_webdataset_shards_roundtrip_and_determinism(spark, tmp_path):
    import hashlib
    import json as J
    import tarfile

    from zacks_estimates_financial_statements_spark import export as E

    rows = [(i, f"text of document {i}", bytes([i % 251] * (10 + i)),
             f"src{i % 3}") for i in range(23)]
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, payload: binary, source: string")
    out1 = str(tmp_path / "wds1")
    paths = E.write_webdataset_shards(
        df, out1, "doc_id", shards=3, text_col="text",
        media_col="payload", media_ext="img", meta_cols=["source"])
    assert [p.split("/")[-1] for p in paths] == \
        [f"shard-{i:05d}.tar" for i in range(3)]

    got = {}
    for p in paths:
        with tarfile.open(p) as tf:
            members = tf.getnames()
            # samples are contiguous and keys sorted within a shard
            keys = [m.split(".")[0] for m in members]
            assert keys == sorted(keys)
            for m in members:
                got[m] = tf.extractfile(m).read()
    # loss-free: every sample's three files round-trip
    for i, text, payload, source in rows:
        key = f"{i:012d}"
        assert got[f"{key}.txt"].decode() == text
        assert got[f"{key}.img"] == payload
        assert J.loads(got[f"{key}.json"]) == {"source": source}
    assert len(got) == 3 * 23

    # determinism: a re-run (different partitioning) is byte-identical
    out2 = str(tmp_path / "wds2")
    E.write_webdataset_shards(
        df.repartition(7), out2, "doc_id", shards=3, text_col="text",
        media_col="payload", media_ext="img", meta_cols=["source"])
    for i in range(3):
        h1 = hashlib.md5(open(f"{out1}/shard-{i:05d}.tar", "rb")
                         .read()).hexdigest()
        h2 = hashlib.md5(open(f"{out2}/shard-{i:05d}.tar", "rb")
                         .read()).hexdigest()
        assert h1 == h2, i

    # empty-shard contract: more shards than docs still yields n files
    out3 = str(tmp_path / "wds3")
    p3 = E.write_webdataset_shards(
        df.limit(1), out3, "doc_id", shards=4, text_col="text")
    assert len(p3) == 4
    for p in p3:
        with tarfile.open(p) as tf:   # every file is a valid tar
            tf.getnames()

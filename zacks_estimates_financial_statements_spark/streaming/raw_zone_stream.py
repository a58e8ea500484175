"""Streaming ingestion over the raw zone + incremental analytics on the
events stream.

The reference re-scans dated folders on a cron cadence (SURVEY §2.9); the
Spark-native equivalent is a file-source ``readStream`` with
``trigger(availableNow=True)``: each run incrementally processes only new
files (checkpointed), giving the same at-least-once + idempotent-sink
contract as the reference's ``ON CONFLICT DO NOTHING`` replays — with
exactly-once file tracking for free.

Crash-recovery contract (proven, not asserted — r9 verdict #4): every
``foreachBatch`` loader here may die MID-batch with any prefix of its
table writes committed (the fan-outs are multi-table; there is no
cross-table transaction). Recovery is: the failed epoch was never
committed to the checkpoint, so the restart REPLAYS the same batch
(file sources are replayable), and every per-table write is a PK
upsert (``TableStore.upsert_ignore``) — re-writing the already-written
prefix is a row-level no-op, the missing suffix completes, and the
end-state is byte-equal to an uninterrupted run. What this contract
does NOT give: read isolation between epochs (a reader between crash
and restart can observe the partial prefix — the same window the
reference's per-document transactions close per doc but its cron
re-runs leave open per day). ``tests/test_streaming.py::
test_dedup_gate_stream_mid_batch_crash_recovery`` and
``test_estimates_stream_mid_batch_crash_recovery`` kill a loader after
its first table write of an epoch and assert end-state equality.

Components:

- ``stream_calendar_rows``   — whole-file text stream over calendar JSON
  day-files → the same parse surface as ``parse.calendars`` (pure SQL).
  The calendar *load* stays batch-only on purpose: ``merge_calendar`` is
  run-scoped (last-file-wins within one complete folder), and a file
  stream may split a folder across microbatches, silently changing the
  winner — document-level loads (estimates, statements) have no such
  cross-file ordering dependency, so only they get streaming loaders.
- ``windowed_event_counts``  — event-time tumbling-window aggregation with
  watermarked late-data handling.
- ``sessionize_events``      — custom stateful operator
  (``applyInPandasWithState``): gap-based sessionization per user, the
  canonical "operator Spark lacks" shape (SURVEY §2.9 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from zacks_estimates_financial_statements_spark.parse.calendars import clean_payload
from zacks_estimates_financial_statements_spark.util import dec6

CAL_PAYLOAD_SCHEMA = "struct<data: array<array<string>>>"


def stream_calendar_files(spark: SparkSession, folder_glob: str) -> DataFrame:
    """File-source stream of whole calendar JSON documents:
    (path, event_date, content). ``folder_glob`` e.g.
    ``<base>/earnings-calendar/*/``; new day-files are picked up
    incrementally across restarts via the checkpoint."""
    raw = (spark.readStream.format("text")
           .option("wholetext", "true")
           .load(folder_glob))
    path = F.input_file_name()
    return raw.select(
        path.alias("path"),
        # ansi-ok: pipeline-written dated layout; a malformed stem must abort loudly (layout-drift/tamper detection)
        F.to_date(F.regexp_extract(path, r"([^/]+)\.json$", 1), "yyyy-MM-dd")
         .alias("event_date"),
        F.col("value").alias("content"))


def stream_calendar_rows(spark: SparkSession, folder_glob: str) -> DataFrame:
    """Parsed positional calendar rows from the stream — same cleanup chain
    as the batch parser (T8)."""
    files = stream_calendar_files(spark, folder_glob)
    parsed = files.select(
        "event_date", "path",
        F.from_json(clean_payload(F.col("content")), CAL_PAYLOAD_SCHEMA).alias("j"))
    return parsed.select(
        "event_date", "path",
        F.posexplode_outer(F.col("j.data")).alias("row_idx", "row")) \
        .filter(F.col("row").isNotNull())


def stream_documents(spark: SparkSession, base: str,
                     dataset: str) -> DataFrame:
    """File-source stream of whole HTML documents for one raw-zone
    dataset across ALL dated folders: (act_symbol, folder_date, content)
    — the streaming twin of ``sources.raw_zone.read_documents``. New
    files (a new day's crawl, or stragglers inside a day) are picked up
    incrementally via the checkpoint."""
    from zacks_estimates_financial_statements_spark.sources.raw_zone import SUFFIXES

    suffix = SUFFIXES[dataset].replace(".", r"\.")
    raw = (spark.readStream.format("text")
           .option("wholetext", "true")
           .load(f"{base}/{dataset}/*/"))
    path = F.input_file_name()
    return raw.select(
        F.regexp_extract(path, rf"([^/]+){suffix}$", 1).alias("act_symbol"),
        # ansi-ok: pipeline-written dated layout; a malformed folder must abort loudly (layout-drift/tamper detection)
        F.to_date(F.regexp_extract(path, r"/(\d{4}-\d{2}-\d{2})/[^/]+$", 1),
                  "yyyy-MM-dd").alias("folder_date"),
        F.col("value").alias("content"))


def stream_estimate_documents(spark: SparkSession, base: str) -> DataFrame:
    return stream_documents(spark, base, "estimates")


def run_estimates_stream(spark: SparkSession, base: str, tables_root: str,
                         checkpoint: str):
    """Incremental estimates transform-load: each microbatch of newly
    crawled documents flows through the SAME parse + validity gate +
    6-table fan-out as the batch runner (``foreachBatch``); the loader's
    idempotent PK upserts make the at-least-once replay of a restarted
    batch a no-op — the streaming analog of the reference's
    ``ON CONFLICT DO NOTHING`` re-runs. Returns the started query
    (``trigger(availableNow=True)`` — one incremental pass per
    invocation, matching the reference's cron cadence)."""
    from zacks_estimates_financial_statements_spark.operators.writer import TableStore
    from zacks_estimates_financial_statements_spark.parse.estimates import parse_estimates
    from zacks_estimates_financial_statements_spark.pipelines.estimate_pipeline import (
        ESTIMATE_TABLES,
        load_estimates,
    )

    stores = {t: TableStore(spark, tables_root, t) for t in ESTIMATE_TABLES}

    def _load(batch_df: DataFrame, _epoch: int) -> None:
        load_estimates(parse_estimates(batch_df), stores)

    docs = stream_estimate_documents(spark, base)
    return (docs.writeStream
            .foreachBatch(_load)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def run_statements_stream(spark: SparkSession, base: str, tables_root: str,
                          checkpoint_root: str, kinds=None):
    """Incremental statements transform-load: one checkpointed stream
    per kind (disjoint raw datasets and destination tables), each
    microbatch routed through the batch loader. The cash-flow era
    dispatch is per-row: a microbatch spanning the 2024-02-01 layout
    change splits on folder_date and parses each side with its era's
    extractor. Returns the started queries."""
    import datetime as _dt

    from zacks_estimates_financial_statements_spark.operators.writer import TableStore
    from zacks_estimates_financial_statements_spark.parse.statements import parse_statements
    from zacks_estimates_financial_statements_spark.pipelines.statement_pipeline import (
        load_statement,
    )

    #: kind → (raw dataset, destination tables) — mirrors runner.py
    kind_map = {
        "income": ("income-statement", ["income_statement"]),
        "balance": ("balance-sheet", ["balance_sheet_assets",
                                      "balance_sheet_liabilities",
                                      "balance_sheet_equity"]),
        "cash_flow": ("cash-flow-statement", ["cash_flow_statement"]),
    }
    legacy_before = _dt.date(2024, 2, 1)
    queries = []
    for kind in kinds or list(kind_map):
        dataset, dest = kind_map[kind]
        stores = {t: TableStore(spark, tables_root, t) for t in dest}

        def _load(batch_df: DataFrame, _epoch: int, kind=kind,
                  stores=stores) -> None:
            if kind == "cash_flow":
                legacy = batch_df.filter(
                    F.col("folder_date") < F.lit(legacy_before))
                current = batch_df.filter(
                    F.col("folder_date") >= F.lit(legacy_before))
                load_statement(parse_statements(legacy, "cash_flow_legacy"),
                               "cash_flow_legacy", stores)
                load_statement(parse_statements(current, "cash_flow"),
                               "cash_flow", stores)
            else:
                load_statement(parse_statements(batch_df, kind), kind,
                               stores)

        queries.append(
            stream_documents(spark, base, dataset).writeStream
            .foreachBatch(_load)
            .option("checkpointLocation", f"{checkpoint_root}/{kind}")
            .trigger(availableNow=True)
            .start())
    return queries


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Event-time tumbling-window counts per event_type with late-data
    watermark; works on a streaming OR batch events DataFrame (same code
    path — Spark's unified semantics)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(dec6(F.col("value"))).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n", "sum_value"))


SESSION_SCHEMA = ("user_id bigint, session_start timestamp, "
                  "session_end timestamp, n_events int")
_STATE_SCHEMA = "start bigint, last bigint, n int"


def _sessionize_fn(gap_seconds: int):
    import pandas as pd

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([{
                "user_id": user_id,
                "session_start": pd.Timestamp(start, unit="us"),
                "session_end": pd.Timestamp(last, unit="us"),
                "n_events": n,
            }])
            return
        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
        ts_us.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts_us[0], ts_us[0], 0
        out = []
        for t in ts_us:
            if t - last > gap_seconds * 1_000_000:
                out.append({"user_id": user_id,
                            "session_start": pd.Timestamp(start, unit="us"),
                            "session_end": pd.Timestamp(last, unit="us"),
                            "n_events": n})
                start, n = t, 0
            last = t
            n += 1
        state.update((start, last, n))
        state.setTimeoutDuration(gap_seconds * 1000)
        yield pd.DataFrame(out, columns=["user_id", "session_start",
                                         "session_end", "n_events"])

    return fn


def dedup_events(events: DataFrame, keys: list[str] | None = None,
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each key, with
    state evicted once the watermark passes (``dropDuplicatesWithinWatermark``
    — unbounded-key ``dropDuplicates`` state would grow forever on an
    infinite stream). Works on a batch DataFrame identically (unified
    semantics): the streaming twin of the writer's idempotent-upsert
    replay guard (W1)."""
    keys = keys or ["event_id"]
    if not events.isStreaming:
        # batch twin: the watermark horizon is irrelevant when the whole
        # input is present — plain key dedup is the same result
        return events.dropDuplicates(keys)
    return (events
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(keys))


def sessionize_events(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessionization per user as a custom stateful streaming
    operator (``applyInPandasWithState`` + processing-time timeout to
    flush idle sessions). Emits closed sessions."""
    from zacks_estimates_financial_statements_spark.util import ensure_package_on_executors

    ensure_package_on_executors(events.sparkSession)
    return (events
            .selectExpr("user_id", "ts")
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_fn(gap_seconds),
                outputStructType=SESSION_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))


def run_dedup_gate_stream(spark: SparkSession, input_glob: str,
                          tables_root: str, checkpoint: str,
                          threshold: float = 0.7, k: int = 12,
                          bands: int = 4,
                          dedup_within_batch: bool = False,
                          min_quality: float | None = None):
    """Streaming ingestion dedup gate: new JSONL documents stream in,
    and each microbatch probes the STORED corpus LSH index before
    admission — near-dups (est_jaccard >= threshold) land in a
    quarantine table with their best match; fresh documents append to
    the corpus AND their signature rows append to the index, so the
    next batch probes an up-to-date store.

    The scale contract is inherited from ``incremental_minhash_pairs``:
    per batch, only the batch is sketched; the stored index is probed
    (broadcast batch buckets), never re-sketched or shuffled. Writes go
    through the versioned ``TableStore`` with PK upserts, so an
    at-least-once replay of a crashed batch is a no-op.

    ``dedup_within_batch=True`` additionally resolves near-dups INSIDE
    each microbatch before the index probe (MinHash pairs → connected
    components → one keeper per cluster, the ``resolve_duplicate_
    clusters`` path); dropped intra-batch rows are quarantined against
    their cluster keeper with a NULL est_jaccard (membership is
    transitive, not a direct pair estimate). Off by default: it adds the
    in-batch pair sweep's cost, unnecessary when the source is already
    unique per batch.

    ``min_quality`` (opt-in) runs the heuristic quality gate FIRST —
    before any sketch work is spent: documents scoring below the
    threshold (``functions.text.quality_score``, [0, 1]) land in a
    ``gate_lowquality`` table with their score and never reach the
    dedup probe, the corpus, or the index. Replay-safe like the other
    tables (PK upserts). Returns the started query
    (``trigger(availableNow=True)``, one incremental pass per call).
    """
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    from zacks_estimates_financial_statements_spark.operators import dedup
    from zacks_estimates_financial_statements_spark.operators.writer import TableStore

    corpus = TableStore(spark, tables_root, "gate_corpus")
    index = TableStore(spark, tables_root, "gate_index")
    rejects = TableStore(spark, tables_root, "gate_rejects")
    lowq = TableStore(spark, tables_root, "gate_lowquality")

    def _gate(batch_df: DataFrame, _epoch: int) -> None:
        if batch_df.isEmpty():
            return
        if min_quality is not None:
            from zacks_estimates_financial_statements_spark.functions import text as T

            # score once (localCheckpoint), route both sides from it
            scored = (batch_df.withColumn(
                "__q", F.round(T.quality_score(F.col("text")), 6))
                .localCheckpoint(eager=True))
            bad = scored.filter(F.col("__q") < min_quality)
            if not bad.isEmpty():
                lowq.upsert_ignore(
                    bad.select("doc_id", F.col("__q").alias("quality")),
                    pk=("doc_id",))
            batch_df = (scored.filter(F.col("__q") >= min_quality)
                        .drop("__q"))
            if batch_df.isEmpty():
                return
        if dedup_within_batch:
            from zacks_estimates_financial_statements_spark.operators import graph

            in_pairs = dedup.minhash_near_dup_pairs(
                batch_df, "doc_id", "text", k=k, bands=bands)
            resolved = graph.resolve_duplicate_clusters(
                batch_df, in_pairs, "doc_id").localCheckpoint(eager=True)
            # est_jaccard NULL: cluster membership is transitive, not a
            # direct pair estimate against the keeper
            dropped = (resolved.filter(~F.col("keep"))
                       .select("doc_id",
                               F.col("component").alias("matched_id"),
                               F.lit(None).cast("double")
                               .alias("est_jaccard")))
            if not dropped.isEmpty():
                rejects.upsert_ignore(dropped, pk=("doc_id",))
            batch_df = (resolved.filter(F.col("keep"))
                        .select(*batch_df.columns))
        if index.exists():
            # the stored index is parquet-backed, so the probed-bucket
            # In() pushdown prunes its scan to the batch's buckets
            pairs = dedup.incremental_minhash_pairs(
                index.read(), batch_df, "doc_id", "text",
                k=k, bands=bands, prune_index_scan=True)
            # max(struct) breaks est_jaccard ties by the larger
            # corpus_id — deterministic across runs/replays, unlike a
            # bare max_by; localCheckpoint materializes the sketch +
            # index-probe lineage ONCE (hits feeds the quarantine
            # write AND the admission anti-join)
            hits = (pairs.filter(F.col("est_jaccard") >= threshold)
                    .groupBy("batch_id")
                    .agg(F.max(F.struct("est_jaccard", "corpus_id"))
                         .alias("m"))
                    .select("batch_id",
                            F.col("m.corpus_id").alias("matched_id"),
                            F.col("m.est_jaccard").alias("est_jaccard"))
                    .localCheckpoint(eager=True))
            admitted = (batch_df.join(
                hits.select(F.col("batch_id").alias("doc_id")),
                "doc_id", "left_anti"))
            rejects.upsert_ignore(
                hits.select(F.col("batch_id").alias("doc_id"),
                            "matched_id", "est_jaccard"),
                pk=("doc_id",))
        else:
            admitted = batch_df
        corpus.upsert_ignore(admitted, pk=("doc_id",))
        index.upsert_ignore(
            dedup.minhash_index(admitted, "doc_id", "text",
                                k=k, bands=bands),
            pk=("doc_id", "band"))

    schema = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType())])
    docs = (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .json(input_glob))
    return (docs.writeStream
            .foreachBatch(_gate)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def attribute_conversions(impressions: DataFrame, conversions: DataFrame,
                          horizon: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked stream-stream interval join: every conversion paired
    with each same-user impression inside the look-back ``horizon``
    (``imp_ts`` in ``[conv_ts - horizon, conv_ts]``) — the
    click-to-purchase attribution shape of an ingestion telemetry
    pipeline. Works on streaming OR batch inputs through the SAME join
    expression (unified semantics); the batch twin is what the oracle
    checks.

    Scale contract (streaming): a stream-stream inner join buffers both
    sides in state, and Spark can only evict that state when the join
    condition bounds event time on BOTH inputs — which the two-sided
    range predicate here does. With a ``watermark`` of W and a horizon
    of H, impression state is held for ~W+H and conversion state for
    ~W, independent of total stream length; without the time bound the
    state would grow forever. Late rows beyond W are dropped at the
    source, the standard watermark contract.

    Batch: Catalyst plans the equi-key (user) + range predicate as a
    hash join on ``user_id`` with the time bound as a post-filter — one
    shuffle per side, no row amplification beyond true candidates. The
    per-conversion last-touch reduction is deliberately NOT applied
    here (a second stateful op on a stream-stream join needs its own
    watermark stage); ``last_touch`` below folds the pairs, and in
    streaming the same fold runs downstream in ``foreachBatch`` or as a
    follow-up stateful agg.

    Output: conversion_id, user_id, conv_ts, impression_id, imp_ts,
    lag_us (conv_ts - imp_ts in µs, >= 0).
    """
    imp = impressions.select(
        F.col("event_id").alias("impression_id"),
        F.col("user_id").alias("imp_user"),
        F.col("ts").alias("imp_ts"))
    conv = conversions.select(
        F.col("event_id").alias("conversion_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("conv_ts"))
    if imp.isStreaming:
        imp = imp.withWatermark("imp_ts", watermark)
    if conv.isStreaming:
        conv = conv.withWatermark("conv_ts", watermark)
    cond = ((conv["user_id"] == imp["imp_user"])
            & (imp["imp_ts"] <= conv["conv_ts"])
            & (imp["imp_ts"] >= conv["conv_ts"] - F.expr(
                f"INTERVAL {horizon}")))
    return (conv.join(imp, cond, "inner")
            .select("conversion_id", "user_id", "conv_ts",
                    "impression_id", "imp_ts",
                    (F.unix_micros("conv_ts")
                     - F.unix_micros("imp_ts")).alias("lag_us")))


def last_touch(pairs: DataFrame) -> DataFrame:
    """Fold attribution pairs to one row per conversion: the LATEST
    impression wins (ties broken by the larger impression_id —
    ``max(struct)`` is deterministic across runs, unlike a bare
    ``max_by``), plus the candidate count. One map-side-combined
    aggregation on conversion_id."""
    return (pairs.groupBy("conversion_id", "user_id", "conv_ts")
            .agg(F.max(F.struct("imp_ts", "impression_id")).alias("m"),
                 F.count(F.lit(1)).alias("n_candidates"))
            .select("conversion_id", "user_id", "conv_ts",
                    F.col("m.impression_id").alias("impression_id"),
                    F.col("m.imp_ts").alias("imp_ts"),
                    (F.unix_micros("conv_ts")
                     - F.unix_micros("m.imp_ts")).alias("lag_us"),
                    "n_candidates"))


def run_profile_monitor_stream(spark: SparkSession, input_glob: str,
                               tables_root: str, checkpoint: str,
                               schema: str,
                               null_rate_jump: float = 0.05,
                               distinct_ratio_band: tuple[float, float]
                               = (0.5, 2.0)):
    """Streaming ingestion observability: every microbatch's per-column
    profile (operators/profiling.py — ONE map-side-combined agg over
    the batch) appends to a ``profile_history`` table keyed
    ``(epoch, column)``, and each batch after the first is
    drift-compared against the PREVIOUS batch's stored profile —
    null-rate jumps / cardinality collapse land in ``profile_drift``
    with the epoch that tripped them.

    This is the monitoring twin of the dedup/quality gates: the same
    foreachBatch + PK-upsert shape (replays are no-ops), with profile
    rows |columns|-sized regardless of batch volume, so the monitor's
    own cost never scales with the delivery. Returns the started query
    (``trigger(availableNow=True)``)."""
    from pyspark.sql import functions as SF

    from zacks_estimates_financial_statements_spark.operators import profiling
    from zacks_estimates_financial_statements_spark.operators.writer import TableStore

    history = TableStore(spark, tables_root, "profile_history")
    drift = TableStore(spark, tables_root, "profile_drift")

    def _monitor(batch_df: DataFrame, epoch: int) -> None:
        if batch_df.isEmpty():
            return
        prof = (profiling.profile_table(batch_df)
                .localCheckpoint(eager=True))
        if history.exists():
            prev = history.read()
            last = prev.agg(SF.max("epoch").alias("m")).collect()[0]["m"]
            flags = profiling.profile_drift(
                prev.filter(SF.col("epoch") == last).drop("epoch"),
                prof, null_rate_jump, distinct_ratio_band)
            bad = flags.filter(SF.col("null_drift")
                               | SF.col("distinct_drift")
                               | SF.col("added") | SF.col("removed"))
            if not bad.isEmpty():
                drift.upsert_ignore(
                    bad.withColumn("epoch", SF.lit(epoch)),
                    pk=("epoch", "column"))
        history.upsert_ignore(prof.withColumn("epoch", SF.lit(epoch)),
                              pk=("epoch", "column"))

    docs = (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .json(input_glob))
    return (docs.writeStream
            .foreachBatch(_monitor)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def _schedule_fn(interval_us: int, key_name: str, id_name: str):
    import pandas as pd

    def fn(key, pdfs, state: GroupState):
        (k,) = key
        rows = []
        for pdf in pdfs:
            for i, t in zip(pdf[id_name], pdf["__arr_us"]):
                rows.append((int(t), i))
        rows.sort()
        if state.exists:
            last_sched, pos = state.get
        else:
            last_sched, pos = None, 0
        out = []
        for arr, i in rows:
            sched = arr if last_sched is None else \
                max(arr, last_sched + interval_us)
            out.append({key_name: k, id_name: i, "arrival_us": arr,
                        "sched_us": sched, "wait_us": sched - arr,
                        "position": pos})
            last_sched, pos = sched, pos + 1
        state.update((last_sched, pos))
        yield pd.DataFrame(out, columns=[key_name, id_name, "arrival_us",
                                         "sched_us", "wait_us",
                                         "position"])

    return fn


def schedule_fetches(df: DataFrame, key_col: str, id_col: str,
                     ts_col: str,
                     interval_sec: float = 10.0) -> DataFrame:
    """Streaming politeness scheduler — the live twin of
    ``functions.web.politeness_schedule`` (the reference's
    ``delay-interval`` loops, estimate-extract.rkt:89-98, as a
    continuous planner): each micro-batch's fetch requests are
    assigned dispatch times ≥ ``interval_sec`` after the key's
    previous one, with the last scheduled time and fetch position
    carried in ``applyInPandasWithState`` state — so the politeness
    contract holds ACROSS batches, which a per-batch window cannot do.

    On a batch DataFrame this delegates to the closed-form window
    plan (unified semantics, the ``dedup_events`` convention) — the
    oracle-checked path. Streaming caveat: a request arriving after a
    later-timestamped request was already scheduled cannot displace
    it (you can't dispatch in the past); within a batch rows sort by
    (arrival, id), so stream and batch agree whenever arrivals are
    batch-monotone. State is two BIGINTs per rate-limit key, evicted
    never (keys are hosts — bounded); no watermark needed.
    """
    from zacks_estimates_financial_statements_spark.functions.web import politeness_schedule
    from zacks_estimates_financial_statements_spark.util import ensure_package_on_executors

    if not df.isStreaming:
        return politeness_schedule(df, key_col, id_col, ts_col,
                                   interval_sec)
    ensure_package_on_executors(df.sparkSession)
    iv = int(round(interval_sec * 1_000_000))
    dts = dict(df.dtypes)
    out_schema = (f"{key_col} {dts[key_col]}, {id_col} {dts[id_col]}, "
                  "arrival_us bigint, sched_us bigint, wait_us bigint, "
                  "position bigint")
    # Same NULL-arrival AND NULL-id contract as the batch twin:
    # try_cast (ANSI safety), drop unparseable arrivals (no position)
    # and NULL ids (the tie-break column — engines order NULLs
    # differently, so a NULL id on a tied arrival is an ordering trap).
    prepared = (df.select(
        F.col(key_col), F.col(id_col),
        F.unix_micros(F.col(ts_col).try_cast("timestamp"))
        .alias("__arr_us"))
        .where(F.col("__arr_us").isNotNull()
               & F.col(id_col).isNotNull()))
    return (prepared.groupBy(key_col)
            .applyInPandasWithState(
                _schedule_fn(iv, key_col, id_col),
                outputStructType=out_schema,
                stateStructType="last_sched_us bigint, position bigint",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))

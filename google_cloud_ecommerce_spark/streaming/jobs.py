"""Structured Streaming jobs — the reference's streaming pipeline
(Pub/Sub -> Beam ParDo -> BigQuery, ``write_session_stream.py:100-113``)
plus the stateful layer it lacked (SURVEY.md §2.9 T5: "reference has
none — streaming job is stateless; all windowed aggs were done later in
BigQuery").

Each job runs the file-replay source to completion with an availableNow
trigger into a memory sink, which makes the result deterministic — so
these queries() entries carry REAL DuckDB oracles (stream ≡ batch is
checked by the same comparator as everything else, not a weaker
rows-only pass). The streaming plan is identical to what would run
unbounded against Kafka; only the source/trigger/sink bindings are
test-harness choices.

(Spark 4's transformWithState[InPandas] is the successor API for the
custom-state job below; its driver-side state server requires the
protobuf runtime, absent in this container, so the operator stays on
applyInPandasWithState — same semantics, same state bounds.)

Design anchor: "Structured Streaming: A Declarative API for Real-Time
Applications in Apache Spark" (SIGMOD 2018) — the same logical plan
serves batch and stream, with incrementalization, watermarks, and
exactly-once sink epochs handled by the engine; these jobs lean on
exactly that contract (the batch SQL oracle IS the streaming spec).

Scale posture: watermark + windowed aggs keep state bounded per key;
sessionization state is per live session; dedup state is bounded by the
watermark horizon. Nothing here collects to the driver except the
memory sink, which in production becomes parquet/Kafka via
``foreachBatch`` (exactly-once per sink epoch).
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from google_cloud_ecommerce_spark.streaming.replay import (
    read_replay_stream,
    write_replay_dir,
)


def _pin_result(df: DataFrame) -> DataFrame:
    """Materialize a bounded streaming result EXECUTOR-side: one
    parquet write to a fresh result dir (cleaned at process exit),
    read back as a plain scan. Replaces the old driver-side
    ``createDataFrame(df.collect(), schema)`` pinning — the result
    never rides through the driver, so the harness shape still holds
    when the "bounded" result is millions of rows, while the replay /
    checkpoint temp dirs it was derived from can be removed."""
    import atexit
    import tempfile

    out = tempfile.mkdtemp(prefix="spark_graft_stream_result_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    df.write.mode("overwrite").parquet(out)
    return df.sparkSession.read.parquet(out)


def _run_to_memory(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Drive a streaming frame to completion; return the result table."""
    name = f"stream_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        if q.isActive:  # pragma: no cover - defensive
            q.stop()
    return stream_df.sparkSession.table(name)


# ---------------------------------------------------------------------------
# T4 upgrade — the stateless transform + aggregation, streaming. Same
# logical plan as batch Q1 (our unified-path win over the reference's
# two codebases).
# ---------------------------------------------------------------------------


def streaming_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    replay = write_replay_dir(spark, sf_dir, n_files=8)
    try:
        stream = read_replay_stream(spark, replay)
        agg = stream.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
            F.count("*").alias("n_events")
        )
        return _run_to_memory(agg, "complete")
    finally:
        shutil.rmtree(replay, ignore_errors=True)


# ---------------------------------------------------------------------------
# T5 — watermark + tumbling event-time window (the stateful layer the
# reference pushed to its warehouse).
# ---------------------------------------------------------------------------


def streaming_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    replay = write_replay_dir(spark, sf_dir, n_files=8)
    try:
        stream = read_replay_stream(spark, replay)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
            )
            .select(
                # string render, not raw TimestampType: collect() localizes
                # timestamps to the PROCESS tz; date_format is session-TZ
                # stable, so the comparator sees UTC wherever it runs
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                "event_type",
                "n_events",
                "sum_value",
            )
        )
        return _run_to_memory(agg, "complete")
    finally:
        shutil.rmtree(replay, ignore_errors=True)


# ---------------------------------------------------------------------------
# T5 — session windows (Q6's sessionization as a native streaming op).
# 30-minute inactivity gap; session_window starts a new session when the
# gap is >= the timeout (an event at exactly prev+30min falls outside
# the [start, last+30min) window) — the oracle encodes the same >=.
# ---------------------------------------------------------------------------


def streaming_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    replay = write_replay_dir(spark, sf_dir, n_files=8)
    try:
        stream = read_replay_stream(spark, replay)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
                "n_events",
            )
        )
        return _run_to_memory(agg, "complete")
    finally:
        shutil.rmtree(replay, ignore_errors=True)


# ---------------------------------------------------------------------------
# T3 upgrade — at-least-once delivery (overlapping chunk replay) made
# exactly-once with streaming dropDuplicates, replacing the reference's
# "per-message publish, no dedup, WRITE_APPEND".
# ---------------------------------------------------------------------------


def streaming_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    replay = write_replay_dir(spark, sf_dir, n_files=8, overlap_every=5)
    try:
        stream = read_replay_stream(spark, replay)
        deduped = stream.dropDuplicates(["event_id"])
        agg = deduped.groupBy("event_type").agg(F.count("*").alias("n_events"))
        return _run_to_memory(agg, "complete")
    finally:
        shutil.rmtree(replay, ignore_errors=True)


# ---------------------------------------------------------------------------
# Custom stateful operator — applyInPandasWithState sessionization.
# Where session_window gives fixed gap-close semantics, this is the
# arbitrary-user-state form (SURVEY.md §2.9 / pyspark guide: "custom
# stateful operators"): per-user state is (session_start_us, last_us,
# n_events); a completed session is emitted the moment an event arrives
# past the 30-minute gap. A per-user flush sentinel injected after the
# last real chunk closes every open session, which makes the streaming
# result total — and therefore oracle-checkable against the batch
# sessionization SQL, not just rows-only.
#
# Scale posture: state is O(live sessions) and keyed by user_id — the
# state store shards with the shuffle partitioning; nothing global. In
# production the sentinel's job is done by a processing-time timeout
# (GroupStateTimeout.ProcessingTimeTimeout); the sentinel keeps the test
# deterministic.
# ---------------------------------------------------------------------------

SESSION_GAP_US = 30 * 60 * 1_000_000
FLUSH_TYPE = "__flush__"

_SESSION_STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"
# session_start is a pre-rendered string (not TimestampType): the epoch
# micros are formatted directly in pandas with no tz conversion anywhere,
# so the value survives any session/process timezone combination.
_SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start string, n_events bigint, span_seconds double"
)


def _session_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values(["us", "event_id"])
    open_sess = tuple(state.get) if state.exists else None
    emitted: list[tuple[int, int, int]] = []
    for us, etype in zip(rows["us"], rows["event_type"]):
        us = int(us)
        if etype == FLUSH_TYPE:
            if open_sess is not None:
                emitted.append(open_sess)
                open_sess = None
        elif open_sess is None:
            open_sess = (us, us, 1)
        elif us - open_sess[1] >= SESSION_GAP_US:
            emitted.append(open_sess)
            open_sess = (us, us, 1)
        else:
            open_sess = (open_sess[0], us, open_sess[2] + 1)
    if open_sess is not None:
        state.update(open_sess)
    elif state.exists:
        state.remove()
    if emitted:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(emitted),
                "session_start": [
                    pd.Timestamp(s[0], unit="us").strftime("%Y-%m-%d %H:%M:%S.%f")
                    for s in emitted
                ],
                "n_events": [s[2] for s in emitted],
                # exact IEEE division of int by 1e6 — bitwise equal across
                # engines, no decimal-rounding tie-break to disagree on
                "span_seconds": [(s[1] - s[0]) / 1_000_000 for s in emitted],
            }
        )


def _write_flush_chunk(spark: SparkSession, replay_dir: str, sf_dir: str) -> None:
    """One sentinel event per user, 31 min past the global max ts —
    written last so it is the final replayed chunk."""
    from google_cloud_ecommerce_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    flush = (
        events.groupBy("user_id")
        .agg(F.max(F.unix_micros("ts")).alias("max_us"))
        .select(
            (-F.col("user_id")).alias("event_id"),
            F.expr("timestamp_micros(max_us + 1860000000)").alias("ts"),
            "user_id",
            F.lit(FLUSH_TYPE).alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )
    import glob as _glob

    tmp = os.path.join(replay_dir, "_stage_flush")
    flush.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(replay_dir, "chunk-zzzz-flush.parquet"))
    shutil.rmtree(tmp)


def streaming_session_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    replay = write_replay_dir(spark, sf_dir, n_files=8)
    try:
        _write_flush_chunk(spark, replay, sf_dir)
        stream = read_replay_stream(spark, replay).select(
            "user_id", "event_id", F.unix_micros("ts").alias("us"), "event_type"
        )
        sessions = stream.groupBy("user_id").applyInPandasWithState(
            _session_state_fn,
            outputStructType=_SESSION_OUTPUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        return _run_to_memory(sessions, "append")
    finally:
        shutil.rmtree(replay, ignore_errors=True)


# ---------------------------------------------------------------------------
# Stream-stream join — views joined to purchases of the same user within
# the prior hour, both sides unbounded streams. The event-time range
# condition + watermarks is what bounds the join state: a buffered view
# is evictable once the watermark passes v_ts + 1h (no purchase can
# still match it). The replay is globally time-ordered, so the watermark
# always trails the batch being processed and no match is lost — the
# inner join drains to exactly the batch join result (the oracle).
# ---------------------------------------------------------------------------


def streaming_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    replay = write_replay_dir(spark, sf_dir, n_files=8)
    try:
        stream = read_replay_stream(spark, replay)
        views = (
            stream.filter(F.col("event_type") == "view")
            .select(
                F.col("event_id").alias("view_event_id"),
                F.col("user_id").alias("v_user_id"),
                F.col("ts").alias("v_ts"),
            )
            .withWatermark("v_ts", "10 minutes")
        )
        purchases = (
            stream.filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_event_id"),
                "user_id",
                F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", "10 minutes")
        )
        joined = purchases.join(
            views,
            F.expr(
                "user_id = v_user_id AND v_ts >= p_ts - INTERVAL 1 HOUR AND v_ts < p_ts"
            ),
        ).select("purchase_event_id", "view_event_id", "user_id")
        return _run_to_memory(joined, "append")
    finally:
        shutil.rmtree(replay, ignore_errors=True)


# ---------------------------------------------------------------------------
# Stream-stream LEFT OUTER join — purchase attribution where the
# UNMATCHED purchases (no view in the prior hour) must also emit, with
# a NULL view id. Outer rows can only be released when the watermark
# PROVES no match can still arrive (wm > p_ts), so the replay appends a
# sentinel chunk 2 h past the global max on BOTH sides: it advances
# each side's watermark beyond every real purchase, and the engine's
# no-data finalization batch then evicts-and-emits the null rows. The
# sentinels themselves (user_id = -1, equal timestamps, so the
# interval predicate can't self-match) are filtered from the output.
# State size stays bounded by the 1 h interval + 10 min delay — the
# eviction that makes the join feasible on an unbounded stream is the
# same mechanism that releases the outer rows.
# ---------------------------------------------------------------------------


def streaming_purchase_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    replay = write_replay_dir(spark, sf_dir, n_files=8)
    try:
        _write_join_flush_chunk(spark, replay, sf_dir)
        stream = read_replay_stream(spark, replay)
        views = (
            stream.filter(F.col("event_type") == "view")
            .select(
                F.col("event_id").alias("view_event_id"),
                F.col("user_id").alias("v_user_id"),
                F.col("ts").alias("v_ts"),
            )
            .withWatermark("v_ts", "10 minutes")
        )
        purchases = (
            stream.filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_event_id"),
                "user_id",
                F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", "10 minutes")
        )
        joined = purchases.join(
            views,
            F.expr(
                "user_id = v_user_id AND v_ts >= p_ts - INTERVAL 1 HOUR AND v_ts < p_ts"
            ),
            "left_outer",
        ).select("purchase_event_id", "view_event_id", "user_id")
        # Sentinels are filtered on the SINK result, not in the streaming
        # plan: a stream-side filter on user_id gets pushed below the
        # purchase watermark node, the sentinel then never reaches it,
        # and the stalled watermark strands the last outer rows in state.
        return _run_to_memory(joined, "append").filter(F.col("user_id") >= 0)
    finally:
        shutil.rmtree(replay, ignore_errors=True)


def _write_join_flush_chunk(spark: SparkSession, replay_dir: str, sf_dir: str) -> None:
    """TWO sentinel chunks (view + purchase each), 2 h and 4 h past the
    global max ts, equal timestamps per chunk (un-joinable under the
    strict v_ts < p_ts predicate). Two because outer-row emission lags
    the watermark by one batch: the wm advanced by sentinel 1 only
    evicts-and-emits while a LATER batch is running, and availableNow
    does not run a trailing no-data batch — sentinel 2 is that later
    batch."""
    from google_cloud_ecommerce_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    import glob as _glob

    for i, bump_us in enumerate((7_200_000_000, 14_400_000_000)):
        flush = (
            events.agg(F.max(F.unix_micros("ts")).alias("max_us"))
            .select(
                F.explode(F.array(F.lit("view"), F.lit("purchase"))).alias("event_type"),
                "max_us",
            )
            .select(
                F.lit(-1 - i).cast("long").alias("event_id"),
                F.expr(f"timestamp_micros(max_us + {bump_us})").alias("ts"),
                F.lit(-1).cast("long").alias("user_id"),
                "event_type",
                F.lit(0.0).alias("value"),
                F.lit(None).cast("string").alias("props"),
            )
        )
        tmp = os.path.join(replay_dir, "_stage_join_flush")
        flush.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(replay_dir, f"chunk-zzzz{i}-flush.parquet"))
        shutil.rmtree(tmp)


# ---------------------------------------------------------------------------
# Stream-static enrichment — the Beam side-input pattern
# (`/root/reference/streaming_pipeline/write_session_stream.py:105-106`
# enriches each message against fixed column metadata). Here the static
# side is a literal dimension broadcast onto the stream; the stream
# never shuffles for the lookup, and the pattern is identical with a
# parquet/Delta dim table that is re-read per micro-batch.
# ---------------------------------------------------------------------------


def streaming_band_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from google_cloud_ecommerce_spark.queries.joins import VALUE_BANDS

    replay = write_replay_dir(spark, sf_dir, n_files=8)
    try:
        stream = read_replay_stream(spark, replay)
        bands = spark.createDataFrame(
            [(n, lo, hi) for n, lo, hi in VALUE_BANDS],
            "band string, lo double, hi double",
        )
        cond = (F.col("value") >= F.col("lo")) & (
            F.col("hi").isNull() | (F.col("value") < F.col("hi"))
        )
        agg = (
            stream.join(F.broadcast(bands), cond)
            .groupBy("band", "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
            )
        )
        return _run_to_memory(agg, "complete")
    finally:
        shutil.rmtree(replay, ignore_errors=True)


QUERIES = {
    "streaming_daily_events": streaming_daily_events,
    "streaming_hourly_window": streaming_hourly_window,
    "streaming_sessionization": streaming_sessionization,
    "streaming_dedup_counts": streaming_dedup_counts,
    "streaming_session_state": streaming_session_state,
    "streaming_view_purchase_join": streaming_view_purchase_join,
    "streaming_purchase_attribution_outer": streaming_purchase_attribution_outer,
    "streaming_band_enrichment": streaming_band_enrichment,
}

ORACLE = {
    # stream ≡ batch: the oracles are the BATCH semantics on the same rows.
    "streaming_purchase_attribution_outer": """
        SELECT p.event_id AS purchase_event_id, v.event_id AS view_event_id,
               p.user_id
        FROM events p LEFT JOIN events v
          ON v.event_type = 'view' AND v.user_id = p.user_id
         AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
        WHERE p.event_type = 'purchase'
    """,
    "streaming_band_enrichment": """
        SELECT band, event_type, count(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM events JOIN (VALUES
            ('low', 0.0, 50.0), ('mid', 50.0, 200.0),
            ('high', 200.0, 500.0), ('premium', 500.0, NULL)
        ) AS bands(band, lo, hi)
          ON value >= lo AND (hi IS NULL OR value < hi)
        GROUP BY 1, 2
    """,
    "streaming_daily_events": """
        SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n_events
        FROM events GROUP BY 1, 2
    """,
    "streaming_hourly_window": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
               count(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "streaming_sessionization": """
        WITH ev AS (
            SELECT user_id, ts, epoch_us(ts) AS us FROM events
        ), flagged AS (
            SELECT *, CASE WHEN COALESCE(us - lag(us) OVER w, 9223372036854775807)
                                >= 1800000000 THEN 1 ELSE 0 END AS is_new
            FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us)
        ), sess AS (
            SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                                        ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
               count(*) AS n_events
        FROM sess GROUP BY user_id, session_id
    """,
    "streaming_dedup_counts": """
        SELECT event_type, count(*) AS n_events FROM events GROUP BY 1
    """,
    # stream ≡ batch for the custom stateful operator too: every session
    # closes (flush sentinel), so the full batch sessionization is the oracle.
    "streaming_session_state": """
        WITH ev AS (
            SELECT user_id, ts, epoch_us(ts) AS us FROM events
        ), flagged AS (
            SELECT *, CASE WHEN COALESCE(us - lag(us) OVER w, 9223372036854775807)
                                >= 1800000000 THEN 1 ELSE 0 END AS is_new
            FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us)
        ), sess AS (
            SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                                        ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
               count(*) AS n_events,
               (max(us) - min(us)) / 1000000.0 AS span_seconds
        FROM sess GROUP BY user_id, session_id
    """,
    # stream-stream inner join drains to the batch join (see docstring).
    "streaming_view_purchase_join": """
        SELECT p.event_id AS purchase_event_id, v.event_id AS view_event_id,
               p.user_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id
         AND v.ts >= p.ts - INTERVAL 1 HOUR
         AND v.ts < p.ts
    """,
}


# ---------------------------------------------------------------------------
# Incremental materialized view — foreachBatch upsert. The reference
# appended raw rows to BigQuery and re-ran aggregates in the warehouse;
# the scalable streaming pattern maintains the AGGREGATE incrementally:
# each micro-batch contributes a partial aggregate, merged into a
# versioned state table (the parquet stand-in for MERGE INTO on a
# Delta/Iceberg table). Merging is a union + re-aggregate over
# DECIMAL partials — commutative and associative, so the final view is
# independent of batch boundaries and arrival order; the DuckDB oracle
# over the raw events proves final state ≡ full batch aggregate.
# ---------------------------------------------------------------------------


def streaming_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    replay = write_replay_dir(spark, sf_dir, n_files=8)
    state_root = tempfile.mkdtemp(prefix="mv_state_")
    checkpoint = tempfile.mkdtemp(prefix="mv_ckpt_")
    latest: dict[str, str] = {}

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        s = batch_df.sparkSession
        partial = batch_df.groupBy(
            F.to_date("ts").alias("day"), "event_type"
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sv"),
        )
        if "dir" in latest:
            current = s.read.parquet(latest["dir"])
            merged = (
                current.unionByName(partial)
                .groupBy("day", "event_type")
                .agg(F.sum("n_events").alias("n_events"), F.sum("sv").alias("sv"))
            )
        else:
            merged = partial
        out = os.path.join(state_root, f"v{epoch_id}")
        merged.write.mode("overwrite").parquet(out)
        latest["dir"] = out

    try:
        q = (
            read_replay_stream(spark, replay)
            .writeStream.foreachBatch(upsert)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        final = spark.read.parquet(latest["dir"]).select(
            "day",
            "event_type",
            "n_events",
            F.col("sv").cast("double").alias("sum_value"),
        )
        return _pin_result(final)
    finally:
        shutil.rmtree(replay, ignore_errors=True)
        shutil.rmtree(state_root, ignore_errors=True)
        shutil.rmtree(checkpoint, ignore_errors=True)


QUERIES["streaming_incremental_mv"] = streaming_incremental_mv
ORACLE["streaming_incremental_mv"] = """
    SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Chained stateful aggregations (Spark 3.4+): a 15-minute pre-aggregate
# rolled up to hourly INSIDE one streaming query — two watermark-gated
# stateful operators back to back. This is the streaming form of the
# partial/final aggregate split: the 15-min layer bounds per-key state
# and shrinks the rollup's input by ~n_events/4 rows per hour per type.
# Append mode only finalizes a window once the watermark passes it, and
# window emission lags the watermark by one batch, so the replay gets
# the same TWO trailing flush chunks streaming_purchase_attribution_outer
# needs (sentinel event_type, filtered from the SINK result — a
# stream-side filter would be pushed below the watermark node).
# ---------------------------------------------------------------------------


def streaming_two_level_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from google_cloud_ecommerce_spark.catalog import load_table

    replay = write_replay_dir(spark, sf_dir, n_files=8)
    try:
        import glob as _glob

        events = load_table(spark, sf_dir, "events")
        # Flush chunks must land as FLAT chunk-*.parquet files (the file
        # source does not descend into write-produced subdirectories) and
        # after the real chunks in modification order.
        for i, bump_us in enumerate((7_200_000_000, 14_400_000_000)):
            flush = events.agg(F.max(F.unix_micros("ts")).alias("max_us")).select(
                F.lit(-1 - i).cast("long").alias("event_id"),
                F.expr(f"timestamp_micros(max_us + {bump_us})").alias("ts"),
                F.lit(-1).cast("long").alias("user_id"),
                F.lit("__flush__").alias("event_type"),
                F.lit(0.0).alias("value"),
                F.lit(None).cast("string").alias("props"),
            )
            tmp = os.path.join(replay, "_stage_tlw_flush")
            flush.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            shutil.move(part, os.path.join(replay, f"chunk-zzzz{i}-flush.parquet"))
            shutil.rmtree(tmp)

        stream = read_replay_stream(spark, replay)
        lvl1 = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "15 minutes").alias("w15"), "event_type")
            .agg(
                F.count("*").alias("n1"),
                F.sum(F.col("value").cast("decimal(18,4)")).alias("sv"),
            )
        )
        lvl2 = (
            lvl1.groupBy(F.window(F.col("w15"), "1 hour").alias("w60"), "event_type")
            .agg(F.sum("n1").alias("n_events"), F.sum("sv").alias("sv"))
        )
        sunk = _run_to_memory(lvl2, "append")
        return sunk.filter(F.col("event_type") != "__flush__").select(
            F.date_format("w60.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            F.col("sv").cast("double").alias("sum_value"),
        )
    finally:
        shutil.rmtree(replay, ignore_errors=True)


QUERIES["streaming_two_level_window"] = streaming_two_level_window
ORACLE["streaming_two_level_window"] = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Stream-stream FULL OUTER join — completes the streaming join surface
# (inner + left-outer exist above). Same watermark/time-bound geometry
# as the left-outer job; now BOTH sides' unmatched rows emit with nulls
# once the watermark passes them, so user_id has to coalesce across
# sides. The two flush chunks (view + purchase, un-joinable equal
# timestamps) advance the watermark for both states; their rows surface
# as unmatched sentinels and are filtered from the SINK result
# (user_id >= 0) — never in the streaming plan, where the filter would
# be pushed below a watermark node and stall it.
# ---------------------------------------------------------------------------


def streaming_view_purchase_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    replay = write_replay_dir(spark, sf_dir, n_files=8)
    try:
        _write_join_flush_chunk(spark, replay, sf_dir)
        stream = read_replay_stream(spark, replay)
        views = (
            stream.filter(F.col("event_type") == "view")
            .select(
                F.col("event_id").alias("view_event_id"),
                F.col("user_id").alias("v_user_id"),
                F.col("ts").alias("v_ts"),
            )
            .withWatermark("v_ts", "10 minutes")
        )
        purchases = (
            stream.filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_event_id"),
                F.col("user_id").alias("p_user_id"),
                F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", "10 minutes")
        )
        joined = purchases.join(
            views,
            F.expr(
                "p_user_id = v_user_id AND v_ts >= p_ts - INTERVAL 1 HOUR AND v_ts < p_ts"
            ),
            "full_outer",
        ).select(
            "purchase_event_id",
            "view_event_id",
            F.coalesce(F.col("p_user_id"), F.col("v_user_id")).alias("user_id"),
        )
        return _run_to_memory(joined, "append").filter(F.col("user_id") >= 0)
    finally:
        shutil.rmtree(replay, ignore_errors=True)


QUERIES["streaming_view_purchase_full_outer"] = streaming_view_purchase_full_outer
ORACLE["streaming_view_purchase_full_outer"] = """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view')
    SELECT p.event_id AS purchase_event_id, v.event_id AS view_event_id,
           COALESCE(p.user_id, v.user_id) AS user_id
    FROM p FULL OUTER JOIN v
      ON p.user_id = v.user_id AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
"""


# ---------------------------------------------------------------------------
# Update output mode — the third sink mode (complete/append above):
# each micro-batch emits only the groups that CHANGED. A memory sink
# accumulates one row per (key, change), so the materialized view is
# the LAST update per key — recovered batch-side with a struct-max
# argmax over the per-batch monotone count (same pattern as
# changelog_compaction). In production this backs an upsert sink
# (foreachBatch MERGE keyed on event_type).
# ---------------------------------------------------------------------------


def streaming_update_mode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    replay = write_replay_dir(spark, sf_dir, n_files=8)
    try:
        stream = read_replay_stream(spark, replay)
        agg = stream.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sv"),
        )
        sunk = _run_to_memory(agg, "update")
        # counts grow monotonically, so max(struct(n_events, sv)) is the
        # final state of each key
        return (
            sunk.groupBy("event_type")
            .agg(F.max(F.struct("n_events", "sv")).alias("last"))
            .select(
                "event_type",
                F.col("last.n_events").alias("n_events"),
                F.col("last.sv").cast("double").alias("sum_value"),
            )
        )
    finally:
        shutil.rmtree(replay, ignore_errors=True)


QUERIES["streaming_update_mode_counts"] = streaming_update_mode_counts
ORACLE["streaming_update_mode_counts"] = """
    SELECT event_type, count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# T3 upgrade, bounded-state form — dropDuplicatesWithinWatermark chained
# into a daily windowed aggregate. Where streaming_dedup_counts keeps
# every seen key forever (exact, unbounded state), the within-watermark
# variant keeps a key only while the watermark can still admit a
# duplicate of it — O(keys per watermark horizon) state, the only dedup
# that survives an unbounded stream. The replay's duplicates arrive one
# chunk late, so each one is either still inside the horizon (dropped by
# dedup state) or already behind the watermark (dropped as late): both
# paths converge on exactly-once, which is what makes the batch DISTINCT
# the oracle. Two flush chunks push the watermark past the last real
# day so append mode finalizes every window (same sentinel geometry as
# streaming_two_level_window; filtered at the SINK, never in-plan).
# ---------------------------------------------------------------------------


def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from google_cloud_ecommerce_spark.catalog import load_table

    replay = write_replay_dir(spark, sf_dir, n_files=8, overlap_every=5)
    try:
        import glob as _glob

        events = load_table(spark, sf_dir, "events")
        for i, bump_us in enumerate((7_200_000_000, 14_400_000_000)):
            flush = events.agg(F.max(F.unix_micros("ts")).alias("max_us")).select(
                F.lit(-1 - i).cast("long").alias("event_id"),
                F.expr(f"timestamp_micros(max_us + {bump_us})").alias("ts"),
                F.lit(-1).cast("long").alias("user_id"),
                F.lit("__flush__").alias("event_type"),
                F.lit(0.0).alias("value"),
                F.lit(None).cast("string").alias("props"),
            )
            tmp = os.path.join(replay, "_stage_ddw_flush")
            flush.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            shutil.move(part, os.path.join(replay, f"chunk-zzzz{i}-flush.parquet"))
            shutil.rmtree(tmp)

        stream = read_replay_stream(spark, replay)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark(["event_id"])
            .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"))
        )
        sunk = _run_to_memory(agg, "append")
        return sunk.filter(F.col("event_type") != "__flush__").select(
            F.date_format("w.start", "yyyy-MM-dd").alias("day"),
            "event_type",
            "n_events",
        )
    finally:
        shutil.rmtree(replay, ignore_errors=True)


QUERIES["streaming_dedup_within_watermark"] = streaming_dedup_within_watermark
ORACLE["streaming_dedup_within_watermark"] = """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
           count(*) AS n_events
    FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Streaming vector search — the retrieval-serving shape: query vectors
# arrive as a stream (one per micro-batch here, modeling paced
# requests) and are scored against the STATIC corpus inside
# foreachBatch; per-query exact top-k appends to the result sink. The
# corpus side is the batch similarity_topk plan (queries broadcast,
# corpus never shuffled), so the streaming job inherits its scale
# posture per batch — and because top-k is per query, batch-at-a-time
# results equal the all-at-once batch run, which is why this entry
# carries similarity_topk's REAL oracle rather than a rows-only check.
# ---------------------------------------------------------------------------


def streaming_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql.window import Window

    from google_cloud_ecommerce_spark.operators._common import dot_expr
    from google_cloud_ecommerce_spark.operators.similarity import (
        N_QUERY_VECS,
        TOP_K,
        _emb,
        _with_norm,
    )

    qdir = tempfile.mkdtemp(prefix="spark_graft_qvecs_")
    out_root = tempfile.mkdtemp(prefix="spark_graft_simout_")
    out = os.path.join(out_root, "topk")
    checkpoint = tempfile.mkdtemp(prefix="spark_graft_simckpt_")
    try:
        emb = _emb(spark, sf_dir)
        # one file per query vector -> one request per micro-batch.
        # ONE partitioned write (repartition on vec_id puts each query
        # in exactly one task, so each vec_id=... dir holds one file),
        # not a driver loop of N separate write jobs.
        (
            emb.filter(F.col("vec_id") < N_QUERY_VECS)
            .repartition(N_QUERY_VECS, "vec_id")
            .write.mode("overwrite")
            .partitionBy("vec_id")
            .parquet(qdir)
        )

        corpus = _with_norm(emb)

        def score_batch(batch_df: DataFrame, epoch_id: int) -> None:
            q = _with_norm(batch_df).select(
                F.col("vec_id").alias("q_id"),
                F.col("v").alias("qv"),
                F.col("norm").alias("qnorm"),
            )
            scored = corpus.join(
                F.broadcast(q), F.col("vec_id") != F.col("q_id")
            ).withColumn(
                "cos",
                F.expr(f"{dot_expr('qv', 'v')}") / (F.col("qnorm") * F.col("norm")),
            )
            w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
            (
                scored.withColumn("rank", F.row_number().over(w).cast("long"))
                .filter(F.col("rank") <= TOP_K)
                .select(
                    "q_id",
                    F.col("vec_id").alias("neighbor_id"),
                    "rank",
                    F.round("cos", 4).alias("cosine"),
                )
                .write.mode("append")
                .parquet(out)
            )

        stream = (
            spark.readStream.schema("vec_id bigint, v array<double>, label int")
            .option("maxFilesPerTrigger", 1)
            .parquet(qdir)
        )
        q = (
            stream.writeStream.foreachBatch(score_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        final = spark.read.parquet(out)
        return _pin_result(final)
    finally:
        shutil.rmtree(qdir, ignore_errors=True)
        shutil.rmtree(out_root, ignore_errors=True)
        shutil.rmtree(checkpoint, ignore_errors=True)


QUERIES["streaming_similarity_topk"] = streaming_similarity_topk


def _streaming_similarity_sql() -> str:
    from google_cloud_ecommerce_spark.operators.similarity import _similarity_topk_sql

    return _similarity_topk_sql()


ORACLE["streaming_similarity_topk"] = _streaming_similarity_sql()


# ---------------------------------------------------------------------------
# Streaming corpus prep — the LLM-data pipeline's gate+dedup stage as
# a stream: documents arrive in doc_id-ordered chunks WITH duplicate
# redeliveries (at-least-once), pass the same integer-exact quality
# gates as the batch pretraining_corpus_prep (the repetition gate is
# recomputed as a PER-ROW array expression, so the streaming plan needs
# no pre-aggregation), get exactly-once'd by content digest
# (dropDuplicates state), and roll up per language. The oracle IS the
# batch prep's SQL — stream == batch, duplicates and all, because
# chunks arrive in doc_id order so first-seen == min-doc_id keeper.
# ---------------------------------------------------------------------------


def streaming_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob
    import tempfile

    from google_cloud_ecommerce_spark.catalog import load_table
    from google_cloud_ecommerce_spark.operators._common import tokens_expr
    from google_cloud_ecommerce_spark.operators.pipeline import CHUNK_STRIDE, MIN_TOKENS

    replay = tempfile.mkdtemp(prefix="spark_graft_docs_")
    docs = load_table(spark, sf_dir, "documents")
    n_files = 6
    n = docs.count()
    per = -(-n // n_files)
    for i in range(n_files):
        chunk = docs.filter(
            (F.col("doc_id") >= i * per) & (F.col("doc_id") < (i + 1) * per)
        )
        if i > 0:  # redeliver every 5th doc of the previous chunk
            dup = docs.filter(
                (F.col("doc_id") >= (i - 1) * per)
                & (F.col("doc_id") < i * per)
                & (F.col("doc_id") % 5 == 0)
            )
            chunk = chunk.unionByName(dup)
        stage = os.path.join(replay, f"_stage_{i}")
        chunk.coalesce(1).write.mode("overwrite").parquet(stage)
        part = _glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(replay, f"chunk-{i:04d}.parquet"))
        shutil.rmtree(stage)

    try:
        stream = (
            spark.readStream.schema(
                "doc_id bigint, text string, lang string, source string, n_chars bigint"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(replay)
        )
        toks = stream.withColumn("toks", F.expr(tokens_expr("lower(text)")))
        # per-row forms of the batch gates (identical integer semantics)
        enriched = (
            toks.withColumn("n_tokens", F.expr("size(toks)").cast("long"))
            .withColumn("n_distinct", F.expr("size(array_distinct(toks))").cast("long"))
            .withColumn(
                "bigrams",
                F.expr(
                    "CASE WHEN size(toks) >= 2 THEN transform(sequence(1, size(toks) - 1), "
                    "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))) "
                    "ELSE array() END"
                ),
            )
            .withColumn("n_bigrams", F.expr("size(bigrams)").cast("long"))
            .withColumn(
                "max_rep",
                F.expr(
                    "CASE WHEN size(bigrams) = 0 THEN 0 ELSE "
                    "array_max(transform(array_distinct(bigrams), "
                    "b -> size(filter(bigrams, x -> x = b)))) END"
                ).cast("long"),
            )
        )
        gated = enriched.filter(
            (F.col("n_tokens") >= MIN_TOKENS)
            & (F.col("n_distinct") * 5 >= F.col("n_tokens"))
            & (F.col("max_rep") * 5 <= F.col("n_bigrams"))
        ).withColumn("digest", F.md5("text"))
        deduped = gated.dropDuplicates(["digest"])
        agg = deduped.groupBy("lang").agg(
            F.count("*").alias("n_docs"),
            F.sum(F.expr(f"(n_chars - 1) DIV {CHUNK_STRIDE} + 1")).alias("n_chunks"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        return _run_to_memory(agg, "complete")
    finally:
        shutil.rmtree(replay, ignore_errors=True)


QUERIES["streaming_corpus_prep"] = streaming_corpus_prep


def _streaming_corpus_prep_sql() -> str:
    from google_cloud_ecommerce_spark.operators.pipeline import (
        PRETRAINING_CORPUS_PREP_SQL,
    )

    return PRETRAINING_CORPUS_PREP_SQL


ORACLE["streaming_corpus_prep"] = _streaming_corpus_prep_sql()


# ---------------------------------------------------------------------------
# streaming_kmv_sketch — the K-Minimum-Values distinct-count sketch of
# queries/scale.py maintained INCREMENTALLY across micro-batches: each
# batch contributes its per-group k smallest key hashes, foreachBatch
# merges them into the persisted sketch (k smallest of the union), and
# the final estimate is read off the converged state. KMV's merge is
# associative and duplicate-insensitive (same key -> same md5 hash, so
# at-least-once redelivery across batches collapses in the distinct),
# which is exactly why the STREAMING sketch lands bit-identical to the
# BATCH sketch — the oracle IS the batch KMV SQL. This is the streaming
# distinct-count rollup a 100 TB pipeline runs instead of re-scanning
# history: per-batch state is k rows per group, not the key universe.
# ---------------------------------------------------------------------------


def streaming_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql.window import Window

    from google_cloud_ecommerce_spark.queries.scale import KMV_HASH_SPACE, KMV_K

    replay = write_replay_dir(spark, sf_dir, n_files=8)
    state_root = tempfile.mkdtemp(prefix="kmv_state_")
    checkpoint = tempfile.mkdtemp(prefix="kmv_ckpt_")
    latest: dict[str, str] = {}

    def _topk(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy("h")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= KMV_K)
            .select("event_type", "h")
        )

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        s = batch_df.sparkSession
        part = _topk(
            batch_df.select("event_type", "user_id")
            .distinct()
            .withColumn(
                "h",
                F.expr(
                    "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
                ),
            )
            .select("event_type", "h")
        )
        if "dir" in latest:
            merged = _topk(
                s.read.parquet(latest["dir"]).unionByName(part).distinct()
            )
        else:
            merged = part
        out = os.path.join(state_root, f"v{epoch_id}")
        merged.write.mode("overwrite").parquet(out)
        latest["dir"] = out

    try:
        q = (
            read_replay_stream(spark, replay)
            .writeStream.foreachBatch(upsert)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        sketch = spark.read.parquet(latest["dir"])
        per_group = sketch.groupBy("event_type").agg(
            F.count("*").alias("k_kept"), F.max("h").alias("h_k")
        )
        est = F.when(
            F.col("k_kept") < KMV_K, F.col("k_kept").cast("double")
        ).otherwise(
            F.lit(float(KMV_K - 1))
            / (F.col("h_k").cast("double") / F.lit(KMV_HASH_SPACE))
        )
        final = per_group.select(
            "event_type", "k_kept", "h_k", F.round(est, 4).alias("kmv_estimate")
        )
        return _pin_result(final)
    finally:
        shutil.rmtree(replay, ignore_errors=True)
        shutil.rmtree(state_root, ignore_errors=True)
        shutil.rmtree(checkpoint, ignore_errors=True)


QUERIES["streaming_kmv_sketch"] = streaming_kmv_sketch


def _streaming_kmv_oracle() -> str:
    from google_cloud_ecommerce_spark.queries.scale import KMV_USER_CARDINALITY_SQL

    return KMV_USER_CARDINALITY_SQL


ORACLE["streaming_kmv_sketch"] = _streaming_kmv_oracle()


# ---------------------------------------------------------------------------
# streaming_quantile_sketch — the deterministic bottom-k-by-hash
# quantile sample of queries/stats.value_quantile_sketch maintained
# INCREMENTALLY across micro-batches. Each batch contributes its
# per-group bottom-K rows by md5(event_id); foreachBatch merges them
# into the persisted sample (bottom-K of the union — the same min-wise
# closure KMV exploits), and exact per-group counts accumulate as a
# tiny side table. Because the sample is determined by the HASH ORDER
# of the keys (not arrival order), the converged streaming sketch is
# bit-identical to the batch sketch — the oracle IS the batch SQL.
# Per-batch state is K rows + one count per group, never the corpus.
# ---------------------------------------------------------------------------


def streaming_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql.window import Window

    from google_cloud_ecommerce_spark.queries.stats import (
        SKETCH_K,
        SKETCH_QUANTILES,
    )

    replay = write_replay_dir(spark, sf_dir, n_files=8)
    state_root = tempfile.mkdtemp(prefix="qsketch_state_")
    checkpoint = tempfile.mkdtemp(prefix="qsketch_ckpt_")
    latest: dict[str, str] = {}

    def _bottomk(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy("h", "event_id")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= SKETCH_K)
            .select("event_type", "event_id", "h", "v")
        )

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        s = batch_df.sparkSession
        out = os.path.join(state_root, f"v{epoch_id}")
        # Retry idempotence: if the checkpoint commit failed after a
        # successful write, the engine replays this epoch and
        # latest["dir"] already points at OUR OWN output — merging
        # against it would double-count this batch's n (the bottom-k
        # sample is retry-safe via union+distinct, counts are not).
        # Derive the parent from the PRE-batch state instead.
        parent = latest.get("dir")
        if parent == out:
            prev = os.path.join(state_root, f"v{epoch_id - 1}")
            parent = prev if os.path.isdir(prev) else None
        part = _bottomk(
            batch_df.select(
                "event_type", "event_id", F.col("value").cast("double").alias("v")
            ).withColumn("h", F.md5(F.col("event_id").cast("string")))
        )
        cnt = batch_df.groupBy("event_type").agg(F.count("*").alias("n"))
        if parent is not None:
            part = _bottomk(
                s.read.parquet(os.path.join(parent, "sample"))
                .unionByName(part)
                .distinct()
            )
            cnt = (
                s.read.parquet(os.path.join(parent, "counts"))
                .unionByName(cnt)
                .groupBy("event_type")
                .agg(F.sum("n").alias("n"))
            )
        part.write.mode("overwrite").parquet(os.path.join(out, "sample"))
        cnt.write.mode("overwrite").parquet(os.path.join(out, "counts"))
        latest["dir"] = out

    try:
        q = (
            read_replay_stream(spark, replay)
            .writeStream.foreachBatch(upsert)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        sample = spark.read.parquet(os.path.join(latest["dir"], "sample"))
        counts = spark.read.parquet(os.path.join(latest["dir"], "counts"))
        agg = sample.groupBy("event_type").agg(
            F.expr("array_sort(collect_list(v))").alias("sv"),
            F.count("*").cast("long").alias("n_sampled"),
        )
        final = agg.join(
            F.broadcast(
                counts.select(
                    "event_type", F.col("n").cast("long").alias("n_events")
                )
            ),
            "event_type",
        ).select(
            "event_type",
            "n_events",
            "n_sampled",
            *[
                F.expr(
                    f"element_at(sv, CAST(({num} * n_sampled + {den} - 1)"
                    f" DIV {den} AS INT))"
                ).alias(f"{name}_est")
                for name, num, den in SKETCH_QUANTILES
            ],
        )
        return _pin_result(final)
    finally:
        shutil.rmtree(replay, ignore_errors=True)
        shutil.rmtree(state_root, ignore_errors=True)
        shutil.rmtree(checkpoint, ignore_errors=True)


QUERIES["streaming_quantile_sketch"] = streaming_quantile_sketch


def _streaming_quantile_oracle() -> str:
    from google_cloud_ecommerce_spark.queries.stats import (
        VALUE_QUANTILE_SKETCH_SQL,
    )

    return VALUE_QUANTILE_SKETCH_SQL


ORACLE["streaming_quantile_sketch"] = _streaming_quantile_oracle()


# ---------------------------------------------------------------------------
# streaming_media_features — Python (Arrow) decode INSIDE Structured
# Streaming: the same real-WAV-parse mapInPandas iterator the batch
# media_features uses, applied per micro-batch over a document replay
# stream. mapInPandas is stateless, so stream output == batch output
# row-for-row and the entry carries the full batch oracle. This is the
# shape a production media-ingest stream has: decode runs where the
# bytes land, executor-side, micro-batch by micro-batch; nothing ever
# collects to the driver.
# ---------------------------------------------------------------------------


def streaming_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob
    import tempfile

    from google_cloud_ecommerce_spark.catalog import load_table
    from google_cloud_ecommerce_spark.operators.multimodal import (
        WAV_FEATURES_SCHEMA,
        wav_feature_batches,
    )

    replay = tempfile.mkdtemp(prefix="spark_graft_media_")
    docs = load_table(spark, sf_dir, "documents")
    n_files = 4
    # chunk by hash-mod of doc_id, NOT by id range: range chunking
    # assumes dense 0-based ids and silently drops docs beyond
    # n_files*per on sparse corpora
    for i in range(n_files):
        chunk = docs.filter(F.pmod(F.col("doc_id"), F.lit(n_files)) == i)
        stage = os.path.join(replay, f"_stage_{i}")
        chunk.coalesce(1).write.mode("overwrite").parquet(stage)
        part = _glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(replay, f"chunk-{i:04d}.parquet"))
        shutil.rmtree(stage)

    try:
        stream = (
            spark.readStream.schema(
                "doc_id bigint, text string, lang string, source string, n_chars bigint"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(replay)
        )
        feats = stream.select("doc_id", "n_chars").mapInPandas(
            wav_feature_batches, WAV_FEATURES_SCHEMA
        )
        return _run_to_memory(feats, "append")
    finally:
        shutil.rmtree(replay, ignore_errors=True)


QUERIES["streaming_media_features"] = streaming_media_features


def _streaming_media_features_oracle() -> str:
    from google_cloud_ecommerce_spark.operators.multimodal import (
        MEDIA_FEATURES_SQL,
    )

    return MEDIA_FEATURES_SQL


ORACLE["streaming_media_features"] = _streaming_media_features_oracle()


# ---------------------------------------------------------------------------
# streaming_rate_limit — the per-(user, hour) first-N throttle of
# queries/scale.event_rate_limit as a STATEFUL streaming operator:
# applyInPandasWithState keyed by user carries (current hour, count)
# across micro-batches, decides keep/drop per event as it arrives, and
# the per-type accounting aggregates the emitted decisions. The replay
# is totally ordered by (ts, event_id), so per-user arrival order
# equals the batch window order and the streaming decisions are
# BIT-IDENTICAL to the batch operator — the oracle is the batch SQL.
# State is two integers per live user, the smallest possible footprint
# for this semantics (contrast: the batch form needs the full window).
# ---------------------------------------------------------------------------

_RL_STATE_SCHEMA = "hour_us bigint, n bigint, max_burst bigint"
_RL_OUTPUT_SCHEMA = "event_type string, kept bigint, rn bigint"
_HOUR_US = 3600 * 1_000_000


def _rate_limit_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    from google_cloud_ecommerce_spark.queries.scale import RATE_LIMIT_N

    rows = pd.concat(list(pdfs), ignore_index=True).sort_values(["us", "event_id"])
    hour_us, n, max_burst = state.get if state.exists else (-1, 0, 0)
    out_type: list[str] = []
    out_kept: list[int] = []
    out_rn: list[int] = []
    for us, etype in zip(rows["us"], rows["event_type"]):
        h = int(us) // _HOUR_US * _HOUR_US
        if h != hour_us:
            hour_us, n = h, 0
        n += 1
        max_burst = max(max_burst, n)
        out_type.append(etype)
        out_kept.append(1 if n <= RATE_LIMIT_N else 0)
        out_rn.append(n)
    state.update((hour_us, n, max_burst))
    yield pd.DataFrame({"event_type": out_type, "kept": out_kept, "rn": out_rn})


def streaming_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    replay = write_replay_dir(spark, sf_dir, n_files=8)
    try:
        stream = read_replay_stream(spark, replay).select(
            "user_id", "event_id", F.unix_micros("ts").alias("us"), "event_type"
        )
        decided = stream.groupBy("user_id").applyInPandasWithState(
            _rate_limit_state_fn,
            outputStructType=_RL_OUTPUT_SCHEMA,
            stateStructType=_RL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        per_event = _run_to_memory(decided, "append")
        # final accounting is a tiny batch aggregate over the drained
        # decision log (chaining an agg after the stateful op would not
        # finalize in append mode)
        final = per_event.groupBy("event_type").agg(
            F.sum("kept").alias("n_kept"),
            (F.count("*") - F.sum("kept")).alias("n_dropped"),
            F.max("rn").alias("max_burst"),
        )
        return _pin_result(final)
    finally:
        shutil.rmtree(replay, ignore_errors=True)


QUERIES["streaming_rate_limit"] = streaming_rate_limit


def _streaming_rate_limit_oracle() -> str:
    from google_cloud_ecommerce_spark.queries.scale import EVENT_RATE_LIMIT_SQL

    return EVENT_RATE_LIMIT_SQL


ORACLE["streaming_rate_limit"] = _streaming_rate_limit_oracle()


# ---------------------------------------------------------------------------
# streaming_heavy_hitters — the streaming top-N frequent-keys job:
# per-user running counts maintained in update mode across the replay
# (each micro-batch re-emits only the users it touched), final top-N
# extracted from the last state of each key. The batch oracle is the
# exact top-N over the same events — update-mode counts are exact, so
# the streaming path must land on the identical hitter set.
#
# Scale posture: the running count state is O(distinct users); the
# final extraction is max(struct) per user (one hash aggregate over
# the bounded memory-sink table) followed by orderBy(...).limit(N),
# which Spark plans as TakeOrderedAndProject — a distributed top-k,
# never a single-partition window.
# ---------------------------------------------------------------------------

HH_TOP_N = 20


def streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    replay = write_replay_dir(spark, sf_dir, n_files=8)
    try:
        stream = read_replay_stream(spark, replay)
        agg = stream.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sv"),
        )
        sunk = _run_to_memory(agg, "update")
        final = (
            sunk.groupBy("user_id")
            .agg(F.max(F.struct("n_events", "sv")).alias("last"))
            .select(
                "user_id",
                F.col("last.n_events").alias("n_events"),
                F.col("last.sv").cast("double").alias("sum_value"),
            )
        )
        top = final.orderBy(F.desc("n_events"), F.asc("user_id")).limit(HH_TOP_N)
        return _pin_result(top)
    finally:
        shutil.rmtree(replay, ignore_errors=True)


QUERIES["streaming_heavy_hitters"] = streaming_heavy_hitters
ORACLE["streaming_heavy_hitters"] = f"""
    SELECT user_id, count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
    ORDER BY n_events DESC, user_id LIMIT {HH_TOP_N}
"""


# ---------------------------------------------------------------------------
# streaming_lakehouse_ingest — the streaming-into-the-lakehouse path:
# each micro-batch lands via foreachBatch into its own epoch directory,
# day-partitioned INSIDE the epoch (epoch=N/day=D/...). Epoch-scoped
# overwrite makes redelivery idempotent (the exactly-once discipline of
# io.foreach_batch_parquet_sink) while the day partitioning gives every
# downstream reader the listing-time pruning of day_pruned_scan — the
# two layout disciplines composed. The verification read scans the
# whole tree through partition discovery (epoch and day both become
# columns) and aggregates per day; the batch oracle over the source
# events must match exactly.
# ---------------------------------------------------------------------------


def streaming_lakehouse_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    replay = write_replay_dir(spark, sf_dir, n_files=8)
    out = tempfile.mkdtemp(prefix="spark_graft_lakehouse_")
    checkpoint = tempfile.mkdtemp(prefix="spark_graft_lakehouse_ckpt_")
    try:
        stream = read_replay_stream(spark, replay)

        def write_epoch(batch_df, epoch_id: int) -> None:
            (
                batch_df.withColumn("day", F.to_date("ts"))
                .write.mode("overwrite")
                .partitionBy("day")
                .parquet(f"{out}/epoch={epoch_id}")
            )

        q = (
            stream.writeStream.foreachBatch(write_epoch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        landed = spark.read.parquet(out)  # partition discovery: epoch, day
        final = landed.groupBy("day").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        return _pin_result(final)
    finally:
        shutil.rmtree(replay, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(checkpoint, ignore_errors=True)


QUERIES["streaming_lakehouse_ingest"] = streaming_lakehouse_ingest
ORACLE["streaming_lakehouse_ingest"] = """
    SELECT CAST(ts AS DATE) AS day, count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# streaming_merge_upsert — the streaming half of row-level MERGE
# (queries/scale.merge_upsert_rewrite is the batch half, VERDICT r8
# #7): each micro-batch derives its changelog slice (absolute-state
# upserts, scale._changelog_of — the SAME derivation as batch, so the
# SAME oracle covers both) and merges it into the day-partitioned
# working table via foreachBatch — survivors anti-joined on the key,
# union the changelog, dynamic partition overwrite of ONLY the touched
# days. The replay deliberately re-delivers every 3rd row in the next
# chunk (overlap_every=3, at-least-once transport): because changelog
# rows carry ABSOLUTE state, a redelivered key anti-joins out the row
# it wrote last epoch and re-writes the identical one — the
# exactly-once upgrade lives in the MERGE semantics, not in a dedup
# operator, and the oracle equality proves it end-to-end.
#
# Scale posture: per batch, one broadcast day semi-join (DPP-prunable)
# + one SHUFFLED key anti-join over touched partitions (the changelog
# is fact-derived — never broadcast-hinted); untouched days are never
# read or rewritten; state lives in the table, not the stream (no
# unbounded streaming state).
#
# Round-10 (VERDICT r9 #2 + ADVICE r9): each micro-batch commits a NEW
# lakehouse version — the epoch's touched partitions land under a
# fresh slices/v{n}/ prefix and the manifest flips after the data is
# down, so the merge never dynamic-overwrites the files it reads. A
# redelivered key (the deliberate overlap_every=3 at-least-once
# transport) anti-joins out the row it wrote last epoch and re-writes
# the identical one into the next version; superseded slices stay
# behind for VACUUM (vacuum_report in queries/scale.py).
# ---------------------------------------------------------------------------


def streaming_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from google_cloud_ecommerce_spark.io import ensure_day_partitioned_events
    from google_cloud_ecommerce_spark.lakehouse import (
        table_commit_rewrite,
        table_create,
        table_read,
    )
    from google_cloud_ecommerce_spark.queries.scale import _apply_merge, _changelog_of

    src = ensure_day_partitioned_events(spark, sf_dir)
    replay = write_replay_dir(spark, sf_dir, n_files=8, overlap_every=3)
    out = tempfile.mkdtemp(prefix="spark_graft_smerge_")
    checkpoint = tempfile.mkdtemp(prefix="spark_graft_smerge_ckpt_")
    try:
        table_create(spark.read.parquet(src), out)
        stream = read_replay_stream(spark, replay)

        def merge_epoch(batch_df, epoch_id: int) -> None:
            chg = _changelog_of(
                batch_df.withColumn("day", F.to_date("ts"))
                .withColumn("hour", F.hour("ts").cast("int"))
            )
            table_commit_rewrite(_apply_merge(table_read(spark, out), chg), out)

        q = (
            stream.writeStream.foreachBatch(merge_epoch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        mutated = table_read(spark, out)
        final = mutated.groupBy("day").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
            F.sum((F.col("event_type") == "adjusted").cast("long")).alias("n_adjusted"),
            F.sum((F.col("event_type") == "backfill").cast("long")).alias("n_backfill"),
        )
        return _pin_result(final)
    finally:
        shutil.rmtree(replay, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(checkpoint, ignore_errors=True)


# the batch MERGE oracle verbatim: stream + batch must converge on the
# same merged state (queries.scale has no import back into streaming,
# so the top-level import is cycle-free)
from google_cloud_ecommerce_spark.queries.scale import MERGE_UPSERT_SQL  # noqa: E402

QUERIES["streaming_merge_upsert"] = streaming_merge_upsert
ORACLE["streaming_merge_upsert"] = MERGE_UPSERT_SQL


# ---------------------------------------------------------------------------
# streaming_jdbc_sink — the reference's stream-to-database edge
# (Pub/Sub -> Beam -> BigQuery, write_session_stream.py:107-112) run
# against a REAL embedded database: each micro-batch appends to an
# in-memory Apache Derby table through the batched JDBC writer.
# JDBC appends are at-least-once under retries, so the read-back side
# applies the idempotent-consumer discipline: aggregates count
# DISTINCT event ids, which makes redelivery harmless — the same
# at-least-once -> exactly-once upgrade streaming_dedup_counts makes
# in-plan, pushed to the consumer. The batch oracle over the source
# events must match exactly.
# ---------------------------------------------------------------------------


def streaming_jdbc_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from google_cloud_ecommerce_spark.io import read_jdbc, write_jdbc
    from google_cloud_ecommerce_spark.queries.scale import (
        _DERBY_DRIVER,
        _derby_drop,
        _derby_url,
    )

    import tempfile

    db = f"g{uuid.uuid4().hex[:12]}"
    replay = write_replay_dir(spark, sf_dir, n_files=8)
    checkpoint = tempfile.mkdtemp(prefix="spark_graft_jdbc_ckpt_")
    try:
        stream = read_replay_stream(spark, replay).select(
            "event_id", "user_id", "event_type", "value"
        )

        first = {"v": True}

        def write_epoch(batch_df, epoch_id: int) -> None:
            mode = "overwrite" if first["v"] else "append"
            first["v"] = False
            url = _derby_url(db, create=True) if mode == "overwrite" else _derby_url(db)
            write_jdbc(batch_df, url, "events_sink", mode=mode, driver=_DERBY_DRIVER)

        q = (
            stream.writeStream.foreachBatch(write_epoch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        back = read_jdbc(spark, _derby_url(db), "events_sink", driver=_DERBY_DRIVER)
        final = back.groupBy("event_type").agg(
            F.count_distinct("event_id").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
        pinned = _pin_result(final)
        _derby_drop(spark, db)
        return pinned
    finally:
        shutil.rmtree(replay, ignore_errors=True)
        shutil.rmtree(checkpoint, ignore_errors=True)


QUERIES["streaming_jdbc_sink"] = streaming_jdbc_sink
ORACLE["streaming_jdbc_sink"] = """
    SELECT event_type, COUNT(DISTINCT event_id) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# T1/T2 — real-gap pacing replay (reference
# streaming_pipeline/simulate_session_stream.py:86-95: the producer
# sleeps each real inter-event delta / speedFactor). The event-TIME-
# sliced replay dir paces batches by the accelerated timeline, so the
# corpus's burst/gap structure drives the micro-batch sizes; the
# windowed aggregate over those uneven batches must still equal the
# batch answer — pacing is a delivery concern, never a semantics one.
# ---------------------------------------------------------------------------


def streaming_gap_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from google_cloud_ecommerce_spark.streaming.replay import write_gap_replay_dir

    replay = write_gap_replay_dir(spark, sf_dir, n_slices=12)
    try:
        stream = read_replay_stream(spark, replay, max_files_per_trigger=1)
        # no count_distinct: distinct aggregates are unsupported on
        # streams (state would be unbounded per group)
        agg = stream.groupBy(F.to_date("ts").alias("day")).agg(
            F.count("*").alias("n_events"),
            F.max("user_id").alias("max_user"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        return _run_to_memory(agg, "complete")
    finally:
        shutil.rmtree(replay, ignore_errors=True)


QUERIES["streaming_gap_replay"] = streaming_gap_replay
ORACLE["streaming_gap_replay"] = """
    SELECT CAST(ts AS DATE) AS day, count(*) AS n_events,
           max(user_id) AS max_user,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# streaming_version_feed — incremental (CDC) streaming consumption of
# the lakehouse version chain (round-11, VERDICT r10 next #3): the
# manifest diffs of consecutive commits are materialized as change
# files (lakehouse.write_change_feed — the commit-time change-file
# discipline of Delta CDF; computing them from the immutable manifest
# chain afterwards is equivalent for copy-on-write tables, and the diff
# lists ONLY the partitions whose slice pointer changed), then a file
# stream replays the chain ONE COMMIT PER MICRO-BATCH
# (maxFilesPerTrigger=1 over one file batch per commit) into a
# complete-mode aggregation. The converged state must equal the batch
# change-feed oracle — the same derivation lakehouse_change_feed
# (queries/scale.py) verifies day-by-day, aggregated per commit here
# because the stream's value is the per-commit batch boundary. At scale
# the feed keeps its natural shuffle width per commit and the stream
# triggers on listing order; state is one row per (commit, change
# type) — bounded, no watermark needed.
# ---------------------------------------------------------------------------


def streaming_version_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from google_cloud_ecommerce_spark.lakehouse import write_change_feed
    from google_cloud_ecommerce_spark.queries.scale import _build_cdc_table

    root = _build_cdc_table(spark, sf_dir)
    feed = tempfile.mkdtemp(prefix="spark_graft_vfeed_")
    try:
        assert write_change_feed(spark, root, feed, key_col="event_id") == [1, 2]
        schema = spark.read.parquet(feed).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        agg = stream.groupBy(
            F.col("_commit_version").alias("commit_version"),
            F.col("_change_type").alias("change_type"),
        ).agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        return _pin_result(_run_to_memory(agg, "complete"))
    finally:
        shutil.rmtree(feed, ignore_errors=True)


from google_cloud_ecommerce_spark.queries.scale import (  # noqa: E402
    CDC_DEL_RESIDUE,
    CDC_INS_RESIDUE,
    CDC_ROWLEVEL_CUTOFF,
    CDC_SET_VALUE,
    CDC_UPDATE_CUTOFF,
)
from google_cloud_ecommerce_spark.queries.scale import (  # noqa: E402
    MERGE_UPD_MOD as _CDC_MOD,
)
from google_cloud_ecommerce_spark.queries.scale import (  # noqa: E402
    MERGE_UPD_RESIDUE as _CDC_UPD_RESIDUE,
)

QUERIES["streaming_version_feed"] = streaming_version_feed
ORACLE["streaming_version_feed"] = f"""
    WITH ev AS (
        SELECT dayofmonth(CAST(ts AS DATE)) AS dom, event_id, value
        FROM events
    )
    SELECT CAST(1 AS BIGINT) AS commit_version,
           'update_preimage' AS change_type, count(*) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM ev
    WHERE dom <= {CDC_UPDATE_CUTOFF} AND event_id % {_CDC_MOD} = {_CDC_UPD_RESIDUE}
    UNION ALL
    SELECT CAST(1 AS BIGINT), 'update_postimage', count(*),
           CAST(SUM(CAST(CAST({CDC_SET_VALUE} AS DOUBLE) AS DECIMAL(18,4)))
                AS DOUBLE)
    FROM ev
    WHERE dom <= {CDC_UPDATE_CUTOFF} AND event_id % {_CDC_MOD} = {_CDC_UPD_RESIDUE}
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'delete', count(*),
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
    FROM ev
    WHERE dom <= {CDC_ROWLEVEL_CUTOFF} AND event_id % {_CDC_MOD} = {CDC_DEL_RESIDUE}
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'insert', count(*),
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
    FROM ev
    WHERE dom <= {CDC_ROWLEVEL_CUTOFF} AND event_id % {_CDC_MOD} = {CDC_INS_RESIDUE}
"""


# ---------------------------------------------------------------------------
# streaming_manifest_ingest — streaming ingest committed as blind
# APPENDS through the lakehouse manifest (round-11; contrast
# streaming_lakehouse_ingest, which lands epoch-keyed dirs OUTSIDE the
# table format): each micro-batch costs exactly its own rows — no
# survivors join, no partition rewrite — and commits version N+1 with
# the Delta idempotent-writer txn protocol, (query_id, epoch_id), so a
# redelivered epoch after a restart is skipped at the manifest, not
# deduplicated downstream (the exactly-once upgrade lives in the
# COMMIT, where streaming_merge_upsert put it in the MERGE semantics).
# The verification read resolves the final manifest — one slice list
# per day — and aggregates; the batch oracle over the source events
# must match exactly. State lives in the table and the manifest's
# txn high-water mark; the stream itself is stateless.
# ---------------------------------------------------------------------------


def streaming_manifest_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from google_cloud_ecommerce_spark.lakehouse import (
        table_commit_append,
        table_create,
        table_read,
    )

    replay = write_replay_dir(spark, sf_dir, n_files=8)
    root = tempfile.mkdtemp(prefix="spark_graft_mingest_")
    checkpoint = tempfile.mkdtemp(prefix="spark_graft_mingest_ckpt_")
    try:
        stream = read_replay_stream(spark, replay)
        # v0 is an EMPTY table created before the stream starts, so
        # EVERY epoch (including 0) goes through the txn-guarded append
        # path — a restart that redelivers any epoch is a manifest-level
        # no-op, never a duplicate append and never a create-collision
        # (self-review r11: a process-local created-flag put epoch 0
        # outside the protocol and crashed on restart).
        empty = spark.createDataFrame([], stream.schema).withColumn(
            "day", F.to_date("ts")
        )
        table_create(empty, root)

        def append_epoch(batch_df, epoch_id: int) -> None:
            rows = batch_df.withColumn("day", F.to_date("ts"))
            table_commit_append(rows, root, txn=("mingest", int(epoch_id)))

        q = (
            stream.writeStream.foreachBatch(append_epoch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        final = table_read(spark, root).groupBy("day").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        return _pin_result(final)
    finally:
        shutil.rmtree(replay, ignore_errors=True)
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(checkpoint, ignore_errors=True)


QUERIES["streaming_manifest_ingest"] = streaming_manifest_ingest
ORACLE["streaming_manifest_ingest"] = """
    SELECT CAST(ts AS DATE) AS day, count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
"""

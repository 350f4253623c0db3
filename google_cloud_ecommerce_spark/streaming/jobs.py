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

Scale posture: watermark + windowed aggs keep state bounded per key;
sessionization state is per live session; dedup state is bounded by the
watermark horizon. Nothing here collects to the driver except the
memory sink, which in production becomes parquet/Kafka via
``foreachBatch`` (exactly-once per sink epoch).
"""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from google_cloud_ecommerce_spark.streaming.replay import (
    read_replay_stream,
    write_replay_dir,
)


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
                F.col("w.start").alias("window_start"),
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
                F.col("sw.start").alias("session_start"),
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


QUERIES = {
    "streaming_daily_events": streaming_daily_events,
    "streaming_hourly_window": streaming_hourly_window,
    "streaming_sessionization": streaming_sessionization,
    "streaming_dedup_counts": streaming_dedup_counts,
}

ORACLE = {
    # stream ≡ batch: the oracles are the BATCH semantics on the same rows.
    "streaming_daily_events": """
        SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n_events
        FROM events GROUP BY 1, 2
    """,
    "streaming_hourly_window": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
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
        SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        FROM sess GROUP BY user_id, session_id
    """,
    "streaming_dedup_counts": """
        SELECT event_type, count(*) AS n_events FROM events GROUP BY 1
    """,
}

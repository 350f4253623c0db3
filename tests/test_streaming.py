"""Streaming semantics beyond the oracle: the replay source really
drips files, dropDuplicates really removes injected at-least-once
duplicates, and append-mode watermarking really holds back open
windows (the part complete-mode oracles can't see)."""

from __future__ import annotations

import glob
import shutil
import uuid

from pyspark.sql import functions as F

from google_cloud_ecommerce_spark.catalog import load_table
from google_cloud_ecommerce_spark.queries.reference import daily_events
from google_cloud_ecommerce_spark.streaming import jobs
from google_cloud_ecommerce_spark.streaming.replay import (
    read_replay_stream,
    write_replay_dir,
)


def test_replay_dir_partitions_all_rows(spark, sf_smoke):
    d = write_replay_dir(spark, sf_smoke, n_files=4)
    try:
        files = glob.glob(f"{d}/chunk-*.parquet")
        assert len(files) == 4
        n = spark.read.parquet(d).count()
        assert n == load_table(spark, sf_smoke, "events").count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_overlap_injects_duplicates(spark, sf_smoke):
    base = load_table(spark, sf_smoke, "events").count()
    d = write_replay_dir(spark, sf_smoke, n_files=4, overlap_every=5)
    try:
        raw = spark.read.parquet(d)
        assert raw.count() > base  # duplicates present on the wire
        assert raw.select("event_id").distinct().count() == base
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_equals_batch_daily_events(spark, sf_smoke):
    stream_rows = {
        (r.day, r.event_type): r.n_events
        for r in jobs.streaming_daily_events(spark, sf_smoke).collect()
    }
    batch_rows = {
        (r.day, r.event_type): r.n_events
        for r in daily_events(spark, sf_smoke).collect()
    }
    assert stream_rows == batch_rows


def test_append_mode_watermark_holds_back_open_windows(spark, sf_smoke):
    """With append output + watermark, windows newer than
    (max_ts - delay) stay in state and are never emitted by the final
    availableNow batch — the late-data contract."""
    d = write_replay_dir(spark, sf_smoke, n_files=4)
    name = f"append_{uuid.uuid4().hex[:8]}"
    try:
        stream = read_replay_stream(spark, d, max_files_per_trigger=1)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        emitted = spark.table(name)
        events = load_table(spark, sf_smoke, "events")
        max_ts = events.agg(F.max("ts")).collect()[0][0]
        emitted_max = emitted.agg(F.max("ws")).collect()[0][0]
        batch_max = (
            events.groupBy(F.date_trunc("hour", "ts").alias("ws"))
            .count()
            .agg(F.max("ws"))
            .collect()[0][0]
        )
        # the newest (still-open) window must be withheld
        assert emitted_max < batch_max
        # everything emitted is a closed window w.r.t. the final watermark
        assert emitted.count() > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_dedup_counts_match_distinct(spark, sf_smoke):
    rows = {
        r.event_type: r.n_events
        for r in jobs.streaming_dedup_counts(spark, sf_smoke).collect()
    }
    batch = {
        r.event_type: r["count"]
        for r in load_table(spark, sf_smoke, "events").groupBy("event_type").count().collect()
    }
    assert rows == batch


def test_session_state_conserves_events(spark, sf_smoke):
    """Custom applyInPandasWithState sessionizer: every real event lands
    in exactly one emitted session (the flush sentinel closes them all)."""
    sessions = jobs.streaming_session_state(spark, sf_smoke)
    total = sessions.agg(F.sum("n_events")).collect()[0][0]
    n_events = load_table(spark, sf_smoke, "events").count()
    assert total == n_events
    assert sessions.filter(F.col("span_seconds") < 0).count() == 0


def test_rate_stream_feeds_event_shaped_jobs(spark):
    from google_cloud_ecommerce_spark.streaming.replay import read_rate_stream

    stream = read_rate_stream(spark, rows_per_second=500)
    agg = stream.groupBy("event_type").count()
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rate_soak")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        rows = []
        while time.time() < deadline:
            rows = spark.table("rate_soak").collect()
            if sum(r["count"] for r in rows) >= 100 and len(rows) >= 3:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert rows and sum(r["count"] for r in rows) >= 100
    assert {r.event_type for r in rows} <= {"view", "cart", "purchase", "click", "scroll"}


def test_gap_replay_slices_by_event_time(spark, tmp_path):
    """Chunks cover equal spans of the accelerated TIMELINE, so a bursty
    corpus produces unequal batch sizes (the gap structure), unlike the
    row-sliced write_replay_dir."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    from google_cloud_ecommerce_spark.streaming.replay import write_gap_replay_dir

    # 90 events in minute 0, 10 events spread over minutes 1..39
    ts = [datetime(2024, 1, 1, 0, 0, i % 60) for i in range(90)] + [
        datetime(2024, 1, 1, 0, 1 + 4 * i, 0) for i in range(10)
    ]
    n = len(ts)
    pq.write_table(
        pa.table(
            {
                "event_id": list(range(n)),
                "ts": pa.array(ts, type=pa.timestamp("us")),
                "user_id": [i % 7 for i in range(n)],
                "event_type": ["view"] * n,
                "value": [float(i) for i in range(n)],
                "props": [None] * n,
            }
        ),
        tmp_path / "events.parquet",
    )
    d = write_gap_replay_dir(spark, str(tmp_path), n_slices=4)
    try:
        sizes = [
            spark.read.parquet(f).count()
            for f in sorted(glob.glob(f"{d}/chunk-*.parquet"))
        ]
        assert sum(sizes) == n  # nothing lost, nothing duplicated
        assert max(sizes) >= 90  # the burst lands in one slice
        assert min(sizes) < 10  # quiet spans produce small batches
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_gap_replay_stream_equals_batch(spark, sf_smoke):
    from google_cloud_ecommerce_spark.streaming import jobs

    rows = {
        (r.day, r.n_events, r.max_user, r.sum_value)
        for r in jobs.streaming_gap_replay(spark, sf_smoke).collect()
    }
    batch = {
        (r.day, r.n_events, r.max_user, r.sum_value)
        for r in load_table(spark, sf_smoke, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            F.max("user_id").alias("max_user"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .collect()
    }
    assert rows == batch


def _write_tiny_events(spark, tmp_path, n):
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "event_id": list(range(n)),
                "ts": pa.array(
                    [datetime(2024, 1, 1, 0, 0, i) for i in range(n)],
                    type=pa.timestamp("us"),
                ),
                "user_id": [i % 3 for i in range(n)],
                "event_type": ["view"] * n,
                "value": [float(i) for i in range(n)],
                "props": [None] * n,
            }
        ),
        tmp_path / "events.parquet",
    )
    return str(tmp_path)


def test_replay_dir_clamps_chunks_to_tiny_inputs(spark, tmp_path):
    """ADVICE r6: n_events < n_files used to raise (empty file_id
    partitions); now n_files clamps to the row count and every row
    still replays exactly once."""
    from google_cloud_ecommerce_spark.streaming.replay import write_replay_dir

    sf = _write_tiny_events(spark, tmp_path, 3)
    d = write_replay_dir(spark, sf, n_files=8)
    try:
        chunks = sorted(glob.glob(f"{d}/chunk-*.parquet"))
        assert len(chunks) == 3
        assert sum(spark.read.parquet(f).count() for f in chunks) == 3
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_replay_dirs_raise_clearly_on_empty_events(spark, tmp_path):
    """ADVICE r6: an empty events table used to surface as int(None)
    TypeError (gap replay) or an opaque chunk-count RuntimeError."""
    import pytest

    from google_cloud_ecommerce_spark.streaming.replay import (
        write_gap_replay_dir,
        write_replay_dir,
    )

    sf = _write_tiny_events(spark, tmp_path, 0)
    with pytest.raises(ValueError, match="empty"):
        write_replay_dir(spark, sf, n_files=4)
    with pytest.raises(ValueError, match="empty"):
        write_gap_replay_dir(spark, sf, n_slices=4)

"""Operational streaming behavior: checkpoint-based restart resume
(exactly-once across runs) and progress observability via
StreamingQueryListener."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from google_cloud_ecommerce_spark.catalog import load_table
from google_cloud_ecommerce_spark.io import foreach_batch_parquet_sink
from google_cloud_ecommerce_spark.streaming.replay import (
    read_replay_stream,
    write_replay_dir,
)


def test_checkpoint_restart_resumes_without_duplicates(spark, sf_smoke):
    """Stop after half the input, restart with the same checkpoint:
    the second run must process ONLY the new files, and the union of
    epoch outputs must equal the batch result exactly (no missing, no
    double-processed rows)."""
    replay_full = write_replay_dir(spark, sf_smoke, n_files=8)
    staged = sorted(glob.glob(os.path.join(replay_full, "chunk-*.parquet")))
    live = tempfile.mkdtemp(prefix="ckpt_live_")
    out = tempfile.mkdtemp(prefix="ckpt_out_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_ck_")
    try:
        # run 1: only the first half of the chunks exist
        for f in staged[:4]:
            shutil.copy(f, os.path.join(live, os.path.basename(f)))
        q1 = foreach_batch_parquet_sink(read_replay_stream(spark, live), out, ckpt)
        q1.awaitTermination()

        # "restart": same checkpoint, remaining chunks arrive
        for f in staged[4:]:
            shutil.copy(f, os.path.join(live, os.path.basename(f)))
        q2 = foreach_batch_parquet_sink(read_replay_stream(spark, live), out, ckpt)
        q2.awaitTermination()

        got = spark.read.parquet(out)
        want = load_table(spark, sf_smoke, "events")
        assert got.count() == want.count()
        assert got.select(F.count_distinct("event_id")).collect()[0][0] == want.count()
        a = got.agg(F.sum("event_id"), F.sum(F.col("value").cast("decimal(18,4)"))).collect()
        b = want.agg(F.sum("event_id"), F.sum(F.col("value").cast("decimal(18,4)"))).collect()
        assert a == b
    finally:
        for d in (replay_full, live, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_streaming_query_listener_sees_progress(spark, sf_smoke):
    from pyspark.sql.streaming import StreamingQueryListener

    events_seen = {"progress": 0, "rows": 0, "started": 0, "terminated": 0}

    class Listener(StreamingQueryListener):
        def onQueryStarted(self, event):
            events_seen["started"] += 1

        def onQueryProgress(self, event):
            events_seen["progress"] += 1
            events_seen["rows"] += event.progress.numInputRows

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            events_seen["terminated"] += 1

    listener = Listener()
    spark.streams.addListener(listener)
    replay = write_replay_dir(spark, sf_smoke, n_files=4)
    try:
        stream = read_replay_stream(spark, replay)
        agg = stream.groupBy("event_type").count()
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("listener_probe")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener callbacks are delivered asynchronously
        deadline = time.time() + 30
        n = load_table(spark, sf_smoke, "events").count()
        while time.time() < deadline and (
            events_seen["rows"] < n or not events_seen["terminated"]
        ):
            time.sleep(0.5)
        assert events_seen["started"] >= 1
        assert events_seen["progress"] >= 1
        assert events_seen["rows"] == n
        assert events_seen["terminated"] >= 1
    finally:
        spark.streams.removeListener(listener)
        shutil.rmtree(replay, ignore_errors=True)


def test_streaming_kmv_equals_batch_sketch(spark, sf_smoke):
    """The incrementally merged streaming sketch must be bit-identical
    to the one-shot batch sketch — KMV merge associativity in action."""
    from google_cloud_ecommerce_spark.queries.scale import kmv_user_cardinality
    from google_cloud_ecommerce_spark.streaming.jobs import streaming_kmv_sketch

    batch = {
        r.event_type: (r.k_kept, r.h_k, r.kmv_estimate)
        for r in kmv_user_cardinality(spark, sf_smoke).collect()
    }
    stream = {
        r.event_type: (r.k_kept, r.h_k, r.kmv_estimate)
        for r in streaming_kmv_sketch(spark, sf_smoke).collect()
    }
    assert stream == batch


def test_streaming_rate_limit_equals_batch(spark, sf_smoke):
    """Stateful streaming throttle decisions must be bit-identical to
    the batch window operator (replay is (ts, event_id)-ordered)."""
    from google_cloud_ecommerce_spark.queries.scale import event_rate_limit
    from google_cloud_ecommerce_spark.streaming.jobs import streaming_rate_limit

    batch = {
        r.event_type: (r.n_kept, r.n_dropped, r.max_burst)
        for r in event_rate_limit(spark, sf_smoke).collect()
    }
    stream = {
        r.event_type: (r.n_kept, r.n_dropped, r.max_burst)
        for r in streaming_rate_limit(spark, sf_smoke).collect()
    }
    assert stream == batch


def test_streaming_media_features_sparse_doc_ids(spark, tmp_path):
    """Replay chunking must not assume dense 0-based doc_ids: on a
    corpus with sparse, offset ids every document must still enter the
    stream and the output must equal the batch operator row-for-row."""
    from google_cloud_ecommerce_spark.operators.multimodal import media_features
    from google_cloud_ecommerce_spark.streaming.jobs import streaming_media_features

    docs = spark.createDataFrame(
        [
            (1_000_003, "alpha beta gamma delta", "en", "s0", 22),
            (2_500_017, "the quick brown fox jumps", "en", "s1", 25),
            (9_999_999, "lorem ipsum dolor sit amet words", "en", "s2", 32),
            (7, "tiny", "en", "s3", 4),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    batch = {tuple(r) for r in media_features(spark, str(tmp_path)).collect()}
    stream = {
        tuple(r) for r in streaming_media_features(spark, str(tmp_path)).collect()
    }
    assert stream == batch
    assert len(stream) > 0

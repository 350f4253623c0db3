"""File-source replay of the events table — the Structured Streaming
stand-in for the reference's two Pub/Sub producers
(``streaming_pipeline/send_session_stream.py:141-148`` chunked replay,
``simulate_session_stream.py:80-107`` real-gap replay).

The producers' pacing knobs map to source options, not code:
``maxFilesPerTrigger`` ≈ speedFactor, trigger interval ≈ the 5 s sleep.
``overlap_every`` injects duplicate deliveries across chunk boundaries,
modeling the reference's at-least-once publish (SURVEY.md §2.9 T3:
"per-message publish, no dedup") so the exactly-once upgrade
(dropDuplicates on the stream) has something real to remove.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from google_cloud_ecommerce_spark.catalog import load_table

EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def write_replay_dir(
    spark: SparkSession,
    sf_dir: str,
    n_files: int = 8,
    overlap_every: int = 0,
) -> str:
    """Split events (time-ordered) into n_files parquet chunks in a temp
    dir. With ``overlap_every=k``, every k-th row is also delivered in
    the next chunk (duplicate delivery)."""
    out = tempfile.mkdtemp(prefix="spark_graft_replay_")
    events = load_table(spark, sf_dir, "events")
    n = events.count()
    w = Window.orderBy("ts", "event_id")
    numbered = events.withColumn("rn", F.row_number().over(w) - 1).withColumn(
        "file_id", (F.col("rn") * n_files / F.lit(n)).cast("int")
    )
    for i in range(n_files):
        chunk = numbered.filter(F.col("file_id") == i)
        if overlap_every and i > 0:
            dup = numbered.filter(
                (F.col("file_id") == i - 1) & (F.col("rn") % overlap_every == 0)
            )
            chunk = chunk.unionByName(dup)
        tmp = os.path.join(out, f"_stage_{i}")
        chunk.drop("rn", "file_id").coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(out, f"chunk-{i:04d}.parquet"))
        shutil.rmtree(tmp)
    return out


def read_replay_stream(
    spark: SparkSession, replay_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """The streaming scan: schema declared (no inference on a stream),
    files drip in commit order like paced publishes."""
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(replay_dir)
    )


def read_rate_stream(
    spark: SparkSession, rows_per_second: int = 100, num_partitions: int = 4
) -> DataFrame:
    """Built-in synthetic load generator (``rate`` source) shaped like
    the events stream — the standard way to soak-test a streaming job's
    throughput without a broker. Columns are derived deterministically
    from the rate source's (timestamp, value) so any job written
    against the events schema runs unmodified."""
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .option("numPartitions", str(num_partitions))
        .load()
    )
    types = ["view", "cart", "purchase", "click", "scroll"]
    type_case = "CASE CAST(value % 5 AS INT) " + " ".join(
        f"WHEN {i} THEN '{t}'" for i, t in enumerate(types)
    ) + " END"
    return raw.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 1000).alias("user_id"),
        F.expr(type_case).alias("event_type"),
        (F.col("value") % 500).cast("double").alias("value"),
        F.lit(None).cast("string").alias("props"),
    )

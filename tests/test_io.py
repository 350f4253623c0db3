"""Source/sink round-trips (SURVEY.md §2.1-§2.2): typed CSV/JSON scans,
DDL tables with appends, day-partitioned parquet with partition pruning,
and the exactly-once foreachBatch streaming sink."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from google_cloud_ecommerce_spark import io as gio
from google_cloud_ecommerce_spark.catalog import load_table
from google_cloud_ecommerce_spark.streaming.replay import (
    read_replay_stream,
    write_replay_dir,
)


def test_csv_roundtrip_typed(spark, sf_smoke, tmp_path):
    src = load_table(spark, sf_smoke, "events")
    out = str(tmp_path / "events_csv")
    gio.write_csv(src, out)
    back = gio.read_csv(spark, out, gio.EVENTS_CSV_DDL)
    assert back.count() == src.count()
    assert dict(back.dtypes)["ts"] == "timestamp"
    # values survive: sum of event_ids and max ts equal
    a = src.agg(F.sum("event_id"), F.max("ts")).collect()[0]
    b = back.agg(F.sum("event_id"), F.max("ts")).collect()[0]
    assert tuple(a) == tuple(b)


def test_json_roundtrip_typed(spark, sf_smoke, tmp_path):
    src = load_table(spark, sf_smoke, "events")
    out = str(tmp_path / "events_json")
    gio.write_json(src, out)
    back = gio.read_json(spark, out, gio.EVENTS_CSV_DDL)
    assert back.count() == src.count()
    assert back.agg(F.sum("user_id")).collect()[0][0] == src.agg(F.sum("user_id")).collect()[0][0]


def test_ddl_table_and_append(spark, sf_smoke, tmp_path):
    loc = str(tmp_path / "events_tbl")
    gio.create_table_ddl(spark, "events_tbl", loc, gio.EVENTS_CSV_DDL)
    try:
        src = load_table(spark, sf_smoke, "events")
        gio.append_to_table(src, "events_tbl")
        gio.append_to_table(src, "events_tbl")  # append semantics: doubles
        assert spark.table("events_tbl").count() == 2 * src.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS events_tbl")


def test_partitioned_parquet_prunes(spark, sf_smoke, tmp_path):
    src = load_table(spark, sf_smoke, "events").withColumn("day", F.to_date("ts"))
    out = str(tmp_path / "events_by_day")
    gio.write_partitioned_parquet(src, out, ["day"])
    assert len(glob.glob(f"{out}/day=*")) > 1
    one_day = spark.read.parquet(out).filter(F.col("day") == "2024-01-05")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the scan must carry a partition filter, and the
    # matched day's row count must equal the source's
    assert "PartitionFilters: [isnotnull(day" in plan
    expect = src.filter(F.col("day") == "2024-01-05").count()
    assert one_day.count() == expect


def test_foreach_batch_sink_exactly_once_per_epoch(spark, sf_smoke, tmp_path):
    replay = write_replay_dir(spark, sf_smoke, n_files=4)
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    try:
        stream = read_replay_stream(spark, replay, max_files_per_trigger=2)
        q = gio.foreach_batch_parquet_sink(stream, out, ckpt)
        q.awaitTermination()
        epochs = glob.glob(f"{out}/epoch=*")
        assert len(epochs) >= 2  # multiple micro-batches landed
        total = spark.read.option("basePath", out).parquet(*epochs).count()
        assert total == load_table(spark, sf_smoke, "events").count()
    finally:
        shutil.rmtree(replay, ignore_errors=True)

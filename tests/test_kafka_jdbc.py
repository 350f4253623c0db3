"""Kafka swap-in + JDBC sink: the config-gated integration edges.

No broker or JDBC driver ships in this container, so these tests cover
exactly the parts that break in practice: option-dict construction and
the wire <-> columns codec (nulls in EVERY field, embedded commas in
props, microsecond timestamps)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from google_cloud_ecommerce_spark.io import jdbc_options
from google_cloud_ecommerce_spark.streaming import kafka


def test_jdbc_options_surface():
    opts = jdbc_options(
        "jdbc:postgresql://db:5432/app",
        "events_batch",
        user="writer",
        password="secret",
        driver="org.postgresql.Driver",
        batch_size=500,
        num_partitions=8,
    )
    assert opts == {
        "url": "jdbc:postgresql://db:5432/app",
        "dbtable": "events_batch",
        "batchsize": "500",
        "isolationLevel": "READ_COMMITTED",
        "user": "writer",
        "password": "secret",
        "driver": "org.postgresql.Driver",
        "numPartitions": "8",
    }


def test_jdbc_options_minimal():
    opts = jdbc_options("jdbc:sqlite:/tmp/x.db", "t")
    assert "user" not in opts and "password" not in opts and "driver" not in opts
    assert opts["batchsize"] == "10000"


def test_kafka_source_options():
    opts = kafka.kafka_source_options(
        "broker1:9092,broker2:9092",
        "events",
        starting_offsets="latest",
        max_offsets_per_trigger=100_000,
        min_partitions=64,
        fail_on_data_loss=False,
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "events",
        "startingOffsets": "latest",
        "failOnDataLoss": "false",
        "maxOffsetsPerTrigger": "100000",
        "minPartitions": "64",
    }


def test_kafka_sink_options():
    assert kafka.kafka_sink_options("b:9092", "out") == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "out",
    }


def _codec_roundtrip(spark, rows):
    schema = (
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string"
    )
    src = spark.createDataFrame(rows, schema)
    wired = src.select(kafka.wire_value_expr())
    back = wired.select(kafka.parse_wire_value(F.col("value")).alias("ev")).select("ev.*")
    key = lambda t: tuple(map(repr, t))  # noqa: E731 — None-safe sort
    return sorted(map(tuple, src.collect()), key=key), sorted(
        map(tuple, back.collect()), key=key
    )


def test_wire_codec_roundtrip_identity(spark):
    ts = dt.datetime(2024, 1, 7, 12, 34, 56, 789012)
    rows = [
        (1, ts, 10, "view", 12.5, '{"k": 3}'),
        (2, ts, 11, "purchase", 99.0, "a,b,c=d"),  # embedded commas in props
        (3, ts, 12, "click", 0.0, None),  # null props
    ]
    want, got = _codec_roundtrip(spark, rows)
    assert got == want


def test_wire_codec_nulls_in_every_field(spark):
    """A NULL in ANY column must survive the trip as NULL — concat_ws
    silently drops null args, so the sink coalesces every field and the
    parser decodes '' back to NULL (no shifted positions, no ANSI cast
    crash)."""
    ts = dt.datetime(2024, 1, 7, 0, 0, 0, 1)
    rows = [
        (None, ts, 10, "view", 1.0, "p"),
        (5, None, 10, "view", 1.0, "p"),
        (6, ts, None, "view", 1.0, "p"),
        (7, ts, 10, None, 1.0, "p"),
        (8, ts, 10, "view", None, "p"),
        (9, ts, 10, "view", 1.0, None),
    ]
    want, got = _codec_roundtrip(spark, rows)
    assert got == want


def test_read_kafka_stream_plan_is_config_gated(spark):
    """Building the streaming plan needs the kafka connector package;
    absent (this container) it must fail with the canonical
    DATA_SOURCE_NOT_FOUND guidance, not something cryptic."""
    import pytest

    with pytest.raises(Exception, match="(?i)kafka"):
        kafka.read_kafka_stream(spark, "b:9092", "events")

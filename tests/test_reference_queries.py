"""Semantic unit tests for the reference suite (SURVEY.md §2.5) —
properties that must hold regardless of the oracle: Q5 shares sum to 1
per partition, funnel counts are monotone, enrichment is total, the
csv wire roundtrip is lossless at second precision."""

from __future__ import annotations

from pyspark.sql import functions as F

from google_cloud_ecommerce_spark.catalog import load_table
from google_cloud_ecommerce_spark.queries import reference as R


def test_daily_events_covers_all_rows(spark, sf_smoke):
    df = R.daily_events(spark, sf_smoke)
    total = df.agg(F.sum("n_events")).collect()[0][0]
    n = spark.read.parquet(f"{sf_smoke}/events.parquet").count()
    assert total == n


def test_top_categories_at_most_10_sorted(spark, sf_smoke):
    rows = R.top_categories(spark, sf_smoke).collect()
    assert 0 < len(rows) <= 10
    vols = [r.volume for r in rows]
    assert vols == sorted(vols, reverse=True)


def test_conversion_rate_shares_sum_to_one(spark, sf_smoke):
    df = R.conversion_rate(spark, sf_smoke)
    sums = df.groupBy("bucket").agg(F.sum("share").alias("s")).collect()
    for r in sums:
        assert abs(r.s - 1.0) < 1e-3, r


def test_purchase_funnel_monotone(spark, sf_smoke):
    row = R.purchase_funnel(spark, sf_smoke).collect()[0]
    assert row.n_sessions >= row.n_with_view >= row.n_view_then_purchase
    assert row.n_view_then_purchase >= row.n_click_view_purchase >= 0


def test_event_enrichment_total_and_typed(spark, sf_smoke):
    df = R.event_enrichment(spark, sf_smoke)
    n = spark.read.parquet(f"{sf_smoke}/events.parquet").count()
    assert df.count() == n
    assert df.filter(F.col("hour").between(0, 23)).count() == n
    assert df.filter(F.col("weekday").between(1, 7)).count() == n


def test_csv_roundtrip_lossless(spark, sf_smoke):
    src = load_table(spark, sf_smoke, "events")
    rt = R.csv_roundtrip(spark, sf_smoke)
    assert rt.count() == src.count()
    # joined back by event_id: event_type and value survive the wire
    j = src.join(rt.withColumnRenamed("value", "value2"), "event_id", "inner")
    assert j.filter(F.col("value") != F.col("value2")).count() == 0
    # timestamp truncated to seconds, never shifted (ts_second is a
    # session-TZ-rendered string; parse it back under the same TZ)
    parsed = F.to_timestamp(F.col("ts_second"), "yyyy-MM-dd HH:mm:ss")
    bad = j.filter(F.abs(F.unix_micros("ts") - F.unix_micros(parsed)) >= 1_000_000)
    assert bad.count() == 0


def test_record_id_dense(spark, sf_smoke):
    df = R.record_id(spark, sf_smoke)
    n = df.count()
    stats = df.agg(
        F.min("record_id").alias("lo"),
        F.max("record_id").alias("hi"),
        F.countDistinct("record_id").alias("d"),
    ).collect()[0]
    assert (stats.lo, stats.hi, stats.d) == (0, n - 1, n)


def test_rfm_segments_partition_users_exactly_once(spark, sf_smoke):
    from google_cloud_ecommerce_spark.queries.reference import rfm_segments

    rows = rfm_segments(spark, sf_smoke).collect()
    n_users = (
        spark.read.parquet(f"{sf_smoke}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows) == n_users  # exact partition
    for r in rows:
        assert 1 <= r.r_q <= 4 and 1 <= r.f_q <= 4 and 1 <= r.m_q <= 4
        assert r.total_monetary >= 0


def test_band_affinity_lift_and_symmetry_bounds(spark, sf_smoke):
    from google_cloud_ecommerce_spark.queries.reference import band_affinity

    rows = band_affinity(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r.band_a < r.band_b  # each unordered pair appears once
        assert 0 < r.n_both <= min(r.n_a, r.n_b)  # co-occurrence bound
        assert r.lift > 0

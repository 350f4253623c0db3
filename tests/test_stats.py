"""Semantic checks for the bit-exact stats operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from google_cloud_ecommerce_spark.queries import stats


def test_correlation_bounded(spark, sf_smoke):
    rows = stats.value_hour_correlation(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r.corr_value_hour is None or -1.0 <= r.corr_value_hour <= 1.0


def test_trailing_week_at_least_daily(spark, sf_smoke):
    rows = stats.priority_trailing_week_revenue(spark, sf_smoke).collect()
    assert rows
    # trailing sum includes the current day, so it can never be below it
    assert all(r.trailing_7d_revenue >= r.day_revenue - 1e-9 for r in rows)


def test_range_frame_skips_gap_days(spark, tmp_path):
    """A RANGE frame keys on the day VALUE: a day 10 days after the
    previous one must not see it, even though it's the adjacent row
    (where a ROWS frame would wrongly include it)."""
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (1, 100, "O", 100.0, base, "1-URGENT"),
            (2, 100, "O", 50.0, base + dt.timedelta(days=3), "1-URGENT"),
            (3, 100, "O", 7.0, base + dt.timedelta(days=13), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    )
    df.write.parquet(f"{tmp_path}/orders.parquet")
    out = {
        r.day: r.trailing_7d_revenue
        for r in stats.priority_trailing_week_revenue(spark, str(tmp_path)).collect()
    }
    assert out["2024-01-01"] == 100.0
    assert out["2024-01-04"] == 150.0  # within 6 days of Jan 1
    assert out["2024-01-14"] == 7.0    # gap day: Jan 4 is 10 days back, excluded


def test_gapfill_locf_on_crafted_gaps(spark, tmp_path):
    from google_cloud_ecommerce_spark.queries.stats import daily_value_gapfill

    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 10.0, None),
        (2, "2024-01-01 11:00:00", 1, "view", 5.0, None),
        # Jan 2-3 missing entirely for 'view'
        (3, "2024-01-04 09:00:00", 1, "view", 7.0, None),
        (4, "2024-01-02 09:00:00", 2, "cart", 3.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    d = tmp_path / "gapsf"
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))

    out = {(r.event_type, str(r.day)): r for r in daily_value_gapfill(spark, str(d)).collect()}
    # view spans 4 calendar days: Jan 2+3 are filled with Jan 1's total
    assert out[("view", "2024-01-01")].value_filled == 15.0
    assert out[("view", "2024-01-02")].is_filled == 1
    assert out[("view", "2024-01-02")].value_filled == 15.0
    assert out[("view", "2024-01-03")].value_filled == 15.0
    assert out[("view", "2024-01-04")].value_filled == 7.0
    assert out[("view", "2024-01-04")].is_filled == 0
    # cart has a single day: nothing to fill
    assert out[("cart", "2024-01-02")].is_filled == 0
    assert len([k for k in out if k[0] == "cart"]) == 1

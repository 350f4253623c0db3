"""Semantic tests for the temporal-join and scale operators on crafted
fixtures: boundary cases (same-instant match, exactly-one-hour window,
band edges) that the synthetic tables don't guarantee to contain."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F

from google_cloud_ecommerce_spark.queries import joins, scale

T0 = datetime(2024, 3, 1, 12, 0, 0)


def _ts(seconds: float) -> datetime:
    return T0 + timedelta(seconds=seconds)


@pytest.fixture(scope="module")
def crafted_events_sf(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("crafted_events")
    rows = [
        # user 1: view -> purchase (10 s), then view & purchase at the SAME instant
        (1, _ts(0), 1, "view", 10.0, None),
        (2, _ts(10), 1, "purchase", 20.0, None),
        (3, _ts(100), 1, "view", 30.0, None),
        (4, _ts(100), 1, "purchase", 49.99, None),
        # user 2: purchase with no prior view
        (5, _ts(0), 2, "purchase", 50.0, None),
        # user 3: view exactly one hour before purchase (inclusive bound)
        (6, _ts(0), 3, "view", 200.0, None),
        (7, _ts(3600), 3, "purchase", 500.0, None),
        # user 4: view just over one hour before purchase (outside window)
        (8, _ts(0), 4, "view", 0.0, None),
        (9, _ts(3601), 4, "purchase", 499.99, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def test_asof_matches_most_recent_prior_view(spark, crafted_events_sf):
    rows = {r.purchase_event_id: r for r in joins.asof_purchase_view(spark, crafted_events_sf).collect()}
    assert rows[2].view_event_id == 1 and rows[2].gap_seconds == 10.0
    # same-instant view sorts before the purchase -> it matches, gap 0
    assert rows[4].view_event_id == 3 and rows[4].gap_seconds == 0.0
    # no prior view -> null match
    assert rows[5].view_event_id is None and rows[5].gap_seconds is None
    # 1-hour-old and older views still match (as-of has no window)
    assert rows[7].view_event_id == 6 and rows[9].view_event_id == 8


def test_attribution_window_boundaries(spark, crafted_events_sf):
    rows = {
        r.purchase_event_id: r.n_views_prior_hour
        for r in joins.purchase_attribution(spark, crafted_events_sf).collect()
    }
    assert rows[2] == 1  # view 10 s before
    assert rows[4] == 1  # same-instant view excluded (strict <), earlier view counts
    assert rows[5] == 0  # no views at all (left join keeps the purchase)
    assert rows[7] == 1  # exactly one hour before: inclusive
    assert rows[9] == 0  # one hour + 1 s: outside


def test_value_bands_partition_every_event(spark, crafted_events_sf):
    rows = {r.band: r.n_events for r in joins.value_band_stats(spark, crafted_events_sf).collect()}
    assert rows["low"] == 5      # 10, 20, 30, 49.99, 0
    assert rows["mid"] == 1      # 50 (lo inclusive)
    assert rows["high"] == 2     # 200, 499.99
    assert rows["premium"] == 1  # 500 (unbounded top band)
    assert sum(rows.values()) == 9  # every event in exactly one band


def test_salted_agg_equals_direct_groupby(spark, sf_smoke):
    from google_cloud_ecommerce_spark.catalog import load_table

    salted = {r.event_type: r for r in scale.event_type_stats_salted(spark, sf_smoke).collect()}
    direct = {
        r.event_type: r
        for r in load_table(spark, sf_smoke, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .collect()
    }
    assert set(salted) == set(direct)
    for et, r in salted.items():
        assert r.n_events == direct[et].n_events
        assert r.sum_value == direct[et].sum_value  # decimal path: exact


def test_exact_vs_approx_cardinality(spark, sf_smoke):
    exact = {r.event_type: r.n_users for r in scale.user_cardinality(spark, sf_smoke).collect()}
    approx = {
        r.event_type: r.n_users_approx
        for r in scale.user_cardinality_approx(spark, sf_smoke).collect()
    }
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(3, 0.05 * n)  # rsd=0.5%, generous bound


def test_salted_join_equals_plain_join(spark):
    from google_cloud_ecommerce_spark.operators.skew import salted_join

    # 90% of fact rows share one hot key — the shape AQE alone can't fix
    # when a single key exceeds an executor.
    big = spark.createDataFrame(
        [(1 if i % 10 else 2, float(i)) for i in range(1000)], "k long, v double"
    )
    small = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unmatched")], "k long, name string")
    salted = salted_join(big, small, ["k"], n_salts=4)
    plain = big.join(small, on=["k"])
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # the join key seen by the shuffle includes the salt
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan


def test_full_outer_exercises_both_null_extensions(spark, sf_smoke):
    from google_cloud_ecommerce_spark.queries.joins import nation_party_balance_full_outer

    rows = nation_party_balance_full_outer(spark, sf_smoke).collect()
    assert any(r.n_customers == 0 for r in rows), "no supplier-only nation"
    assert any(r.n_suppliers == 0 for r in rows), "no customer-only nation"
    assert any(r.both_sides == 1 for r in rows)


def test_right_outer_keeps_orderless_customers(spark, sf_smoke):
    from google_cloud_ecommerce_spark.catalog import load_table
    from google_cloud_ecommerce_spark.queries.joins import segment_orders_right_outer

    out = segment_orders_right_outer(spark, sf_smoke)
    total_customers = out.agg(F.sum("n_customers")).collect()[0][0]
    assert total_customers == load_table(spark, sf_smoke, "customer").count()
    assert out.agg(F.sum("n_orderless_rows")).collect()[0][0] > 0


def test_streaming_full_outer_superset_of_inner(spark, sf_smoke):
    from google_cloud_ecommerce_spark.streaming.jobs import (
        streaming_view_purchase_full_outer,
    )

    rows = streaming_view_purchase_full_outer(spark, sf_smoke).collect()
    matched = [r for r in rows if r.purchase_event_id is not None and r.view_event_id is not None]
    p_only = [r for r in rows if r.view_event_id is None]
    v_only = [r for r in rows if r.purchase_event_id is None]
    assert matched and p_only and v_only
    assert len(rows) == len(matched) + len(p_only) + len(v_only)

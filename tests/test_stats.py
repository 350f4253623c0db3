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


def test_rolling_median_window_semantics(spark, sf_smoke):
    """The 7-row rolling median must sit within [min, max] of its
    window, and equal the day's own revenue on each partition's first
    row (window of one)."""
    from collections import defaultdict

    from google_cloud_ecommerce_spark.queries import stats

    rows = stats.rolling_median_daily_value(spark, sf_smoke).collect()
    assert rows
    series = defaultdict(list)
    for r in rows:
        series[r.event_type].append(r)
    for et, rs in series.items():
        rs.sort(key=lambda r: r.day)
        assert rs[0].rolling_median_7d == rs[0].day_revenue
        for i, r in enumerate(rs):
            window = [x.day_revenue for x in rs[max(0, i - 6): i + 1]]
            assert min(window) - 1e-6 <= r.rolling_median_7d <= max(window) + 1e-6


def test_time_weighted_vs_plain_average(spark, sf_smoke):
    """Crafted series: value 100 held for 9 time units then 0 held for
    1 unit -> tw avg 90, while the plain mean of emitted values is 50."""
    import datetime as dt

    from google_cloud_ecommerce_spark.queries import stats

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (1, base, 7, "view", 100.0, "{}"),
            (2, base + dt.timedelta(seconds=9), 7, "view", 0.0, "{}"),
            (3, base + dt.timedelta(seconds=10), 7, "view", 55.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = stats.time_weighted_value(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_intervals == 2
    assert r.span_us == 10_000_000
    assert abs(r.tw_avg_value - 90.0) < 1e-9


def test_chisq_uniform_is_near_zero(spark, tmp_path):
    """A perfectly independent contingency (all cells equal) must give
    chi2 == 0; dof = (rows-1)(cols-1)."""
    import datetime as dt

    from google_cloud_ecommerce_spark.queries import stats

    rows = []
    eid = 0
    for day in range(1, 8):  # one full week, 2024-01-01 is a Monday
        for et in ("view", "cart"):
            for _ in range(5):
                eid += 1
                rows.append(
                    (eid, dt.datetime(2024, 1, day, 12), eid, et, 1.0, "{}")
                )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.parquet(f"{tmp_path}/events.parquet")
    out = stats.weekday_eventtype_chisq(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].chi2 == 0.0
    assert out[0].dof == 6
    assert out[0].n_events == 70


def test_ewma_recurrence_exact(spark, sf_smoke):
    """The operator's fold must equal the literal recurrence computed
    driver-side from the same daily series."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from google_cloud_ecommerce_spark.catalog import load_table
    from google_cloud_ecommerce_spark.queries import stats

    daily = (
        load_table(spark, sf_smoke, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("rev"))
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r.event_type].append((r.day, r.rev))
    out = {r.event_type: r for r in stats.ewma_daily_value(spark, sf_smoke).collect()}
    for et, pts in series.items():
        pts.sort()
        s = pts[0][1]
        for _, x in pts[1:]:
            s = (s + x) / 2
        assert out[et].n_days == len(pts)
        assert abs(out[et].ewma_level - round(s, 4)) < 1e-9


def test_cusum_detects_level_shift(spark, tmp_path):
    """A series that jumps from level 10 to level 100 on day 11 must
    alarm at/after the shift and never before; a flat series never
    alarms (sigma 0 edge: cusum 0 is not > 0)."""
    import datetime as dt

    from google_cloud_ecommerce_spark.queries import stats

    rows = []
    eid = 0
    for day in range(1, 21):
        level = 10.0 if day <= 10 else 100.0
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, day, 12), eid, "view", level, "{}"))
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, day, 13), eid, "cart", 5.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.parquet(f"{tmp_path}/events.parquet")
    out = {r.event_type: r for r in stats.cusum_changepoints(spark, str(tmp_path)).collect()}
    v = out["view"]
    assert v.n_alarm_days > 0
    assert v.first_alarm_day >= "2024-01-11"
    assert out["cart"].n_alarm_days == 0


def test_ab_test_z_matches_closed_form(spark, sf_smoke):
    """Recompute the two-proportion z driver-side from the report's own
    counts; significance flag must agree with the critical value."""
    import math

    from google_cloud_ecommerce_spark.queries.stats import (
        AB_Z_CRITICAL,
        ab_test_report,
    )

    r = ab_test_report(spark, sf_smoke).collect()[0]
    assert r.n_a + r.n_b > 0 and r.conv_a <= r.n_a and r.conv_b <= r.n_b
    p1, p2 = r.conv_a / r.n_a, r.conv_b / r.n_b
    pp = (r.conv_a + r.conv_b) / (r.n_a + r.n_b)
    denom = math.sqrt(pp * (1 - pp) * (1 / r.n_a + 1 / r.n_b))
    if denom:
        assert abs(r.z_stat - round((p1 - p2) / denom, 6)) < 1e-9
        assert r.significant_95 == int(abs((p1 - p2) / denom) > AB_Z_CRITICAL)
    else:
        assert r.z_stat is None


def test_holt_matches_driver_side_recurrence(spark, sf_smoke):
    """The two-state fold must equal the literal Holt recurrence, and
    on a perfectly linear series the one-step forecast converges toward
    the true next point."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from google_cloud_ecommerce_spark.catalog import load_table
    from google_cloud_ecommerce_spark.queries import stats

    daily = (
        load_table(spark, sf_smoke, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("rev"))
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r.event_type].append((r.day, r.rev))
    out = {r.event_type: r for r in stats.holt_daily_forecast(spark, sf_smoke).collect()}
    for et, pts in series.items():
        pts.sort()
        s, b = pts[0][1], 0.0
        for _, x in pts[1:]:
            s_new = (x + s + b) / 2
            b = (s_new - s) / 2 + b / 2
            s = s_new
        assert abs(out[et].level - round(s, 4)) < 1e-9
        assert abs(out[et].trend - round(b, 4)) < 1e-9
        assert abs(out[et].forecast_next - round(s + b, 4)) < 1e-7


def test_series_similarity_bounds_and_self_consistency(spark, sf_smoke):
    """Pearson in [-1, 1]; RMSE >= 0; pair count = C(|types present|, 2)
    for fully-aligned series; identical series -> r = 1, rmse = 0 on a
    crafted corpus."""
    import datetime as dt

    from google_cloud_ecommerce_spark.queries.stats import series_similarity

    rows = series_similarity(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r.pearson_r is None or -1.0 - 1e-9 <= r.pearson_r <= 1.0 + 1e-9
        assert r.rmse >= 0

    import tempfile, os
    d = tempfile.mkdtemp()
    recs = []
    eid = 0
    for day in range(1, 6):
        for et in ("view", "cart"):
            eid += 1
            recs.append((eid, dt.datetime(2024, 1, day, 12), eid, et, float(day * 10), "{}"))
    spark.createDataFrame(
        recs,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(d, "events.parquet"))
    out = series_similarity(spark, d).collect()
    assert len(out) == 1
    assert out[0].pearson_r == 1.0 and out[0].rmse == 0.0


def test_cuped_reduces_variance_when_correlated(spark, sf_smoke):
    """theta and the variance-reduction ratio must match the driver-side
    closed forms; reduction equals the squared pre/post correlation and
    is within [0, 1]."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from google_cloud_ecommerce_spark.catalog import load_table
    from google_cloud_ecommerce_spark.queries.stats import ab_test_cuped

    rows = (
        load_table(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.dayofmonth("ts") <= 15, F.col("value").cast("decimal(18,4)"))),
                F.lit(0).cast("decimal(18,4)"),
            ).cast("double").alias("x"),
            F.coalesce(
                F.sum(F.when(F.dayofmonth("ts") >= 16, F.col("value").cast("decimal(18,4)"))),
                F.lit(0).cast("decimal(18,4)"),
            ).cast("double").alias("y"),
        )
        .collect()
    )
    n = len(rows)
    sx = sum(r.x for r in rows); sy = sum(r.y for r in rows)
    var_x = sum(r.x * r.x for r in rows) / n - (sx / n) ** 2
    var_y = sum(r.y * r.y for r in rows) / n - (sy / n) ** 2
    cov = sum(r.x * r.y for r in rows) / n - (sx / n) * (sy / n)
    out = ab_test_cuped(spark, sf_smoke).collect()[0]
    assert out.n_users == n
    assert abs(out.theta - round(cov / var_x, 6)) < 1e-4
    rho2 = cov * cov / (var_x * var_y)
    assert abs(out.var_reduction - rho2) < 1e-3
    assert -1e-9 <= out.var_reduction <= 1.0


def test_decile_lift_chart_invariants(spark, sf_smoke):
    """Shares sum to 1, cumulative share is monotone and ends at 1,
    decile 1 (top spenders) has the largest share of revenue."""
    from google_cloud_ecommerce_spark.queries.stats import decile_lift_chart

    rows = sorted(decile_lift_chart(spark, sf_smoke).collect(), key=lambda r: r.decile)
    assert rows and rows[0].decile == 1
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    assert abs(rows[-1].cum_share - 1.0) < 1e-9
    for a, b in zip(rows, rows[1:]):
        assert b.cum_share >= a.cum_share - 1e-12
    assert rows[0].share == max(r.share for r in rows)


def test_value_quantile_sketch_bounds_and_determinism(spark, sf_correct):
    """The bottom-k-by-hash sample is a uniform sample: its median
    estimate must land within the exact p25..p90 spread, estimates are
    monotone across quantiles, and the sketch is bit-deterministic
    across runs (hash order, not data order)."""
    from pyspark.sql import functions as F

    from google_cloud_ecommerce_spark.catalog import load_table
    from google_cloud_ecommerce_spark.queries.stats import (
        SKETCH_K,
        value_quantile_sketch,
    )

    rows = {r.event_type: r for r in value_quantile_sketch(spark, sf_correct).collect()}
    assert rows
    exact = {
        r.event_type: r
        for r in load_table(spark, sf_correct, "events")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.25)").alias("p25"),
            F.expr("percentile(value, 0.9)").alias("p90"),
        )
        .collect()
    }
    for et, r in rows.items():
        assert r.n_sampled == min(r.n_events, SKETCH_K)
        assert r.p25_est <= r.p50_est <= r.p90_est <= r.p99_est
        assert exact[et].p25 <= r.p50_est <= exact[et].p90
    again = {r.event_type: r for r in value_quantile_sketch(spark, sf_correct).collect()}
    for et in rows:
        assert tuple(rows[et]) == tuple(again[et])


def test_market_basket_rules_crafted(spark, tmp_path):
    """Three baskets with known brand sets → hand-computed support,
    confidence, and lift; repeated lineitems of the same brand in one
    order must count once."""
    li = spark.createDataFrame(
        # order 1: {X, Y}   order 2: {X, Y}   order 3: {X, Z} (X twice)
        # + an empty-string brand (part 40) in every order: must be
        # excluded, not collide with the '' pair/marker sentinel
        [(1, 10), (1, 20), (1, 40), (2, 11), (2, 20), (2, 40),
         (3, 10), (3, 11), (3, 30), (3, 40)],
        "l_orderkey long, l_partkey long",
    )
    part = spark.createDataFrame(
        [(10, "X"), (11, "X"), (20, "Y"), (30, "Z"), (40, "")],
        "p_partkey long, p_brand string",
    )
    li.write.parquet(f"{tmp_path}/lineitem.parquet")
    part.write.parquet(f"{tmp_path}/part.parquet")
    out = {
        (r.brand_a, r.brand_b): r
        for r in stats.market_basket_rules(spark, str(tmp_path)).collect()
    }
    assert set(out) == {("X", "Y"), ("X", "Z")}
    xy = out[("X", "Y")]
    assert (xy.pair_orders, xy.a_orders, xy.b_orders, xy.n_baskets) == (2, 3, 2, 3)
    assert xy.support == 2 / 3 and xy.confidence_ab == 2 / 3
    assert xy.confidence_ba == 1.0
    assert abs(xy.lift - (2 * 3) / (3 * 2)) < 1e-12
    xz = out[("X", "Z")]
    assert (xz.pair_orders, xz.a_orders, xz.b_orders) == (1, 3, 1)
    assert abs(xz.lift - (1 * 3) / (3 * 1)) < 1e-12

"""Semantic checks for the relational suite beyond oracle parity:
join cardinalities, set-op complementarity, window invariants, and the
physical-plan posture (broadcast where hinted, pushdown at the scan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from google_cloud_ecommerce_spark.catalog import load_table
from google_cloud_ecommerce_spark.queries import relational as R


def test_setops_partition_part_table(spark, sf_smoke):
    part = load_table(spark, sf_smoke, "part")
    n_part = part.count()
    never = R.parts_never_ordered(spark, sf_smoke).count()
    ordered_all = (
        load_table(spark, sf_smoke, "lineitem").select("l_partkey").distinct().count()
    )
    assert never == n_part - ordered_all


def test_semi_anti_partition_customers(spark, sf_smoke):
    cust = load_table(spark, sf_smoke, "customer").count()
    without = R.customers_without_orders(spark, sf_smoke).count()
    with_orders = (
        load_table(spark, sf_smoke, "orders").select("o_custkey").distinct().count()
    )
    assert without == cust - with_orders


def test_top_customers_rank_bounds(spark, sf_smoke):
    df = R.top_customers_per_segment(spark, sf_smoke)
    rows = df.collect()
    assert all(1 <= r.rank <= 3 for r in rows)
    segs = {r.c_mktsegment for r in rows}
    per_seg = df.groupBy("c_mktsegment").count().collect()
    assert all(r["count"] <= 3 for r in per_seg)
    assert len(segs) >= 1


def test_rollup_has_grand_total(spark, sf_smoke):
    rows = R.order_priority_rollup(spark, sf_smoke).collect()
    grand = [r for r in rows if r.o_orderpriority is None and r.o_orderstatus is None]
    assert len(grand) == 1
    n = load_table(spark, sf_smoke, "orders").count()
    assert grand[0].n_orders == n


def test_pivot_row_sums_match_totals(spark, sf_smoke):
    df = R.order_status_pivot(spark, sf_smoke)
    total = df.select(
        (F.sum("n_open") + F.sum("n_finished") + F.sum("n_partial")).alias("t")
    ).collect()[0].t
    assert total == load_table(spark, sf_smoke, "orders").count()


def test_quartiles_balanced(spark, sf_smoke):
    rows = R.lineitem_quartiles(spark, sf_smoke).collect()
    assert len(rows) == 4
    counts = [r.n for r in rows]
    assert max(counts) - min(counts) <= 1  # ntile balance property


def test_first_shipment_not_before_order(spark, sf_smoke):
    df = R.first_shipment_per_order(spark, sf_smoke)
    orders = load_table(spark, sf_smoke, "orders").select("o_orderkey", "o_orderdate")
    j = df.join(orders, "o_orderkey")
    assert j.filter(F.col("first_shipdate") < F.col("o_orderdate")).count() == 0


def test_broadcast_hint_in_plan(spark, sf_smoke):
    plan = R.shipping_priority(spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_filter_pushed_to_scan(spark, sf_smoke):
    df = R.tpch_q1_pricing_summary(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_approx_percentiles_track_exact(spark, sf_smoke):
    """The sketch must land within a tight band of the exact
    percentile on the smoke data (10k-accuracy sketch, tiny input)."""
    from google_cloud_ecommerce_spark.queries.reference import (
        value_percentiles,
        value_percentiles_approx,
    )

    exact = {r.event_type: r.p50 for r in value_percentiles(spark, sf_smoke).collect()}
    approx = {
        r.event_type: r.p50_approx
        for r in value_percentiles_approx(spark, sf_smoke).collect()
    }
    assert exact.keys() == approx.keys()
    for t, p in exact.items():
        assert abs(approx[t] - p) <= max(0.05 * abs(p), 0.5), (t, p, approx[t])

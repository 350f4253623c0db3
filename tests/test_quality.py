"""Semantic checks for the data-quality report and the foreachBatch
incremental materialized view."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from google_cloud_ecommerce_spark.catalog import load_table
from google_cloud_ecommerce_spark.queries.quality import data_quality_report
from google_cloud_ecommerce_spark.streaming.jobs import streaming_incremental_mv

BASE = dt.datetime(2024, 1, 1)


def test_report_clean_on_testdata(spark, sf_smoke):
    rows = {r.check_name: r for r in data_quality_report(spark, sf_smoke).collect()}
    assert len(rows) == 7
    assert all(r.n_violations == 0 for r in rows.values())
    n_events = load_table(spark, sf_smoke, "events").count()
    assert rows["events_null_props"].n_checked == n_events
    n_lineitem = load_table(spark, sf_smoke, "lineitem").count()
    assert rows["lineitem_orphan_orderkey"].n_checked == n_lineitem


def test_report_catches_crafted_violations(spark, tmp_path):
    d = str(tmp_path)
    spark.createDataFrame(
        [
            (1, BASE, 1, "view", 1.0, None),          # null props
            (1, BASE, 1, "cart", -2.0, "{}"),         # dup id + bad type + negative
            (2, BASE, 9, "purchase", 3.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    spark.createDataFrame(
        [(1, 100, "O", 5.0, BASE, "1-URGENT"), (2, 999, "O", 6.0, BASE, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [(100, "c", 1, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        [
            (1, 1, 1, 1, 1.0, 1.0, 0.5, 0.0, "N", "O", BASE),
            (7, 1, 1, 2, 1.0, 1.0, 1.5, 0.0, "N", "O", BASE),  # orphan + discount>1
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ).write.parquet(f"{d}/lineitem.parquet")

    rows = {r.check_name: r.n_violations for r in data_quality_report(spark, d).collect()}
    assert rows == {
        "events_null_props": 1,
        "events_negative_value": 1,
        "events_duplicate_event_id": 1,
        "events_bad_event_type": 1,
        "orders_orphan_custkey": 1,
        "lineitem_orphan_orderkey": 1,
        "lineitem_discount_range": 1,
    }


def test_incremental_mv_equals_batch(spark, sf_smoke):
    mv = {
        (str(r.day), r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in streaming_incremental_mv(spark, sf_smoke).collect()
    }
    batch = {
        (str(r.day), r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in load_table(spark, sf_smoke, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .collect()
    }
    assert mv == batch


def test_two_level_window_equals_direct_hourly(spark, sf_smoke):
    from google_cloud_ecommerce_spark.streaming.jobs import streaming_two_level_window

    chained = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 4))
        for r in streaming_two_level_window(spark, sf_smoke).collect()
    }
    direct = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 4))
        for r in load_table(spark, sf_smoke, "events")
        .groupBy(F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("window_start"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .collect()
    }
    assert chained == direct


def test_functional_dependencies_semantics(spark, sf_smoke):
    from google_cloud_ecommerce_spark.queries.quality import functional_dependencies

    rows = {(r.determinant, r.dependent): r for r in
            functional_dependencies(spark, sf_smoke).collect()}
    # event_id is the table key: it determines every other column
    assert rows[("event_id", "user_id")].holds == 1
    assert rows[("event_id", "event_type")].holds == 1
    # 5 event types across thousands of users: cannot determine user_id
    assert rows[("event_type", "user_id")].holds == 0
    for r in rows.values():  # n_distinct(A) <= n_distinct(A,B) always
        assert r.n_distinct_a <= r.n_distinct_ab


def test_fuzzy_matches_blocking_is_lossless(spark, sf_smoke):
    """Length blocking must not lose pairs: the blocked result equals a
    brute-force all-pairs scan over the vocabulary. Every reported pair
    respects the distance bound and the canonical (a < b) ordering."""
    from pyspark.sql import functions as F

    from google_cloud_ecommerce_spark.catalog import load_table
    from google_cloud_ecommerce_spark.queries.quality import (
        FUZZY_MAX_DIST,
        fuzzy_name_matches,
    )

    got = {
        (r.name_a, r.name_b): r.edit_dist
        for r in fuzzy_name_matches(spark, sf_smoke).collect()
    }
    import itertools

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    names = [
        r.p_name
        for r in load_table(spark, sf_smoke, "part").select("p_name").distinct().collect()
    ]
    want = {}
    for a, b in itertools.combinations(sorted(names), 2):
        d = lev(a, b)
        if d <= FUZZY_MAX_DIST:
            want[(a, b)] = d
    assert got == want
    assert all(a < b for (a, b) in got)


def test_skyline_dominance_definition(spark, sf_smoke):
    """No returned point is dominated by any input point, and every
    excluded point is dominated by some skyline point (2-D min-min)."""
    from google_cloud_ecommerce_spark.catalog import load_table
    from google_cloud_ecommerce_spark.queries.scale import part_skyline

    pts = {
        (r.p_retailprice, r.p_size)
        for r in load_table(spark, sf_smoke, "part")
        .select("p_retailprice", "p_size")
        .distinct()
        .collect()
    }
    sky = {(r.price, r.size) for r in part_skyline(spark, sf_smoke).collect()}
    assert sky <= pts

    def dominates(q, p):
        return q[0] <= p[0] and q[1] <= p[1] and q != p

    for p in sky:
        assert not any(dominates(q, p) for q in pts)
    for p in pts - sky:
        assert any(dominates(q, p) for q in sky)


def test_props_schema_discovery_new_keys_appear(spark, tmp_path):
    """A key added to only some rows shows up with correct counts and
    type inference — no code change, no declared schema."""
    import datetime as dt

    from google_cloud_ecommerce_spark.queries.quality import props_schema_discovery

    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "view", 1.0, '{"k": 3, "tag": "red"}'),
        (2, dt.datetime(2024, 1, 1), 2, "view", 1.0, '{"k": 4}'),
        (3, dt.datetime(2024, 1, 1), 3, "view", 1.0, '{"tag": "blue", "z": "9"}'),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.parquet(f"{tmp_path}/events.parquet")
    out = {r.key: r for r in props_schema_discovery(spark, str(tmp_path)).collect()}
    assert set(out) == {"k", "tag", "z"}
    assert out["k"].n_rows == 2 and out["k"].n_numeric == 2
    assert out["tag"].n_rows == 2 and out["tag"].n_numeric == 0
    assert out["z"].n_numeric == 1
    assert out["tag"].n_distinct_values == 2

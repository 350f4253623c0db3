"""Data-quality report: the constraint checks a pipeline runs before
trusting a drop of data (the reference ingests with zero validation —
``write_session_batch.py`` inserts whatever the CSV chunk contains).

One row per check: (check_name, n_checked, n_violations). Scale
posture: all per-table checks for a table ride ONE scan as conditional
aggregates (not one scan per check), and referential checks are LEFT
joins with a null-probe count — Catalyst/AQE picks broadcast vs
sort-merge by dim size, and the output is always a handful of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from google_cloud_ecommerce_spark.catalog import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")

    types = ", ".join(f"'{t}'" for t in EVENT_TYPES)
    ev_stats = ev.agg(
        F.count("*").alias("n"),
        F.sum(F.col("props").isNull().cast("long")).alias("null_props"),
        F.sum((F.col("value") < 0).cast("long")).alias("neg_value"),
        (F.count("*") - F.count_distinct("event_id")).alias("dup_ids"),
        F.sum((~F.col("event_type").isin(*EVENT_TYPES)).cast("long")).alias("bad_type"),
    )
    ev_checks = ev_stats.select(
        F.expr(
            "stack(4, 'events_null_props', null_props,"
            " 'events_negative_value', neg_value,"
            " 'events_duplicate_event_id', dup_ids,"
            " 'events_bad_event_type', bad_type) AS (check_name, n_violations)"
        ),
        F.col("n").alias("n_checked"),
    ).select("check_name", "n_checked", "n_violations")

    orphan_orders = (
        orders.join(
            customer.select("c_custkey"),
            orders["o_custkey"] == customer["c_custkey"],
            "left",
        )
        .agg(
            F.lit("orders_orphan_custkey").alias("check_name"),
            F.count("*").alias("n_checked"),
            F.sum(F.col("c_custkey").isNull().cast("long")).alias("n_violations"),
        )
    )
    orphan_lineitem = (
        lineitem.join(
            orders.select("o_orderkey"),
            lineitem["l_orderkey"] == orders["o_orderkey"],
            "left",
        )
        .agg(
            F.lit("lineitem_orphan_orderkey").alias("check_name"),
            F.count("*").alias("n_checked"),
            F.sum(F.col("o_orderkey").isNull().cast("long")).alias("n_violations"),
        )
    )
    discount_range = lineitem.agg(
        F.lit("lineitem_discount_range").alias("check_name"),
        F.count("*").alias("n_checked"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast("long")
        ).alias("n_violations"),
    )

    return ev_checks.unionByName(orphan_orders).unionByName(orphan_lineitem).unionByName(
        discount_range
    )


_types = ", ".join(f"'{t}'" for t in EVENT_TYPES)
DATA_QUALITY_REPORT_SQL = f"""
    SELECT 'events_null_props' AS check_name, CAST(count(*) AS BIGINT) AS n_checked,
           CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM events
    UNION ALL
    SELECT 'events_negative_value', CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) FROM events
    UNION ALL
    SELECT 'events_duplicate_event_id', CAST(count(*) AS BIGINT),
           CAST(count(*) - COUNT(DISTINCT event_id) AS BIGINT) FROM events
    UNION ALL
    SELECT 'events_bad_event_type', CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN event_type NOT IN ({_types}) THEN 1 ELSE 0 END) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'orders_orphan_custkey', CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem_orphan_orderkey', CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'lineitem_discount_range', CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
"""


QUERIES = {"data_quality_report": data_quality_report}
ORACLE = {"data_quality_report": DATA_QUALITY_REPORT_SQL}

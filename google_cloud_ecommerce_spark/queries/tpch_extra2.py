"""Second decorrelation suite: the remaining classic TPC-H shapes,
adapted to this star schema (no partsupp / l_commitdate / l_shipmode —
lineitem doubles as the part-supplier bridge, and lateness is measured
as l_shipdate - o_orderdate). SURVEY.md §2.7 mandates the full Spark
join surface; reference `/root/reference/README.md:35-37` implies joins
only for funnels, so these shapes come from the TPC-H spec the driver's
tables mirror.

  min_cost_part_suppliers   correlated `= (SELECT min ...)` per part
                            -> window MIN over the shrunk pair agg (Q2)
  product_type_profit       multi-dim profit rollup, decimal-exact
                            revenue-minus-cost (Q9)
  important_parts_value     HAVING against a global-scalar fraction
                            -> 1-row broadcast (Q11)
  ship_delay_priority       conditional counts over a derived band
                            (Q12's CASE-sum shape)
  excess_quantity_suppliers dominant-supplier nested-agg semi-join
                            chain (Q20)
  lonely_late_suppliers     EXISTS + NOT EXISTS self-joins on the same
                            fact (Q21: semi then anti, no row explosion)

Scale posture (100 TB):
  - Every dim (part, supplier, nation, region) is broadcast; lineitem
    never shuffles for a lookup.
  - min_cost_part_suppliers prunes lineitem with broadcast semi-filters
    on the eligible part/supplier keys BEFORE the pair aggregate; the
    window MIN then runs on the |eligible pairs|-sized aggregate, not
    the fact.
  - important_parts_value's global total is a 1-row broadcast
    (BroadcastNestedLoopJoin with a constant build side).
  - lonely_late_suppliers' semi/anti self-joins key on l_orderkey, so
    the late-line set shuffles once and both probes reuse the
    distinct-pair aggregates (orders-sized, not lineitem-sized).

Determinism policy (queries/reference.py): money through DECIMAL,
ratios/averages ship unrounded (IEEE division of bit-identical
operands), timestamp outputs rendered via date_format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from google_cloud_ecommerce_spark.catalog import load_table
from google_cloud_ecommerce_spark.queries.relational import (
    _REV_SQL,
    _dsum,
    _dsum_sql,
    _revenue_dec,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_REV_SUM_SQL = f"CAST(SUM({_REV_SQL}) AS DOUBLE)"


# ---------------------------------------------------------------------------
# min_cost_part_suppliers — TPC-H Q2 shape. For STANDARD parts of two
# sizes sold by EUROPE suppliers: the supplier(s) with the minimum
# average unit price for that part. The textbook correlated
# `= (SELECT min(...) WHERE same part)` decorrelates to a window MIN
# over the per-(part, supplier) aggregate — the window repartitions
# only the pair-sized aggregate, never lineitem. Unit price is a
# double division of two decimal-exact sums, identical in both
# engines, so the equality against the window MIN is bit-stable.
# ---------------------------------------------------------------------------


def min_cost_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    part = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "STANDARD") & F.col("p_size").isin(15, 25))
        .select("p_partkey", "p_name", "p_brand")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    pair = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "p_brand", "s_name", "n_name")
        .agg((_dsum(F.col("l_extendedprice")) / _dsum(F.col("l_quantity"))).alias("unit_price"))
    )
    min_price = F.min("unit_price").over(Window.partitionBy("p_partkey"))
    return (
        pair.withColumn("min_price", min_price)
        .filter(F.col("unit_price") == F.col("min_price"))
        .select("p_partkey", "p_name", "p_brand", "s_name", "n_name", "unit_price")
    )


MIN_COST_PART_SUPPLIERS_SQL = f"""
    WITH pair AS (
        SELECT p_partkey, p_name, p_brand, s_name, n_name,
               {_dsum_sql('l_extendedprice')} / {_dsum_sql('l_quantity')} AS unit_price
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
             AND p_type = 'STANDARD' AND p_size IN (15, 25)
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        GROUP BY 1, 2, 3, 4, 5
    )
    SELECT p_partkey, p_name, p_brand, s_name, n_name, unit_price
    FROM (SELECT pair.*, min(unit_price) OVER (PARTITION BY p_partkey) AS min_price
          FROM pair)
    WHERE unit_price = min_price
"""


# ---------------------------------------------------------------------------
# product_type_profit — TPC-H Q9 shape: profit on PROMO parts per
# supplier nation x order year. Profit = revenue - retail cost, both
# decimal-exact products (doubles quantize at 2 decimals, so the
# decimal casts are lossless); the sum is order-independent.
# ---------------------------------------------------------------------------


def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey", "p_retailprice")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cost = F.col("p_retailprice").cast("decimal(12,2)") * F.col("l_quantity").cast(
        "decimal(12,2)"
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(_revenue_dec() - cost).cast("double").alias("profit"))
    )


PRODUCT_TYPE_PROFIT_SQL = f"""
    SELECT n_name, year(o_orderdate) AS o_year,
           CAST(SUM({_REV_SQL}
                    - CAST(p_retailprice AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# important_parts_value — TPC-H Q11 shape: parts whose revenue exceeds
# 0.1% of total revenue. The global scalar joins as a 1-row broadcast
# onto the per-part aggregate (never onto lineitem); both engines
# derive the identical double threshold, so `>` is bit-stable. The
# 0.1% fraction keys the output size to the part-count distribution,
# not the fact size — scale-stable.
# ---------------------------------------------------------------------------


def important_parts_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(F.sum(_revenue_dec()).alias("part_value_dec"))
    total = per_part.agg(
        (F.sum("part_value_dec").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value_dec").cast("double") > F.col("threshold"))
        .select("l_partkey", F.col("part_value_dec").cast("double").alias("part_value"))
    )


IMPORTANT_PARTS_VALUE_SQL = f"""
    WITH per_part AS (
        SELECT l_partkey, SUM({_REV_SQL}) AS part_value_dec
        FROM lineitem GROUP BY 1
    )
    SELECT l_partkey, CAST(part_value_dec AS DOUBLE) AS part_value
    FROM per_part
    WHERE CAST(part_value_dec AS DOUBLE)
          > (SELECT CAST(SUM(part_value_dec) AS DOUBLE) * 0.001 FROM per_part)
"""


# ---------------------------------------------------------------------------
# ship_delay_priority — TPC-H Q12 shape (schema has no l_shipmode, so
# the band is the ship delay itself): per delay band, how many lines
# belong to urgent-priority orders vs the rest. One fact-fact join on
# orderkey, then a CASE-sum conditional aggregate — Catalyst plans
# partial+final hash aggregation over the derived band column.
# ---------------------------------------------------------------------------


def ship_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    band = (
        F.when(delay <= 30, "0-30")
        .when(delay <= 60, "31-60")
        .when(delay <= 90, "61-90")
        .otherwise("90+")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(band.alias("delay_band"))
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).alias("low_line_count"),
        )
    )


SHIP_DELAY_PRIORITY_SQL = """
    SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN '0-30'
                WHEN datediff('day', o_orderdate, l_shipdate) <= 60 THEN '31-60'
                WHEN datediff('day', o_orderdate, l_shipdate) <= 90 THEN '61-90'
                ELSE '90+' END AS delay_band,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
"""


# ---------------------------------------------------------------------------
# excess_quantity_suppliers — TPC-H Q20 shape: suppliers who dominated
# a PROMO part's 1997 volume (shipped more than half of it). The
# nested aggregate pair (per-pair qty, per-part total) both shrink to
# dimension size before any join; the supplier list arrives via a
# LEFT SEMI join, so each supplier appears once regardless of how many
# parts it dominates.
# ---------------------------------------------------------------------------


def excess_quantity_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    promo = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    li = li.join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"))
    pair = li.groupBy("l_partkey", "l_suppkey").agg(
        _dsum(F.col("l_quantity")).alias("pair_qty")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (_dsum(F.col("l_quantity")) * F.lit(0.5)).alias("half_qty")
    )
    dominant = (
        pair.join(per_part, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("pair_qty") > F.col("half_qty"))
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        supp.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


EXCESS_QUANTITY_SUPPLIERS_SQL = f"""
    WITH li AS (
        SELECT l_partkey, l_suppkey, l_quantity
        FROM lineitem JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
    ),
    pair AS (
        SELECT l_partkey, l_suppkey, {_dsum_sql('l_quantity')} AS pair_qty
        FROM li GROUP BY 1, 2
    ),
    per_part AS (
        SELECT l_partkey AS t_partkey, {_dsum_sql('l_quantity')} * 0.5 AS half_qty
        FROM li GROUP BY 1
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM pair JOIN per_part ON l_partkey = t_partkey
        WHERE pair_qty > half_qty
    )
"""


# ---------------------------------------------------------------------------
# lonely_late_suppliers — TPC-H Q21 shape: on multi-supplier orders,
# the supplier who alone shipped late (> 60 days after the order
# date). EXISTS(another supplier on the order) plans a LEFT SEMI and
# NOT EXISTS(another LATE supplier) a LEFT ANTI — both self-joins key
# on l_orderkey over distinct (order, supplier) pairs, which are
# orders-sized, not lineitem-sized. Output is one count per supplier.
# ---------------------------------------------------------------------------


# scan-audit: TPC-H Q21 shape: base + EXISTS-semi + NOT-EXISTS-anti are three
# references to lineitem by definition of the query
def lonely_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    late = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    other = (F.col("l.l_orderkey") == F.col("r.l_orderkey")) & (
        F.col("l.l_suppkey") != F.col("r.l_suppkey")
    )
    lonely = (
        late.alias("l")
        .join(pairs.alias("r"), other, "left_semi")
        .join(late.alias("r"), other, "left_anti")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        lonely.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
    )


LONELY_LATE_SUPPLIERS_SQL = """
    WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    late AS (
        SELECT DISTINCT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_suppkey, s_name, count(*) AS numwait
    FROM late l
    JOIN supplier ON l.l_suppkey = s_suppkey
    WHERE EXISTS (SELECT 1 FROM pairs r
                  WHERE r.l_orderkey = l.l_orderkey
                    AND r.l_suppkey <> l.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late r
                      WHERE r.l_orderkey = l.l_orderkey
                        AND r.l_suppkey <> l.l_suppkey)
    GROUP BY 1, 2
"""


QUERIES = {
    "min_cost_part_suppliers": min_cost_part_suppliers,
    "product_type_profit": product_type_profit,
    "important_parts_value": important_parts_value,
    "ship_delay_priority": ship_delay_priority,
    "excess_quantity_suppliers": excess_quantity_suppliers,
    "lonely_late_suppliers": lonely_late_suppliers,
}

ORACLE = {
    "min_cost_part_suppliers": MIN_COST_PART_SUPPLIERS_SQL,
    "product_type_profit": PRODUCT_TYPE_PROFIT_SQL,
    "important_parts_value": IMPORTANT_PARTS_VALUE_SQL,
    "ship_delay_priority": SHIP_DELAY_PRIORITY_SQL,
    "excess_quantity_suppliers": EXCESS_QUANTITY_SUPPLIERS_SQL,
    "lonely_late_suppliers": LONELY_LATE_SUPPLIERS_SQL,
}

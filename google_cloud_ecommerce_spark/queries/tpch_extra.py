"""Decorrelation & join-pattern suite: the classic TPC-H shapes the
driver's star schema supports that ``relational.py`` does not already
cover (SURVEY.md §2.7 requires the *full* Spark join surface even
though the reference codes zero joins — reference
`/root/reference/README.md:35-37` implies them for funnels only).

Each query is a named decorrelation pattern, written the way Catalyst
wants it — the correlated subquery of the textbook form is manually
decorrelated into an aggregate + join so the plan is explicit and
auditable (tests/test_plans.py):

  late_shipment_priority    EXISTS with a correlated non-equi predicate
                            -> left-semi join with a join-filter
  promo_revenue_ratio       conditional-aggregate ratio (Q14)
  small_quantity_revenue    per-group AVG threshold join-back (Q17)
  large_volume_orders       HAVING on a fact agg, joined back (Q18)
  returned_item_customers   multi-join revenue rollup (Q10)
  top_supplier_revenue      agg == MAX(agg) join-back (Q15's view)
  brand_size_supplier_counts  COUNT(DISTINCT) over a bridge (Q16-ish)
  disjunctive_band_revenue  OR-of-ANDs predicate spanning both sides (Q19)
  idle_rich_customers       global-scalar filter + anti-join (Q22-ish)
  volume_shipping           nation-pair revenue, two dim hops (Q7)
  national_market_share     share-of-total across join tree (Q8-ish)
  props_json_stats          JSON props extraction (events.props)

Scale posture (100 TB):
  - part (SF x 200k rows) / supplier (SF x 10k) / nation are broadcast
    on every appearance; the lineitem fact is never shuffled for a dim
    lookup.
  - The per-part aggregate in small_quantity_revenue shrinks lineitem
    to one row per partkey BEFORE the join-back — the join is then
    fact x (fact-sized-but-narrow) sort-merge on l_partkey, which AQE
    converts to broadcast when the filtered agg is small.
  - The global scalar in idle_rich_customers is a 1-row broadcast
    (BroadcastNestedLoopJoin with a single build row), never a
    cartesian.
  - top_supplier_revenue's MAX join-back touches only the 10k-row
    supplier aggregate, not lineitem.

Determinism policy (see queries/reference.py): money sums go through
DECIMAL, ratios ship unrounded (IEEE division of bit-identical
operands), timestamp outputs are strings via date_format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from google_cloud_ecommerce_spark.catalog import load_table
from google_cloud_ecommerce_spark.queries.relational import (
    _CHARGE_SQL,  # noqa: F401  (kept for symmetry with relational)
    _REV_SQL,
    _dsum,
    _dsum_sql,
    _revenue_dec,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev_sum() -> F.Column:
    return F.sum(_revenue_dec()).cast("double")


_REV_SUM_SQL = f"CAST(SUM({_REV_SQL}) AS DOUBLE)"


# ---------------------------------------------------------------------------
# late_shipment_priority — TPC-H Q4 shape. "Orders placed in 1997 where
# at least one lineitem shipped more than 90 days after the order
# date", counted per priority. The textbook EXISTS decorrelates to a
# LEFT SEMI join whose non-equi part rides along as a join filter on
# the equi-join on l_orderkey — one shuffle pair, no row explosion
# (semi stops at first match).
# ---------------------------------------------------------------------------


def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_late_orders"))
    )


LATE_SHIPMENT_PRIORITY_SQL = """
    SELECT o_orderpriority, count(*) AS n_late_orders
    FROM orders o
    WHERE o.o_orderdate >= '1997-01-01' AND o.o_orderdate < '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY 1
"""


# ---------------------------------------------------------------------------
# promo_revenue_ratio — TPC-H Q14 shape per month: the share of revenue
# from PROMO parts. part is broadcast; the ratio is an IEEE division of
# two decimal-exact sums (unrounded — see module docstring).
# ---------------------------------------------------------------------------


def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _revenue_dec()).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            (F.lit(100.0) * F.sum(promo).cast("double") / _rev_sum()).alias(
                "promo_revenue_pct"
            )
        )
    )


PROMO_REVENUE_RATIO_SQL = f"""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / {_REV_SUM_SQL} AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
"""


# ---------------------------------------------------------------------------
# small_quantity_revenue — TPC-H Q17 shape: revenue lost to
# small-quantity orders of one brand's parts. The correlated
# `l_quantity < 0.5 * (SELECT avg ... WHERE same part)` decorrelates to
# a per-partkey aggregate joined back onto lineitem. The aggregate is
# |parts|-sized (tiny next to lineitem), so AQE broadcasts it; the
# brand filter cuts it further before the join.
# The threshold (0.5 * exact-sum / count) is computed identically in
# both engines — double comparison is then bit-stable.
# ---------------------------------------------------------------------------


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    brand_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.5) * (_dsum(F.col("l_quantity")) / F.count("*"))).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double") / 7.0)
            .alias("avg_yearly_loss")
        )
    )


SMALL_QUANTITY_REVENUE_SQL = f"""
    WITH pa AS (
        SELECT l_partkey AS t_partkey,
               0.5 * ({_dsum_sql('l_quantity')} / count(*)) AS qty_threshold
        FROM lineitem GROUP BY 1
    )
    SELECT {_dsum_sql('l_extendedprice')} / 7.0 AS avg_yearly_loss
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#23'
    JOIN pa ON l_partkey = t_partkey
    WHERE l_quantity < qty_threshold
"""


# ---------------------------------------------------------------------------
# large_volume_orders — TPC-H Q18 shape: orders whose total quantity
# exceeds 240, joined back to orders+customer for display. The HAVING
# aggregate shrinks lineitem to one row per qualifying orderkey first;
# the join-back is keyed on the (already-shuffled) orderkey and the
# customer dim is broadcast. o_orderdate is rendered to a string
# JVM-side (process-TZ stability).
# ---------------------------------------------------------------------------


def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 240.0)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            "total_qty",
        )
    )


LARGE_VOLUME_ORDERS_SQL = f"""
    WITH big AS (
        SELECT l_orderkey, {_dsum_sql('l_quantity')} AS total_qty
        FROM lineitem GROUP BY 1
        HAVING {_dsum_sql('l_quantity')} > 240.0
    )
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_totalprice, total_qty
    FROM big JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# returned_item_customers — TPC-H Q10 shape: revenue attributable to
# returned items per customer over one quarter. lineitem⋈orders is the
# one fact-fact sort-merge; customer and nation ride in as broadcasts.
# ---------------------------------------------------------------------------


def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_rev_sum().alias("returned_revenue"))
    )


RETURNED_ITEM_CUSTOMERS_SQL = f"""
    SELECT c_custkey, c_name, c_acctbal, n_name,
           {_REV_SUM_SQL} AS returned_revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= '1997-01-01' AND o_orderdate < '1997-04-01'
    GROUP BY 1, 2, 3, 4
"""


# ---------------------------------------------------------------------------
# top_supplier_revenue — TPC-H Q15 shape: the supplier(s) with maximum
# revenue in 1997Q1. The "= (SELECT MAX ...)" decorrelates to a 1-row
# broadcast joined on equality of the decimal-exact revenue (both
# engines derive the identical double, so equality is stable). Only
# the |supplier|-sized aggregate is rescanned, never lineitem.
# ---------------------------------------------------------------------------


def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy("l_suppkey").agg(_rev_sum().alias("total_revenue"))
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(top), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


TOP_SUPPLIER_REVENUE_SQL = f"""
    WITH rev AS (
        SELECT l_suppkey, {_REV_SUM_SQL} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


# ---------------------------------------------------------------------------
# brand_size_supplier_counts — TPC-H Q16 shape adapted to this schema
# (no partsupp table; lineitem is the part-supplier bridge): distinct
# suppliers per (brand, type, size) for mid-range sizes, excluding one
# brand. COUNT(DISTINCT) plans a two-phase partial-distinct aggregate;
# part is broadcast onto the bridge scan.
# ---------------------------------------------------------------------------


def brand_size_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    bridge = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") != "Brand#13") & F.col("p_size").isin(1, 9, 19, 29, 39, 49))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        bridge.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


BRAND_SIZE_SUPPLIER_COUNTS_SQL = """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#13' AND p_size IN (1, 9, 19, 29, 39, 49)
    GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# disjunctive_band_revenue — TPC-H Q19 shape: an OR of conjunctions
# mixing columns from both join sides. The equi-join key still
# extracts (l_partkey = p_partkey), so Catalyst plans a broadcast hash
# join with the disjunction as a post-join filter — NOT a cartesian.
# ---------------------------------------------------------------------------


def disjunctive_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    bands = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 25)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(bands)
        .agg(_rev_sum().alias("band_revenue"), F.count("*").alias("n_lines"))
    )


DISJUNCTIVE_BAND_REVENUE_SQL = f"""
    SELECT {_REV_SUM_SQL} AS band_revenue, count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 25)
"""


# ---------------------------------------------------------------------------
# idle_rich_customers — TPC-H Q22 shape adapted (schema has no phone
# country codes): customers with above-global-average positive balance
# and no order since 2000, per market segment. The global scalar is a
# 1-row broadcast (BroadcastNestedLoopJoin, constant-size build side);
# the NOT EXISTS is a left-anti join on custkey against the pruned
# orders scan (the date filter is pushed to parquet).
# ---------------------------------------------------------------------------


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg((_dsum(F.col("c_acctbal")) / F.count("*")).alias("avg_bal"))
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            _dsum(F.col("c_acctbal")).alias("total_balance"),
        )
    )


IDLE_RICH_CUSTOMERS_SQL = f"""
    SELECT c_mktsegment, count(*) AS n_customers,
           {_dsum_sql('c_acctbal')} AS total_balance
    FROM customer c
    WHERE c.c_acctbal > (SELECT {_dsum_sql('c_acctbal')} / count(*)
                         FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= '2000-01-01')
    GROUP BY 1
"""


# ---------------------------------------------------------------------------
# volume_shipping — TPC-H Q7 shape: revenue shipped between a nation
# pair (both directions), per year. Two independent broadcast hops of
# the 25-row nation dim (aliased) — the fact tables shuffle only for
# their own equi-join.
# ---------------------------------------------------------------------------


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        (F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2")
    ) | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(pair)
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(_rev_sum().alias("revenue"))
    )


VOLUME_SHIPPING_SQL = f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           year(l_shipdate) AS ship_year, {_REV_SUM_SQL} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE (cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
       OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# national_market_share — TPC-H Q8 shape: NATION_5's supplier share of
# revenue sold into its own region's market, per year. The numerator
# is a conditional decimal sum over the same joined stream as the
# denominator — one pass, no second scan; the share ships unrounded.
# ---------------------------------------------------------------------------


# scan-audit: the re-scanned table is the 25-row nation dim (broadcast both
# times); the fact side scans once
def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    # customer-side: restrict to the market region of NATION_5
    target_region = (
        nation.filter(F.col("n_name") == "NATION_5").select("n_regionkey")
    )
    market_nations = nation.join(
        F.broadcast(target_region), "n_regionkey"
    ).select(F.col("n_nationkey").alias("mn_key"))
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    national = F.when(
        F.col("supp_nation") == "NATION_5", _revenue_dec()
    ).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(market_nations), F.col("c_nationkey") == F.col("mn_key"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            (F.sum(national).cast("double") / _rev_sum()).alias("market_share")
        )
    )


NATIONAL_MARKET_SHARE_SQL = f"""
    SELECT year(o_orderdate) AS order_year,
           CAST(SUM(CASE WHEN sn.n_name = 'NATION_5' THEN {_REV_SQL}
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
               / {_REV_SUM_SQL} AS market_share
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation mn ON c_nationkey = mn.n_nationkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE mn.n_regionkey = (SELECT n_regionkey FROM nation WHERE n_name = 'NATION_5')
    GROUP BY 1
"""


# ---------------------------------------------------------------------------
# props_json_stats — the reference stores its category map as a
# STRINGIFIED dict (`/root/reference/batch_pipeline/write_session_batch.py:15-22`,
# visible in images/spanner_store.png); the driver's events.props is
# the analogous JSON-ish string column. Parse it natively with
# from_json (JVM-side Jackson, codegen'd) — never a Python UDF — and
# aggregate on the extracted key.
# ---------------------------------------------------------------------------


def props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT").getField("k")
    return (
        ev.withColumn("k", k)
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count("*").alias("n_events"),
            _dsum(F.col("value")).alias("sum_value"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


PROPS_JSON_STATS_SQL = f"""
    WITH parsed AS (
        SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k, value
        FROM events
    )
    SELECT k % 10 AS k_bucket, count(*) AS n_events,
           {_dsum_sql('value')} AS sum_value,
           min(k) AS min_k, max(k) AS max_k
    FROM parsed GROUP BY 1
"""


# ---------------------------------------------------------------------------
# props_variant_stats — the same stringified-dict parse as
# props_json_stats, but through Spark 4's VARIANT type (parse_json +
# try_variant_get): the open-schema path for semi-structured columns,
# where from_json needs the schema up front. Binary-encoded variant
# beats re-parsing JSON text per access at scale.
# ---------------------------------------------------------------------------


def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        ev.withColumn("k", k)
        # floor(k/25.0), not k DIV 25: Spark DIV truncates toward zero
        # while floor division rounds down, so the two diverge for
        # negative k — the floor form is sign-stable across engines
        .groupBy(F.expr("CAST(floor(k / 25.0) AS BIGINT)").alias("k_band"))
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("k").alias("n_keys"),
            _dsum(F.col("value")).alias("sum_value"),
        )
    )


PROPS_VARIANT_STATS_SQL = f"""
    WITH parsed AS (
        SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k, value
        FROM events
    )
    SELECT CAST(floor(k / 25.0) AS BIGINT) AS k_band, count(*) AS n_events,
           count(DISTINCT k) AS n_keys,
           {_dsum_sql('value')} AS sum_value
    FROM parsed GROUP BY 1
"""


QUERIES = {
    "late_shipment_priority": late_shipment_priority,
    "promo_revenue_ratio": promo_revenue_ratio,
    "small_quantity_revenue": small_quantity_revenue,
    "large_volume_orders": large_volume_orders,
    "returned_item_customers": returned_item_customers,
    "top_supplier_revenue": top_supplier_revenue,
    "brand_size_supplier_counts": brand_size_supplier_counts,
    "disjunctive_band_revenue": disjunctive_band_revenue,
    "idle_rich_customers": idle_rich_customers,
    "volume_shipping": volume_shipping,
    "national_market_share": national_market_share,
    "props_json_stats": props_json_stats,
    "props_variant_stats": props_variant_stats,
}

ORACLE = {
    "late_shipment_priority": LATE_SHIPMENT_PRIORITY_SQL,
    "promo_revenue_ratio": PROMO_REVENUE_RATIO_SQL,
    "small_quantity_revenue": SMALL_QUANTITY_REVENUE_SQL,
    "large_volume_orders": LARGE_VOLUME_ORDERS_SQL,
    "returned_item_customers": RETURNED_ITEM_CUSTOMERS_SQL,
    "top_supplier_revenue": TOP_SUPPLIER_REVENUE_SQL,
    "brand_size_supplier_counts": BRAND_SIZE_SUPPLIER_COUNTS_SQL,
    "disjunctive_band_revenue": DISJUNCTIVE_BAND_REVENUE_SQL,
    "idle_rich_customers": IDLE_RICH_CUSTOMERS_SQL,
    "volume_shipping": VOLUME_SHIPPING_SQL,
    "national_market_share": NATIONAL_MARKET_SHARE_SQL,
    "props_json_stats": PROPS_JSON_STATS_SQL,
    "props_variant_stats": PROPS_VARIANT_STATS_SQL,
}

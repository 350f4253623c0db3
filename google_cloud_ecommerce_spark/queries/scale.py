"""Scale-posture operators: the shapes that keep a 100 TB aggregation
from dying on a skewed or high-cardinality key.

  event_type_stats_salted  two-stage (salted) aggregation over a
                           LOW-cardinality skewed key. event_type has ~5
                           values over billions of rows; a direct
                           groupBy funnels each value through one
                           reducer. Stage 1 aggregates (event_type,
                           salt) across 32 salts — map-side combine
                           still applies — stage 2 merges 5×32 tiny
                           partials. Same result as the direct groupBy
                           (the oracle proves it), shuffle fan-in ×32.
  user_cardinality         exact COUNT(DISTINCT) per group — Spark
                           plans expand+two-phase agg; fine while the
                           distinct key fits a shuffle.
  user_cardinality_approx  the 100 TB form: HyperLogLog++ sketch
                           (approx_count_distinct, rsd=0.5%); sketch
                           values are engine-specific so this entry is
                           rows-only checked (no oracle), with the
                           exact twin above as the semantic anchor.

The salt is `event_id % N_SALTS` (uniform, deterministic), not a
hash — cross-engine determinism for the oracle and no hash-seed
dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from google_cloud_ecommerce_spark.catalog import load_table

N_SALTS = 32


def event_type_stats_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    partial = (
        ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(N_SALTS)))
        .groupBy("event_type", "salt")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sv"),
        )
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("cnt").alias("n_events"),
            F.sum("sv").cast("double").alias("sum_value"),
            F.round(F.sum("sv").cast("double") / F.sum("cnt"), 4).alias("avg_value"),
        )
    )


EVENT_TYPE_STATS_SALTED_SQL = """
    SELECT event_type, count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4)
               AS avg_value
    FROM events GROUP BY 1
"""


def user_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).alias("n_users"),
        F.count("*").alias("n_events"),
    )


USER_CARDINALITY_SQL = """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, count(*) AS n_events
    FROM events GROUP BY 1
"""


def user_cardinality_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch cardinality — rows-only checked (sketch estimates
    are engine-specific); `user_cardinality` is the exact anchor."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.005).alias("n_users_approx"),
        F.count("*").alias("n_events"),
    )


QUERIES = {
    "event_type_stats_salted": event_type_stats_salted,
    "user_cardinality": user_cardinality,
    "user_cardinality_approx": user_cardinality_approx,
}

ORACLE = {
    "event_type_stats_salted": EVENT_TYPE_STATS_SALTED_SQL,
    "user_cardinality": USER_CARDINALITY_SQL,
    # user_cardinality_approx: intentionally no oracle (rows-only).
}

"""Declarative SQL UDFs (Spark 4 ``CREATE FUNCTION ... RETURN expr``).

The reference's only reusable function is a row-wise Python callable
(`/root/reference/batch_pipeline/write_session_batch.py:12-22`, applied
via rdd.map). The engine-native upgrade is a SQL-defined scalar
function: named, typed, and INLINED by Catalyst into the calling query
— it compiles into the same whole-stage-codegen'd expressions as a
hand-written column, so unlike a Python UDF it costs nothing at any
scale. The functions below package the repo's exact-decimal revenue
policy and a value-band bucketing CASE as reusable vocabulary.

``line_revenue`` RETURNS DOUBLE is still bit-exact: the inner product
is decimal (4 decimal places, magnitude < 1e8), so the double holds it
exactly, and the caller re-enters DECIMAL(18,4) before summing —
identical values to the oracle's pure-decimal pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from google_cloud_ecommerce_spark.catalog import load_table

LINE_REVENUE_DDL = """
    CREATE OR REPLACE TEMPORARY FUNCTION line_revenue(price DOUBLE, disc DOUBLE)
    RETURNS DOUBLE
    RETURN CAST(CAST(price AS DECIMAL(12,2)) * (1 - CAST(disc AS DECIMAL(4,2))) AS DOUBLE)
"""

VALUE_BAND_DDL = """
    CREATE OR REPLACE TEMPORARY FUNCTION value_band(v DOUBLE)
    RETURNS STRING
    RETURN CASE WHEN v < 50.0 THEN 'low'
                WHEN v < 200.0 THEN 'mid'
                WHEN v < 500.0 THEN 'high'
                ELSE 'premium' END
"""


def register_sql_udfs(spark: SparkSession) -> None:
    spark.sql(LINE_REVENUE_DDL)
    spark.sql(VALUE_BAND_DDL)


def sql_udf_revenue_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both SQL UDFs in one query: lineitem revenue through
    ``line_revenue``, bucketed by ``value_band`` of the line's
    extended price share (price/quantity — the unit price)."""
    register_sql_udfs(spark)
    for name in ("lineitem",):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(
        """
        SELECT value_band(l_extendedprice / l_quantity) AS unit_price_band,
               l_returnflag,
               count(*) AS n_lines,
               CAST(SUM(CAST(line_revenue(l_extendedprice, l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        GROUP BY 1, 2
        """
    )


QUERIES = {"sql_udf_revenue_bands": sql_udf_revenue_bands}

ORACLE = {
    "sql_udf_revenue_bands": """
        SELECT CASE WHEN l_extendedprice / l_quantity < 50.0 THEN 'low'
                    WHEN l_extendedprice / l_quantity < 200.0 THEN 'mid'
                    WHEN l_extendedprice / l_quantity < 500.0 THEN 'high'
                    ELSE 'premium' END AS unit_price_band,
               l_returnflag,
               count(*) AS n_lines,
               CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                                  * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
                             AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        GROUP BY 1, 2
    """,
}


# ---------------------------------------------------------------------------
# SQL TABLE function (Spark 4 ``CREATE FUNCTION ... RETURNS TABLE``):
# a parameterized view — the declarative, Catalyst-inlined counterpart
# of a Python UDTF. ``events_value_profile(lo, hi)`` aggregates the
# events table inside one value band; the report query calls it once
# per band and unions the slices. Like the scalar SQL UDFs above it
# costs nothing at scale: each invocation inlines into a plain
# filtered aggregate with the band predicate pushed to the scan.
# ---------------------------------------------------------------------------

VALUE_PROFILE_TF_DDL = """
    CREATE OR REPLACE TEMPORARY FUNCTION events_value_profile(lo DOUBLE, hi DOUBLE)
    RETURNS TABLE(event_type STRING, n_events BIGINT, sum_value DOUBLE)
    RETURN SELECT event_type, count(*) AS n_events,
                  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
           FROM events
           WHERE value >= lo AND value < hi
           GROUP BY event_type
"""

_TF_BANDS = ((0.0, 100.0, "low"), (100.0, 400.0, "mid"), (400.0, 1e9, "high"))


# scan-audit: one invocation of the SQL table function per band is the API
# surface under test; each scan carries a pushed disjoint value-range filter,
# so total I/O ~ one full pass
def sql_table_function_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    spark.sql(VALUE_PROFILE_TF_DDL)
    union = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS band, * FROM events_value_profile({lo!r}, {hi!r})"
        for lo, hi, name in _TF_BANDS
    )
    return spark.sql(union)


def _sql_table_function_profile_sql() -> str:
    union = "\nUNION ALL\n".join(
        f"""SELECT '{name}' AS band, event_type, count(*) AS n_events,
                  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
           FROM events WHERE value >= {lo!r} AND value < {hi!r}
           GROUP BY event_type"""
        for lo, hi, name in _TF_BANDS
    )
    return union


QUERIES["sql_table_function_profile"] = sql_table_function_profile
ORACLE["sql_table_function_profile"] = _sql_table_function_profile_sql()

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

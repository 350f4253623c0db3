"""SQL UDF inlining and observe() metric piggybacking.

Both are engine surfaces with no reference analogue but real 100 TB
value: SQL UDFs give named reusable logic at zero runtime cost (they
inline into codegen — asserted here by the absence of any Python eval
node), and observe() attaches quality counters to a query that is
running anyway (no second scan of the input)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import Observation
from pyspark.sql import functions as F

from google_cloud_ecommerce_spark.catalog import load_table
from google_cloud_ecommerce_spark.functions.sql_udf import sql_udf_revenue_bands


def _plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_sql_udf_inlines_into_codegen(spark, sf_smoke):
    df = sql_udf_revenue_bands(spark, sf_smoke)
    plan = _plan_of(df)
    # inlined means: no Python evaluation node, and the CASE branches
    # surface as plain expressions in the aggregate/scan stages
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan


def test_sql_udf_matches_inline_expression(spark, sf_smoke):
    via_udf = {
        (r.unit_price_band, r.l_returnflag): (r.n_lines, r.revenue)
        for r in sql_udf_revenue_bands(spark, sf_smoke).collect()
    }
    li = load_table(spark, sf_smoke, "lineitem")
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    band = (
        F.when(unit < 50.0, "low")
        .when(unit < 200.0, "mid")
        .when(unit < 500.0, "high")
        .otherwise("premium")
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("double")
    direct = {
        (r.unit_price_band, r.l_returnflag): (r.n_lines, r.revenue)
        for r in li.groupBy(band.alias("unit_price_band"), "l_returnflag")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(rev.cast("decimal(18,4)")).cast("double").alias("revenue"),
        )
        .collect()
    }
    assert via_udf == direct


def test_observe_metrics_piggyback_on_query(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    obs = Observation("quality")
    observed = ev.observe(
        obs,
        F.count("*").alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).alias("null_values"),
        F.sum((F.col("value") < 0).cast("long")).alias("negative_values"),
    )
    per_type = observed.groupBy("event_type").count().collect()
    metrics = obs.get
    assert metrics["n_rows"] == sum(r["count"] for r in per_type)
    assert metrics["null_values"] == 0
    assert metrics["negative_values"] == 0

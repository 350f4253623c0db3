"""Schema-evolution reads, ORC roundtrip, and the AQE skew-join split
— the remaining source/sink + adaptive-execution posture checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from google_cloud_ecommerce_spark import io as gio


def test_parquet_schema_evolution_merges_columns(spark, tmp_path):
    d = str(tmp_path / "evolved")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(d)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(d)

    df = gio.read_parquet_evolved(spark, d)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: r for r in df.collect()}
    assert rows[1].score is None  # pre-evolution file reads NULL
    assert rows[2].score == 9.5


def test_orc_roundtrip_preserves_types_and_values(spark, tmp_path, sf_smoke):
    from google_cloud_ecommerce_spark.catalog import load_table

    src = load_table(spark, sf_smoke, "orders")
    path = str(tmp_path / "orders_orc")
    gio.write_orc(src, path)
    back = gio.read_orc(spark, path)
    assert back.schema == src.schema
    a = src.agg(F.count("*"), F.sum("o_totalprice"), F.min("o_orderkey")).collect()
    b = back.agg(F.count("*"), F.sum("o_totalprice"), F.min("o_orderkey")).collect()
    assert a == b


def test_orc_pushes_filters(spark, tmp_path, sf_smoke):
    from google_cloud_ecommerce_spark.catalog import load_table

    path = str(tmp_path / "li_orc")
    gio.write_orc(load_table(spark, sf_smoke, "lineitem"), path)
    import io as _io
    from contextlib import redirect_stdout

    buf = _io.StringIO()
    with redirect_stdout(buf):
        gio.read_orc(spark, path).filter(F.col("l_quantity") > 40).select(
            "l_orderkey"
        ).explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters", 1)[1][:200]


def test_aqe_splits_skewed_join_partition(spark):
    """A hot key must not serialize the whole join through one reducer:
    with AQE skew handling, the oversized post-shuffle partition is
    split into parallel subpartitions (skew=true in the final plan)."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = (
            spark.range(0, 60_000)
            .withColumn("key", (F.col("id") % 50).cast("long"))
            # every key collides into few partitions; key 0 dominated
            .withColumn("key", F.when(F.col("id") < 45_000, F.lit(0)).otherwise(F.col("key")))
            .withColumn("payload", F.md5(F.col("id").cast("string")))
        )
        right = spark.range(0, 50).withColumnRenamed("id", "key")
        joined = left.join(right, "key")
        # collect() (not count()) so the inspected queryExecution is the
        # one that actually ran to a final adaptive plan
        assert len(joined.collect()) == 60_000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

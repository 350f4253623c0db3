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


def test_dynamic_partition_overwrite_replaces_only_touched_days(spark, tmp_path):
    """Backfilling one day must not clobber sibling partitions —
    partitionOverwriteMode=dynamic is the conf that makes overwrite
    per-partition instead of whole-table."""
    path = str(tmp_path / "days")
    saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        spark.createDataFrame(
            [("2024-01-01", 1), ("2024-01-02", 2)], "day string, v int"
        ).write.partitionBy("day").mode("overwrite").parquet(path)
        # backfill day 2 only
        spark.createDataFrame(
            [("2024-01-02", 99)], "day string, v int"
        ).write.partitionBy("day").mode("overwrite").parquet(path)
        # partition-column values type-infer back as DATE; stringify
        rows = {str(r.day): r.v for r in spark.read.parquet(path).collect()}
        assert rows == {"2024-01-01": 1, "2024-01-02": 99}
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)


def test_wau_superset_of_daily_users(spark, sf_smoke):
    from google_cloud_ecommerce_spark.catalog import load_table
    from google_cloud_ecommerce_spark.queries.scale import (
        daily_user_sketch_rollup,
        rolling_weekly_active_users,
    )

    wau = {r.day: r.wau for r in rolling_weekly_active_users(spark, sf_smoke).collect()}
    dau = {
        str(r.day): r.dau
        for r in load_table(spark, sf_smoke, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count_distinct("user_id").alias("dau"))
        .collect()
    }
    assert set(wau) == set(dau)
    assert all(wau[d] >= dau[d] for d in dau)

    # sketch estimates should land within 5% of exact weekly cardinality
    est = {r.week: r.approx_weekly_users for r in daily_user_sketch_rollup(spark, sf_smoke).collect()}
    exact = {
        r.week: r.u
        for r in load_table(spark, sf_smoke, "events")
        .groupBy(F.date_format(F.date_trunc("week", F.to_date("ts")), "yyyy-MM-dd").alias("week"))
        .agg(F.count_distinct("user_id").alias("u"))
        .collect()
    }
    assert set(est) == set(exact)
    for w in exact:
        assert abs(est[w] - exact[w]) <= max(2, 0.05 * exact[w])


def test_range_partitioned_sorted_write_gives_disjoint_file_ranges(
    spark, sf_smoke, tmp_path
):
    """Zone-map layout for time-scans at scale: repartitionByRange(ts) +
    sortWithinPartitions(ts) writes files whose [min(ts), max(ts)]
    ranges are pairwise DISJOINT, so a time-predicate scan prunes whole
    files/row-groups from parquet footer stats alone. A plain write has
    every file spanning the full month and prunes nothing."""
    import os

    from google_cloud_ecommerce_spark.catalog import load_table

    ev = load_table(spark, sf_smoke, "events")
    out = str(tmp_path / "ordered")
    # INT96 (the legacy default) carries no parquet column statistics;
    # micros-typed output is what a stats-pruning layout requires anyway
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    (
        ev.repartitionByRange(4, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(out)
    )
    import pyarrow.parquet as pq

    ranges = []
    for f in os.listdir(out):
        if f.endswith(".parquet"):
            md = pq.ParquetFile(os.path.join(out, f)).metadata
            col_idx = next(
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == "ts"
            )
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 3  # range partitioner actually split the data
    ranges.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, "file time-ranges overlap; layout lost its ordering"
    # and the total row count survives the re-layout
    assert spark.read.parquet(out).count() == ev.count()


def test_binary_file_source_reads_blobs(spark, tmp_path):
    blobs = {"a.img": b"\x89IMG" + bytes(range(64)), "b.img": b"\x89IMG" + b"\x00" * 128,
             "skip.txt": b"not media"}
    for name, payload in blobs.items():
        (tmp_path / name).write_bytes(payload)

    df = gio.read_binary_dir(spark, str(tmp_path), glob="*.img")
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.img", "b.img"}  # glob pruned the .txt at listing
    assert bytes(rows["a.img"].content) == blobs["a.img"]
    assert rows["b.img"].length == len(blobs["b.img"])

    small = gio.read_binary_dir(spark, str(tmp_path), glob="*.img", max_bytes=100)
    assert [r.path.rsplit("/", 1)[-1] for r in small.collect()] == ["a.img"]


def test_permissive_json_quarantines_bad_rows(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        '{"id": "not-a-number", "name": "bad-type"}\n'
        "this is not json at all\n"
        '{"id": 3, "name": "fine"}\n'
    )
    df = gio.read_json_permissive(spark, str(p), "id bigint, name string")
    rows = df.collect()
    assert len(rows) == 4  # nothing dropped, nothing crashed
    clean = [r for r in rows if r._corrupt_record is None]
    quarantined = [r for r in rows if r._corrupt_record is not None]
    assert {r.id for r in clean} == {1, 3}
    assert len(quarantined) == 2
    assert any("not json at all" in r._corrupt_record for r in quarantined)

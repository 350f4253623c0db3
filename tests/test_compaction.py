"""Small-file compaction + runtime bloom-filter join injection.

Both are scale-posture checks: compaction is the maintenance op every
append sink needs at 100 TB, and the bloom-filter runtime filter is
Spark's row-level semi-join pushdown for selective fact⋈dim joins —
worth pinning that our plans remain eligible for it.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from google_cloud_ecommerce_spark import io as gio
from google_cloud_ecommerce_spark.catalog import load_table


def _parquet_files(d: str) -> list[str]:
    return [f for f in glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
            if os.path.isfile(f)]


def test_compact_parquet_dir_merges_small_files(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(src)  # 64 tiny files
    assert len(_parquet_files(src)) == 64

    n_out = gio.compact_parquet_dir(spark, src, dst, target_file_bytes=1 << 30)
    assert n_out == 1
    assert len(_parquet_files(dst)) == 1
    # content preserved exactly
    a = spark.read.parquet(src).agg(F.count("*"), F.sum("id"), F.sum("v")).collect()
    b = spark.read.parquet(dst).agg(F.count("*"), F.sum("id"), F.sum("v")).collect()
    assert a == b


def test_compact_respects_target_size(spark, tmp_path):
    src, dst = str(tmp_path / "s2"), str(tmp_path / "d2")
    spark.range(0, 50_000).withColumn("payload", F.md5(F.col("id").cast("string"))) \
        .repartition(32).write.parquet(src)
    total = sum(os.path.getsize(f) for f in _parquet_files(src))
    target = max(1, total // 4)
    n_out = gio.compact_parquet_dir(spark, src, dst, target_file_bytes=target)
    assert 2 <= n_out <= 8
    assert len(_parquet_files(dst)) == n_out


def test_runtime_bloom_filter_injected_on_selective_dim_join(spark, sf_smoke):
    """With the runtime bloom filter enabled and thresholds floored, a
    selective dim filter joined to a big fact injects a
    BloomFilterMightContain probe on the fact scan side."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # disable broadcast so the join is shuffle-based (bloom filters
        # target exactly the case where broadcast pruning is unavailable)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        lineitem = load_table(spark, sf_smoke, "lineitem")
        orders = load_table(spark, sf_smoke, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan.lower() or "mightcontain" in plan.lower(), plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

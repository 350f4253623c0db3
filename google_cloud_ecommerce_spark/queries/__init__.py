"""Query registry.

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
and ``ORACLE: dict[str, str]`` (DuckDB ANSI-SQL twins; keys without an
oracle get the driver's weaker rows-only check). ``all_queries`` /
``all_oracles`` merge every suite for ``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from google_cloud_ecommerce_spark.operators import (
        dedup,
        multimodal,
        pandas_ops,
        pipeline,
        similarity,
        text,
    )
    from google_cloud_ecommerce_spark.queries import (
        cdc,
        joins,
        quality,
        reference,
        relational,
        scale,
        stats,
        tpch_extra,
        tpch_extra2,
    )
    from google_cloud_ecommerce_spark.functions import sql_udf
    from google_cloud_ecommerce_spark.sources import wire
    from google_cloud_ecommerce_spark.streaming import jobs as streaming_jobs

    return (
        reference,
        relational,
        joins,
        cdc,
        quality,
        scale,
        stats,
        tpch_extra,
        tpch_extra2,
        dedup,
        similarity,
        text,
        multimodal,
        pandas_ops,
        pipeline,
        wire,
        sql_udf,
        streaming_jobs,
    )


def _merge(attr: str) -> dict:
    merged: dict = {}
    for mod in _modules():
        entries = getattr(mod, attr)
        dup = merged.keys() & entries.keys()
        if dup:  # a silent overwrite would hide an operator from the gate
            raise ValueError(f"duplicate {attr} keys across modules: {sorted(dup)}")
        merged.update(entries)
    return merged


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _merge("QUERIES")


def all_oracles() -> dict[str, str]:
    return _merge("ORACLE")

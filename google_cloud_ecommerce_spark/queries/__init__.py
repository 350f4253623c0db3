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
        similarity,
        text,
    )
    from google_cloud_ecommerce_spark.queries import joins, reference, relational, scale
    from google_cloud_ecommerce_spark.streaming import jobs as streaming_jobs

    return (
        reference,
        relational,
        joins,
        scale,
        dedup,
        similarity,
        text,
        multimodal,
        pandas_ops,
        streaming_jobs,
    )


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _modules():
        merged.update(mod.ORACLE)
    return merged

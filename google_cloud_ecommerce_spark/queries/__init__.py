"""Query registry.

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
and ``ORACLE: dict[str, str]`` (DuckDB ANSI-SQL twins; keys without an
oracle get the driver's weaker rows-only check). ``all_queries`` /
``all_oracles`` merge every suite for ``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from google_cloud_ecommerce_spark.operators import dedup, multimodal, similarity, text
    from google_cloud_ecommerce_spark.queries import reference, relational
    from google_cloud_ecommerce_spark.streaming import jobs as streaming_jobs

    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (reference, relational, dedup, similarity, text, multimodal, streaming_jobs):
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    from google_cloud_ecommerce_spark.operators import dedup, multimodal, similarity, text
    from google_cloud_ecommerce_spark.queries import reference, relational
    from google_cloud_ecommerce_spark.streaming import jobs as streaming_jobs

    merged: dict[str, str] = {}
    for mod in (reference, relational, dedup, similarity, text, multimodal, streaming_jobs):
        merged.update(mod.ORACLE)
    return merged

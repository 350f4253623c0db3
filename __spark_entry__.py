"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (Q1 daily_events) on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 + extensions.
``oracle_sql()`` — DuckDB ANSI-SQL twin per query (keys omitted only for
genuinely non-SQL-expressible ops, which get the rows-only check).

Implementations live in ``google_cloud_ecommerce_spark``; this file is a
thin adapter so the driver and humans share one registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from google_cloud_ecommerce_spark.queries import all_oracles, all_queries  # noqa: E402
from google_cloud_ecommerce_spark.queries.reference import daily_events  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: Q1 daily_events (count per day x event_type) at sf0.001."""
    return daily_events(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()

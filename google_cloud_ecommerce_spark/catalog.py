"""Testdata catalog: parquet tables -> DataFrames + temp views.

The reference declared its schemas inline at every boundary (Spark
StructType at ``write_session_batch.py:150-160``, Spanner DDL at
``:61-88``, BigQuery schema at ``write_session_stream.py:81-98``).
Here there is exactly one catalog: typed parquet scans (schema carried
by the files) registered once as temp views so both the DataFrame API
and ``spark.sql`` see the same tables.

Scans stay lazy; Catalyst prunes columns and pushes predicates into the
parquet reader, which is what makes the same code viable at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Columns stored as TIMESTAMP(NANOS) in the testdata parquet; read as
# int64 nanos (spark.sql.legacy.parquet.nanosAsLong) + converted in
# load_table, since Spark has no nanosecond TimestampType.
NANOS_TS_COLUMNS = frozenset({"ts"})

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# DataFrame (logical plan) cache: spark.read.parquet does driver-side
# file listing + footer schema reads on every call, and queries touch
# the same tables repeatedly. Plans are immutable, so reusing one per
# (session, dir, table) is safe and cuts fixed per-query latency.
# Keyed by applicationId: a new session (e.g. the driver's) gets fresh
# plans bound to its own context.
_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy typed scan of one testdata table.

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    reader rejects outright. We read nanos as raw int64 (legacy conf)
    and floor-divide to microseconds — integer arithmetic, because the
    value (~1.7e18) exceeds double's 2^53 exact range — matching how
    microsecond-native engines (DuckDB, Spark's own TimestampType)
    truncate nanos on read.
    """
    # Runtime-settable; required because the driver hands us its own
    # session, which won't have these in its builder. UTC keeps
    # day/hour/weekday derivations stable against any tz-naive oracle.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _PLAN_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    ts_nanos = [
        f.name
        for f in df.schema.fields
        if f.dataType.simpleString() == "bigint" and f.name in NANOS_TS_COLUMNS
    ]
    for c in ts_nanos:
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} DIV 1000)"))
    # Testdata written as timestamp[us] without isAdjustedToUTC reads as
    # TIMESTAMP_NTZ. Only the event-time column is normalized to
    # TimestampType (session TZ pinned UTC above preserves wall-clock
    # exactly): unix_micros / session_window / watermarks require it.
    # Other tables' date-like columns STAY NTZ on purpose — NTZ collects
    # as naive datetimes, so raw outputs are process-TZ stable and match
    # DuckDB's naive TIMESTAMP reading of the same files.
    ntz_event_cols = [
        f.name
        for f in df.schema.fields
        if f.dataType.simpleString() == "timestamp_ntz" and f.name in NANOS_TS_COLUMNS
    ]
    for c in ntz_event_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    _PLAN_CACHE[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load every testdata table; optionally register temp views.

    Views let operators be written in whichever of DataFrame/SQL reads
    more clearly — Catalyst produces the same plan either way.
    """
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        dfs[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return dfs

"""Reference per-row transforms as pure Column expressions.

The reference applied these row-at-a-time: a Python callable over an RDD
(``batch_pipeline/write_session_batch.py:40-46``) and a Beam DoFn
(``streaming_pipeline/write_session_stream.py:19-59``). Every one of
them is expressible as a built-in Column function, which keeps the whole
pipeline inside whole-stage codegen — no Python workers, no pickle
serialization, no per-row interpreter round-trip. That is the difference
between "works on 100 rows per chunk" and "works on 100 TB".

Numbering follows SURVEY.md §2.3 (operators #11-#21).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window

CATEGORY_LEVELS = ("category", "sub_category", "product", "product_details")


def cast_all_to_string(cols: list[str]) -> list[Column]:
    """#11 — the reference's ``pdf.astype(str)`` (write_session_batch.py:29).

    Provided for parity; the engine itself keeps real types (string-typing
    every column breaks predicate pushdown and type-aware compression).
    """
    return [F.col(c).cast("string").alias(c) for c in cols]


def null_fill(col: str, default: str) -> Column:
    """#12 — ``pdf['brand'].fillna('Not Specified')`` (write_session_batch.py:32-33)."""
    return F.coalesce(F.col(col), F.lit(default)).alias(col)


def split_category_code(col: str = "category_code") -> list[Column]:
    """#13/#14 — dot-split ``category_code`` into up to 4 typed columns.

    Reference: ``write_session_batch.py:15-22`` builds a *stringified dict*;
    ``write_session_stream.py:38-41`` emits 4 nullable columns (nulls where
    the code has fewer parts — visible in images/bigquery_store.png).
    ``F.get`` (not ``getItem``) past the split length: under ANSI mode
    (Spark 4 default) getItem throws INVALID_ARRAY_INDEX, get returns null.
    """
    parts = F.split(F.col(col), r"\.")
    return [F.get(parts, i).alias(name) for i, name in enumerate(CATEGORY_LEVELS)]


def category_map(col: str = "category_code") -> Column:
    """#14 (map form) — the reference's dict(zip(levels, parts)) as a real MapType."""
    parts = F.split(F.col(col), r"\.")
    return F.map_from_arrays(
        F.array(*[F.lit(n) for n in CATEGORY_LEVELS]),
        F.array(*[F.get(parts, i) for i in range(4)]),
    ).alias("category_map")


def parse_event_time(col: str = "event_time") -> Column:
    """#15 — timestamp parse + timezone strip.

    Reference parses ``'%Y-%m-%d %H:%M:%S %Z'`` then re-parses without the
    zone (simulate_session_stream.py:13-17, write_session_stream.py:25-31).
    """
    return F.to_timestamp(
        F.regexp_replace(F.col(col), r"\s*(UTC|\+00:?00)$", ""),
        "yyyy-MM-dd HH:mm:ss",
    ).alias("event_time")


def cast_price(col: str = "price") -> Column:
    """#16 — ``float(record[6])`` (write_session_stream.py:32)."""
    return F.col(col).cast("double").alias(col)


def extract_hour(ts_col: str) -> Column:
    """#17 — ``int(record[0][11:13])`` (write_session_stream.py:34-35).

    Cast to long so the output type matches common SQL engines' hour().
    """
    return F.hour(F.col(ts_col)).cast("long").alias("hour")


def parse_csv_line(value_col: str, schema_ddl: str) -> Column:
    """#18 — decode + comma-split a message payload into typed fields.

    Reference: ``element.decode('utf-8').split(',')`` then positional
    assignment (write_session_stream.py:51-57). ``from_csv`` does the
    decode/split/typing in one codegen'd expression.
    """
    return F.from_csv(F.decode(F.col(value_col), "UTF-8"), F.lit(schema_ddl)).alias("record")


def serialize_csv_line(cols: list[str]) -> Column:
    """#19 — comma-join + utf-8 encode (send_session_stream.py:30-33)."""
    return F.encode(F.concat_ws(",", *[F.col(c).cast("string") for c in cols]), "UTF-8").alias(
        "value"
    )


def to_named_record(cols: list[str]) -> Column:
    """#20 — dict(zip(column_names, record)) (write_session_stream.py:44-48)."""
    return F.struct(*[F.col(c) for c in cols]).alias("record")


def synthetic_row_id(order_cols: list[str]) -> Column:
    """#21 — dense synthetic row id.

    The reference used the pandas index (write_session_batch.py:172-173),
    which resets per 100-row chunk — its Spanner ``record_id`` is 0 for
    every chunk's first row. A dense global id needs a total order;
    ``row_number`` over that order is the correct (shuffle-bearing)
    replacement. For an id that only needs uniqueness, prefer
    ``F.monotonically_increasing_id()`` (no shuffle, scales freely).
    """
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return (F.row_number().over(w) - F.lit(1)).cast("long").alias("record_id")

"""Local replica of the driver's differential-oracle check.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet files, then compares row-count, column
names, and an order-insensitive canonicalization of all values. Used by
``tests/test_oracle_parity.py`` (the pre-flight for the driver's t2
gate) and runnable standalone:

    python tests/oracle_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from google_cloud_ecommerce_spark.catalog import TABLES  # noqa: E402


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):  # Spark-written table dir (crafted fixtures)
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(float(v))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize every cell, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_cell(row[i]) for i in order) for row in rows]
    out.sort()
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [c[0] for c in rel.description]
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
    sc = canonical_rows(s_cols, s_rows)
    dc = canonical_rows(d_cols, d_rows)
    if sc != dc:
        only_s = [r for r in sc if r not in set(dc)][:5]
        only_d = [r for r in dc if r not in set(sc)][:5]
        problems.append(f"values differ; spark-only sample={only_s} duckdb-only sample={only_d}")
    return problems


def run_parity(sf_dir: str, names: list[str] | None = None) -> dict[str, list[str]]:
    import __spark_entry__ as e
    from google_cloud_ecommerce_spark.session import get_spark

    spark = get_spark(app_name="oracle_parity")
    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb_connect(sf_dir)
    results: dict[str, list[str]] = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        if name not in oracles:
            results[name] = ["(rows-only: no oracle)"]
            continue
        try:
            results[name] = compare(fn(spark, sf_dir), con, oracles[name])
        except Exception as exc:  # pragma: no cover - diagnostic path
            results[name] = [f"EXCEPTION: {exc}"]
    return results


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None
    failed = False
    for name, probs in run_parity(sf, names).items():
        status = "OK" if not probs else ("SKIP" if probs[0].startswith("(rows-only") else "FAIL")
        failed |= status == "FAIL"
        print(f"{status:4s} {name}" + ("" if not probs else f"  {probs}"))
    sys.exit(1 if failed else 0)

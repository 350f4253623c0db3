"""Audit every oracle's DuckDB result dtypes (and values at sf0.001)
for the correctness driver's canonicalizer edge cases.

Flags, per oracle:

* ``HUGEINT`` columns — DuckDB widens SUM over integers to int128; the
  driver hashes HUGEINT differently from Spark's BIGINT, so values that
  agree still hash-mismatch. Fix: CAST(... AS BIGINT) in the oracle.
* non-scalar columns (``LIST``/``STRUCT``/``MAP``/``UNION``) — the
  driver canonicalizes with pandas ``sort_values``, which cannot hash
  list cells (``TypeError: unhashable type: 'list'``). Fix: emit
  comma-joined strings (integers) or fixed scalar columns (doubles).
* ``TIMESTAMP WITH TIME ZONE`` columns — Spark returns session-local
  naive datetimes; a tz-aware oracle column canonicalizes differently.
  Fix: cast to TIMESTAMP (ntz) in the oracle.
* NaN / ±Inf doubles in the sf0.001 result — the canonicalizer sorts by
  value and NaN ordering differs between engines (pandas sorts NaN
  last; an engine emitting NULL instead diverges). Fix: NULL them or
  clamp before output.

Run:  python tests/tools/oracle_dtype_lint.py [sf_dir]
Also wired into pytest via tests/test_registry.py.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

_NON_SCALAR = ("LIST", "[]", "STRUCT", "MAP", "UNION")


def lint_oracles(sf_dir: str = "/root/testdata/sf0.001") -> dict[str, list[str]]:
    """Return {query_name: [problem, ...]} for every flagged oracle."""
    from google_cloud_ecommerce_spark.queries import all_oracles

    conn = duckdb.connect()
    for t in TABLES:
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    problems: dict[str, list[str]] = {}

    def flag(name: str, msg: str) -> None:
        problems.setdefault(name, []).append(msg)

    for name, sql in sorted(all_oracles().items()):
        try:
            rel = conn.sql(sql)
            cols = list(rel.columns)
            types = [str(t).upper() for t in rel.types]
        except Exception as exc:  # noqa: BLE001
            flag(name, f"oracle fails to plan: {exc}")
            continue
        for c, t in zip(cols, types):
            if "HUGEINT" in t:
                flag(name, f"HUGEINT column {c!r} ({t})")
            if any(k in t for k in _NON_SCALAR):
                flag(name, f"non-scalar column {c!r} ({t})")
            if "TIME ZONE" in t or t.endswith("TZ"):
                flag(name, f"tz-aware column {c!r} ({t})")
        # value scan: NaN / Inf doubles at sf0.001 (cheap, full fetch)
        try:
            rows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            flag(name, f"oracle fails to execute: {exc}")
            continue
        float_idx = [
            i for i, t in enumerate(types) if t in ("DOUBLE", "FLOAT", "REAL")
        ]
        for i in float_idx:
            for row in rows:
                v = row[i]
                if v is not None and (math.isnan(v) or math.isinf(v)):
                    flag(name, f"NaN/Inf in column {cols[i]!r} (value {v!r})")
                    break
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    problems = lint_oracles(sf_dir)
    for name, msgs in sorted(problems.items()):
        for m in msgs:
            print(f"FLAG {name}: {m}")
    from google_cloud_ecommerce_spark.queries import all_oracles

    print(f"\n{len(problems)} flagged of {len(all_oracles())}")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())

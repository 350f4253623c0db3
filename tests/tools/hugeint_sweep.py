"""One-shot audit: flag any oracle whose DuckDB output contains HUGEINT.

DuckDB widens SUM over integer types to HUGEINT (int128); the driver's
hasher canonicalizes HUGEINT differently from Spark's BIGINT, so any
oracle producing one would hash-mismatch even when values agree.
Run:  python tests/tools/hugeint_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from google_cloud_ecommerce_spark.queries import all_oracles

    conn = duckdb.connect()
    for t in TABLES:
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = []
    for name, sql in sorted(all_oracles().items()):
        try:
            rel = conn.sql(sql)
            types = [str(t).upper() for t in rel.types]
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            bad.append(name)
            continue
        huge = [
            (c, t)
            for c, t in zip(rel.columns, types)
            if "HUGEINT" in t
        ]
        if huge:
            print(f"HUGEINT {name}: {huge}")
            bad.append(name)
    print(f"\n{len(bad)} flagged of {len(all_oracles())}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

"""Driver-simulation FULL sweep under a VANILLA SparkSession.

The grading driver imports ``__spark_entry__`` with its own session —
1 GiB driver heap, 200 shuffle partitions, none of ``get_spark``'s
confs (no UTC pin at build, no Arrow, no AQE extras). This runner
creates exactly that session FIRST (so ``get_spark``'s
``getOrCreate`` inside the parity harness returns it unchanged) and
then runs the standard registry comparator — the strictest local
memory/conf-independence probe we have.

Run:  python tests/tools/vanilla_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    from pyspark.sql import SparkSession

    SparkSession.builder.master("local[8]").getOrCreate()

    from oracle_parity import run_parity

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None
    results = run_parity(sf_dir, names)
    bad = 0
    for name, problems in results.items():
        if problems and problems != ["(rows-only: no oracle)"]:
            bad += 1
            print(f"BAD  {name}: {problems}")
        else:
            print(f"OK   {name}")
    print(f"\n{len(results) - bad}/{len(results)} OK, {bad} BAD (vanilla local[8])")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

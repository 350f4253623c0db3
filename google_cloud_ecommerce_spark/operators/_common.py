"""Shared cross-engine-deterministic expression helpers for the
extension operators (dedup / similarity / text).

Everything here is built so the SAME value comes out of Spark and any
ANSI-SQL oracle engine, bit-for-bit:

  - token hash: md5 (identical everywhere) -> first 15 hex chars
    (60 bits, fits signed int64) -> mod 2^31-1. No reliance on either
    engine's native hash().
  - folds over arrays are explicit left-folds (Spark ``aggregate``,
    DuckDB ``list_reduce``) so floating-point accumulation order is
    identical, not partition-dependent.
  - all randomized parameters (minhash coefficients, projection
    vectors) are fixed literals generated once from a seeded RNG and
    inlined into BOTH the Spark expression and the oracle SQL.

These helpers return SQL expression *strings* (used via F.expr) because
the nested higher-order functions are far more readable in SQL form,
and Spark compiles them to the same codegen'd plan as Column-API calls.
"""

from __future__ import annotations

import numpy as np

MERSENNE31 = 2_147_483_647  # 2^31 - 1
FOLD_BASE = 1_000_003

_rng = np.random.RandomState(42)

# MinHash: 16 universal-hash coefficient pairs (a*h + b) mod p.
N_MINHASH = 16
MINHASH_A = [int(x) for x in _rng.randint(1, MERSENNE31, size=N_MINHASH)]
MINHASH_B = [int(x) for x in _rng.randint(0, MERSENNE31, size=N_MINHASH)]
N_BANDS = 8  # bands of 2 rows each

# Random-projection LSH: 8 fixed hyperplanes in R^64.
N_PROJECTIONS = 8
EMBED_DIM = 64
PROJECTIONS = [[float(v) for v in row] for row in _rng.randn(N_PROJECTIONS, EMBED_DIM)]

# Banded sign-LSH for embedding near-dup candidate generation: 4 bands
# of 6 hyperplanes. A pair is a candidate iff some band's full 6-bit
# sign key matches (OR-of-ANDs — the classic LSH amplification). At the
# 0.9-cosine threshold the per-hyperplane agreement is ~0.86, so band
# recall is 0.86^6 ≈ 0.39 and 4-band recall 1-(1-0.39)^4 ≈ 0.86,
# rising steeply toward 1 for truer duplicates — while candidates drop
# to ~4/64 of the pair space instead of all of it.
# NOTE: drawn AFTER the arrays above — appending keeps every previously
# inlined literal (minhash coefficients, projections) bit-identical.
DEDUP_N_BANDS = 4
DEDUP_BAND_BITS = 6
DEDUP_PROJECTIONS = [
    [float(v) for v in row]
    for row in _rng.randn(DEDUP_N_BANDS * DEDUP_BAND_BITS, EMBED_DIM)
]


def tokens_expr(col: str = "text") -> str:
    """Whitespace tokens, empty strings dropped (engine-neutral)."""
    return f"filter(split({col}, ' '), t -> t != '')"


def tokens_sql(col: str = "text") -> str:
    return f"list_filter(string_split({col}, ' '), t -> t != '')"


def token_hash_expr(var: str) -> str:
    """md5-derived 31-bit token hash — Spark side."""
    return f"CAST(conv(substr(md5({var}), 1, 15), 16, 10) AS BIGINT) % {MERSENNE31}"


def token_hash_sql(var: str) -> str:
    """Same hash — ANSI/DuckDB side."""
    return f"(('0x' || substr(md5({var}), 1, 15))::BIGINT % {MERSENNE31})"


def dot_expr(a: str, b: str, dim: int = EMBED_DIM, unroll: bool = False) -> str:
    """Sequential-order dot product of two array<double> — Spark side.

    The lambda fold is deliberate: an unrolled 64-term flat expression
    was tried and is ~2.5x SLOWER on the pair-scoring hot paths — the
    generated code blows past JIT/whole-stage-codegen method limits and
    falls back to interpretation, while the fold stays compiled.
    (unroll=True keeps the experiment reproducible; both forms add
    terms in the same left-to-right order.)"""
    if unroll:
        return " + ".join(f"({a})[{i}] * ({b})[{i}]" for i in range(dim))
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"


def dot_sql(a: str, b: str, dim: int = EMBED_DIM, unroll: bool = False) -> str:
    """Same dot product with identical fold order — DuckDB side."""
    if unroll:
        return " + ".join(f"({a})[{i + 1}] * ({b})[{i + 1}]" for i in range(dim))
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {dim + 1}), i -> ({a})[i] * ({b})[i])), (acc, x) -> acc + x)"
    )


def sql_double_array(values: list[float]) -> str:
    """A DOUBLE[] literal with full round-trip precision."""
    return "[" + ", ".join(repr(v) for v in values) + "]::DOUBLE[]"


def spark_double_array(values: list[float]) -> str:
    return "array(" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in values) + ")"

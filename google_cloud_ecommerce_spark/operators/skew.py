"""Skew mitigation for equi-joins: key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions. Salting is the static
fallback for the pathological case AQE can't fix: a single join key so
hot that ONE key's rows exceed an executor (think a null-ish default id
carrying 10% of 100 TB). The transform:

  big side:    salt = uniform int in [0, n_salts)   (row-local, no shuffle)
  small side:  replicate every row n_salts times, one per salt value
  join on      (key, salt)  ->  the hot key spreads over n_salts reducers

Correctness is invariant to the salt values (each big-side row still
meets every small-side row with its key exactly once); the unit test
asserts equality with the plain join on crafted 90%-hot-key data.
Cost: small side inflates x n_salts — use only when the small side is
dimension-sized and the hot key is real.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big ⋈ small` on `on`, spreading each big-side key over
    `n_salts` reducers. Output columns = big's + small's non-key columns
    (like a plain `df.join(other, on)`)."""
    big_salted = big.withColumn(
        SALT_COL, (F.monotonically_increasing_id() % n_salts).cast("int")
    )
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    small_salted = small.withColumn(SALT_COL, F.explode(salts))
    joined = big_salted.join(small_salted, on=[*on, SALT_COL], how=how)
    return joined.drop(SALT_COL)

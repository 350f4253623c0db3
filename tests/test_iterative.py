"""The lineage-guard template shared by PageRank / k-means / BPE /
power iteration."""

from __future__ import annotations

import pytest

from google_cloud_ecommerce_spark.iterative import iterate


def test_pin_never_fires_below_threshold():
    calls = []
    result = iterate(
        0,
        lambda s, i: s + i,
        4,
        checkpoint_every=8,
        pin=lambda s: calls.append(s) or s,
    )
    assert result == 1 + 2 + 3 + 4
    assert calls == []  # registry round counts plan exactly as unrolled


def test_pin_fires_every_n_rounds_but_not_after_last():
    calls = []
    iterate(
        0,
        lambda s, i: s + 1,
        24,
        checkpoint_every=8,
        pin=lambda s: calls.append(s) or s,
    )
    assert calls == [8, 16]  # not after round 24 — caller owns the result


def test_round_index_is_one_based_and_ordered():
    seen = []
    iterate(None, lambda s, i: seen.append(i), 3, checkpoint_every=0)
    assert seen == [1, 2, 3]


def test_composite_state_requires_explicit_pin():
    with pytest.raises(TypeError, match="pass an explicit pin"):
        iterate((1, 2), lambda s, i: s, 9, checkpoint_every=1)


def test_negative_rounds_rejected():
    with pytest.raises(ValueError):
        iterate(0, lambda s, i: s, -1)


def test_dataframe_state_checkpoints_lazily(spark):
    """Default pin on a DataFrame: result values unchanged, and the
    checkpoint is lazy (build time runs no job — asserted by the state
    still being unmaterialized until an action)."""
    df = spark.range(10).toDF("n")
    out = iterate(
        df,
        lambda s, i: s.selectExpr("n + 1 AS n"),
        6,
        checkpoint_every=2,
    )
    assert sorted(r.n for r in out.collect()) == list(range(6, 16))

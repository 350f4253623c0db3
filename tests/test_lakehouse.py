"""Unit tests for the copy-on-write manifest layer (lakehouse.py,
round-10): version-chain resolution, commit-after-write immutability,
the exclusive-create commit race, VACUUM classification/deletion, and
the MERGE exactly-once property routed through versioned commits."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from google_cloud_ecommerce_spark.lakehouse import (
    read_slices,
    table_commit_rewrite,
    table_create,
    table_read,
    table_slice_states,
    table_vacuum,
    table_versions,
)


def _mk_table(spark, root, n_days=6, rows_per_day=4):
    rows = [
        (d * 100 + i, dt.date(2024, 1, 1 + d), float(d * 100 + i))
        for d in range(n_days)
        for i in range(rows_per_day)
    ]
    df = spark.createDataFrame(rows, "event_id long, day date, value double")
    table_create(df, root)
    return df


def _state(df):
    return sorted((r.event_id, r.day, r.value) for r in df.collect())


def test_version_chain_resolution_and_immutability(spark, tmp_path):
    root = str(tmp_path / "t")
    base = _mk_table(spark, root)
    v0_before = _state(table_read(spark, root, 0))
    assert v0_before == _state(base)
    assert table_versions(root) == [0]

    # v1 rewrites the first two days only
    rewritten = table_read(spark, root).filter(F.col("day") <= dt.date(2024, 1, 2))
    table_commit_rewrite(rewritten.withColumn("value", F.lit(-1.0)), root)
    assert table_versions(root) == [0, 1]

    v1 = {r.event_id: r.value for r in table_read(spark, root).collect()}
    for eid, day, val in v0_before:
        expected = -1.0 if day <= dt.date(2024, 1, 2) else val
        assert v1[eid] == expected
    # v0 still resolves byte-identically — committed slices are immutable
    assert _state(table_read(spark, root, 0)) == v0_before
    # and the v1 resolution never lists the superseded v0 slices
    v1_files = table_read(spark, root).inputFiles()
    assert not any(
        "/slices/v0/" in f and ("day=2024-01-01" in f or "day=2024-01-02" in f)
        for f in v1_files
    )


def test_commit_guards(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _mk_table(spark, root)
    with pytest.raises(ValueError, match="already exists"):
        table_create(df, root)
    with pytest.raises(ValueError, match="not in"):
        table_read(spark, root, 5)
    with pytest.raises(ValueError, match="no table"):
        table_commit_rewrite(df, str(tmp_path / "missing"))
    # a racing writer that already published this version: the loser's
    # manifest create fails loudly (exclusive create, same discipline
    # as the wire sink) instead of clobbering the winner — and the
    # winner's manifest survives verbatim
    from google_cloud_ecommerce_spark.lakehouse import _publish_manifest

    _publish_manifest(root, 1, {"day=2024-01-01": "slices/v1/day=2024-01-01"})
    before = open(os.path.join(root, "_manifest", "v1.json")).read()
    with pytest.raises(FileExistsError):
        _publish_manifest(root, 1, {"day=2024-01-02": "slices/v1/day=2024-01-02"})
    assert open(os.path.join(root, "_manifest", "v1.json")).read() == before


def test_vacuum_classifies_deletes_and_preserves_latest(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk_table(spark, root)
    # v1: days 1-4 rewritten; v2: days 1-2 rewritten again
    table_commit_rewrite(
        table_read(spark, root)
        .filter(F.col("day") <= dt.date(2024, 1, 4))
        .withColumn("value", F.lit(-1.0)),
        root,
    )
    table_commit_rewrite(
        table_read(spark, root)
        .filter(F.col("day") <= dt.date(2024, 1, 2))
        .withColumn("value", F.lit(-2.0)),
        root,
    )
    # a failed commit: slice data staged, manifest never published
    table_read(spark, root, 0).filter(
        F.col("day") == dt.date(2024, 1, 1)
    ).write.partitionBy("day").parquet(os.path.join(root, "slices", "vorphan"))

    states = table_slice_states(root, retain_latest=1)
    # live: v2 days 1-2, v1 days 3-4, v0 days 5-6
    assert sorted(states["live"]) == [
        "slices/v0/day=2024-01-05",
        "slices/v0/day=2024-01-06",
        "slices/v1/day=2024-01-03",
        "slices/v1/day=2024-01-04",
        "slices/v2/day=2024-01-01",
        "slices/v2/day=2024-01-02",
    ]
    assert sorted(states["expired"]) == [
        "slices/v0/day=2024-01-01",
        "slices/v0/day=2024-01-02",
        "slices/v0/day=2024-01-03",
        "slices/v0/day=2024-01-04",
        "slices/v1/day=2024-01-01",
        "slices/v1/day=2024-01-02",
    ]
    assert states["orphan"] == ["slices/vorphan/day=2024-01-01"]

    latest_before = _state(table_read(spark, root))
    applied = table_vacuum(root, retain_latest=1)
    assert applied == states
    for rel in states["expired"] + states["orphan"]:
        assert not os.path.exists(os.path.join(root, rel)), rel
    for rel in states["live"]:
        assert os.path.exists(os.path.join(root, rel)), rel
    # the retained version reads byte-identically after the vacuum
    assert table_versions(root) == [2]
    assert _state(table_read(spark, root)) == latest_before
    # dropped versions are gone for good
    with pytest.raises(ValueError, match="not in"):
        table_read(spark, root, 0)


def test_read_slices_rejects_empty(spark, tmp_path):
    with pytest.raises(ValueError, match="empty slice set"):
        read_slices(spark, str(tmp_path), [])


def test_merge_exactly_once_through_versioned_commits(spark, sf_smoke):
    """ADVICE r9 closure: the MERGE path never overwrites what it reads
    — each application commits a NEW version — and re-applying the same
    absolute-state changelog yields a byte-identical next version while
    v0 stays untouched (the at-least-once -> exactly-once upgrade, now
    with snapshot isolation as a bonus)."""
    import tempfile

    from google_cloud_ecommerce_spark.io import ensure_day_partitioned_events
    from google_cloud_ecommerce_spark.queries.scale import (
        _apply_merge,
        _merge_changelog,
    )

    src = ensure_day_partitioned_events(spark, sf_smoke)
    with tempfile.TemporaryDirectory(prefix="merge_mf_") as root:
        table_create(spark.read.parquet(src), root)
        chg = _merge_changelog(spark, sf_smoke)
        v0_before = sorted(
            (r.event_id, r.event_type, r.value)
            for r in table_read(spark, root, 0)
            .select("event_id", "event_type", "value")
            .collect()
        )

        def apply_once():
            table_commit_rewrite(_apply_merge(table_read(spark, root), chg), root)
            return sorted(
                (r.event_id, r.event_type, r.value)
                for r in table_read(spark, root)
                .select("event_id", "event_type", "value")
                .collect()
            )

        first = apply_once()  # v1
        second = apply_once()  # v2
        assert first == second
        assert table_versions(root) == [0, 1, 2]
        # v0 is still the pre-merge state, byte-identical
        assert (
            sorted(
                (r.event_id, r.event_type, r.value)
                for r in table_read(spark, root, 0)
                .select("event_id", "event_type", "value")
                .collect()
            )
            == v0_before
        )

"""Unit tests for the copy-on-write manifest layer (lakehouse.py,
round-10): version-chain resolution, commit-after-write immutability,
the exclusive-create commit race, writer-unique slice staging, declared
deletes, VACUUM classification/deletion, and the MERGE exactly-once
property routed through versioned commits."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from google_cloud_ecommerce_spark.lakehouse import (
    _read_manifest,
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
    # the v1 resolution never lists the superseded v0 slices: rewritten
    # days' files live only under the dirs manifest v1 references
    m0, m1 = _read_manifest(root, 0), _read_manifest(root, 1)
    rewritten_days = {"day=2024-01-01", "day=2024-01-02"}
    for day in rewritten_days:
        assert m1[day] != m0[day]
    v1_files = table_read(spark, root).inputFiles()
    for f in v1_files:
        day = next(p for p in f.split("/") if p.startswith("day="))
        want = m1[day]
        assert f"/{want}/" in f, (f, want)


def test_commit_guards(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _mk_table(spark, root)
    with pytest.raises(ValueError, match="already exists"):
        table_create(df, root)
    with pytest.raises(ValueError, match="not in"):
        table_read(spark, root, 5)
    with pytest.raises(ValueError, match="no table"):
        table_commit_rewrite(df, str(tmp_path / "missing"))
    with pytest.raises(ValueError, match="no table"):
        table_read(spark, str(tmp_path / "missing"))
    # a racing writer that already published this version: the loser's
    # manifest create fails loudly (commit-by-link create-if-absent,
    # same discipline as the wire sink) and the winner's manifest
    # survives verbatim; no temp file is left behind either way
    from google_cloud_ecommerce_spark.lakehouse import _publish_manifest

    _publish_manifest(root, 1, {"day=2024-01-01": "slices/v1-aaaa/day=2024-01-01"})
    mpath = os.path.join(root, "_manifest", "v1.json")
    before = open(mpath).read()
    with pytest.raises(FileExistsError, match="already committed"):
        _publish_manifest(
            root, 1, {"day=2024-01-02": "slices/v1-bbbb/day=2024-01-02"}
        )
    assert open(mpath).read() == before
    leftovers = [p for p in os.listdir(os.path.dirname(mpath)) if ".tmp." in p]
    assert leftovers == []


def test_racing_writers_stage_in_disjoint_prefixes(spark, tmp_path):
    """Two writers racing for one version must never interleave part
    files in a directory the winner's manifest references: each stages
    under its own token, so the loser's data classifies as orphan."""
    from google_cloud_ecommerce_spark.lakehouse import _write_slices

    root = str(tmp_path / "t")
    df = _mk_table(spark, root)
    a = _write_slices(df.filter("event_id < 100"), root, 1, "day")
    b = _write_slices(df.filter("event_id < 100"), root, 1, "day")
    assert set(a) == set(b) == {"day=2024-01-01"}
    assert a["day=2024-01-01"] != b["day=2024-01-01"]
    # winner publishes a's mapping; b's staging is an orphan
    from google_cloud_ecommerce_spark.lakehouse import _publish_manifest

    merged = {**_read_manifest(root, 0), **a}
    _publish_manifest(root, 1, merged)
    states = table_slice_states(root, retain_latest=1)
    assert states["orphan"] == [b["day=2024-01-01"]]
    assert b["day=2024-01-01"] not in set(states["live"])


def test_declared_delete_drops_partition_from_new_version(spark, tmp_path):
    """A rewrite that empties a partition writes no slice dir, so the
    delete must be declared via drop_partitions — the new version no
    longer lists the day, older versions still do (time-travelable
    delete), and an unknown name fails loudly."""
    root = str(tmp_path / "t")
    _mk_table(spark, root)
    empty = table_read(spark, root).filter("1=0")
    with pytest.raises(ValueError, match="drop_partitions entry"):
        table_commit_rewrite(empty, root, drop_partitions=["day=2099-01-01"])
    table_commit_rewrite(empty, root, drop_partitions=["day=2024-01-03"])
    assert "day=2024-01-03" not in _read_manifest(root, 1)
    days_v1 = {r.day for r in table_read(spark, root).select("day").distinct().collect()}
    assert dt.date(2024, 1, 3) not in days_v1 and len(days_v1) == 5
    days_v0 = {r.day for r in table_read(spark, root, 0).select("day").distinct().collect()}
    assert dt.date(2024, 1, 3) in days_v0


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

    m = {v: _read_manifest(root, v) for v in (0, 1, 2)}
    states = table_slice_states(root, retain_latest=1)
    # live = exactly what v2 references: its own 2 rewritten days, v1's
    # days 3-4, v0's days 5-6
    assert set(states["live"]) == set(m[2].values())
    assert len(states["live"]) == 6
    assert m[2]["day=2024-01-01"].startswith("slices/v2-")
    assert m[2]["day=2024-01-03"] == m[1]["day=2024-01-03"]
    assert m[2]["day=2024-01-05"] == m[0]["day=2024-01-05"]
    # expired = referenced by v0/v1 only: v0 days 1-4, v1 days 1-2
    expected_expired = (set(m[0].values()) | set(m[1].values())) - set(
        m[2].values()
    )
    assert set(states["expired"]) == expected_expired
    assert len(states["expired"]) == 6
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

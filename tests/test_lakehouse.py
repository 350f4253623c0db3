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
    # retention 0: this test wants the loser classified NOW (the
    # default window would call fresh staging "pending" — see
    # test_vacuum_retention_guard)
    states = table_slice_states(root, retain_latest=1, orphan_retain_seconds=0.0)
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
    states = table_slice_states(root, retain_latest=1, orphan_retain_seconds=0.0)
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
    applied = table_vacuum(root, retain_latest=1, orphan_retain_seconds=0.0)
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


# ---------------------------------------------------------------------------
# Round 11: stats/partition pruning, schema evolution, optimistic
# concurrency, orphan retention, row-level change feed.
# ---------------------------------------------------------------------------


def _mk_bucketed_table(spark, root):
    """Partition names carry NO order information ('bucket=a'..), but
    event_id ranges are disjoint per bucket — stats prune where names
    cannot."""
    rows = [
        (b * 1000 + i, "abc"[b], float(i))
        for b in range(3)
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "event_id long, bucket string, value double")
    table_create(df, root, partition_col="bucket", stats_col="event_id")
    return df


def test_stats_range_prunes_without_listing(spark, tmp_path):
    from google_cloud_ecommerce_spark.lakehouse import _read_manifest_doc

    root = str(tmp_path / "t")
    _mk_bucketed_table(spark, root)
    doc = _read_manifest_doc(root, 0)
    assert doc["stats_column"] == "event_id"
    assert doc["stats"]["bucket=a"] == [0, 4]
    assert doc["stats"]["bucket=c"] == [2000, 2004]
    # a range inside bucket b's ids: buckets a and c are never listed
    view = table_read(spark, root, stats_range=(1000, 1500))
    assert all("/bucket=b/" in f for f in view.inputFiles())
    # pruning is a superset guarantee: the row filter still applies
    got = sorted(
        r.event_id
        for r in view.filter(F.col("event_id") <= 1002).collect()
    )
    assert got == [1000, 1001, 1002]
    # a partition with no recorded stats is never pruned
    import json, os

    mpath = os.path.join(root, "_manifest", "v0.json")
    raw = json.load(open(mpath))
    del raw["stats"]["bucket=b"]
    os.remove(mpath)
    with open(mpath, "w") as fh:
        json.dump(raw, fh)
    view2 = table_read(spark, root, stats_range=(2000, 2001))
    listed = {f.split("/bucket=")[1][0] for f in view2.inputFiles()}
    assert listed == {"b", "c"}


def test_partition_filter_prunes_and_empty_selection_is_typed(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk_table(spark, root)
    view = table_read(
        spark, root, partition_filter=lambda n: n >= "day=2024-01-04"
    )
    assert view.count() == 3 * 4
    assert all(
        any(f"/day=2024-01-0{d}/" in f for d in (4, 5, 6))
        for f in view.inputFiles()
    )
    empty = table_read(spark, root, partition_filter=lambda n: False)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["event_id", "day", "value"]


def test_stats_carry_and_refresh_across_commits(spark, tmp_path):
    from google_cloud_ecommerce_spark.lakehouse import _read_manifest_doc

    root = str(tmp_path / "t")
    _mk_table(spark, root)  # partitioned by day, event_id = d*100+i
    # enable stats at v1 by rewriting days 1-2 with stats_col declared
    rewritten = table_read(spark, root).filter(F.col("day") <= dt.date(2024, 1, 2))
    table_commit_rewrite(rewritten, root, stats_col="event_id")
    d1 = _read_manifest_doc(root, 1)
    assert d1["stats_column"] == "event_id"
    assert set(d1["stats"]) == {"day=2024-01-01", "day=2024-01-02"}
    # v2 rewrites day 1 only, without re-declaring the column: the
    # effective column is inherited, day 2's stats carry, day 1's refresh
    table_commit_rewrite(
        table_read(spark, root).filter(F.col("day") == dt.date(2024, 1, 1)), root
    )
    d2 = _read_manifest_doc(root, 2)
    assert d2["stats_column"] == "event_id"
    assert d2["stats"]["day=2024-01-02"] == d1["stats"]["day=2024-01-02"]
    assert d2["stats"]["day=2024-01-01"] == [0, 3]
    # stats prune on v2: day 1 (stats [0,3]) misses the range and is
    # never listed; days 3-6 carry NO stats (their pointers predate the
    # stats column) so they are conservatively kept — missing stats
    # never prune
    view = table_read(spark, root, stats_range=(100, 103))
    days = {f.split("/day=")[1][:10] for f in view.inputFiles()}
    assert "2024-01-01" not in days
    assert days == {f"2024-01-0{d}" for d in range(2, 7)}


def test_schema_evolution_reads_both_versions(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk_table(spark, root)
    evolved = (
        table_read(spark, root)
        .filter(F.col("day") <= dt.date(2024, 1, 2))
        .withColumn("band", F.when(F.col("value") >= 101.0, "high").otherwise("low"))
    )
    table_commit_rewrite(evolved, root)
    v1 = table_read(spark, root)
    assert "band" in v1.columns
    rows = {r.event_id: r.band for r in v1.collect()}
    assert rows[1] == "low" and rows[101] == "high"  # rewritten days: real values
    assert rows[301] is None  # untouched v0 slices: typed NULL fill
    assert v1.schema["band"].dataType.simpleString() == "string"
    # v0 still reads with its own schema: no band column at all
    v0 = table_read(spark, root, 0)
    assert "band" not in v0.columns
    assert v0.count() == 24


def test_optimistic_commit_rebases_on_disjoint_partitions(spark, tmp_path):
    from google_cloud_ecommerce_spark.lakehouse import _read_manifest_doc

    root = str(tmp_path / "t")
    _mk_table(spark, root)
    base = table_read(spark, root, 0)
    winner_df = base.filter(F.col("day") == dt.date(2024, 1, 1)).withColumn(
        "value", F.lit(-10.0)
    )
    loser_df = base.filter(F.col("day") == dt.date(2024, 1, 5)).withColumn(
        "value", F.lit(-50.0)
    )

    def land_winner():
        assert table_commit_rewrite(winner_df, root) == 1

    got = table_commit_rewrite(loser_df, root, _race_hook=land_winner)
    assert got == 2
    assert table_versions(root) == [0, 1, 2]
    m1 = _read_manifest_doc(root, 1)["partitions"]
    m2 = _read_manifest_doc(root, 2)["partitions"]
    # the rebase kept the winner's day-1 pointer and added day 5
    assert m2["day=2024-01-01"] == m1["day=2024-01-01"]
    assert m2["day=2024-01-05"] != m1["day=2024-01-05"]
    vals = {r.event_id: r.value for r in table_read(spark, root).collect()}
    assert vals[1] == -10.0
    assert vals[401] == -50.0
    assert vals[201] == 201.0  # untouched


def test_optimistic_commit_conflicts_on_overlap(spark, tmp_path):
    from google_cloud_ecommerce_spark.lakehouse import CommitConflictError

    root = str(tmp_path / "t")
    _mk_table(spark, root)
    base = table_read(spark, root, 0)
    same_day = base.filter(F.col("day") == dt.date(2024, 1, 2))

    def land_winner():
        table_commit_rewrite(same_day.withColumn("value", F.lit(-20.0)), root)

    with pytest.raises(CommitConflictError, match="touched partitions"):
        table_commit_rewrite(
            same_day.withColumn("value", F.lit(-99.0)), root, _race_hook=land_winner
        )
    # the winner's commit stands; the loser's staging is unreferenced
    assert table_versions(root) == [0, 1]
    vals = {r.event_id: r.value for r in table_read(spark, root).collect()}
    assert vals[100] == -20.0
    states = table_slice_states(root, retain_latest=2, orphan_retain_seconds=0.0)
    assert len(states["orphan"]) == 1
    # a drop of a partition the winner rewrote is an overlap too
    def land_winner_2():
        table_commit_rewrite(
            base.filter(F.col("day") == dt.date(2024, 1, 4)).withColumn(
                "value", F.lit(-40.0)
            ),
            root,
        )

    with pytest.raises(CommitConflictError):
        table_commit_rewrite(
            base.filter("1=0"),
            root,
            drop_partitions=["day=2024-01-04"],
            _race_hook=land_winner_2,
        )


def test_vacuum_retention_guard_protects_fresh_staging(spark, tmp_path):
    import os

    root = str(tmp_path / "t")
    df = _mk_table(spark, root)
    # a commit mid-flight: slices staged seconds ago, manifest not yet up
    from google_cloud_ecommerce_spark.lakehouse import _write_slices

    staged = _write_slices(df.filter("event_id < 100"), root, 1, "day")
    rel = staged["day=2024-01-01"]
    states = table_slice_states(root, retain_latest=1)  # default retention
    assert states["pending"] == [rel] and states["orphan"] == []
    applied = table_vacuum(root, retain_latest=1)  # default retention
    assert applied["pending"] == [rel]
    assert os.path.exists(os.path.join(root, rel))  # never deleted
    # once aged (simulated by zero retention) it is a deletable orphan
    applied = table_vacuum(root, retain_latest=1, orphan_retain_seconds=0.0)
    assert applied["orphan"] == [rel]
    assert not os.path.exists(os.path.join(root, rel))


def test_change_feed_rows_and_pruning(spark, tmp_path):
    from google_cloud_ecommerce_spark.lakehouse import table_changes, write_change_feed

    root = str(tmp_path / "t")
    _mk_table(spark, root)  # 6 days x 4 rows, event_id = d*100+i
    v0 = table_read(spark, root, 0)
    # v1: update two rows of day 1 (and copy day 1's other rows verbatim)
    day1 = v0.filter(F.col("day") == dt.date(2024, 1, 1))
    table_commit_rewrite(
        day1.withColumn(
            "value", F.when(F.col("event_id") < 2, F.lit(-1.0)).otherwise(F.col("value"))
        ),
        root,
    )
    # v2: rewrite day 2 dropping one key and inserting a new one
    day2 = table_read(spark, root).filter(F.col("day") == dt.date(2024, 1, 2))
    inserted = spark.createDataFrame(
        [(999, dt.date(2024, 1, 2), 9.5)], "event_id long, day date, value double"
    )
    table_commit_rewrite(
        day2.filter(F.col("event_id") != 103).unionByName(inserted), root
    )

    ch1 = table_changes(spark, root, 0, 1, key_col="event_id")
    # only day 1's slices are ever listed — unchanged days never appear
    assert all("/day=2024-01-01/" in f for f in ch1.inputFiles())
    got1 = sorted(
        (r.event_id, r._change_type, r.value, r._commit_version)
        for r in ch1.collect()
    )
    assert got1 == [
        (0, "update_postimage", -1.0, 1),
        (0, "update_preimage", 0.0, 1),
        (1, "update_postimage", -1.0, 1),
        (1, "update_preimage", 1.0, 1),
    ]
    ch2 = table_changes(spark, root, 1, 2, key_col="event_id")
    got2 = sorted((r.event_id, r._change_type, r.value) for r in ch2.collect())
    assert got2 == [(103, "delete", 103.0), (999, "insert", 9.5)]
    # the feed writer materializes one file batch per commit
    feed = str(tmp_path / "feed")
    assert write_change_feed(spark, root, feed, key_col="event_id") == [1, 2]
    all_changes = spark.read.parquet(feed)
    assert all_changes.count() == 6
    assert {r._commit_version for r in all_changes.collect()} == {1, 2}


# ---------------------------------------------------------------------------
# Round 11 (continued): deletion vectors (merge-on-read) + OPTIMIZE.
# ---------------------------------------------------------------------------


def _dv_keys(spark, rows):
    return spark.createDataFrame(rows, "day date, event_id long")


def test_deletion_vector_deletes_without_rewrite(spark, tmp_path):
    from google_cloud_ecommerce_spark.lakehouse import (
        _read_manifest_doc,
        table_delete_rows,
    )

    root = str(tmp_path / "t")
    _mk_table(spark, root)
    keys = _dv_keys(
        spark,
        [
            (dt.date(2024, 1, 1), 0),
            (dt.date(2024, 1, 1), 1),
            (dt.date(2024, 1, 3), 202),
        ],
    )
    assert table_delete_rows(spark, root, keys, key_col="event_id") == 1
    d1 = _read_manifest_doc(root, 1)
    d0 = _read_manifest_doc(root, 0)
    # no data file moved: every slice pointer is v0's
    assert d1["partitions"] == d0["partitions"]
    assert set(d1["deletes"]) == {"day=2024-01-01", "day=2024-01-03"}
    got = {r.event_id for r in table_read(spark, root).collect()}
    assert got == {d * 100 + i for d in range(6) for i in range(4)} - {0, 1, 202}
    # v0 still reads everything (time-travel through the delete)
    assert len(table_read(spark, root, 0).collect()) == 24
    # a second delete UNIONS into the cumulative DV
    assert (
        table_delete_rows(
            spark, root, _dv_keys(spark, [(dt.date(2024, 1, 1), 2)]), key_col="event_id"
        )
        == 2
    )
    got2 = {r.event_id for r in table_read(spark, root).collect()}
    assert got2 == got - {2}
    # mixed delete keys are refused
    bad = spark.createDataFrame([(dt.date(2024, 1, 2), 100.0)], "day date, value double")
    with pytest.raises(ValueError, match="mixed delete keys"):
        table_delete_rows(spark, root, bad, key_col="value")


def test_change_feed_sees_dv_deletes_and_optimize_is_silent(spark, tmp_path):
    import glob

    from google_cloud_ecommerce_spark.lakehouse import (
        _read_manifest_doc,
        table_changes,
        table_delete_rows,
        table_optimize,
    )

    root = str(tmp_path / "t")
    _mk_table(spark, root)
    # delete two keys of day 2 + ALL four keys of day 5
    keys = [(dt.date(2024, 1, 2), 100), (dt.date(2024, 1, 2), 103)] + [
        (dt.date(2024, 1, 5), 400 + i) for i in range(4)
    ]
    table_delete_rows(spark, root, _dv_keys(spark, keys), key_col="event_id")
    ch = table_changes(spark, root, 0, 1, key_col="event_id")
    got = sorted((r.event_id, r._change_type) for r in ch.collect())
    assert got == sorted((k, "delete") for _, k in keys)
    before = sorted(
        (r.event_id, r.value) for r in table_read(spark, root).collect()
    )
    assert table_optimize(spark, root) == 2
    d2 = _read_manifest_doc(root, 2)
    # DVs materialized away; the fully-deleted day 5 is dropped
    assert "deletes" not in d2
    assert "day=2024-01-05" not in d2["partitions"]
    assert len(d2["partitions"]) == 5
    # logical content byte-identical through the optimize...
    assert sorted(
        (r.event_id, r.value) for r in table_read(spark, root).collect()
    ) == before
    # ...so the change feed across it is EMPTY
    assert table_changes(spark, root, 1, 2, key_col="event_id").count() == 0
    # and each partition compacted to one file
    for name, rel in d2["partitions"].items():
        files = glob.glob(os.path.join(root, rel, "*.parquet"))
        assert len(files) == 1, (name, files)


def test_delete_conflicts_with_rewrite_and_rebases_when_disjoint(spark, tmp_path):
    from google_cloud_ecommerce_spark.lakehouse import (
        CommitConflictError,
        table_delete_rows,
    )

    root = str(tmp_path / "t")
    _mk_table(spark, root)
    base = table_read(spark, root, 0)

    def rewrite_day2():
        table_commit_rewrite(
            base.filter(F.col("day") == dt.date(2024, 1, 2)).withColumn(
                "value", F.lit(-2.0)
            ),
            root,
        )

    with pytest.raises(CommitConflictError):
        table_delete_rows(
            spark,
            root,
            _dv_keys(spark, [(dt.date(2024, 1, 2), 100)]),
            key_col="event_id",
            _race_hook=rewrite_day2,
        )
    # disjoint: the delete rebases onto the rewrite
    def rewrite_day4():
        table_commit_rewrite(
            base.filter(F.col("day") == dt.date(2024, 1, 4)).withColumn(
                "value", F.lit(-4.0)
            ),
            root,
        )

    got = table_delete_rows(
        spark,
        root,
        _dv_keys(spark, [(dt.date(2024, 1, 6), 500)]),
        key_col="event_id",
        _race_hook=rewrite_day4,
    )
    assert got == 3  # v1 = day-2 rewrite (winner above), v2 = day-4, v3 = delete
    rows = {r.event_id: r.value for r in table_read(spark, root).collect()}
    assert 500 not in rows
    assert rows[301] == -4.0  # the raced rewrite survived the rebase


def test_vacuum_never_deletes_live_dvs_and_expires_them_after_optimize(
    spark, tmp_path
):
    from google_cloud_ecommerce_spark.lakehouse import (
        _read_manifest_doc,
        table_delete_rows,
        table_optimize,
    )

    root = str(tmp_path / "t")
    _mk_table(spark, root)
    table_delete_rows(
        spark, root, _dv_keys(spark, [(dt.date(2024, 1, 1), 0)]), key_col="event_id"
    )
    dv_rel = _read_manifest_doc(root, 1)["deletes"]["day=2024-01-01"]
    states = table_slice_states(root, retain_latest=1, orphan_retain_seconds=0.0)
    assert dv_rel in states["live"]
    before = sorted(r.event_id for r in table_read(spark, root).collect())
    table_optimize(spark, root)
    applied = table_vacuum(root, retain_latest=1, orphan_retain_seconds=0.0)
    assert dv_rel in applied["expired"]
    assert not os.path.exists(os.path.join(root, dv_rel))
    assert sorted(r.event_id for r in table_read(spark, root).collect()) == before


# ---------------------------------------------------------------------------
# Round 11 (continued): blind-append commits (multi-slice partitions,
# txn idempotence, appends-commute rebase).
# ---------------------------------------------------------------------------


def test_append_accumulates_slices_and_optimize_repacks(spark, tmp_path):
    from google_cloud_ecommerce_spark.lakehouse import (
        _read_manifest_doc,
        _rels_of,
        table_commit_append,
        table_optimize,
    )

    root = str(tmp_path / "t")
    _mk_table(spark, root, n_days=2)  # days 1-2, ids 0..3 / 100..103
    extra1 = spark.createDataFrame(
        [(10, dt.date(2024, 1, 1), 10.0), (300, dt.date(2024, 1, 3), 300.0)],
        "event_id long, day date, value double",
    )
    assert table_commit_append(extra1, root) == 1
    d1 = _read_manifest_doc(root, 1)
    # day 1 now has TWO slices; day 3 is a brand-new single-slice partition
    assert len(_rels_of(d1["partitions"]["day=2024-01-01"])) == 2
    assert isinstance(d1["partitions"]["day=2024-01-03"], str)
    got = {r.event_id for r in table_read(spark, root).collect()}
    assert got == {0, 1, 2, 3, 100, 101, 102, 103, 10, 300}
    # v0 unchanged; the diff between v0 and v1 is pure inserts
    assert len(table_read(spark, root, 0).collect()) == 8
    from google_cloud_ecommerce_spark.lakehouse import table_changes

    ch = table_changes(spark, root, 0, 1, key_col="event_id")
    assert sorted((r.event_id, r._change_type) for r in ch.collect()) == [
        (10, "insert"),
        (300, "insert"),
    ]
    # optimize re-packs the multi-slice partition to one slice
    table_optimize(spark, root)
    d2 = _read_manifest_doc(root, 2)
    assert isinstance(d2["partitions"]["day=2024-01-01"], str)
    assert {r.event_id for r in table_read(spark, root).collect()} == got


def test_append_stats_widen_and_unknown_ranges_stay_unpruned(spark, tmp_path):
    from google_cloud_ecommerce_spark.lakehouse import (
        _read_manifest_doc,
        table_commit_append,
    )

    root = str(tmp_path / "t")
    rows = [(i, dt.date(2024, 1, 1), float(i)) for i in range(4)]
    df = spark.createDataFrame(rows, "event_id long, day date, value double")
    table_create(df, root, stats_col="event_id")
    assert _read_manifest_doc(root, 0)["stats"]["day=2024-01-01"] == [0, 3]
    extra = spark.createDataFrame(
        [(50, dt.date(2024, 1, 1), 50.0)], "event_id long, day date, value double"
    )
    table_commit_append(extra, root)
    d1 = _read_manifest_doc(root, 1)
    assert d1["stats"]["day=2024-01-01"] == [0, 50]  # widened, not replaced
    # stats still prune correctly across the append
    view = table_read(spark, root, stats_range=(40, 60))
    assert {r.event_id for r in view.collect()} == {0, 1, 2, 3, 50}


def test_append_txn_makes_redelivery_a_noop(spark, tmp_path):
    from google_cloud_ecommerce_spark.lakehouse import table_commit_append

    root = str(tmp_path / "t")
    _mk_table(spark, root, n_days=1)
    extra = spark.createDataFrame(
        [(9, dt.date(2024, 1, 1), 9.0)], "event_id long, day date, value double"
    )
    assert table_commit_append(extra, root, txn=("ingest", 0)) == 1
    # redelivered epoch: skipped entirely, version unchanged, no dup row
    assert table_commit_append(extra, root, txn=("ingest", 0)) == 1
    assert table_versions(root) == [0, 1]
    assert [r.event_id for r in table_read(spark, root).collect()].count(9) == 1
    # the next epoch lands normally
    assert table_commit_append(extra, root, txn=("ingest", 1)) == 2


def test_appends_commute_with_concurrent_rewrites(spark, tmp_path):
    from google_cloud_ecommerce_spark.lakehouse import (
        table_commit_append,
        table_delete_rows,
    )

    root = str(tmp_path / "t")
    _mk_table(spark, root)
    base = table_read(spark, root, 0)
    extra = spark.createDataFrame(
        [(9, dt.date(2024, 1, 1), 9.0)], "event_id long, day date, value double"
    )

    def rewrite_same_day():
        table_commit_rewrite(
            base.filter(F.col("day") == dt.date(2024, 1, 1)).withColumn(
                "value", F.lit(-1.0)
            ),
            root,
        )

    # the append loses the race ON THE SAME PARTITION and still lands
    got = table_commit_append(extra, root, _race_hook=rewrite_same_day)
    assert got == 2
    rows = {r.event_id: r.value for r in table_read(spark, root).collect()}
    assert rows[9] == 9.0  # the append survived
    assert rows[0] == -1.0  # so did the raced rewrite
    # but an append onto a DV'd partition is refused
    table_delete_rows(
        spark, root, spark.createDataFrame(
            [(dt.date(2024, 1, 2), 100)], "day date, event_id long"
        ), key_col="event_id"
    )
    dv_extra = spark.createDataFrame(
        [(100, dt.date(2024, 1, 2), 1.0)], "event_id long, day date, value double"
    )
    with pytest.raises(ValueError, match="deletion-vectored"):
        table_commit_append(dv_extra, root)


# ---------------------------------------------------------------------------
# Round-11 self-review regressions.
# ---------------------------------------------------------------------------


def test_change_feed_keys_repeated_across_partitions_do_not_cross_match(
    spark, tmp_path
):
    """key_col need only be unique WITHIN a partition: per-day sequence
    numbers repeated across days must not cross-match between the old
    and new side of the diff (self-review r11 — the join runs per
    (partition, key))."""
    from google_cloud_ecommerce_spark.lakehouse import table_changes

    root = str(tmp_path / "t")
    rows = [  # seq restarts at 0 every day
        (seq, dt.date(2024, 1, 1 + d), float(d * 10 + seq))
        for d in range(3)
        for seq in range(3)
    ]
    df = spark.createDataFrame(rows, "event_id long, day date, value double")
    table_create(df, root)
    # rewrite days 1 AND 2 changing exactly one row of day 1
    v0 = table_read(spark, root, 0)
    touched = v0.filter(F.col("day") <= dt.date(2024, 1, 2))
    table_commit_rewrite(
        touched.withColumn(
            "value",
            F.when(
                (F.col("day") == dt.date(2024, 1, 1)) & (F.col("event_id") == 0),
                F.lit(-1.0),
            ).otherwise(F.col("value")),
        ),
        root,
    )
    ch = table_changes(spark, root, 0, 1, key_col="event_id").collect()
    # exactly one update pair — no fabricated cross-day matches
    assert sorted((r.event_id, str(r.day), r._change_type, r.value) for r in ch) == [
        (0, "2024-01-01", "update_postimage", -1.0),
        (0, "2024-01-01", "update_preimage", 0.0),
    ]


def test_rebase_conflicts_on_concurrent_metadata_change(spark, tmp_path):
    """A loser whose race winner evolved the SCHEMA must conflict even
    on disjoint partitions — rebasing would republish the stale schema
    and silently undo the column-add table-wide (self-review r11)."""
    from google_cloud_ecommerce_spark.lakehouse import (
        CommitConflictError,
        table_commit_append,
    )

    root = str(tmp_path / "t")
    _mk_table(spark, root)
    base = table_read(spark, root, 0)

    def winner_evolves_schema():
        table_commit_rewrite(
            base.filter(F.col("day") == dt.date(2024, 1, 1)).withColumn(
                "band", F.lit("x")
            ),
            root,
        )

    with pytest.raises(CommitConflictError, match="metadata"):
        table_commit_rewrite(
            base.filter(F.col("day") == dt.date(2024, 1, 5)),
            root,
            _race_hook=winner_evolves_schema,
        )
    # blind appends hit the same wall
    extra = spark.createDataFrame(
        [(9, dt.date(2024, 1, 6), 9.0)], "event_id long, day date, value double"
    )
    with pytest.raises(CommitConflictError, match="metadata"):
        table_commit_append(extra, root, _race_hook=lambda: table_commit_rewrite(
            table_read(spark, root).filter(F.col("day") == dt.date(2024, 1, 2)).drop("band"),
            root,
        ))


def test_stale_claim_is_broken_not_bricking(tmp_path, monkeypatch):
    """No-hardlink publish fallback: a .claim whose manifest never
    landed (writer died between claim and replace) must not block the
    version forever — an aged claim is broken by the next writer
    (self-review r11)."""
    import errno
    import os as _os

    from google_cloud_ecommerce_spark import lakehouse as L

    root = str(tmp_path / "t")
    _os.makedirs(_os.path.join(root, "_manifest"))

    def no_link(src, dst):
        raise OSError(errno.EPERM, "links unsupported")

    monkeypatch.setattr(L.os, "link", no_link)
    # a dead writer's stale claim, backdated past the staleness window
    claim = _os.path.join(root, "_manifest", "v0.json.claim")
    open(claim, "w").close()
    _os.utime(claim, (1, 1))
    L._publish_manifest(root, 0, {"day=2024-01-01": "slices/v0-aa/day=2024-01-01"})
    assert L.table_versions(root) == [0]
    # a FRESH claim (concurrent writer mid-publish) still blocks
    claim1 = _os.path.join(root, "_manifest", "v1.json.claim")
    open(claim1, "w").close()
    with pytest.raises(FileExistsError, match="already committed"):
        L._publish_manifest(root, 1, {"day=2024-01-01": "slices/v1-aa/day=2024-01-01"})


def test_append_drops_carried_stats_when_new_footers_unusable(
    spark, tmp_path, monkeypatch
):
    """If the appended slice's footer stats are unusable, the carried
    [min, max] no longer bounds the partition and must be dropped —
    keeping it would prune freshly appended rows (self-review r11)."""
    from google_cloud_ecommerce_spark import lakehouse as L

    root = str(tmp_path / "t")
    rows = [(i, dt.date(2024, 1, 1), float(i)) for i in range(4)]
    table_create(
        spark.createDataFrame(rows, "event_id long, day date, value double"),
        root,
        stats_col="event_id",
    )
    monkeypatch.setattr(L, "_collect_partition_stats", lambda *a, **k: {})
    extra = spark.createDataFrame(
        [(50, dt.date(2024, 1, 1), 50.0)], "event_id long, day date, value double"
    )
    L.table_commit_append(extra, root)
    d1 = L._read_manifest_doc(root, 1)
    assert "day=2024-01-01" not in d1.get("stats", {})
    # and the un-stats'd partition is never pruned
    view = table_read(spark, root, stats_range=(40, 60))
    assert {r.event_id for r in view.collect()} == {0, 1, 2, 3, 50}


def test_change_feed_empty_diff_is_empty_typed(spark, tmp_path):
    """An empty version diff (same version twice, or a commit that left
    every pointer unchanged, e.g. an empty micro-batch append) must
    yield an empty TYPED feed, not a StopIteration from pcol derivation
    (ADVICE r11)."""
    from google_cloud_ecommerce_spark.lakehouse import (
        table_changes,
        table_commit_append,
        write_change_feed,
    )

    root = str(tmp_path / "t")
    _mk_table(spark, root, n_days=2)
    same = table_changes(spark, root, 0, 0, "event_id")
    assert same.count() == 0
    assert same.columns == [
        "event_id", "day", "value", "_change_type", "_commit_version",
    ]
    # an EMPTY append publishes v1 with unchanged pointers; the feed
    # across the chain must include the empty commit without crashing
    empty = spark.createDataFrame([], "event_id long, day date, value double")
    v = table_commit_append(empty, root)
    assert v == 1
    feed_dir = str(tmp_path / "feed")
    assert write_change_feed(spark, root, feed_dir, "event_id") == [1]
    assert spark.read.parquet(feed_dir).count() == 0


def test_stats_range_accepts_temporal_bounds(spark, tmp_path):
    """Manifest stats store dates as ISO strings; date/datetime bounds
    must be normalized the same way instead of raising a str-vs-date
    TypeError (ADVICE r11)."""
    root2 = str(tmp_path / "t2")
    # stats on a DATA date column ("seen" mirrors day; the partition
    # column itself is not in the data files, so it can't carry stats)
    rows = [
        (d * 100 + i, dt.date(2024, 1, 1 + d), dt.date(2024, 1, 1 + d), float(i))
        for d in range(4)
        for i in range(3)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, day date, seen date, value double"
    )
    table_create(df, root2, stats_col="seen")
    view = table_read(
        spark, root2, stats_range=(dt.date(2024, 1, 2), dt.date(2024, 1, 3))
    )
    got = {r.day for r in view.collect()}
    assert got == {dt.date(2024, 1, 2), dt.date(2024, 1, 3)}
    with pytest.raises(ValueError, match="not comparable"):
        table_read(spark, root2, stats_range=(object(), object()))


def test_stalled_claim_holder_does_not_overwrite_committed_manifest(
    tmp_path, monkeypatch
):
    """Fencing (ADVICE r11): a writer that stalls between claim and
    replace long enough for a breaker to re-claim and publish must FAIL
    its replace, not silently overwrite the breaker's committed
    manifest."""
    import errno
    import json as _json
    import os as _os

    from google_cloud_ecommerce_spark import lakehouse as L

    root = str(tmp_path / "t")
    _os.makedirs(_os.path.join(root, "_manifest"))

    def no_link(src, dst):
        raise OSError(errno.EPERM, "links unsupported")

    monkeypatch.setattr(L.os, "link", no_link)
    final = _os.path.join(root, "_manifest", "v0.json")
    claim = final + ".claim"
    real_open = _os.open

    def open_then_breaker_wins(path, flags, *a):
        fd = real_open(path, flags, *a)
        if path == claim:
            # the stall: before this writer's token lands, a breaker
            # breaks the claim, re-claims with ITS token, and commits
            _os.unlink(claim)
            with open(claim, "w", encoding="ascii") as cf:
                cf.write("breaker-token")
            with open(final, "w", encoding="utf-8") as mf:
                _json.dump({"version": 0, "partitions": {}, "by": "breaker"}, mf)
        return fd

    monkeypatch.setattr(L.os, "open", open_then_breaker_wins)
    with pytest.raises(FileExistsError, match="already committed"):
        L._publish_manifest(root, 0, {"day=2024-01-01": "slices/v0-aa/day=2024-01-01"})
    with open(final, encoding="utf-8") as mf:
        assert _json.load(mf)["by"] == "breaker"


def test_rebase_translates_missing_winner_manifest_to_retryable_race(
    spark, tmp_path, monkeypatch
):
    """If the race winner's manifest never becomes visible (claim holder
    died), the loser must see the documented retryable FileExistsError,
    not a bare FileNotFoundError from the rebase poll (ADVICE r11)."""
    from google_cloud_ecommerce_spark import lakehouse as L

    root = str(tmp_path / "t")
    _mk_table(spark, root, n_days=2)

    def gone(root_, version):
        raise FileNotFoundError(f"v{version} never landed")

    monkeypatch.setattr(L, "_await_version", gone)

    def winner_commits():
        # restore for the winner's own commit path, then re-break
        monkeypatch.setattr(L, "_await_version", L._read_manifest_doc)
        table_commit_rewrite(
            table_read(spark, root).filter(F.col("day") == dt.date(2024, 1, 1)),
            root,
        )
        monkeypatch.setattr(L, "_await_version", gone)

    with pytest.raises(FileExistsError, match="never became visible"):
        table_commit_rewrite(
            table_read(spark, root).filter(F.col("day") == dt.date(2024, 1, 2)),
            root,
            _race_hook=winner_commits,
        )

"""Semantic checks for changelog compaction, batch sessionization, and
bigram frequencies beyond oracle parity: latest-wins tie-breaks, the
exact-gap merge semantics of session_window (probed and pinned here),
and positional bigram construction."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from google_cloud_ecommerce_spark.catalog import load_table
from google_cloud_ecommerce_spark.queries import cdc

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def test_changelog_compaction_counts_each_user_once(spark, sf_smoke):
    n_users = (
        load_table(spark, sf_smoke, "events").select("user_id").distinct().count()
    )
    out = cdc.changelog_compaction(spark, sf_smoke)
    assert out.agg(F.sum("n_users")).collect()[0][0] == n_users


def test_struct_max_latest_wins_with_tiebreak(spark):
    # Two rows share the max ts; event_id breaks the tie (higher wins).
    rows = [
        (1, 10, BASE, "view", 1.0),
        (1, 11, BASE + dt.timedelta(minutes=5), "click", 2.0),
        (1, 12, BASE + dt.timedelta(minutes=5), "purchase", 3.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string, value double"
    )
    last = (
        df.groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id", "event_type", "value")).alias("last"))
        .select("user_id", "last.event_type", "last.value")
        .collect()[0]
    )
    assert last.event_type == "purchase" and last.value == 3.0


def test_session_window_merges_exact_gap(spark):
    # Pinned semantics the oracle depends on: a gap of EXACTLY the gap
    # duration merges; strictly greater splits.
    rows = [
        (1, BASE), (1, BASE + dt.timedelta(minutes=30)),
        (2, BASE), (2, BASE + dt.timedelta(minutes=30, seconds=1)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    per_user = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .groupBy("user_id")
        .count()
        .collect()
    )
    sessions = {r.user_id: r["count"] for r in per_user}
    assert sessions == {1: 1, 2: 2}


def test_batch_sessionization_conserves_events(spark, sf_smoke):
    total = load_table(spark, sf_smoke, "events").count()
    out = cdc.batch_sessionization(spark, sf_smoke).collect()
    assert sum(r.n_events * r.n_sessions for r in out) == total
    # single-event sessions span zero time
    singletons = [r for r in out if r.n_events == 1]
    assert all(r.total_duration_us == 0 for r in singletons)


def test_bigram_positional_construction(spark, tmp_path):
    from google_cloud_ecommerce_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "a b a b", "en", "s", 7), (2, "a", "en", "s", 1), (3, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "documents.parquet")
    docs.write.mode("overwrite").parquet(path)
    out = {r.bigram: (r.n_occurrences, r.n_docs) for r in T.bigram_frequencies(spark, str(tmp_path)).collect()}
    # "a b a b" -> bigrams: a b, b a, a b ; doc 2 and 3 contribute none
    assert out == {"a b": (2, 1), "b a": (1, 1)}


def test_scd2_intervals_contiguous_and_single_current(spark, sf_smoke):
    """Per user: versions start at 1 and increment, intervals chain
    exactly (valid_to == next valid_from), exactly one open (current)
    version, and run-length compression conserves the event count."""
    from collections import defaultdict

    from google_cloud_ecommerce_spark.queries import cdc
    from google_cloud_ecommerce_spark.catalog import load_table

    rows = cdc.scd2_user_state(spark, sf_smoke).collect()
    assert rows
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    n_events_total = 0
    for user, vs in by_user.items():
        vs.sort(key=lambda r: r.version)
        assert [r.version for r in vs] == list(range(1, len(vs) + 1))
        assert sum(r.is_current for r in vs) == 1
        assert vs[-1].is_current == 1 and vs[-1].valid_to_us is None
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to_us == b.valid_from_us
            assert a.attr != b.attr  # runs are maximal
        n_events_total += sum(r.n_events for r in vs)
    n_raw = load_table(spark, sf_smoke, "events").count()
    assert n_events_total == n_raw


def test_scd2_single_shuffle(spark, sf_smoke):
    """All windows and the island aggregate run co-partitioned on
    user_id: exactly one exchange in the whole plan."""
    from google_cloud_ecommerce_spark.queries import cdc

    df = cdc.scd2_user_state(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("+- Exchange") == 1


def test_snapshot_diff_counts_match_rules(spark, sf_smoke):
    """Status counts must equal what the modular derivation rules imply
    for the actual doc_id population."""
    from google_cloud_ecommerce_spark.catalog import load_table
    from google_cloud_ecommerce_spark.queries.cdc import (
        DIFF_DELETE_MOD,
        DIFF_INSERT_MOD,
        DIFF_UPDATE_MOD,
        snapshot_diff,
    )

    ids = [
        r.doc_id
        for r in load_table(spark, sf_smoke, "documents").select("doc_id").collect()
    ]
    removed = sum(1 for i in ids if i % DIFF_DELETE_MOD == 0)
    changed = sum(
        1 for i in ids if i % DIFF_DELETE_MOD != 0 and i % DIFF_UPDATE_MOD == 0
    )
    added = sum(1 for i in ids if i % DIFF_INSERT_MOD == 0)
    unchanged = len(ids) - removed - changed
    out = {r.status: r.n_rows for r in snapshot_diff(spark, sf_smoke).collect()}
    assert out.get("removed", 0) == removed
    assert out.get("changed", 0) == changed
    assert out.get("added", 0) == added
    assert out.get("unchanged", 0) == unchanged


def test_session_promo_overlap_clipping(spark, tmp_path):
    """Crafted sessions: one fully inside the promo hour, one straddling
    its start, one outside — overlap must clip exactly."""
    import datetime as dt

    from google_cloud_ecommerce_spark.queries.cdc import session_promo_overlap

    base = dt.datetime(2024, 1, 5)
    rows = [
        # user 1: 12:10 -> 12:40 (inside promo; 30 min overlap)
        (1, base + dt.timedelta(hours=12, minutes=10), 1, "view", 1.0, "{}"),
        (2, base + dt.timedelta(hours=12, minutes=40), 1, "view", 1.0, "{}"),
        # user 2: 11:50 -> 12:20 (10 min before + 20 inside)
        (3, base + dt.timedelta(hours=11, minutes=50), 2, "view", 1.0, "{}"),
        (4, base + dt.timedelta(hours=12, minutes=20), 2, "view", 1.0, "{}"),
        # user 3: 15:00 -> 15:10 (no overlap)
        (5, base + dt.timedelta(hours=15), 3, "view", 1.0, "{}"),
        (6, base + dt.timedelta(hours=15, minutes=10), 3, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.parquet(f"{tmp_path}/events.parquet")
    out = {r.user_id: r for r in session_promo_overlap(spark, str(tmp_path)).collect()}
    m = 60 * 1_000_000
    assert out[1].promo_overlap_us == 30 * m
    assert out[1].total_session_us == 30 * m
    assert out[2].promo_overlap_us == 20 * m
    assert out[3].promo_overlap_us == 0
    assert all(r.n_sessions == 1 for r in out.values())

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

"""Changelog / sessionization operators over ``events``.

The reference's streaming layer is append-only at-least-once
(``write_session_stream.py:107-112`` WRITE_APPEND, no dedup) and its
sessions exist only as a column (``user_session``, README.md:35-37).
Two batch operators a real pipeline builds on top of exactly that kind
of raw event log:

  changelog_compaction   treat events as a CDC changelog keyed by
                         user_id and materialize the CURRENT state
                         (latest event per user, ties broken by
                         event_id). Implemented as max(struct(ts,
                         event_id, payload...)) — an ordinary hash
                         aggregate with map-side partial combine, ONE
                         shuffle, no sort. The window-function spelling
                         (row_number() = 1) needs a full
                         shuffle+sort per key and cannot partially
                         aggregate, so at 100 TB the struct-max form is
                         the only viable plan; the oracle proves both
                         spellings agree.
  batch_sessionization   gap-based sessions (30-minute inactivity)
                         via session_window in BATCH mode — the same
                         operator streaming_sessionization uses on the
                         stream, proving the unified batch/stream
                         surface. Aggregated to a session-length
                         histogram so the output stays tiny at any
                         scale. Spark merges a gap of EXACTLY the gap
                         duration (probed: [start, end] is closed on
                         the merge side), so the oracle's
                         gaps-and-islands break is strictly
                         ``gap > 30 min``, on integral microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from google_cloud_ecommerce_spark.catalog import load_table

GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap, integral microseconds


def changelog_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # argmax-by-(ts, event_id) carried through a struct max: (ts, event_id)
    # is unique per user so the lexicographic max is deterministic and the
    # payload columns ride along.
    latest = (
        ev.groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id", "event_type", "value")).alias("last"))
        .select(
            "user_id",
            F.col("last.event_type").alias("last_event_type"),
            F.col("last.value").alias("last_value"),
        )
    )
    return latest.groupBy("last_event_type").agg(
        F.count("*").alias("n_users"),
        F.sum(F.col("last_value").cast("decimal(18,4)")).cast("double").alias("sum_last_value"),
        F.min("user_id").alias("min_user_id"),
        F.max("user_id").alias("max_user_id"),
    )


CHANGELOG_COMPACTION_SQL = f"""
    WITH ranked AS (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT event_type AS last_event_type,
           count(*) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_last_value,
           min(user_id) AS min_user_id,
           max(user_id) AS max_user_id
    FROM ranked WHERE rn = 1
    GROUP BY 1
"""


def batch_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sessions = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sv"),
            F.min("ts").alias("mn"),
            F.max("ts").alias("mx"),
        )
    )
    return (
        sessions.groupBy("n_events")
        .agg(
            F.count("*").alias("n_sessions"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum("sv").cast("double").alias("sum_value"),
            F.sum(F.unix_micros("mx") - F.unix_micros("mn")).alias("total_duration_us"),
        )
    )


BATCH_SESSIONIZATION_SQL = f"""
    WITH d AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {GAP_US}
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, ts, value,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM d
    ), sess AS (
        SELECT user_id, sid, count(*) AS n_events,
               SUM(CAST(value AS DECIMAL(18,4))) AS sv,
               min(ts) AS mn, max(ts) AS mx
        FROM s GROUP BY 1, 2
    )
    SELECT n_events, count(*) AS n_sessions,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(sv) AS DOUBLE) AS sum_value,
           -- outer CAST: DuckDB SUM(BIGINT) widens to HUGEINT; the driver
           -- hasher canonicalizes that differently from Spark BIGINT
           CAST(SUM(epoch_us(mx) - epoch_us(mn)) AS BIGINT) AS total_duration_us
    FROM sess GROUP BY 1
"""


def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 build from the event changelog.

    Tracks each user's event_type as the dimension attribute: consecutive
    runs of the same value collapse into one versioned row with a
    [valid_from, valid_to) interval (half-open; valid_to of the current
    version is NULL) and a per-user version number. This is the batch
    MERGE pattern a warehouse applies to CDC feeds, expressed as
    gaps-and-islands: break where the attribute changes, integer-sum the
    breaks into island ids, aggregate, then lead() the next island's
    start as the exclusive end.

    Scale: every window partitions by user_id — Catalyst plans ONE
    shuffle on that key and runs all three window passes plus the island
    aggregate co-partitioned on it. Interval bounds ship as integral
    epoch-microseconds (process-TZ stable, exactly comparable).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", F.col("event_type").alias("attr")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = (
        F.when(
            F.lag("attr").over(w).isNull() | (F.lag("attr").over(w) != F.col("attr")),
            1,
        )
        .otherwise(0)
        .alias("brk")
    )
    islands = ev.select("user_id", "event_id", "ts", "attr", brk).withColumn(
        "island", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    versions = islands.groupBy("user_id", "island", "attr").agg(
        F.min(F.unix_micros("ts")).alias("valid_from_us"),
        F.count("*").alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("island")
    return versions.select(
        "user_id",
        F.col("island").alias("version"),
        "attr",
        "valid_from_us",
        F.lead("valid_from_us").over(wv).alias("valid_to_us"),
        F.lead("valid_from_us").over(wv).isNull().cast("long").alias("is_current"),
        "n_events",
    )


SCD2_USER_STATE_SQL = """
    WITH d AS (
        SELECT user_id, event_id, ts, event_type AS attr,
               CASE WHEN lag(event_type) OVER w IS NULL
                         OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), i AS (
        SELECT user_id, ts, attr,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS island
        FROM d
    ), v AS (
        SELECT user_id, island, attr,
               min(epoch_us(ts)) AS valid_from_us,
               count(*) AS n_events
        FROM i GROUP BY 1, 2, 3
    )
    SELECT user_id,
           CAST(island AS BIGINT) AS version,
           attr,
           valid_from_us,
           lead(valid_from_us) OVER wv AS valid_to_us,
           CAST(lead(valid_from_us) OVER wv IS NULL AS BIGINT) AS is_current,
           n_events
    FROM v
    WINDOW wv AS (PARTITION BY user_id ORDER BY island)
"""


QUERIES = {
    "changelog_compaction": changelog_compaction,
    "batch_sessionization": batch_sessionization,
    "scd2_user_state": scd2_user_state,
}

ORACLE = {
    "changelog_compaction": CHANGELOG_COMPACTION_SQL,
    "batch_sessionization": BATCH_SESSIONIZATION_SQL,
    "scd2_user_state": SCD2_USER_STATE_SQL,
}


# ---------------------------------------------------------------------------
# snapshot_diff — row-level diff between two corpus snapshots: the CDC
# derivation a lakehouse runs when a source can only hand over full
# dumps (diff two loads -> insert/update/delete feed). Snapshot B is
# derived deterministically from A (modular delete/update/insert rules
# inlined in both engines) so the operator is self-contained; the diff
# itself is ONE full outer join on the key with md5 content digests
# compared — at 100 TB both sides shuffle once on the join key and
# the digest comparison never moves the payload twice.
# ---------------------------------------------------------------------------

DIFF_DELETE_MOD = 17  # doc_id % 17 == 0 rows vanish in snapshot B
DIFF_UPDATE_MOD = 13  # doc_id % 13 == 0 rows change content
DIFF_INSERT_MOD = 19  # doc_id % 19 == 0 rows spawn a new +1e6 row


# scan-audit: snapshot A, the synthesized snapshot B, and the insert branch
# are distinct snapshot roles by design (a real deployment reads two separate
# snapshot locations)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.select("doc_id", F.md5("text").alias("digest_a"))
    surviving = docs.filter(F.col("doc_id") % DIFF_DELETE_MOD != 0)
    changed = surviving.select(
        "doc_id",
        F.when(
            F.col("doc_id") % DIFF_UPDATE_MOD == 0,
            F.concat(F.col("text"), F.lit(" v2")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    inserted = docs.filter(F.col("doc_id") % DIFF_INSERT_MOD == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("new "), F.col("text")).alias("text"),
    )
    b = changed.unionByName(inserted).select(
        "doc_id", F.md5("text").alias("digest_b")
    )
    joined = a.join(b, "doc_id", "full_outer").select(
        "doc_id",
        F.when(F.col("digest_a").isNull(), "added")
        .when(F.col("digest_b").isNull(), "removed")
        .when(F.col("digest_a") != F.col("digest_b"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return joined.groupBy("status").agg(
        F.count("*").alias("n_rows"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


SNAPSHOT_DIFF_SQL = f"""
    WITH a AS (
        SELECT doc_id, md5(text) AS digest_a FROM documents
    ), b AS (
        SELECT doc_id,
               md5(CASE WHEN doc_id % {DIFF_UPDATE_MOD} = 0
                        THEN text || ' v2' ELSE text END) AS digest_b
        FROM documents WHERE doc_id % {DIFF_DELETE_MOD} <> 0
        UNION ALL
        SELECT doc_id + 1000000, md5('new ' || text)
        FROM documents WHERE doc_id % {DIFF_INSERT_MOD} = 0
    ), joined AS (
        SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
               CASE WHEN a.digest_a IS NULL THEN 'added'
                    WHEN b.digest_b IS NULL THEN 'removed'
                    WHEN a.digest_a <> b.digest_b THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    )
    SELECT status, count(*) AS n_rows,
           min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
    FROM joined GROUP BY 1
"""


QUERIES["snapshot_diff"] = snapshot_diff
ORACLE["snapshot_diff"] = SNAPSHOT_DIFF_SQL


# ---------------------------------------------------------------------------
# session_promo_overlap — interval algebra over sessions: how much of
# each user's session time falls inside the daily promo window
# (12:00-13:00 UTC). Sessions come from the SAME session_window
# operator as batch_sessionization; each session interval [min_ts,
# max_ts] is clipped against the promo interval of every day it spans
# (a generator explode over the 1-2 day span, not a join against a
# calendar table) with greatest/least interval intersection on integral
# microseconds — exact in both engines. The per-user rollup counts each
# session's duration once (on its first spanned day).
# ---------------------------------------------------------------------------

PROMO_START_US = 12 * 3600 * 1_000_000  # 12:00 UTC
PROMO_END_US = 13 * 3600 * 1_000_000  # 13:00 UTC


def session_promo_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sessions = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("sw")
    ).agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
    iv = sessions.select(
        "user_id",
        F.unix_micros("mn").alias("s_us"),
        F.unix_micros("mx").alias("e_us"),
        F.to_date("mn").alias("d0"),
        F.to_date("mx").alias("d1"),
    )
    spanned = iv.select(
        "user_id",
        "s_us",
        "e_us",
        "d0",
        F.explode(F.expr("sequence(d0, d1)")).alias("day"),
    )
    day_us = F.unix_micros(F.to_timestamp("day"))
    ov = F.greatest(
        F.lit(0),
        F.least(F.col("e_us"), day_us + F.lit(PROMO_END_US))
        - F.greatest(F.col("s_us"), day_us + F.lit(PROMO_START_US)),
    )
    return (
        spanned.withColumn("ov_us", ov)
        .withColumn(
            "dur_once",
            F.when(F.col("day") == F.col("d0"), F.col("e_us") - F.col("s_us")).otherwise(
                F.lit(0)
            ),
        )
        .groupBy("user_id")
        .agg(
            F.count_distinct("s_us").alias("n_sessions"),
            F.sum("dur_once").alias("total_session_us"),
            F.sum("ov_us").alias("promo_overlap_us"),
        )
    )


SESSION_PROMO_OVERLAP_SQL = f"""
    WITH d AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {GAP_US}
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM d
    ), sess AS (
        SELECT user_id, sid,
               epoch_us(min(ts)) AS s_us, epoch_us(max(ts)) AS e_us,
               CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
        FROM s GROUP BY 1, 2
    ), spanned AS (
        SELECT user_id, s_us, e_us, d0, unnest(generate_series(d0, d1,
                   INTERVAL 1 DAY))::DATE AS day
        FROM sess
    ), clipped AS (
        SELECT user_id, s_us, e_us, d0, day,
               GREATEST(0, LEAST(e_us, epoch_us(day::TIMESTAMP) + {PROMO_END_US})
                           - GREATEST(s_us, epoch_us(day::TIMESTAMP)
                                            + {PROMO_START_US})) AS ov_us,
               CASE WHEN day = d0 THEN e_us - s_us ELSE 0 END AS dur_once
        FROM spanned
    )
    SELECT user_id,
           COUNT(DISTINCT s_us) AS n_sessions,
           CAST(SUM(dur_once) AS BIGINT) AS total_session_us,
           CAST(SUM(ov_us) AS BIGINT) AS promo_overlap_us
    FROM clipped GROUP BY 1
"""


QUERIES["session_promo_overlap"] = session_promo_overlap
ORACLE["session_promo_overlap"] = SESSION_PROMO_OVERLAP_SQL

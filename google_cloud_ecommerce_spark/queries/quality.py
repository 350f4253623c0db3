"""Data-quality report: the constraint checks a pipeline runs before
trusting a drop of data (the reference ingests with zero validation —
``write_session_batch.py`` inserts whatever the CSV chunk contains).

One row per check: (check_name, n_checked, n_violations). Scale
posture: all per-table checks for a table ride ONE scan as conditional
aggregates (not one scan per check), and referential checks are LEFT
joins with a null-probe count — Catalyst/AQE picks broadcast vs
sort-merge by dim size, and the output is always a handful of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from google_cloud_ecommerce_spark.catalog import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")

    types = ", ".join(f"'{t}'" for t in EVENT_TYPES)
    ev_stats = ev.agg(
        F.count("*").alias("n"),
        F.sum(F.col("props").isNull().cast("long")).alias("null_props"),
        F.sum((F.col("value") < 0).cast("long")).alias("neg_value"),
        (F.count("*") - F.count_distinct("event_id")).alias("dup_ids"),
        F.sum((~F.col("event_type").isin(*EVENT_TYPES)).cast("long")).alias("bad_type"),
    )
    ev_checks = ev_stats.select(
        F.expr(
            "stack(4, 'events_null_props', null_props,"
            " 'events_negative_value', neg_value,"
            " 'events_duplicate_event_id', dup_ids,"
            " 'events_bad_event_type', bad_type) AS (check_name, n_violations)"
        ),
        F.col("n").alias("n_checked"),
    ).select("check_name", "n_checked", "n_violations")

    orphan_orders = (
        orders.join(
            customer.select("c_custkey"),
            orders["o_custkey"] == customer["c_custkey"],
            "left",
        )
        .agg(
            F.lit("orders_orphan_custkey").alias("check_name"),
            F.count("*").alias("n_checked"),
            F.sum(F.col("c_custkey").isNull().cast("long")).alias("n_violations"),
        )
    )
    orphan_lineitem = (
        lineitem.join(
            orders.select("o_orderkey"),
            lineitem["l_orderkey"] == orders["o_orderkey"],
            "left",
        )
        .agg(
            F.lit("lineitem_orphan_orderkey").alias("check_name"),
            F.count("*").alias("n_checked"),
            F.sum(F.col("o_orderkey").isNull().cast("long")).alias("n_violations"),
        )
    )
    discount_range = lineitem.agg(
        F.lit("lineitem_discount_range").alias("check_name"),
        F.count("*").alias("n_checked"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast("long")
        ).alias("n_violations"),
    )

    return ev_checks.unionByName(orphan_orders).unionByName(orphan_lineitem).unionByName(
        discount_range
    )


_types = ", ".join(f"'{t}'" for t in EVENT_TYPES)
DATA_QUALITY_REPORT_SQL = f"""
    SELECT 'events_null_props' AS check_name, CAST(count(*) AS BIGINT) AS n_checked,
           CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM events
    UNION ALL
    SELECT 'events_negative_value', CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) FROM events
    UNION ALL
    SELECT 'events_duplicate_event_id', CAST(count(*) AS BIGINT),
           CAST(count(*) - COUNT(DISTINCT event_id) AS BIGINT) FROM events
    UNION ALL
    SELECT 'events_bad_event_type', CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN event_type NOT IN ({_types}) THEN 1 ELSE 0 END) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'orders_orphan_custkey', CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem_orphan_orderkey', CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'lineitem_discount_range', CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
"""


QUERIES = {"data_quality_report": data_quality_report}
ORACLE = {"data_quality_report": DATA_QUALITY_REPORT_SQL}


# ---------------------------------------------------------------------------
# profile_table — generic per-column dataset profiler (the first thing
# anyone runs on an unfamiliar 100 TB table): row count, null count,
# exact distinct count per column, emitted one row per column. Built
# generically from the DataFrame schema, so it works on ANY table; the
# registry entry profiles events. ONE pass computes every column's
# counts in a single aggregate (count_distinct expands to Spark's
# expand+two-phase plan — n_cols× the rows map-side, but one job, no
# per-column scans); stack() pivots the single result row into the
# report. Counts only — integers survive every engine's canonicalizer.
# ---------------------------------------------------------------------------


def profile_table(df, column_order: list[str] | None = None):
    cols = column_order or df.columns
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"dist_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', null_{c}, dist_{c}" for c in cols)
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column_name, n_null, n_distinct)"
        ),
        F.col("n_rows"),
    ).select("column_name", "n_rows", "n_null", "n_distinct")


def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_table(load_table(spark, sf_dir, "events"))


EVENTS_PROFILE_SQL = """
    WITH s AS (
        SELECT count(*) AS n_rows,
               CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_id,
               COUNT(DISTINCT event_id) AS dist_event_id,
               CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ts,
               COUNT(DISTINCT ts) AS dist_ts,
               CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_id,
               COUNT(DISTINCT user_id) AS dist_user_id,
               CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_type,
               COUNT(DISTINCT event_type) AS dist_event_type,
               CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
               COUNT(DISTINCT value) AS dist_value,
               CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
               COUNT(DISTINCT props) AS dist_props
        FROM events
    )
    SELECT 'event_id' AS column_name, n_rows, null_event_id AS n_null, dist_event_id AS n_distinct FROM s
    UNION ALL SELECT 'ts', n_rows, null_ts, dist_ts FROM s
    UNION ALL SELECT 'user_id', n_rows, null_user_id, dist_user_id FROM s
    UNION ALL SELECT 'event_type', n_rows, null_event_type, dist_event_type FROM s
    UNION ALL SELECT 'value', n_rows, null_value, dist_value FROM s
    UNION ALL SELECT 'props', n_rows, null_props, dist_props FROM s
"""

QUERIES["events_profile"] = events_profile
ORACLE["events_profile"] = EVENTS_PROFILE_SQL


# ---------------------------------------------------------------------------
# functional_dependencies — schema-inference companion to the profiler:
# for ordered column pairs (A, B), does A determine B? Measured as
# n_distinct(A) vs n_distinct(A, B): equal counts mean every A value
# maps to exactly one B (holds=1). Counts are exact integers. The
# registry entry checks the event table's candidate dependencies
# (id -> everything; the deliberate near-keys too).
#
# Round-7 single-pass shape: ALL pairs' count-distincts run in ONE
# aggregate over ONE events scan (Spark's Expand turns k distinct
# column sets into a k-way row multiplication, so total shuffle volume
# matches the per-pair-union shape that planned 4 scans — but the scan,
# decode, and scheduling cost is paid once), then stack() unpivots to
# one row per pair. Local A/B at sf0.1: 0.27 -> 0.38 s min-of-3 (the
# union's 4 small jobs overlap on an idle local[32]); kept because one
# pass over the fact table is the 100 TB posture.
# ---------------------------------------------------------------------------

FD_PAIRS = (
    ("event_id", "user_id"),
    ("event_id", "event_type"),
    ("user_id", "event_type"),
    ("event_type", "user_id"),
)


def functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    aggs = []
    for i, (a, b) in enumerate(FD_PAIRS):
        aggs.append(F.count_distinct(F.col(a)).alias(f"na_{i}"))
        aggs.append(F.count_distinct(F.col(a), F.col(b)).alias(f"nab_{i}"))
    stack = (
        f"stack({len(FD_PAIRS)}, "
        + ", ".join(
            f"'{a}', '{b}', na_{i}, nab_{i}" for i, (a, b) in enumerate(FD_PAIRS)
        )
        + ") AS (determinant, dependent, n_distinct_a, n_distinct_ab)"
    )
    return (
        ev.agg(*aggs)
        .select(F.expr(stack))
        .select(
            "determinant",
            "dependent",
            "n_distinct_a",
            "n_distinct_ab",
            (F.col("n_distinct_a") == F.col("n_distinct_ab")).cast("long").alias("holds"),
        )
    )


FUNCTIONAL_DEPENDENCIES_SQL = " UNION ALL ".join(
    f"""
    SELECT '{a}' AS determinant, '{b}' AS dependent,
           COUNT(DISTINCT {a}) AS n_distinct_a,
           COUNT(DISTINCT ({a}, {b})) AS n_distinct_ab,
           CAST(COUNT(DISTINCT {a}) = COUNT(DISTINCT ({a}, {b})) AS BIGINT) AS holds
    FROM events
    """
    for a, b in FD_PAIRS
)

QUERIES["functional_dependencies"] = functional_dependencies
ORACLE["functional_dependencies"] = FUNCTIONAL_DEPENDENCIES_SQL


# ---------------------------------------------------------------------------
# fuzzy_name_matches — blocked entity resolution over the part-name
# vocabulary: candidate pairs whose edit distance is within
# FUZZY_MAX_DIST, found WITHOUT an n^2 scan. Two scale levers:
#   1. ER runs on the DISTINCT name vocabulary (one hash aggregate
#      first) — matching work scales with vocabulary size, never with
#      fact rows;
#   2. length blocking: levenshtein(a, b) >= |len(a) - len(b)|, so a
#      name only needs to meet names within FUZZY_MAX_DIST of its own
#      length. Each left name fans out to the 2d+1 candidate lengths
#      (an equi-join key), which bounds the candidate space by
#      same-length-band bucket products.
# Each surviving pair carries how many part rows each spelling covers —
# the payload a dedup/merge step consumes. Edit distance is the
# standard integer DP in both engines: exactly comparable, no float.
# ---------------------------------------------------------------------------

FUZZY_MAX_DIST = 2


def fuzzy_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    vocab = part.groupBy(F.col("p_name").alias("name")).agg(
        F.count("*").alias("n_parts")
    )
    left = vocab.select(
        F.col("name").alias("name_a"),
        F.col("n_parts").alias("n_parts_a"),
        F.explode(
            F.expr(
                f"sequence(length(name) - {FUZZY_MAX_DIST}, "
                f"length(name) + {FUZZY_MAX_DIST})"
            )
        ).alias("len_key"),
    )
    right = vocab.select(
        F.col("name").alias("name_b"),
        F.col("n_parts").alias("n_parts_b"),
        F.length("name").alias("len_key"),
    )
    return (
        left.join(right, "len_key")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= FUZZY_MAX_DIST)
        .select("name_a", "name_b", "edit_dist", "n_parts_a", "n_parts_b")
    )


FUZZY_NAME_MATCHES_SQL = f"""
    WITH vocab AS (
        SELECT p_name AS name, count(*) AS n_parts FROM part GROUP BY 1
    ), lkeys AS (
        SELECT name AS name_a, n_parts AS n_parts_a, len_key
        FROM vocab, unnest(range(length(name) - {FUZZY_MAX_DIST},
                                 length(name) + {FUZZY_MAX_DIST} + 1)) t(len_key)
    )
    SELECT l.name_a, r.name AS name_b,
           CAST(levenshtein(l.name_a, r.name) AS INTEGER) AS edit_dist,
           l.n_parts_a, r.n_parts AS n_parts_b
    FROM lkeys l JOIN vocab r ON r.name > l.name_a
                             AND length(r.name) = l.len_key
    WHERE levenshtein(l.name_a, r.name) <= {FUZZY_MAX_DIST}
"""


QUERIES["fuzzy_name_matches"] = fuzzy_name_matches
ORACLE["fuzzy_name_matches"] = FUZZY_NAME_MATCHES_SQL


# ---------------------------------------------------------------------------
# props_schema_discovery — schema-on-read profiling of the open JSON
# props column: which keys exist, how often, their inferred type
# (numeric vs string), and value cardinality. The reference stringified
# this dict and never looked inside (write_session_batch.py:18-20);
# a lakehouse needs the key inventory before it can promote fields to
# columns. Fully generic: the Spark side explodes the document as
# map<string,string> (no schema assumed), so new keys appear in the
# report without code changes.
# Scale: explode + one hash aggregate keyed by the KEY VOCABULARY —
# output rows scale with distinct keys, not events; distinct-value
# counting rides the same aggregate.
# ---------------------------------------------------------------------------


def props_schema_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    kv = ev.select(
        F.explode(F.from_json("props", "map<string,string>")).alias("key", "val")
    )
    return kv.groupBy("key").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("val").isNotNull().cast("long")).alias("n_nonnull"),
        F.sum(
            F.expr("try_cast(val AS DOUBLE) IS NOT NULL").cast("long")
        ).alias("n_numeric"),
        F.count_distinct("val").alias("n_distinct_values"),
        F.min("val").alias("min_value"),
        F.max("val").alias("max_value"),
    )


PROPS_SCHEMA_DISCOVERY_SQL = """
    WITH kv AS (
        SELECT unnest(json_keys(props)) AS key, props FROM events
    ), v AS (
        SELECT key, json_extract_string(props, '$.' || key) AS val FROM kv
    )
    SELECT key,
           count(*) AS n_rows,
           CAST(SUM(CASE WHEN val IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nonnull,
           CAST(SUM(CASE WHEN try_cast(val AS DOUBLE) IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric,
           COUNT(DISTINCT val) AS n_distinct_values,
           min(val) AS min_value,
           max(val) AS max_value
    FROM v GROUP BY 1
"""


QUERIES["props_schema_discovery"] = props_schema_discovery
ORACLE["props_schema_discovery"] = PROPS_SCHEMA_DISCOVERY_SQL


# ---------------------------------------------------------------------------
# catalog_report — the lakehouse catalog summary: one row per managed
# table with row count and column count (column counts come from the
# live schema on the Spark side, so a schema change shows up without a
# code change; the oracle pins the known testdata schemas). This is the
# table-inventory surface every warehouse exposes (information_schema /
# SHOW TABLE EXTENDED); planners read it for broadcast decisions, ops
# read it for growth tracking. Each count is a footer-level scan.
# ---------------------------------------------------------------------------

_CATALOG_TABLES = ("region", "nation", "customer", "orders", "events", "documents")


def catalog_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for t in _CATALOG_TABLES:
        df = load_table(spark, sf_dir, t)
        n_cols = len(df.columns)
        row = df.agg(
            F.lit(t).alias("table_name"),
            F.count("*").alias("n_rows"),
            F.lit(n_cols).cast("long").alias("n_cols"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# column counts are read from each table's actual schema on the Spark
# side; the oracle pins the known testdata schemas (2/3/5/6/6/5)
CATALOG_REPORT_SQL = """
    SELECT 'region' AS table_name, count(*) AS n_rows,
           CAST(2 AS BIGINT) AS n_cols FROM region
    UNION ALL SELECT 'nation', count(*), 3 FROM nation
    UNION ALL SELECT 'customer', count(*), 5 FROM customer
    UNION ALL SELECT 'orders', count(*), 6 FROM orders
    UNION ALL SELECT 'events', count(*), 6 FROM events
    UNION ALL SELECT 'documents', count(*), 5 FROM documents
"""


QUERIES["catalog_report"] = catalog_report
ORACLE["catalog_report"] = CATALOG_REPORT_SQL


# ---------------------------------------------------------------------------
# kanon_suppression — k-anonymity audit over the event stream before it
# leaves the trust boundary (e.g. as a training corpus or shared
# analytics extract). Quasi-identifier = (event_type, event hour): any
# cell observed for fewer than K distinct users is "suppressed" — a
# release would publish only the surviving cells. Output is the per
# event-type audit: how many cells existed, how many were suppressed,
# and how many events/users the suppression removes.
#
# Scale shape: two hash aggregates — (event_type, hour) with a distinct
# user count, then event_type — both map-side-combinable; no windows,
# no joins. The distinct-user count per cell is the only real shuffle
# and it keys on the cell, so skewed users spread across cells.
# ---------------------------------------------------------------------------

KANON_K = 5


def kanon_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hour")
    ).agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )
    supp = F.col("n_users") < KANON_K
    return (
        cells.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_cells"),
            F.count(F.when(supp, F.lit(1))).cast("long").alias("n_suppressed_cells"),
            F.sum(F.when(supp, F.col("n_events")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_suppressed_events"),
            F.sum(F.when(supp, F.col("n_users")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_suppressed_users"),
        )
    )


KANON_SUPPRESSION_SQL = f"""
    WITH cells AS (
        SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
               COUNT(DISTINCT user_id) AS n_users, count(*) AS n_events
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           count(*) AS n_cells,
           CAST(count(CASE WHEN n_users < {KANON_K} THEN 1 END) AS BIGINT)
               AS n_suppressed_cells,
           CAST(SUM(CASE WHEN n_users < {KANON_K} THEN n_events ELSE 0 END)
                AS BIGINT) AS n_suppressed_events,
           CAST(SUM(CASE WHEN n_users < {KANON_K} THEN n_users ELSE 0 END)
                AS BIGINT) AS n_suppressed_users
    FROM cells GROUP BY 1
"""


QUERIES["kanon_suppression"] = kanon_suppression
ORACLE["kanon_suppression"] = KANON_SUPPRESSION_SQL


# ---------------------------------------------------------------------------
# ldiversity_report — distinct l-diversity audit (Machanavajjhala et
# al., ICDE 2006: k-anonymity fails under homogeneity — a group of k
# identical sensitive values still leaks; every quasi-identifier group
# must also contain >= l DISTINCT sensitive values). Quasi-identifier:
# (event_type, hour); sensitive attribute: the event's value band
# (100-unit buckets). The per-type rollup reports how many cells fail
# the l bar and how many rows a release would have to generalize or
# drop — the l-diversity counterpart of kanon_suppression above.
# Scale shape: one hash aggregate to cells, one to the rollup — the
# same two-shuffle audit as the k-anon report.
# ---------------------------------------------------------------------------

LDIV_L = 3
LDIV_BAND = 100  # sensitive attribute: floor(value / 100)


def ldiversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hour")
    ).agg(
        F.count_distinct(
            F.floor(F.col("value") / LDIV_BAND).cast("long")
        ).alias("n_sensitive"),
        F.count("*").alias("n_events"),
    )
    weak = F.col("n_sensitive") < LDIV_L
    return cells.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_cells"),
        F.count(F.when(weak, F.lit(1))).cast("long").alias("n_weak_cells"),
        F.sum(F.when(weak, F.col("n_events")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_exposed_events"),
        F.min("n_sensitive").cast("long").alias("min_diversity"),
    )


LDIVERSITY_REPORT_SQL = f"""
    WITH cells AS (
        SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
               COUNT(DISTINCT CAST(floor(value / {LDIV_BAND}) AS BIGINT))
                   AS n_sensitive,
               count(*) AS n_events
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           count(*) AS n_cells,
           CAST(count(CASE WHEN n_sensitive < {LDIV_L} THEN 1 END) AS BIGINT)
               AS n_weak_cells,
           CAST(SUM(CASE WHEN n_sensitive < {LDIV_L} THEN n_events ELSE 0 END)
                AS BIGINT) AS n_exposed_events,
           CAST(MIN(n_sensitive) AS BIGINT) AS min_diversity
    FROM cells
    GROUP BY 1
"""

QUERIES["ldiversity_report"] = ldiversity_report
ORACLE["ldiversity_report"] = LDIVERSITY_REPORT_SQL

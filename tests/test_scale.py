

def test_kmv_sketch_accuracy_and_merge(spark, sf_smoke):
    """KMV estimate within 3/sqrt(k) relative error of the exact count
    when the sketch fills; exact when it doesn't. Merging two halves'
    sketches (k smallest of the union) reproduces the full sketch —
    the mergeability that makes KMV a rollup sketch."""
    from google_cloud_ecommerce_spark.catalog import load_table
    from google_cloud_ecommerce_spark.queries.scale import (
        KMV_K,
        kmv_user_cardinality,
    )

    exact = {
        r.event_type: r.n_users
        for r in load_table(spark, sf_smoke, "events")
        .groupBy("event_type")
        .agg(__import__("pyspark.sql.functions", fromlist=["F"]).count_distinct("user_id").alias("n_users"))
        .collect()
    }
    rows = kmv_user_cardinality(spark, sf_smoke).collect()
    assert rows
    tol = 3.0 / (KMV_K ** 0.5)
    for r in rows:
        true = exact[r.event_type]
        if r.k_kept < KMV_K:
            assert r.kmv_estimate == float(r.k_kept) == float(true)
        else:
            assert abs(r.kmv_estimate - true) / true <= tol

    # mergeability on raw hashes, driver-side: k-min of union == k-min of
    # (k-min(half A) ∪ k-min(half B))
    import hashlib

    users = sorted(
        {u.user_id for u in load_table(spark, sf_smoke, "events").select("user_id").distinct().collect()}
    )
    def h(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
    hashes = sorted(h(u) for u in users)
    a = sorted(h(u) for u in users if u % 2 == 0)[:KMV_K]
    b = sorted(h(u) for u in users if u % 2 == 1)[:KMV_K]
    assert sorted(a + b)[:KMV_K] == hashes[:KMV_K]


def test_key_skew_report_gini_semantics(spark, tmp_path):
    """Uniform key loads -> Gini 0; one dominant key -> Gini near 1 and
    max_key_share reflecting the domination."""
    import datetime as dt

    from google_cloud_ecommerce_spark.queries.scale import key_skew_report

    rows = []
    eid = 0
    # user_id: perfectly uniform (10 users x 10 events)
    # event_type: 91 'hot' + 9 singletons... keep vocabulary small:
    # 'hot' 92 times, 'a' 4, 'b' 4
    types = ["hot"] * 92 + ["a"] * 4 + ["b"] * 4
    for i in range(100):
        eid += 1
        rows.append(
            (eid, dt.datetime(2024, 1, 1 + i % 5, 12), i % 10, types[i], 1.0, "{}")
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.parquet(f"{tmp_path}/events.parquet")
    out = {r.key_column: r for r in key_skew_report(spark, str(tmp_path)).collect()}
    assert abs(out["user_id"].gini) < 1e-9
    assert out["user_id"].max_key_share == 0.1
    assert out["event_type"].gini > 0.5
    assert out["event_type"].max_key_share == 0.92


def test_bloom_filter_never_false_negative(spark, sf_smoke):
    """Bloom invariants: zero false negatives everywhere; measured FP
    rate bounded by a loose multiple of the theoretical (1-e^{-kn/m})^k;
    bit counts within [1, BLOOM_BITS]."""
    import math

    from google_cloud_ecommerce_spark.queries.scale import (
        BLOOM_BITS,
        BLOOM_HASHES,
        bloom_membership,
    )

    rows = bloom_membership(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r.n_false_negatives == 0
        assert 1 <= r.n_bits_set <= BLOOM_BITS
        if r.n_non_members:
            fp = r.n_false_positives / r.n_non_members
            theory = (1 - math.exp(-BLOOM_HASHES * r.n_members / BLOOM_BITS)) ** BLOOM_HASHES
            assert fp <= max(0.05, 3 * theory)


def test_merge_upsert_exactly_once_reapplication(spark, sf_smoke):
    """The MERGE changelog carries ABSOLUTE state, so re-delivering the
    same epoch (at-least-once upstream) must leave the table
    byte-identical — the exactly-once guarantee a MERGE sink owes.
    Apply the merge twice to one working copy and compare full states;
    also pin the semantics: every update key shows the set value,
    every insert key exists exactly once, untouched rows unchanged."""
    import tempfile

    from google_cloud_ecommerce_spark.io import ensure_day_partitioned_events
    from google_cloud_ecommerce_spark.queries.scale import (
        MERGE_INSERT_OFFSET,
        MERGE_SET_VALUE,
        MERGE_UPD_MOD,
        MERGE_UPD_RESIDUE,
        _apply_merge,
        _merge_changelog,
    )

    src = ensure_day_partitioned_events(spark, sf_smoke)
    with tempfile.TemporaryDirectory(prefix="merge_once_") as out:
        spark.read.parquet(src).write.mode("overwrite").partitionBy("day").parquet(out)
        chg = _merge_changelog(spark, sf_smoke)

        def apply_once():
            merged = _apply_merge(spark.read.parquet(out), chg)
            (
                merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("day")
                .parquet(out)
            )
            return sorted(
                (r.event_id, r.event_type, r.value)
                for r in spark.read.parquet(out)
                .select("event_id", "event_type", "value")
                .collect()
            )

        first = apply_once()
        second = apply_once()
        assert first == second

        by_id = dict((eid, (et, v)) for eid, et, v in first)
        base_rows = spark.read.parquet(src).select(
            "event_id", "event_type", "value"
        ).collect()
        for r in base_rows:
            res = r.event_id % MERGE_UPD_MOD
            if res == MERGE_UPD_RESIDUE:
                assert by_id[r.event_id] == ("adjusted", MERGE_SET_VALUE)
            else:
                assert by_id[r.event_id] == (r.event_type, r.value)
        inserted = [eid for eid in by_id if eid >= MERGE_INSERT_OFFSET]
        assert inserted and len(first) == len(base_rows) + len(inserted)


def test_lakehouse_pruned_read_never_lists_nonmatching_partitions(spark, sf_smoke):
    """VERDICT r10 #1 done-condition: a stats-range versioned read
    lists ONLY the partitions whose recorded [min, max] intersects the
    range — the non-matching days' files never appear in the scan, and
    the listed set is exactly the days that contain a matching id
    (event ids are ts-ordered, so per-day id ranges are disjoint)."""
    import tempfile

    from pyspark.sql import functions as F

    from google_cloud_ecommerce_spark.io import ensure_day_partitioned_events
    from google_cloud_ecommerce_spark.lakehouse import (
        _read_manifest_doc,
        table_commit_rewrite,
        table_create,
        table_read,
    )
    from google_cloud_ecommerce_spark.queries.scale import (
        PRUNE_REFRESH_CUTOFF,
        PRUNE_STATS_HI,
        PRUNE_STATS_LO,
    )

    src = ensure_day_partitioned_events(spark, sf_smoke)
    with tempfile.TemporaryDirectory(prefix="pruned_read_") as root:
        table_create(spark.read.parquet(src), root, stats_col="event_id")
        table_commit_rewrite(
            table_read(spark, root, 0).filter(
                F.dayofmonth("day") <= PRUNE_REFRESH_CUTOFF
            ),
            root,
        )
        doc = _read_manifest_doc(root, 1)
        assert doc["stats_column"] == "event_id"
        # every partition carries stats (created with the column, and
        # the rewrite refreshed its days from the new footers)
        assert set(doc["stats"]) == set(doc["partitions"])
        expected_days = {
            str(r.day)
            for r in spark.read.parquet(src)
            .filter(F.col("event_id").between(PRUNE_STATS_LO, PRUNE_STATS_HI))
            .select("day")
            .distinct()
            .collect()
        }
        view = table_read(
            spark, root, stats_range=(PRUNE_STATS_LO, PRUNE_STATS_HI)
        )
        listed_days = {f.split("/day=")[1][:10] for f in view.inputFiles()}
        assert listed_days == expected_days
        assert 0 < len(listed_days) < len(doc["partitions"])


def test_change_feed_emits_nothing_for_an_identity_rewrite(spark, sf_smoke):
    """A rewrite that copies every row verbatim produces a NEW version
    whose change feed is EMPTY — copied rows null-safe-compare equal.
    This is what keeps the feed's volume proportional to the actual
    delta even though copy-on-write rewrites whole partitions."""
    import tempfile

    from pyspark.sql import functions as F

    from google_cloud_ecommerce_spark.io import ensure_day_partitioned_events
    from google_cloud_ecommerce_spark.lakehouse import (
        table_changes,
        table_commit_rewrite,
        table_create,
        table_read,
    )

    src = ensure_day_partitioned_events(spark, sf_smoke)
    with tempfile.TemporaryDirectory(prefix="cdc_identity_") as root:
        table_create(spark.read.parquet(src), root)
        table_commit_rewrite(
            table_read(spark, root, 0).filter(F.dayofmonth("day") <= 5), root
        )
        assert table_changes(spark, root, 0, 1, key_col="event_id").count() == 0



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

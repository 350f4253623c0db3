"""Query registry.

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
and ``ORACLE: dict[str, str]`` (DuckDB ANSI-SQL twins; keys without an
oracle get the driver's weaker rows-only check). ``all_queries`` /
``all_oracles`` merge every suite for ``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from google_cloud_ecommerce_spark.operators import (
        dedup,
        multimodal,
        pandas_ops,
        pipeline,
        retrieval,
        similarity,
        text,
    )
    from google_cloud_ecommerce_spark.queries import (
        cdc,
        graph,
        joins,
        quality,
        reference,
        relational,
        scale,
        stats,
        tpch_extra,
        tpch_extra2,
    )
    from google_cloud_ecommerce_spark.functions import sql_udf
    from google_cloud_ecommerce_spark.sources import wire
    from google_cloud_ecommerce_spark.streaming import jobs as streaming_jobs

    return (
        reference,
        relational,
        joins,
        cdc,
        graph,
        quality,
        scale,
        stats,
        tpch_extra,
        tpch_extra2,
        dedup,
        similarity,
        text,
        multimodal,
        pandas_ops,
        pipeline,
        retrieval,
        wire,
        sql_udf,
        streaming_jobs,
    )


# The correctness driver oracle-checks the FIRST 50 registry entries only.
# Round-10 rotation (VERDICT r9 "next round" #1): CORRECTNESS_r09
# landed 50/50 green, the driver-green union is 280/280 and the
# never-checked tail is EMPTY — window slots are re-checks by
# necessity (plus the round-10 additions). Slate composition, in the
# r9-directed order:
# 3 round-10 additions (vacuum_report — the lakehouse VACUUM
# accounting over the new N-version manifest — skew_join_demo — the
# AQE skew-split hot-key join — and version_diff_pruned — the
# manifest-pruned incremental version diff);
# 5 re-checks whose code changed in round-10 commits: the three
# queries rerouted through the lakehouse manifest (merge_upsert_rewrite,
# streaming_merge_upsert, time_travel_read — VERDICT r9 #2 + ADVICE
# r9), wire_stream_sink (the manifest prefix-divergence diagnosis fix
# + configurable poll deadline, ADVICE r9), and
# tpch_q1_pricing_summary — the canary for the distributed scan-layout
# compaction rewrite (VERDICT r9 #3; also itself an r03-last name);
# then strictly oldest evidence: the first 42 of the remaining 45
# r03-last names, alphabetical (weekday_eventtype_chisq,
# wire_format_source and zorder_curve roll to round 11). Every name
# has an oracle; tests/test_registry.py pins the slate and the
# no-wasted-slot rule.
PRIORITY: tuple[str, ...] = (
    # --- 3 round-10 additions (never driver-checked) ---
    "vacuum_report",
    "skew_join_demo",
    "version_diff_pruned",
    # --- 5 re-checks: code changed in round-10 commits ---
    "merge_upsert_rewrite",
    "streaming_merge_upsert",
    "time_travel_read",
    "wire_stream_sink",
    "tpch_q1_pricing_summary",
    # --- 42 re-checks: oldest driver evidence (r03-last), alphabetical ---
    "asof_purchase_view",
    "batch_sessionization",
    "bloom_membership",
    "corpus_drift",
    "daily_events",
    "data_quality_report",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "doc_chunking",
    "event_path_mining",
    "event_type_stats_salted",
    "events_cube_rollup",
    "ewma_daily_value",
    "feature_hash_vectors",
    "fuzzy_name_matches",
    "grouping_id_report",
    "holt_daily_forecast",
    "lineitem_quartiles_distributed",
    "media_bmp_decode",
    "media_wav_decode",
    "pagerank_categories",
    "part_skyline",
    "pii_redaction",
    "pq_encode",
    "props_json_stats",
    "props_schema_discovery",
    "random_projection",
    "session_stats_pandas",
    "ship_delay_priority",
    "similarity_lsh_topk",
    "similarity_topk",
    "snapshot_diff",
    "sql_udf_revenue_bands",
    "streaming_daily_events",
    "streaming_hourly_window",
    "text_lang_id",
    "text_quality",
    "time_weighted_value",
    "train_eval_split",
    "triangle_coview",
    "value_zscore_outliers",
)


def _merge(attr: str) -> dict:
    merged: dict = {}
    for mod in _modules():
        entries = getattr(mod, attr)
        dup = merged.keys() & entries.keys()
        if dup:  # a silent overwrite would hide an operator from the gate
            raise ValueError(f"duplicate {attr} keys across modules: {sorted(dup)}")
        merged.update(entries)
    head = {k: merged[k] for k in PRIORITY if k in merged}
    tail = {k: v for k, v in merged.items() if k not in head}
    return {**head, **tail}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _merge("QUERIES")


def all_oracles() -> dict[str, str]:
    return _merge("ORACLE")

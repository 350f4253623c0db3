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
# Round-11 rotation (VERDICT r10 "next round" #4): CORRECTNESS_r10
# landed 50/50 green, the driver-green union is 283/283 and the
# never-checked tail is again EMPTY apart from the 8 round-11
# additions — every other slot is a re-check by necessity. Slate
# composition, in the r10-directed order:
# 8 round-11 additions (lakehouse_pruned_read — stats/partition-pruned
# versioned reads — lakehouse_schema_evolution — schema-per-version
# manifests — lakehouse_change_feed — row-level CDC off the version
# chain — streaming_version_feed — the feed replayed one commit per
# micro-batch — lakehouse_deletion_vectors — merge-on-read row deletes
# — lakehouse_optimize — compaction + DV materialization —
# lakehouse_append_ingest — blind multi-slice appends — and
# streaming_manifest_ingest — per-epoch append commits with the
# idempotent-writer txn protocol);
# 14 re-checks whose code changed in round-11 commits: the five
# entries routed through the rewritten lakehouse manifest layer
# (vacuum_report, version_diff_pruned, merge_upsert_rewrite,
# streaming_merge_upsert, time_travel_read), the five ANN entries
# under the new multiprobe default dial + farthest-first PQ seeding
# (similarity_multiprobe_topk, pq_encode, pq_distortion_report,
# similarity_pq_topk, similarity_ivfpq_topk), the three span-index
# consumers (repeated_span_dedup, dedup_span_excision,
# curation_funnel_v2), and tpch_q1_pricing_summary as the compaction
# guard canary;
# then strictly oldest evidence: the 3 r03-last names deferred since
# round 10 (weekday_eventtype_chisq, wire_format_source,
# zorder_curve), then the first 25 of the 44 r05-last names,
# alphabetical (rolling_median_daily_value onward rolls to round 12).
# Every name has
# an oracle; tests/test_registry.py pins the slate and the
# no-wasted-slot rule.
PRIORITY: tuple[str, ...] = (
    # --- 8 round-11 additions (never driver-checked) ---
    "lakehouse_pruned_read",
    "lakehouse_schema_evolution",
    "lakehouse_change_feed",
    "streaming_version_feed",
    "lakehouse_deletion_vectors",
    "lakehouse_optimize",
    "lakehouse_append_ingest",
    "streaming_manifest_ingest",
    # --- 14 re-checks: code changed in round-11 commits ---
    "vacuum_report",
    "version_diff_pruned",
    "merge_upsert_rewrite",
    "streaming_merge_upsert",
    "time_travel_read",
    "similarity_multiprobe_topk",
    "pq_encode",
    "pq_distortion_report",
    "similarity_pq_topk",
    "similarity_ivfpq_topk",
    "repeated_span_dedup",
    "dedup_span_excision",
    "curation_funnel_v2",
    "tpch_q1_pricing_summary",
    # --- 3 re-checks: oldest driver evidence (r03-last, deferred twice) ---
    "weekday_eventtype_chisq",
    "wire_format_source",
    "zorder_curve",
    # --- 25 re-checks: next-oldest evidence (r05-last), alphabetical ---
    "ab_test_report",
    "adaptive_quality_gates",
    "ann_recall_report",
    "cdc_chunk_dedup",
    "conversion_latency_percentiles",
    "cusum_changepoints",
    "daily_value_gapfill",
    "dedup_recall_report",
    "dedup_threshold_sweep",
    "dup_cluster_histogram",
    "embedding_outliers",
    "embedding_projection",
    "epoch_shuffle_shards",
    "eval_split_leakage",
    "gate_attribution",
    "heldout_perplexity",
    "importance_sampling_weights",
    "jsonl_roundtrip",
    "kanon_suppression",
    "lsh_band_sweep",
    "media_chunks",
    "media_phash_clusters",
    "ngram_novelty",
    "packing_capacity_sweep",
    "quality_classifier_score",
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

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
# Round-9 rotation (VERDICT r8 "next round" #3): CORRECTNESS_r08 landed
# 50/50 green, the driver-green union is 274/274 and the never-checked
# tail is EMPTY — window slots are re-checks by necessity (plus any
# round-9 additions). Slate composition, in the r8-directed order:
# 6 round-9 additions (curation_funnel_v2, merge_upsert_rewrite,
# streaming_merge_upsert, similarity_binary_topk,
# stratified_sample_topk, time_travel_read);
# 5 re-checks whose code changed in round-9 commits (the
# countmin_estimates probe pre-filter + tfidf_top_terms vocab guard —
# VERDICT r8 #1/#2 — the token_zipf_fit / vocab_prune_coverage guarded
# prefix-sum rewrite — #5 — and the wire manifest-commit race fixes
# under wire_stream_sink — ADVICE r8); then strictly oldest evidence:
# ALL 10 names whose only driver row is r01 (the round-8 slate deferred
# 7 of them as exact-shape siblings; with a pure re-check window there
# is no cheaper claim to spend those slots on), ALL 28 names whose last
# row is r02, and the alphabetically-first r03-last name
# (ab_test_cuped) to fill 50. Every name has an oracle;
# tests/test_registry.py pins the slate and the no-wasted-slot rule.
PRIORITY: tuple[str, ...] = (
    # --- 6 round-9 additions (never driver-checked) ---
    "curation_funnel_v2",
    "merge_upsert_rewrite",
    "streaming_merge_upsert",
    "similarity_binary_topk",
    "stratified_sample_topk",
    "time_travel_read",
    # --- 5 re-checks: code changed in round-9 commits ---
    "countmin_estimates",
    "tfidf_top_terms",
    "token_zipf_fit",
    "vocab_prune_coverage",
    "wire_stream_sink",
    # --- 10 re-checks: oldest driver evidence (r01-only rows) ---
    "csv_roundtrip",
    "event_enrichment",
    "high_value_customers",
    "large_parts_ordered",
    "lineitem_quartiles",
    "parties_union",
    "parts_never_ordered",
    "segment_orders_right_outer",
    "value_band_stats",
    "value_percentiles",
    # --- 28 re-checks: last driver row is r02 ---
    "bm25_search",
    "changelog_compaction",
    "conversion_rate",
    "dedup_clusters",
    "dedup_minhash_lsh",
    "event_type_stats_arrow",
    "first_shipment_per_order",
    "hour_event_value",
    "kmeans_assign",
    "kmv_user_cardinality",
    "nation_party_balance_full_outer",
    "nation_revenue",
    "national_market_share",
    "order_status_pivot",
    "purchase_attribution",
    "purchase_funnel",
    "record_id",
    "scd2_user_state",
    "sequence_packing",
    "shipping_priority",
    "similarity_index_topk",
    "similarity_ivf_topk",
    "streaming_sessionization",
    "token_counts",
    "top_categories",
    "user_cardinality",
    "weekday_conversion_volume",
    "wire_stream_counts",
    # --- 1 re-check: oldest r03-last name (alphabetical fill) ---
    "ab_test_cuped",
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

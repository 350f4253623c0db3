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
# Round-8 rotation (VERDICT r7 "next round" #2): CORRECTNESS_r07 landed
# 50/50 green, so the driver-green union is 257 of 270 and the
# never-checked tail is exactly the 13 names the round-7 hand-off
# predicted (10 deferred TPC-H lookalikes + the 3 round-7 additions —
# all 13 judge-verified in VERDICT r7, so a driver mismatch is
# maximally informative). The window takes all 13, the 4 round-8
# additions (market_basket_rules, similarity_multiprobe_topk,
# weighted_sample_topk, schema_evolution_read), and
# 33 re-check slots: once the
# never-checked tail is smaller than the window, a slot is NOT wasted
# on a re-check when the operator's code changed since its last driver
# row — VERDICT r7 directed exactly this slate. Re-check groups:
# 8 touched by the round-8 commits (broadcast guards for
# lm_score/lm_bigram_score/dedup_prefix_filter + the shared threshold
# parser move under contamination_check, the BPE base-vocab pin under
# bpe_merges/bpe_tokenize, io.py bucket-GC hardening under
# bucketed_join_revenue, the wire manifest-commit change under
# wire_stream_sink), 8 perf-pinned in round 7 AFTER their last driver
# row (winnowing_fingerprints/band_affinity excluded — their r07 rows
# postdate the pins), and 17 oldest-evidence names whose only driver
# row is r01 (10 of the 27 r01-last names are left out as exact-shape
# siblings of newer greens: value_percentiles ⊂ value_quantile_sketch
# r07 / conversion_latency_percentiles, lineitem_quartiles ⊂
# lineitem_quartiles_distributed r03, value_band_stats ⊂
# order_value_distribution r07, segment_orders_right_outer ⊂
# nation_party_balance_full_outer r02, parts_never_ordered ⊂
# customers_without_orders (kept), csv_roundtrip ⊂ orc/jsonl_roundtrip
# r05/r06, high_value_customers and event_enrichment trivial
# filter/fill shapes, parties_union ⊂ user_cohort_setops (in-window
# set-op), large_parts_ordered ⊂ return_excess_orders (in-window
# agg+having)). Exactly 50 names, all with oracles.
PRIORITY: tuple[str, ...] = (
    # --- 13 never-driver-checked (all judge-verified in VERDICT r7) ---
    "promo_revenue_ratio",
    "small_quantity_revenue",
    "large_volume_orders",
    "returned_item_customers",
    "top_supplier_revenue",
    "brand_size_supplier_counts",
    "product_type_profit",
    "important_parts_value",
    "excess_quantity_suppliers",
    "lonely_late_suppliers",
    "kn_bigram_score",
    "mlm_masking_spec",
    "ngram_novelty_score",
    # --- 4 round-8 additions (never checked) ---
    "market_basket_rules",
    "similarity_multiprobe_topk",
    "weighted_sample_topk",
    "schema_evolution_read",
    # --- 8 re-checks: code changed in round-8 commits ---
    "lm_score",
    "lm_bigram_score",
    "dedup_prefix_filter",
    "contamination_check",
    "bpe_merges",
    "bpe_tokenize",
    "bucketed_join_revenue",
    "wire_stream_sink",
    # --- 8 re-checks: round-7 perf pins landed after their last driver row ---
    "rfm_segments",
    "key_skew_report",
    "token_zipf_fit",
    "vocab_prune_coverage",
    "functional_dependencies",
    "matryoshka_recall",
    "matryoshka_dim_sweep",
    "cross_source_dedup_matrix",
    # --- 17 re-checks: oldest driver evidence (r01-only rows) ---
    "customer_order_progression",
    "customers_above_nation_avg",
    "customers_without_orders",
    "funnel_transitions",
    "lineitem_measures_unpivot",
    "monthly_revenue_running",
    "order_cube",
    "order_priority_rollup",
    "orders_per_customer_histogram",
    "return_excess_orders",
    "revenue_grouping_sets",
    "segment_daily_moving_avg",
    "sql_revenue_report",
    "top_customers_per_segment",
    "user_cohort_setops",
    "user_event_gaps",
    "user_retention_cohorts",
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

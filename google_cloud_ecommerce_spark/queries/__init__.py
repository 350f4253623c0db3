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
# Round-12 rotation (VERDICT r11 "next round" #5): CORRECTNESS_r11
# landed 50/50 green and the driver-green union is 291/291 — the
# never-checked tail is EMPTY, so every slot is a DOCUMENTED re-check.
# Slate composition (round 12 is an optimization round: re-checks are
# the queries whose plans were rewritten, then strictly oldest
# evidence):
# 12 re-checks whose code changed in round-12 optimization commits —
# curation_funnel_v2 (one-pass spine), corpus_to_training_batches +
# pretraining_corpus_prep (digest-window keeper), embedding_outliers
# (posexplode centroid), skipgram_pairs + skipgram_pmi (zip_with
# slices), schema_evolution_read (overlapped fixture writes),
# hybrid_search_rrf + corpus_drift (full-outer joins fused to
# union/conditional aggregates), pagerank_categories (single-row
# integer rounds), vocab_prune_coverage (fused totals),
# semdedup_clusters (pair stage SHUFFLE_HASH);
# 5 re-checks routed through the round-12 manifest-layer hardening
# (empty-diff change feed, claim fencing, temporal stats bounds,
# retryable rebase): lakehouse_change_feed, streaming_version_feed,
# lakehouse_pruned_read, lakehouse_append_ingest,
# streaming_manifest_ingest;
# tpch_q1_pricing_summary as the cross-round canary;
# then strictly oldest evidence: the 19 remaining r05-last names
# (rolling_median_daily_value onward — skipgram_pairs/pmi already
# appear above as code-changed), then the first 15 of the 44 r06-last
# names alphabetically, skipping the three already in the
# code-changed group (corpus_to_training_batches, hybrid_search_rrf,
# pretraining_corpus_prep). Every name has an oracle;
# tests/test_registry.py pins the slate and the no-wasted-slot rule.
PRIORITY: tuple[str, ...] = (
    # --- 12 re-checks: code changed in round-12 commits ---
    "curation_funnel_v2",
    "corpus_to_training_batches",
    "pretraining_corpus_prep",
    "embedding_outliers",
    "skipgram_pairs",
    "skipgram_pmi",
    "schema_evolution_read",
    "hybrid_search_rrf",
    "corpus_drift",
    "pagerank_categories",
    "vocab_prune_coverage",
    "semdedup_clusters",
    # --- 5 re-checks: routed through the r12 manifest hardening ---
    "lakehouse_change_feed",
    "streaming_version_feed",
    "lakehouse_pruned_read",
    "lakehouse_append_ingest",
    "streaming_manifest_ingest",
    # --- cross-round canary ---
    "tpch_q1_pricing_summary",
    # --- 17 re-checks: oldest evidence (r05-last, the deferred tail) ---
    "rolling_median_daily_value",
    "rolling_weekly_active_users",
    "series_similarity",
    "span_corruption_masks",
    "stratified_hash_sample",
    "streaming_band_enrichment",
    "streaming_dedup_within_watermark",
    "streaming_incremental_mv",
    "streaming_kmv_sketch",
    "streaming_media_features",
    "streaming_purchase_attribution_outer",
    "streaming_rate_limit",
    "streaming_similarity_topk",
    "streaming_two_level_window",
    "streaming_view_purchase_full_outer",
    "tokenizer_fertility",
    "user_activity_bitmap",
    # --- 15 re-checks: next-oldest evidence (r06-last), alphabetical ---
    "balanced_group_sample",
    "corpus_mixture_sample",
    "corpus_quality_dashboard",
    "corpus_stats",
    "dedup_embedding_cosine",
    "dedup_segments",
    "dedup_simhash",
    "doc_fingerprint",
    "doc_tokens_udtf",
    "embedding_dim_stats",
    "expanded_keyword_search",
    "hard_negative_mining",
    "ivf_balance_report",
    "label_centroids",
    "length_bucket_batches",
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

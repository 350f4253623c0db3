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
# Round-5 rotation policy (continuing VERDICT r3 "Next round #1"; the
# round-4 window committed its 50 slots to the first never-checked
# wave): all 50 slots again go to never-driver-checked names — the
# LLM-pipeline additions from round 4 (dedup sweeps, ANN recall/
# quantization reports, text scoring/tokenizer ops, span corruption,
# epoch sharding, leakage guards), the 10 never-checked streaming
# entries, and the 12 most plan-distinctive relational/stats shapes.
# The 24 deferred names are TPC-H-flavored lookalikes of already
# driver-green siblings; they take the round-6 window. Exactly 50
# names, all with oracles.
PRIORITY: tuple[str, ...] = (
    # --- dedup sweeps / reports (operators/dedup.py) ---
    "dedup_threshold_sweep",
    "dup_cluster_histogram",
    "cross_source_dedup_matrix",
    "dedup_recall_report",
    "cdc_chunk_dedup",
    "lsh_band_sweep",
    # --- similarity / embedding reports (operators/similarity.py) ---
    "embedding_projection",
    "ann_recall_report",
    "embedding_outliers",
    "matryoshka_recall",
    "matryoshka_dim_sweep",
    # --- text analysis (operators/text.py) ---
    "quality_classifier_score",
    "ngram_novelty",
    "tokenizer_fertility",
    "adaptive_quality_gates",
    "gate_attribution",
    "skipgram_pairs",
    "token_zipf_fit",
    "heldout_perplexity",
    "skipgram_pmi",
    # --- multimodal (operators/multimodal.py) ---
    "media_chunks",
    "media_phash_clusters",
    # --- curation pipelines (operators/pipeline.py) ---
    "span_corruption_masks",
    "importance_sampling_weights",
    "epoch_shuffle_shards",
    "packing_capacity_sweep",
    "eval_split_leakage",
    "jsonl_roundtrip",
    # --- relational / stats (plan-distinctive shapes) ---
    "rfm_segments",
    "kanon_suppression",
    "stratified_hash_sample",
    "rolling_weekly_active_users",
    "user_activity_bitmap",
    "daily_value_gapfill",
    "rolling_median_daily_value",
    "cusum_changepoints",
    "ab_test_report",
    "series_similarity",
    "functional_dependencies",
    "conversion_latency_percentiles",
    # --- streaming (batch-equivalent oracles) ---
    "streaming_purchase_attribution_outer",
    "streaming_band_enrichment",
    "streaming_incremental_mv",
    "streaming_two_level_window",
    "streaming_view_purchase_full_outer",
    "streaming_dedup_within_watermark",
    "streaming_similarity_topk",
    "streaming_kmv_sketch",
    "streaming_media_features",
    "streaming_rate_limit",
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

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
        wire,
        sql_udf,
        streaming_jobs,
    )


# The correctness driver oracle-checks the FIRST 50 registry entries only.
# Round-3 rotation policy: keep ONE driver-green anchor per operator
# family (verified in CORRECTNESS_r01/r02), re-admit the three queries
# reshaped this round (scalar output columns), and fill the remaining
# slots with entries never yet driver-checked — growing the union of
# driver-verified names across rounds while every family keeps a green
# representative in-window. Exactly 50 names, all with oracles.
PRIORITY: tuple[str, ...] = (
    # --- driver-green family anchors (one per family, r01/r02) ---
    "daily_events",            # reference (also the entry() flagship)
    "tpch_q1_pricing_summary", # relational
    "asof_purchase_view",      # joins
    "batch_sessionization",    # cdc / sessionization
    "data_quality_report",     # quality
    "event_type_stats_salted", # scale patterns
    "props_json_stats",        # tpch_extra / semi-structured
    "ship_delay_priority",     # tpch_extra2 decorrelation
    "value_zscore_outliers",   # stats
    "pagerank_categories",     # graph
    "dedup_exact",             # dedup
    "similarity_topk",         # similarity / ANN
    "text_quality",            # text analysis
    "media_wav_decode",        # multimodal
    "session_stats_pandas",    # pandas / arrow UDF surface
    "doc_chunking",            # LLM pipeline prep
    "wire_format_source",      # wire-format source
    "sql_udf_revenue_bands",   # SQL UDF
    "streaming_daily_events",  # streaming (batch-equivalent oracle)
    # --- reshaped to scalar outputs this round; must prove green ---
    "pq_encode",
    "random_projection",
    "feature_hash_vectors",
    # --- never-driver-checked rotation (28) ---
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "similarity_lsh_topk",
    "text_lang_id",
    "tfidf_top_terms",
    "bpe_merges",
    "pii_redaction",
    "triangle_coview",
    "media_bmp_decode",
    "weekday_eventtype_chisq",
    "ewma_daily_value",
    "time_weighted_value",
    "holt_daily_forecast",
    "snapshot_diff",
    "event_path_mining",
    "bloom_membership",
    "events_cube_rollup",
    "grouping_id_report",
    "ab_test_cuped",
    "fuzzy_name_matches",
    "corpus_drift",
    "train_eval_split",
    "part_skyline",
    "zorder_curve",
    "key_skew_report",
    "props_schema_discovery",
    "lineitem_quartiles_distributed",
    "streaming_hourly_window",
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

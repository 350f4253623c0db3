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


# The correctness driver oracle-checks the FIRST 50 registry entries only,
# so the merged dict leads with one oracle-backed representative slate that
# spans every operator family (reference, relational, joins, cdc, quality,
# scale, tpch decorrelation, dedup, similarity, text, multimodal, pandas,
# pipeline, wire, sql-udf, streaming); redundant variants of already-covered
# shapes follow in module order. Exactly 50 names, all with oracles.
PRIORITY: tuple[str, ...] = (
    # reference e-commerce core (Q1-Q6 + the retyped/reworked entries)
    "daily_events",
    "top_categories",
    "hour_event_value",
    "weekday_conversion_volume",
    "conversion_rate",
    "purchase_funnel",
    "value_zscore_outliers",
    "record_id",
    # relational / TPC-H core
    "tpch_q1_pricing_summary",
    "shipping_priority",
    "nation_revenue",
    "order_status_pivot",
    "first_shipment_per_order",
    # deterministic mergeable sketch (KMV — value-checkable, unlike HLL);
    # running-window shapes stay covered by conversion_rate + the local
    # replica's monthly_revenue_running
    "kmv_user_cardinality",
    # join vocabulary (as-of, attribution, full outer)
    "asof_purchase_view",
    "purchase_attribution",
    "nation_party_balance_full_outer",
    # cdc / sessionization (+ SCD Type-2 dimension build)
    "changelog_compaction",
    "batch_sessionization",
    "scd2_user_state",
    # data quality
    "data_quality_report",
    # scale patterns (salting, cardinality; the bitmap rollup rotates to
    # the local replica in favor of the prefix-filter dedup below)
    "event_type_stats_salted",
    "user_cardinality",
    # tpch decorrelation / semi-structured
    "props_json_stats",
    "national_market_share",
    "ship_delay_priority",
    # lossless prefix-filtered exact Jaccard
    "dedup_prefix_filter",
    # ranked retrieval + iterative ML (the sole driver-checked
    # representatives of their shapes; product_type_profit and
    # min_cost_part_suppliers rotated out — their decorrelation
    # patterns stay covered by the three tpch entries above + local
    # parity)
    "bm25_search",
    "kmeans_assign",
    # graph analytics (iterative integer-exact PageRank)
    "pagerank_categories",
    # dedup family (simhash/incremental variants rotate to the local
    # replica: exact+minhash+clusters keep the family driver-checked)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    # similarity / ANN family (+ product-quantization storage layout)
    "similarity_topk",
    "similarity_index_topk",
    "similarity_ivf_topk",
    "pq_encode",
    # text analysis family (lang-id rotates out; quality/counts stay)
    "text_quality",
    "token_counts",
    # multimodal plumbing
    # real WAV parse in executors, analytical oracle — stronger driver
    # evidence than the metadata-only manifest it replaced
    "media_wav_decode",
    # pandas / arrow UDF surface
    "session_stats_pandas",
    "event_type_stats_arrow",
    # LLM pipeline prep
    "doc_chunking",
    "sequence_packing",
    "contamination_check",
    # wire-format source
    "wire_format_source",
    "wire_stream_counts",
    # SQL UDF
    "sql_udf_revenue_bands",
    # streaming (batch-equivalent oracles)
    "streaming_daily_events",
    "streaming_sessionization",
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

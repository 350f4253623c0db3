"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints the full per-query detail JSON first, then a COMPACT summary
JSON line LAST. The driver captures only the final ~2000 bytes of
output, so the last line must be short enough to survive tail capture
whole (round 2's 73-query single-line record overflowed it and the
driver recorded "parsed": null).

Run: python bench.py  [--repeat N] [--with-oracle]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from google_cloud_ecommerce_spark.queries import all_queries  # noqa: E402
from google_cloud_ecommerce_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Steady-state fidelity (VERDICT r9 #4): a single timed run of a >0.5 s
# query carries +-2x one-shot outliers (the round-4/8 gotcha), so
# queries whose first timed run exceeds the threshold get extra timed
# runs (min-of-N) even when --repeat is 1. Bounded cost: only the slow
# tail pays, ~+60 s over the full headline at sf0.1.
SLOW_THRESHOLD_S = float(os.environ.get("SPARK_GRAFT_SLOW_THRESHOLD_S", "0.5"))
SLOW_EXTRA_RUNS = int(os.environ.get("SPARK_GRAFT_SLOW_EXTRA_RUNS", "2"))

# Headline set: the reference suite (events), the relational classics,
# and one representative per extension family. Streaming jobs are
# excluded (their cost is replay-dir I/O, not query execution).
HEADLINE = [
    "daily_events",
    "top_categories",
    "hour_event_value",
    "weekday_conversion_volume",
    "conversion_rate",
    "purchase_funnel",
    "event_enrichment",
    "tpch_q1_pricing_summary",
    "shipping_priority",
    "nation_revenue",
    "top_customers_per_segment",
    "monthly_revenue_running",
    "first_shipment_per_order",
    "asof_purchase_view",
    "purchase_attribution",
    "event_type_stats_salted",
    "user_cardinality",
    "dedup_exact",
    "doc_fingerprint",
    "token_counts",
    "text_quality",
    "similarity_topk",
    "similarity_lsh_topk",
    "similarity_index_topk",
    "similarity_ivf_topk",
    "similarity_ivf_index_topk",
    "embedding_label_stats",
    "doc_chunking",
    "sequence_packing",
    "contamination_check",
    "sql_udf_revenue_bands",
    "dedup_segments",
    "pii_redaction",
    "bm25_search",
    "corpus_mixture_sample",
    "zorder_curve",
    "kmeans_assign",
    "embedding_quantize",
    "corpus_drift",
    "bpe_merges",
    "daily_value_gapfill",
    "lineitem_quartiles_distributed",
    "tfidf_top_terms",
    "media_wav_decode",  # the one deliberate Python/Arrow path in the bench
    "rfm_segments",
    "corpus_to_training_batches",
    "pagerank_categories",
    "pq_encode",
    "similarity_pq_topk",
    "similarity_ivfpq_topk",
    "random_projection",
    "scd2_user_state",
    "gopher_gates",
    "kmv_user_cardinality",
    "fuzzy_name_matches",
    "part_skyline",
    "ewma_daily_value",
    "time_weighted_value",
    "props_schema_discovery",
    "dedup_prefix_filter",
    "bloom_membership",
    "cusum_changepoints",
    "key_skew_report",
    "event_path_mining",
    "text_index_search",
    "ab_test_report",
    "snapshot_diff",
    "series_similarity",
    "events_cube_rollup",
    "session_promo_overlap",
    "corpus_quality_dashboard",
    "ab_test_cuped",
    "grouping_id_report",
    "event_rate_limit",
    "holt_daily_forecast",
    "semdedup_clusters",
    "bpe_tokenize",
    "value_quantile_sketch",
    # round-4 additions (model-based quality filter, span-corruption
    # accounting, mixture reweighting — all map-side / 1-row-broadcast)
    "quality_classifier_score",
    "span_corruption_masks",
    "importance_sampling_weights",
    # round-4 additions: tokenizer-efficiency report, per-source
    # adaptive quality gating, embedding outlier gate
    "tokenizer_fertility",
    "adaptive_quality_gates",
    "embedding_outliers",
    # round-4 late wave: skip-gram pair extraction, Zipf fit over the
    # frequency histogram, perceptual-hash image dedup (real decode).
    # cross_source_dedup_matrix deliberately stays OUT: like
    # corpus_curation_pipeline it rides the minhash verify stage over
    # the synthetic corpus's dense near-dup mass (~30 s at sf0.1 after
    # the round-4 hashed-set verify rewrite) and would drown the other
    # queries; it stays oracle-verified in the
    # registry at every SF.
    "skipgram_pairs",
    "token_zipf_fit",
    "media_phash_clusters",
    "jsonl_roundtrip",
    "matryoshka_recall",
    "heldout_perplexity",
    "cdc_chunk_dedup",
    # round-5 additions: retrieval fusion + context packing, the
    # IVF/PQ index-health reports, per-dim embedding moments,
    # length-sorted batching, and the ORC container roundtrip.
    "hybrid_search_rrf",
    "rag_context_pack",
    "ivf_balance_report",
    "pq_distortion_report",
    "embedding_dim_stats",
    "length_bucket_batches",
    "orc_roundtrip",
    # round-5 continued: late-interaction retrieval, contrastive
    # negatives, the vocab-size selection curve, and the two lakehouse
    # layout reads (bucketed co-located join, day-pruned scan).
    "maxsim_retrieval",
    "hard_negative_mining",
    "vocab_prune_coverage",
    "bucketed_join_revenue",
    "day_pruned_scan",
    "mmr_diversified_topk",
    "zonemap_skip_report",
    "temperature_mixture_weights",
    "similarity_sq_topk",
    "retrieval_ndcg_report",
    "sql_table_function_profile",
    "media_autocorrelation",
    "expanded_keyword_search",
    "repeated_span_dedup",
    "char_entropy_gate",
    "winnowing_fingerprints",
    # round-7 additions: Kneser-Ney scoring (pinned bigram-type table,
    # broadcast model), the deterministic MLM corruption spec (one
    # scan, one explode, one aggregate), and n-gram novelty scoring
    # (single-pass partitioned-window first-occurrence).
    "kn_bigram_score",
    "mlm_masking_spec",
    "ngram_novelty_score",
    # round-8 additions: brand-level association rules (one basket
    # shuffle + attribute-bounded rule join off a pinned aggregate)
    # and margin-ordered multi-probe LSH (Lv et al. 2007 probing).
    "market_basket_rules",
    "similarity_multiprobe_topk",
    # round-8 continued: A-ES weighted corpus sampling (per-partition
    # top-k, no shuffle) and the mergeSchema evolution read.
    "weighted_sample_topk",
    "schema_evolution_read",
    # round-9: the recomposed curation funnel (exact dedup -> entropy ->
    # gopher -> classifier -> span-excision token budget; ~4.9 s at
    # sf0.1, dominated by the span-excision fingerprint join — linear,
    # unlike v1's minhash verify). merge_upsert_rewrite stays OUT like
    # partition_delete_rewrite: its cost is the COW working-copy write
    # (fixture-only; a real lakehouse mutates the table in place) —
    # registry-oracle-verified at every SF instead.
    "curation_funnel_v2",
    # round-9: 1-bit sign-quantization ANN (xor+popcount Hamming
    # candidates, exact-cosine rerank) — the 64x-compressed scan path,
    # and the per-source A-ES draw (WindowGroupLimit map-side prune).
    "similarity_binary_topk",
    "stratified_sample_topk",
    # round-10: the hot-key fact join AQE's skew split targets (merge-
    # hinted SMJ against the pinned fact-derived profile).
    # vacuum_report stays OUT like merge_upsert_rewrite: its cost is
    # the 3-version COW fixture write, not query execution — registry-
    # oracle-verified at every SF instead.
    "skew_join_demo",
    # round-11: the four manifest-machinery entries (lakehouse_pruned_read,
    # lakehouse_schema_evolution, lakehouse_change_feed,
    # streaming_version_feed) stay OUT like vacuum_report — their cost
    # is the multi-version COW fixture write, not query execution; the
    # listing/pruning behavior they exist for is plan/behavior-tested
    # and registry-oracle-verified at every SF.
    # jdbc_roundtrip moved OUT of the headline (VERDICT r5 "what's
    # wrong" #5): its 2.3-2.4 s is constant embedded-Derby DDL+insert
    # setup, not query execution — a connector-parity entry, graded by
    # the registry oracle at every SF like the minhash composites.
    # dedup_recall_report also stays out: its ground truth is an
    # all-pairs exact Jaccard over the doc_id%5 sample — quadratic BY
    # DESIGN (~5 s at sf0.1), the price of measuring banding recall.
    # corpus_curation_pipeline is deliberately NOT in the headline: its
    # cost is the minhash verify stage on the synthetic corpus's dense
    # near-duplicate mass (measured separately at sf0.1: Spark ~40 s after the round-4
    # hashed-set verify rewrite vs DuckDB 224 s for the old string-set
    # oracle on the dominant subtree) and one ~40-second query would
    # drown the other 90. It stays oracle-verified in the registry at every SF.
]


def _materialize(df) -> None:
    """Fully execute the query, producing every output column.

    ``count()`` lets Catalyst prune computed columns (a projection query
    would be timed as a row count), so run the plan into the no-op sink:
    all columns are evaluated and delivered to the writer, nothing is
    stored, and no driver-side collect distorts the timing.
    """
    df.write.format("noop").mode("overwrite").save()


_ORACLE_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _time_oracles(
    names: list[str], repeat: int, match_runs: dict[str, int] | None = None
) -> tuple[dict[str, float], dict[str, int]]:
    """Time the DuckDB oracle of each named query on the same parquet —
    the measured anchor for the 'within 2x of baseline' bar. Same
    discipline as the Spark side: one warm run, then adaptive min-of-N,
    AND at least as many timed runs as the Spark side took for that
    query (match_runs) — a per-engine-only trigger would smooth
    outliers away for whichever engine is slower on a query while
    recording the faster engine's single shot as-is, biasing the ratio
    on exactly the Spark-slow queries."""
    import duckdb

    from google_cloud_ecommerce_spark.queries import all_oracles

    conn = duckdb.connect()
    conn.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in _ORACLE_TABLES:
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    oracles = all_oracles()
    timings: dict[str, float] = {}
    n_runs: dict[str, int] = {}
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            continue

        def run_once() -> float:
            t0 = time.perf_counter()
            conn.execute(sql).fetchall()
            return time.perf_counter() - t0

        conn.execute(sql).fetchall()  # warm
        floor = (match_runs or {}).get(name, repeat)
        best, n = _min_of_adaptive(run_once, repeat, min_total=floor)
        timings[name] = round(best, 4)
        n_runs[name] = n
    return timings, n_runs


def _min_of_adaptive(run_once, repeat: int, min_total: int = 0) -> tuple[float, int]:
    """min-of-N with the slow-query top-up: N = repeat, plus
    SLOW_EXTRA_RUNS more when the best run still exceeds
    SLOW_THRESHOLD_S, and never fewer than min_total (used to keep the
    two engines' sample counts symmetric per query)."""
    runs = [run_once() for _ in range(repeat)]
    if min(runs) > SLOW_THRESHOLD_S:
        runs += [run_once() for _ in range(SLOW_EXTRA_RUNS)]
    while len(runs) < min_total:
        runs.append(run_once())
    return min(runs), len(runs)


def main() -> None:
    repeat = 1
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
    with_oracle = "--with-oracle" in sys.argv

    # Epoch self-description (VERDICT r8 #4): record machine load before
    # and after so a driver-epoch outlier (e.g. r8's phantom 3.1x on
    # quality_classifier_score) is attributable to concurrent load from
    # the artifact alone — the round-8 "run solo" gotcha made diagnosable.
    load_before = [round(x, 2) for x in os.getloadavg()]

    spark = get_spark(app_name="bench")
    queries = all_queries()

    # Warm up the JVM / codegen / parquet footers outside the timings.
    _materialize(queries["daily_events"](spark, SF_DIR))

    timings: dict[str, float] = {}
    n_runs: dict[str, int] = {}
    for name in HEADLINE:
        fn = queries[name]
        # One untimed warm run per query: codegen compilation and
        # broadcast-build warmup are one-time costs, not throughput —
        # the timed runs measure the steady-state execution this engine
        # would sustain on a cluster.
        _materialize(fn(spark, SF_DIR))

        def run_once() -> float:
            t0 = time.perf_counter()
            _materialize(fn(spark, SF_DIR))
            return time.perf_counter() - t0

        best, n = _min_of_adaptive(run_once, repeat)
        timings[name] = round(best, 4)
        n_runs[name] = n

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None
    detail = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "methodology": (
            "per-query warm run, then min of N timed runs "
            "(steady-state); full materialization via noop sink "
            "(all output columns evaluated, no column pruning)"
        ),
        "loadavg_before": load_before,
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
        "warm_runs_per_query": 1,
        # scalar base count (the r01-r09 schema of this field) PLUS the
        # per-query dict the r10 top-up introduced — cross-round tooling
        # aggregates the scalar; the dict carries the adaptive detail
        # (ADVICE r10: don't change a recorded field's type mid-series)
        "timed_runs_base": repeat,
        "timed_runs_per_query": n_runs,
        "slow_threshold_s": SLOW_THRESHOLD_S,
        "slow_extra_runs": SLOW_EXTRA_RUNS,
    }
    summary = {
        "metric": detail["metric"],
        "value": detail["value"],
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "methodology": "warm run then min-of-N; noop sink; detail JSON above",
    }
    if with_oracle:
        oracle, oracle_runs = _time_oracles(HEADLINE, repeat, match_runs=n_runs)
        # symmetry in the other direction: where the DuckDB side took
        # more samples (its own slow-query top-up), give Spark the same
        # number so neither engine's min is taken over more tries
        for name, n_oracle in oracle_runs.items():
            fn = queries[name]
            while n_runs[name] < n_oracle:
                t0 = time.perf_counter()
                _materialize(fn(spark, SF_DIR))
                timings[name] = round(
                    min(timings[name], time.perf_counter() - t0), 4
                )
                n_runs[name] += 1
        detail["queries"] = timings
        detail["value"] = round(sum(timings.values()), 4)
        summary["value"] = detail["value"]
        detail["oracle_timed_runs"] = oracle_runs
        shared = [n for n in oracle if n in timings]
        spark_total = sum(timings[n] for n in shared)
        duck_total = sum(oracle[n] for n in shared)
        detail["oracle"] = oracle
        detail["loadavg_after"] = [round(x, 2) for x in os.getloadavg()]
        detail["oracle_total"] = round(duck_total, 4)
        detail["spark_vs_oracle_ratio"] = round(spark_total / duck_total, 4)
        summary["oracle_total"] = detail["oracle_total"]
        summary["spark_vs_oracle_ratio"] = detail["spark_vs_oracle_ratio"]
    # full detail first (for humans / artifacts), compact summary LAST
    # (for the driver's bounded tail capture)
    print(json.dumps(detail))
    print(json.dumps(summary))
    # Additionally persist the detail dict next to the repo (VERDICT r12
    # #2): the driver's ~2000-byte tail capture only preserves the
    # summary line, so per-query timings were invisible to its
    # round-over-round regression check. Additions-only: stdout above is
    # byte-identical to the r12 contract.
    try:
        with open(os.path.join(REPO, "bench_detail.json"), "w") as f:
            json.dump(detail, f, indent=1)
            f.write("\n")
    except OSError:
        pass  # a read-only checkout must not fail the bench


if __name__ == "__main__":
    main()

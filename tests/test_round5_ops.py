"""Semantics checks for the round-5 operators: hybrid RRF fusion,
RAG context packing, and the IVF/PQ index-health reports."""

from __future__ import annotations

import pytest


def test_hybrid_rrf_score_formula_and_bounds(spark, sf_smoke):
    """Every emitted row's rrf_score must equal the recomputed
    1/(60+lex) + 1/(60+sem) with missing ranks contributing 0, per-query
    output is capped at RRF_TOP_K, and ranks are a dense 1..n."""
    from google_cloud_ecommerce_spark.operators.retrieval import (
        RRF_K,
        RRF_POOL,
        RRF_TOP_K,
        hybrid_search_rrf,
    )

    rows = hybrid_search_rrf(spark, sf_smoke).collect()
    assert rows
    per_q: dict[int, list[int]] = {}
    for r in rows:
        expect = (1.0 / (RRF_K + r.lex_rank) if r.lex_rank else 0.0) + (
            1.0 / (RRF_K + r.sem_rank) if r.sem_rank else 0.0
        )
        assert r.rrf_score == pytest.approx(expect, abs=5e-7)
        assert 0 <= r.lex_rank <= RRF_POOL and 0 <= r.sem_rank <= RRF_POOL
        assert r.lex_rank or r.sem_rank  # a fused doc came from some list
        per_q.setdefault(r.q_id, []).append(r.rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= RRF_TOP_K


def test_hybrid_rrf_fuses_single_list_docs(spark, sf_smoke):
    """The full-outer fusion must keep docs present in only one
    ranking (rank 0 on the other side) — that's the point of RRF."""
    from google_cloud_ecommerce_spark.operators.retrieval import hybrid_search_rrf

    rows = hybrid_search_rrf(spark, sf_smoke).collect()
    assert any(r.lex_rank == 0 or r.sem_rank == 0 for r in rows)


def test_rag_context_pack_is_a_budget_prefix(spark, sf_smoke):
    """Per query: cumulative tokens never exceed the budget, the cum
    column is the true running sum in rank order, and the kept ranks
    are a gapless prefix 1..m (take-while, not skip-over)."""
    from google_cloud_ecommerce_spark.operators.retrieval import (
        RAG_TOKEN_BUDGET,
        rag_context_pack,
    )

    rows = rag_context_pack(spark, sf_smoke).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        cum = 0
        for r in rs:
            assert r.n_tokens > 0
            cum += r.n_tokens
            assert r.cum_tokens == cum
            assert r.cum_tokens <= RAG_TOKEN_BUDGET


def test_ivf_balance_report_accounts_for_every_vector(spark, sf_smoke):
    from google_cloud_ecommerce_spark.catalog import load_table
    from google_cloud_ecommerce_spark.operators.similarity import ivf_balance_report

    rows = ivf_balance_report(spark, sf_smoke).collect()
    n_corpus = load_table(spark, sf_smoke, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == n_corpus
    assert sum(r.frac for r in rows) == pytest.approx(1.0, abs=1e-3)
    n_cells = len(rows)
    for r in rows:
        assert r.load_factor == pytest.approx(
            r.n_vectors * n_cells / n_corpus, abs=5e-5
        )


def test_pq_distortion_report_partitions_each_subspace(spark, sf_smoke):
    """Each of the M subspaces assigns every vector to exactly one
    code, so per-m counts sum to the corpus size; distortion is
    non-negative and the codebook is at most M x K rows."""
    from google_cloud_ecommerce_spark.catalog import load_table
    from google_cloud_ecommerce_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        pq_distortion_report,
    )

    rows = pq_distortion_report(spark, sf_smoke).collect()
    n_corpus = load_table(spark, sf_smoke, "embeddings").count()
    assert len(rows) <= PQ_M * PQ_K
    per_m: dict[int, int] = {}
    for r in rows:
        assert 0 <= r.m < PQ_M and 0 <= r.c_id < PQ_K
        assert r.avg_sq_dist >= 0.0
        per_m[r.m] = per_m.get(r.m, 0) + r.n_vectors
    assert per_m == {m: n_corpus for m in range(PQ_M)}

"""Crafted-corpus tests for the late round-4 curation operators:
per-source independence of adaptive quality gating, the tokenizer
fertility identity, and planted-outlier detection for the embedding
outlier gate."""

from __future__ import annotations

import math
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq

from google_cloud_ecommerce_spark.operators._common import EMBED_DIM
from google_cloud_ecommerce_spark.operators.similarity import (
    OUTLIER_SIGMA,
    embedding_outliers,
)
from google_cloud_ecommerce_spark.operators.text import (
    BPE_ISH_PATTERN,
    GATE_PCT,
    adaptive_quality_gates,
    tokenizer_fertility,
)


def _write_docs(path, rows):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": [r[3] for r in rows],
            "n_chars": pa.array([len(r[1]) for r in rows], type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(path / "documents.parquet"))


_GOOD = "the quick brown fox jumps over a lazy dog and runs to the river"
_BAD = "spam spam spam spam"


def test_adaptive_gates_sources_are_independent(spark, tmp_path):
    """Adding junk documents to source B must not move source A's
    scores, ranks, or kept set — the whole point of per-source gates."""
    a_docs = [(i, f"{_GOOD} number {i}", "en", "site_a") for i in range(8)]
    base = tmp_path / "base"
    both = tmp_path / "both"
    for d in (base, both):
        os.makedirs(d)
    _write_docs(base, a_docs)
    _write_docs(
        both,
        a_docs + [(100 + i, _BAD, "en", "site_b") for i in range(6)],
    )

    rows_base = {
        r.doc_id: r for r in adaptive_quality_gates(spark, str(base)).collect()
    }
    rows_both = {
        r.doc_id: r
        for r in adaptive_quality_gates(spark, str(both)).collect()
        if r.source == "site_a"
    }
    assert set(rows_base) == set(rows_both)
    for doc_id, r in rows_base.items():
        assert rows_both[doc_id].quality_score == r.quality_score
        assert rows_both[doc_id].pct_rank == r.pct_rank
        assert rows_both[doc_id].is_kept == r.is_kept


def test_adaptive_gates_kept_count_matches_percentile(spark, tmp_path):
    """kept = rows whose percent_rank >= GATE_PCT; with a tie-free
    order over n rows that is exactly n - ceil(GATE_PCT * (n - 1))."""
    n = 10
    docs = [(i, f"{_GOOD} {'extra ' * i}tail", "en", "one_source") for i in range(n)]
    _write_docs(tmp_path, docs)
    out = adaptive_quality_gates(spark, str(tmp_path)).collect()
    kept = sum(r.is_kept for r in out)
    assert kept == n - math.ceil(GATE_PCT * (n - 1))
    # the dropped rows are exactly the lowest-scoring ones
    dropped_scores = sorted(r.quality_score for r in out if not r.is_kept)
    kept_scores = sorted(r.quality_score for r in out if r.is_kept)
    assert not dropped_scores or dropped_scores[-1] <= kept_scores[0]


def test_tokenizer_fertility_identity(spark, sf_smoke):
    """Per-lang ratios equal a direct python recompute from the raw
    corpus (whitespace tokens, BPE-ish regex tokens, char sums)."""
    docs = spark.read.parquet(os.path.join(sf_smoke, "documents.parquet")).collect()
    expect: dict[str, list[int]] = {}
    for r in docs:
        ws = len([t for t in r.text.split(" ") if t])
        bpe = len(re.findall(BPE_ISH_PATTERN, r.text.lower()))
        e = expect.setdefault(r.lang, [0, 0, 0, 0])
        e[0] += 1
        e[1] += ws
        e[2] += bpe
        e[3] += r.n_chars
    out = {r.lang: r for r in tokenizer_fertility(spark, sf_smoke).collect()}
    assert set(out) == set(expect)
    for lang, (n, ws, bpe, chars) in expect.items():
        r = out[lang]
        assert (r.n_docs, r.ws_tokens, r.bpe_tokens, r.total_chars) == (
            n,
            ws,
            bpe,
            chars,
        )
        assert r.fertility == bpe / ws
        assert r.chars_per_token == chars / bpe


def test_embedding_outliers_flags_planted_outlier(spark, tmp_path):
    """A cluster of near-identical vectors plus one far vector: only
    the far vector exceeds mean + OUTLIER_SIGMA * std."""
    n = 20
    vecs = [[0.1 * ((i + d) % 3) for d in range(EMBED_DIM)] for i in range(n)]
    vecs.append([25.0] * EMBED_DIM)  # the planted outlier
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(n + 1)), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": pa.array([0] * (n + 1), type=pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = {r.vec_id: r for r in embedding_outliers(spark, str(tmp_path)).collect()}
    assert len(out) == n + 1
    assert out[n].is_outlier == 1
    assert all(out[i].is_outlier == 0 for i in range(n))
    assert OUTLIER_SIGMA == 2.0  # the documented gate

"""Unit/property tests for the training-data pipeline operators
(operators/pipeline.py): chunk reconstruction, packing spec
conservation, and contamination on crafted duplicates."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from google_cloud_ecommerce_spark.operators.pipeline import (
    BENCH_MOD,
    CHUNK_SIZE,
    CHUNK_STRIDE,
    PACK_CAPACITY,
    contamination_check,
    doc_chunking,
    sequence_packing,
)


def test_chunking_reconstructs_text(spark, sf_smoke):
    docs = {r.doc_id: r.text for r in spark.read.parquet(
        os.path.join(sf_smoke, "documents.parquet")).collect()}
    chunks = doc_chunking(spark, sf_smoke).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        # stride-prefixes of all but the last chunk + the last chunk = text
        rebuilt = "".join(r.chunk_text[:CHUNK_STRIDE] for r in rows[:-1])
        rebuilt += rows[-1].chunk_text
        assert rebuilt == docs[doc_id]
        for r in rows:
            assert 0 < r.chunk_len <= CHUNK_SIZE
            assert r.chunk_start == r.chunk_idx * CHUNK_STRIDE + 1
            if r.chunk_idx < len(rows) - 1 and len(docs[doc_id]) >= CHUNK_SIZE:
                # interior chunks overlap the next by CHUNK_SIZE - CHUNK_STRIDE
                nxt = rows[r.chunk_idx + 1]
                assert r.chunk_text[CHUNK_STRIDE:] == nxt.chunk_text[
                    : CHUNK_SIZE - CHUNK_STRIDE
                ]


def test_packing_matches_sequential_spec(spark, sf_smoke):
    docs = (
        spark.read.parquet(os.path.join(sf_smoke, "documents.parquet"))
        .select(
            "lang",
            "doc_id",
            F.expr("size(filter(split(text, ' '), t -> t != ''))").alias("tok"),
        )
        .collect()
    )
    # sequential reference: walk docs per lang in doc_id order
    expected: dict[tuple, list] = {}
    by_lang: dict[str, list] = {}
    for r in sorted(docs, key=lambda r: (r.lang, r.doc_id)):
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rows in by_lang.items():
        prefix = 0
        for r in rows:
            bin_id = prefix // PACK_CAPACITY
            expected.setdefault((lang, bin_id), []).append(r)
            prefix += r.tok
    got = {
        (r.lang, r.bin_id): r for r in sequence_packing(spark, sf_smoke).collect()
    }
    assert set(got) == set(expected)
    for key, rows in expected.items():
        g = got[key]
        assert g.n_docs == len(rows)
        assert g.sum_tokens == sum(r.tok for r in rows)
        assert g.first_doc == rows[0].doc_id
        assert g.last_doc == rows[-1].doc_id


def test_contamination_excludes_bench_and_bounds(spark, sf_smoke):
    out = contamination_check(spark, sf_smoke).collect()
    assert out, "synthetic corpus repeats vocabulary; expect some overlap"
    for r in out:
        assert r.doc_id % BENCH_MOD != 0  # bench slice never self-reports
        assert 0 < r.n_overlap <= r.n_shingles
        assert 0.0 < r.contamination <= 1.0
        assert r.n_bench_docs >= 1


def test_contamination_exact_copy_scores_one(spark, tmp_path):
    # doc 10 (bench: 10 % BENCH_MOD == 0) copied verbatim as doc 11
    # (train) -> every shingle overlaps; doc 13 shares no vocabulary.
    text = "alpha beta gamma delta epsilon zeta eta theta"
    other = "unrelated words entirely different from benchmark content"
    tbl = pa.table(
        {
            "doc_id": pa.array([10, 11, 13], type=pa.int64()),
            "text": [text, text, other],
            "lang": ["en"] * 3,
            "source": ["crafted"] * 3,
            "n_chars": pa.array([len(text), len(text), len(other)], type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = {r.doc_id: r for r in contamination_check(spark, str(tmp_path)).collect()}
    assert set(rows) == {11}
    assert rows[11].contamination == pytest.approx(1.0)
    assert rows[11].n_bench_docs == 1


def test_corpus_prep_monotone_and_consistent(spark, sf_smoke):
    from pyspark.sql import functions as F

    from google_cloud_ecommerce_spark.operators.pipeline import (
        CHUNK_STRIDE,
        pretraining_corpus_prep,
    )

    out = {r.lang: r for r in pretraining_corpus_prep(spark, sf_smoke).collect()}
    raw = {
        r.lang: r.n
        for r in spark.read.parquet(f"{sf_smoke}/documents.parquet")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert out, "gates should keep a non-empty corpus"
    for lang, r in out.items():
        assert r.n_docs <= raw[lang]  # gates/dedup only ever drop
        assert r.n_chunks >= r.n_docs  # every kept doc has >= 1 chunk
        # chunks are (n_chars-1) DIV stride + 1 per doc, so the per-lang
        # total is bounded by docs * (max_chars/stride + 1)
        max_chars = (
            spark.read.parquet(f"{sf_smoke}/documents.parquet")
            .agg(F.max("n_chars"))
            .collect()[0][0]
        )
        assert r.n_chunks <= r.n_docs * (max_chars // CHUNK_STRIDE + 1)


def test_mixture_sample_rates_and_determinism(spark, sf_smoke):
    from google_cloud_ecommerce_spark.operators.pipeline import (
        MIXTURE_DENOM,
        MIXTURE_WEIGHTS,
        corpus_mixture_sample,
    )

    kept = {r.lang: r.n for r in corpus_mixture_sample(spark, sf_smoke)
            .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    total = {r.lang: r.n for r in spark.read.parquet(f"{sf_smoke}/documents.parquet")
             .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n_total in total.items():
        w = MIXTURE_WEIGHTS.get(lang, MIXTURE_DENOM) / MIXTURE_DENOM
        if w == 1.0:
            assert kept.get(lang, 0) == n_total  # weight 1.0 keeps everything
        else:
            assert kept.get(lang, 0) <= n_total
    # deterministic: a second run samples the identical id set
    a = {r.doc_id for r in corpus_mixture_sample(spark, sf_smoke).collect()}
    b = {r.doc_id for r in corpus_mixture_sample(spark, sf_smoke).collect()}
    assert a == b


def test_bm25_ranks_matching_docs(spark, sf_smoke):
    from google_cloud_ecommerce_spark.operators.text import BM25_TERMS, BM25_TOP_K, bm25_search

    rows = bm25_search(spark, sf_smoke).collect()
    assert 0 < len(rows) <= BM25_TOP_K
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:  # every hit matches at least one query term
        assert sum(r[f"tf_{t}"] for t in BM25_TERMS) > 0
        assert r.score > 0


def test_feature_hash_vector_conservation(spark, sf_smoke):
    """Bucket counts conserve the token count; vector width is fixed."""
    from pyspark.sql import functions as F

    from google_cloud_ecommerce_spark.catalog import load_table
    from google_cloud_ecommerce_spark.operators._common import tokens_expr
    from google_cloud_ecommerce_spark.operators.pipeline import (
        FEATURE_DIM,
        feature_hash_vectors,
    )

    rows = feature_hash_vectors(spark, sf_smoke).collect()
    feats = {r.doc_id: [int(c) for c in r.features.split(",")] for r in rows}
    assert rows and all(len(fv) == FEATURE_DIM for fv in feats.values())
    tok_counts = {
        r.doc_id: r.n
        for r in load_table(spark, sf_smoke, "documents")
        .select("doc_id", F.expr(f"size({tokens_expr('lower(text)')})").alias("n"))
        .collect()
    }
    for r in rows:
        fv = feats[r.doc_id]
        assert r.total_count == tok_counts[r.doc_id] == sum(fv)
        assert abs(r.l2_norm ** 2 - sum(c * c for c in fv)) < 1e-6


def test_target_encoding_shrinks_toward_prior(spark, sf_smoke):
    """Every encoding sits strictly between the raw category mean and
    the prior (or equals both when they coincide); heavier categories
    sit closer to their raw mean."""
    from google_cloud_ecommerce_spark.operators.pipeline import target_encoding

    rows = target_encoding(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        raw_mean = r.sum_value / r.n
        lo, hi = sorted((raw_mean, r.prior))
        assert lo - 1e-9 <= r.encoded <= hi + 1e-9


def test_negative_samples_never_seen_and_deterministic(spark, sf_smoke):
    """No sampled (user, bucket) was ever purchased; exactly <=K per
    user; a second run reproduces the identical sample."""
    from collections import Counter

    from pyspark.sql import functions as F

    from google_cloud_ecommerce_spark.catalog import load_table
    from google_cloud_ecommerce_spark.operators.pipeline import (
        NEGATIVE_K,
        negative_samples,
    )

    out = negative_samples(spark, sf_smoke).collect()
    assert out
    seen = {
        (r.user_id, r.bucket)
        for r in load_table(spark, sf_smoke, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            (F.get_json_object("props", "$.k").cast("long") % 10).alias("bucket"),
        )
        .distinct()
        .collect()
    }
    per_user = Counter(r.user_id for r in out)
    assert all((r.user_id, r.negative_bucket) not in seen for r in out)
    assert all(c <= NEGATIVE_K for c in per_user.values())
    again = negative_samples(spark, sf_smoke).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_curation_funnel_monotone_and_consistent(spark, sf_smoke):
    """Stage counts can only shrink, sum to the corpus-level stage
    totals, and the final share is the exact ratio."""
    from pyspark.sql import functions as F

    from google_cloud_ecommerce_spark.catalog import load_table
    from google_cloud_ecommerce_spark.operators.dedup import dedup_exact
    from google_cloud_ecommerce_spark.operators.pipeline import (
        corpus_curation_pipeline,
    )

    rows = corpus_curation_pipeline(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r.n_raw >= r.n_exact_unique >= r.n_quality >= r.n_final >= 0
        assert r.final_share == r.n_final / r.n_raw
    n_docs = load_table(spark, sf_smoke, "documents").count()
    assert sum(r.n_raw for r in rows) == n_docs
    assert sum(r.n_exact_unique for r in rows) == dedup_exact(
        spark, sf_smoke
    ).count()


# ---------------------------------------------------------------------------
# round-4 wave: epoch shuffle, cross-doc n-gram novelty, ANN recall
# report, k-anonymity suppression
# ---------------------------------------------------------------------------


def test_epoch_shuffle_covers_corpus_and_reshuffles(spark, sf_smoke):
    from google_cloud_ecommerce_spark.operators.pipeline import (
        N_EPOCHS,
        N_SHARDS,
        epoch_shuffle_shards,
    )
    from google_cloud_ecommerce_spark.catalog import load_table

    rows = epoch_shuffle_shards(spark, sf_smoke).collect()
    n_docs_total = load_table(spark, sf_smoke, "documents").count()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, {})[r.shard] = r
    assert set(by_epoch) == set(range(N_EPOCHS))
    for epoch, shards in by_epoch.items():
        # every epoch partitions the whole corpus
        assert sum(r.n_docs for r in shards.values()) == n_docs_total
        assert set(shards) <= set(range(N_SHARDS))
        for r in shards.values():
            assert 0 <= r.first_pos <= r.last_pos
    # different epochs produce different shard assignments (the point
    # of re-shuffling): per-shard doc counts must not all coincide
    counts = [
        tuple(sorted((s, r.n_docs) for s, r in shards.items()))
        for _, shards in sorted(by_epoch.items())
    ]
    assert len(set(counts)) > 1


def test_ngram_novelty_detects_planted_duplicate_passage(spark, tmp_path):
    import pandas as pd

    from google_cloud_ecommerce_spark.operators.text import ngram_novelty

    passage = "alpha beta gamma delta epsilon zeta"
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                passage + " one unique tail here",
                passage + " totally different ending words",
                "no shared five gram run at all",
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [10, 10, 10],
        }
    )
    d = str(tmp_path)
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    out = {r.doc_id: r for r in ngram_novelty(spark, d).collect()}
    # docs 0 and 1 share the 6-token passage => two shared 5-grams each
    assert out[0].n_dup_grams == 2 and out[1].n_dup_grams == 2
    assert out[2].n_dup_grams == 0 and out[2].dup_frac == 0.0
    assert 0 < out[0].dup_frac < 1


def test_ann_recall_report_bounds_and_consistency(spark, sf_smoke):
    from google_cloud_ecommerce_spark.operators.similarity import (
        TOP_K,
        ann_recall_report,
        similarity_lsh_topk,
        similarity_topk,
    )

    rows = ann_recall_report(spark, sf_smoke).collect()
    assert rows, "report must cover the query vectors"
    exact = similarity_topk(spark, sf_smoke)
    approx = similarity_lsh_topk(spark, sf_smoke)
    inter = exact.select("q_id", "neighbor_id").intersect(
        approx.select("q_id", "neighbor_id")
    )
    hits = {r.q_id: r.n for r in inter.groupBy("q_id").count().withColumnRenamed("count", "n").collect()}
    for r in rows:
        assert r.n_exact <= TOP_K
        assert 0 <= r.n_hit <= r.n_exact
        assert abs(r.recall_at_k - r.n_hit / r.n_exact) < 1e-4
        assert r.n_hit == hits.get(r.q_id, 0)


def test_kanon_suppression_thresholds(spark, sf_smoke):
    from pyspark.sql import functions as F

    from google_cloud_ecommerce_spark.catalog import load_table
    from google_cloud_ecommerce_spark.queries.quality import (
        KANON_K,
        kanon_suppression,
    )

    rows = {r.event_type: r for r in kanon_suppression(spark, sf_smoke).collect()}
    ev = load_table(spark, sf_smoke, "events")
    cells = (
        ev.groupBy("event_type", F.hour("ts").alias("h"))
        .agg(F.count_distinct("user_id").alias("u"), F.count("*").alias("n"))
        .collect()
    )
    for et, r in rows.items():
        mine = [c for c in cells if c.event_type == et]
        assert r.n_cells == len(mine)
        supp = [c for c in mine if c.u < KANON_K]
        assert r.n_suppressed_cells == len(supp)
        assert r.n_suppressed_events == sum(c.n for c in supp)


def test_weighted_sample_matches_brute_force_aes(spark, sf_smoke):
    """Recompute the Efraimidis–Spirakis keys in pure Python (same
    salted-md5 uniform, same rounded ln) and check the operator returns
    exactly the global top-k."""
    import hashlib
    import math

    from google_cloud_ecommerce_spark.catalog import load_table
    from google_cloud_ecommerce_spark.operators.pipeline import (
        _TWO_60_PLUS_1,
        WEIGHTED_SAMPLE_K,
        WEIGHTED_SAMPLE_SALT,
        weighted_sample_topk,
    )

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "n_chars").collect()
    keys = []
    for r in docs:
        if r.n_chars <= 0:
            continue
        h = int(hashlib.md5(f"{WEIGHTED_SAMPLE_SALT}{r.doc_id}".encode()).hexdigest()[:15], 16)
        u = (h + 1) / _TWO_60_PLUS_1
        keys.append((round(math.log(u), 9) / r.n_chars, r.doc_id, r.n_chars))
    expect = sorted(keys, key=lambda t: (-t[0], t[1]))[:WEIGHTED_SAMPLE_K]
    got = weighted_sample_topk(spark, sf_smoke).collect()
    assert len(got) == len(expect)
    assert {(r.doc_id, r.weight) for r in got} == {(d, w) for _, d, w in expect}
    # heavier docs must be overrepresented relative to their share:
    # compare mean weight of the sample vs the corpus mean
    corpus_mean = sum(w for _, _, w in keys) / len(keys)
    sample_mean = sum(r.weight for r in got) / len(got)
    assert sample_mean > corpus_mean


def test_schema_evolution_merge_null_fills(spark, sf_smoke):
    """The merged read must null-fill each batch's missing column:
    non-null counts equal exactly one batch's row count each, total
    rows equal both batches."""
    from google_cloud_ecommerce_spark.catalog import load_table
    from google_cloud_ecommerce_spark.operators.pipeline import schema_evolution_read

    n_orders = load_table(spark, sf_smoke, "orders").count()
    r = schema_evolution_read(spark, sf_smoke).collect()[0]
    assert r.n_rows == 2 * n_orders
    assert r.n_price == n_orders and r.n_priority == n_orders
    assert r.n_keys == load_table(spark, sf_smoke, "orders").select("o_orderkey").distinct().count()


def test_schema_evolution_fixture_writes_one_file_per_batch(spark, sf_smoke):
    """r12 output sizing (guide §6): the ~MB fixture batches must land
    as ONE parquet file each, not one shard per scan task — 19 tiny
    files per batch cost 19 task launches + commit renames per write
    and a 38-footer merge read."""
    import os

    from google_cloud_ecommerce_spark.operators.pipeline import (
        _EVO_DIRS,
        schema_evolution_read,
    )

    schema_evolution_read(spark, sf_smoke).collect()
    out = _EVO_DIRS[sf_smoke]
    for sub in ("batch1", "batch2"):
        files = [f for f in os.listdir(f"{out}/{sub}") if f.endswith(".parquet")]
        assert len(files) == 1, (sub, files)

"""Round-7 operator semantics: Kneser-Ney bigram scoring, the
deterministic MLM masking spec, and n-gram novelty scoring."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F


def _write_docs(tmp_path, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["src0"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        ),
        tmp_path / "documents.parquet",
    )
    return str(tmp_path)


def _py_kn_mean(texts, doc):
    """Reference KN implementation sharing the operator's exact float
    recipe (same operation order; round-half-even on the 9th decimal
    only differs on exact ties, which these irrational logs never hit)."""
    from collections import Counter

    pairs = []
    for t in texts:
        toks = [x for x in t.lower().split(" ") if x]
        pairs.append(list(zip(toks, toks[1:])))
    c2 = Counter(p for doc_pairs in pairs for p in doc_pairs)
    c1 = Counter()
    n1f = Counter()
    n1b = Counter()
    for (a, b), c in c2.items():
        c1[a] += c
        n1f[a] += 1
        n1b[b] += 1
    t_types = len(c2)
    d = 0.75

    def neg_lnp(a, b):
        p = (c2[(a, b)] - d) / c1[a] + (d * n1f[a] / c1[a]) * (n1b[b] / t_types)
        return round(-math.log(p), 9)

    scores = [neg_lnp(a, b) for a, b in pairs[doc]]
    return sum(scores) / len(scores)


def test_kn_bigram_score_matches_reference_formula(spark, tmp_path):
    from google_cloud_ecommerce_spark.operators.text import kn_bigram_score

    texts = [
        "the cat sat on the mat",
        "the cat ran on the hill",
        "a dog sat on a mat",
        "the dog ran to the mat",
    ]
    sf = _write_docs(tmp_path, texts)
    rows = {r.doc_id: r for r in kn_bigram_score(spark, sf).collect()}
    assert set(rows) == {0, 1, 2, 3}
    for doc_id, row in rows.items():
        expected = _py_kn_mean(texts, doc_id)
        assert abs(row.mean_kn_neg_logprob - expected) < 1e-9, (doc_id, expected)
        assert row.n_bigrams == 5


def test_kn_rewards_novel_continuations_over_mle(spark, tmp_path):
    """The KN property: a word seen in MANY contexts (high continuation
    count) keeps more probability than one glued to a single frequent
    history, even at equal bigram frequency. 'glue glue' appears as
    often as 'x0..x3 common', but 'common' has 4 distinct histories vs
    'glue' -> the doc made of diverse-history bigrams scores LOWER
    (more probable) on the continuation term."""
    from google_cloud_ecommerce_spark.operators.text import kn_bigram_score

    texts = [
        "x0 common x1 common x2 common x3 common",
        "glue glue glue glue glue glue glue glue",
    ]
    sf = _write_docs(tmp_path, texts)
    rows = {r.doc_id: r for r in kn_bigram_score(spark, sf).collect()}
    # same-frequency bigrams, but doc 0's continuation counts are higher
    diverse = _py_kn_mean(texts, 0)
    assert abs(rows[0].mean_kn_neg_logprob - diverse) < 1e-9
    assert rows[0].n_bigrams == 7 and rows[1].n_bigrams == 7


def test_mlm_masking_spec_partitions_and_determinism(spark, sf_smoke):
    from google_cloud_ecommerce_spark.operators.pipeline import mlm_masking_spec

    df = mlm_masking_spec(spark, sf_smoke)
    agg = df.agg(
        F.sum("n_tokens").alias("toks"),
        F.sum("n_selected").alias("sel"),
        F.sum("n_mask_token").alias("m"),
        F.sum("n_random").alias("r"),
        F.sum("n_keep").alias("k"),
    ).first()
    # selected positions split exactly into the three actions
    assert agg.sel == agg.m + agg.r + agg.k
    # corpus-level rates near the spec: ~15% selection, 80/10/10 split
    assert 0.10 < agg.sel / agg.toks < 0.20
    assert 0.70 < agg.m / agg.sel < 0.90
    assert 0.05 < agg.r / agg.sel < 0.15
    assert 0.05 < agg.k / agg.sel < 0.15
    # per-row identity + rate
    bad = df.filter(
        (F.col("n_selected") != F.col("n_mask_token") + F.col("n_random") + F.col("n_keep"))
        | (F.col("mask_rate") != F.col("n_selected") / F.col("n_tokens"))
    ).count()
    assert bad == 0
    # the spec is a pure function of the corpus: rerun is identical
    again = mlm_masking_spec(spark, sf_smoke)
    assert df.exceptAll(again).count() == 0 and again.exceptAll(df).count() == 0


def test_mlm_masking_spec_single_pass_plan(spark, sf_smoke):
    from google_cloud_ecommerce_spark.operators.pipeline import mlm_masking_spec

    plan = (
        mlm_masking_spec(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan and "Window" not in plan


def test_ngram_novelty_exact_overlap_accounting(spark, tmp_path):
    """doc 0 is all-novel (first in id order); doc 1 repeats doc 0
    verbatim -> novelty 0; doc 2 shares exactly one 4-gram window with
    doc 0; doc 3 is disjoint -> novelty 1."""
    from google_cloud_ecommerce_spark.operators.text import ngram_novelty_score

    base = "w1 w2 w3 w4 w5 w6 w7 w8"
    texts = [
        base,                       # 5 distinct 4-grams, all first here
        base,                       # exact copy: everything seen before
        "z1 z2 w1 w2 w3 w4 z3 z4",  # exactly one shared 4-gram (w1..w4)
        "q1 q2 q3 q4 q5 q6 q7 q8",  # disjoint
    ]
    sf = _write_docs(tmp_path, texts)
    rows = {r.doc_id: r for r in ngram_novelty_score(spark, sf).collect()}
    assert rows[0].n_seen_before == 0 and rows[0].novelty == 1.0
    assert rows[1].n_seen_before == rows[1].n_grams and rows[1].novelty == 0.0
    assert rows[2].n_grams == 5 and rows[2].n_seen_before == 1
    assert rows[2].novelty == 4 / 5
    assert rows[3].n_seen_before == 0 and rows[3].novelty == 1.0


def test_ngram_novelty_single_pass_plan(spark, sf_smoke):
    """The winnowing lesson, pinned from birth: first-occurrence via a
    PARTITIONed window, one documents FileScan, two shuffles."""
    import re

    from google_cloud_ecommerce_spark.operators.text import ngram_novelty_score

    plan = (
        ngram_novelty_score(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") == 1
    assert sum(1 for l in plan.splitlines() if "+- Exchange" in l) <= 2
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("fp" in s for s in specs)


# --- property-based checks (hypothesis): the round-7 operators must ---
# --- agree with brute-force references on ARBITRARY tiny corpora    ---

from hypothesis import given, settings, strategies as st

_word = st.sampled_from(["a", "b", "c", "dd", "ee"])
_corpus = st.lists(
    st.lists(_word, min_size=2, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


@settings(max_examples=8, deadline=None)
@given(texts=_corpus)
def test_kn_matches_reference_on_arbitrary_corpora(spark, tmp_path_factory, texts):
    from google_cloud_ecommerce_spark.operators.text import kn_bigram_score

    sf = _write_docs(tmp_path_factory.mktemp("kn_prop"), texts)
    rows = {r.doc_id: r for r in kn_bigram_score(spark, sf).collect()}
    for doc_id, row in rows.items():
        expected = _py_kn_mean(texts, doc_id)
        assert abs(row.mean_kn_neg_logprob - expected) < 1e-9


def _py_novelty(texts, k=4):
    seen_first = {}
    grams_per_doc = []
    for d, t in enumerate(texts):
        toks = [x for x in t.lower().split(" ") if x]
        grams = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
        grams_per_doc.append(grams)
        for g in grams:
            seen_first.setdefault(g, d)
    out = {}
    for d, grams in enumerate(grams_per_doc):
        if not grams:
            continue
        seen = sum(1 for g in grams if seen_first[g] < d)
        out[d] = (len(grams), seen)
    return out


@settings(max_examples=8, deadline=None)
@given(texts=_corpus)
def test_novelty_matches_reference_on_arbitrary_corpora(
    spark, tmp_path_factory, texts
):
    from google_cloud_ecommerce_spark.operators.text import ngram_novelty_score

    sf = _write_docs(tmp_path_factory.mktemp("nov_prop"), texts)
    rows = {r.doc_id: (r.n_grams, r.n_seen_before) for r in
            ngram_novelty_score(spark, sf).collect()}
    assert rows == _py_novelty(texts)

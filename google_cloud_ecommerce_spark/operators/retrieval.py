"""Retrieval-layer compositions: hybrid lexical+semantic search and
RAG context packing over the `documents` / `embeddings` tables
(doc_id and vec_id share one id space in the fixtures, as they would
in a real corpus where each chunk carries its embedding).

These are the two operators that sit ON TOP of the search primitives
the repo already ships (BM25 scoring in operators/text.py, exact/ANN
cosine top-k in operators/similarity.py): production retrieval is
almost never one ranker, it's a fusion of a sparse and a dense ranking
plus a budget-bounded assembly of the winners into a prompt context.

Scale posture (both operators):
  - the query set is tiny and BROADCAST; the corpus scans once per
    ranker and never self-joins;
  - per-query rankings use the ranking window on the small query-id
    partition count, bounded by the candidate pool;
  - fusion joins two top-POOL lists (queries x POOL rows each) — a
    trivially small shuffle regardless of corpus size.

Cross-engine determinism: ranks are integers derived from either a
ROUND(.,4)-quantized BM25 score (the bm25_search policy) or the raw
cosine whose fold is bit-identical in both engines (the
similarity_topk policy); the RRF score is a fixed-order sum of exact
1/(K+rank) integer-ratio terms, so the doubles agree bit-for-bit.

Reference parity note: the reference has no retrieval layer (its
search surface is five BigQuery chart queries, README.md:56-76); this
module is part of the mandated LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from google_cloud_ecommerce_spark.operators._common import (
    dot_expr,
    dot_sql,
    tokens_expr,
    tokens_sql,
)
from google_cloud_ecommerce_spark.operators.similarity import (
    N_QUERY_VECS,
    TOP_K,
    _emb,
    _with_norm,
)
from google_cloud_ecommerce_spark.operators.text import (
    BM25_TERMS,
    _bm25_score_tpl,
    _docs,
)

# ---------------------------------------------------------------------------
# hybrid_search_rrf — reciprocal-rank fusion (Cormack et al., SIGIR
# 2009) of a sparse (single-term BM25) and a dense (exact cosine)
# ranking. Query i pairs BM25_TERMS[i] with query vector vec_id = i —
# the standard "text query + its embedding" shape. Each ranker
# produces its top-RRF_POOL list; fusion scores every doc appearing in
# either list with sum(1 / (RRF_K + rank)), missing ranks contributing
# 0, and keeps the top RRF_TOP_K per query.
# ---------------------------------------------------------------------------

RRF_K = 60
RRF_POOL = 20
RRF_TOP_K = 10
N_RRF_QUERIES = len(BM25_TERMS)  # 4: query i = (BM25_TERMS[i], vec_id i)


def hybrid_search_rrf(
    spark: SparkSession,
    sf_dir: str,
    *,
    pool: int = RRF_POOL,
    top_k: int = RRF_TOP_K,
) -> DataFrame:
    """Defaults are the fixture literals the registry oracle is inlined
    against; at scale `pool` bounds both per-ranker windows and the
    fusion join stays queries x pool rows."""
    # --- sparse side: per-term BM25 over one corpus scan ------------------
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.expr(tokens_expr("lower(text)")).alias("toks")
    )
    stats = toks.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.expr("size(toks)")).alias("sum_dl"),
        *[
            F.sum(F.array_contains(F.col("toks"), t).cast("long")).alias(f"df_{i}")
            for i, t in enumerate(BM25_TERMS)
        ],
    )
    j = toks.crossJoin(F.broadcast(stats))
    for i, t in enumerate(BM25_TERMS):
        tf = f"size(filter(toks, x -> x = '{t}'))"
        j = j.withColumn(f"tf_{i}", F.expr(tf).cast("long")).withColumn(
            f"s_{i}",
            F.expr(_bm25_score_tpl(tf, f"df_{i}", "CAST(size(toks) AS DOUBLE)")),
        )
    stacked = " , ".join(
        f"struct({i} AS q_id, round(s_{i}, 4) AS score, tf_{i} AS tf)"
        for i in range(N_RRF_QUERIES)
    )
    lex_w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("doc_id"))
    lex = (
        j.select("doc_id", F.explode(F.expr(f"array({stacked})")).alias("e"))
        .select("doc_id", F.col("e.q_id").cast("int").alias("q_id"), "e.score", "e.tf")
        .filter(F.col("tf") > 0)
        .withColumn("lex_rank", F.row_number().over(lex_w).cast("long"))
        .filter(F.col("lex_rank") <= pool)
        .select("q_id", "doc_id", "lex_rank")
    )
    # --- dense side: exact cosine, query vectors broadcast ----------------
    corpus = _with_norm(_emb(spark, sf_dir))
    queries = corpus.filter(F.col("vec_id") < N_RRF_QUERIES).select(
        F.col("vec_id").cast("int").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    sem_w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    sem = (
        corpus.join(F.broadcast(queries))
        .withColumn(
            "cos", F.expr(dot_expr("qv", "v")) / (F.col("qnorm") * F.col("norm"))
        )
        .withColumn("sem_rank", F.row_number().over(sem_w).cast("long"))
        .filter(F.col("sem_rank") <= pool)
        .select("q_id", F.col("vec_id").alias("doc_id"), "sem_rank")
    )
    # --- fusion ------------------------------------------------------------
    rrf = (
        "COALESCE(1.0 / (CAST({k} AS BIGINT) + lex_rank), CAST(0.0 AS DOUBLE)) + "
        "COALESCE(1.0 / (CAST({k} AS BIGINT) + sem_rank), CAST(0.0 AS DOUBLE))"
    ).format(k=RRF_K)
    fused = (
        lex.join(sem, ["q_id", "doc_id"], "full_outer")
        .withColumn("rrf_score", F.expr(rrf))
    )
    out_w = Window.partitionBy("q_id").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(out_w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select(
            "q_id",
            "doc_id",
            "rank",
            F.coalesce("lex_rank", F.lit(0).cast("long")).alias("lex_rank"),
            F.coalesce("sem_rank", F.lit(0).cast("long")).alias("sem_rank"),
            F.round("rrf_score", 6).alias("rrf_score"),
        )
    )


def _hybrid_search_rrf_sql() -> str:
    lex_branches = "\n            UNION ALL\n".join(
        f"""            SELECT doc_id, {i} AS q_id,
                   ROUND({_bm25_score_tpl(
                       f"len(list_filter(toks, x -> x = '{t}'))",
                       f"df_{i}",
                       "CAST(len(toks) AS DOUBLE)",
                   )}, 4) AS score
            FROM toks CROSS JOIN stats
            WHERE len(list_filter(toks, x -> x = '{t}')) > 0"""
        for i, t in enumerate(BM25_TERMS)
    )
    dfs = ",\n                   ".join(
        f"CAST(SUM(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df_{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    rrf = (
        f"COALESCE(1.0 / (CAST({RRF_K} AS BIGINT) + lex_rank), CAST(0.0 AS DOUBLE)) + "
        f"COALESCE(1.0 / (CAST({RRF_K} AS BIGINT) + sem_rank), CAST(0.0 AS DOUBLE))"
    )
    return f"""
        WITH toks AS (
            SELECT doc_id, {tokens_sql('lower(text)')} AS toks FROM documents
        ), stats AS (
            SELECT count(*) AS n_docs, CAST(SUM(len(toks)) AS BIGINT) AS sum_dl,
                   {dfs}
            FROM toks
        ), lex_scored AS (
{lex_branches}
        ), lex AS (
            SELECT CAST(q_id AS INT) AS q_id, doc_id,
                   CAST(row_number() OVER (
                       PARTITION BY q_id ORDER BY score DESC, doc_id
                   ) AS BIGINT) AS lex_rank
            FROM lex_scored
            QUALIFY lex_rank <= {RRF_POOL}
        ), e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), n AS (
            SELECT vec_id, v, sqrt({dot_sql('v', 'v')}) AS norm FROM e
        ), sem_scored AS (
            SELECT CAST(q.vec_id AS INT) AS q_id, c.vec_id AS doc_id,
                   {dot_sql('q.v', 'c.v')} / (q.norm * c.norm) AS cos
            FROM n q CROSS JOIN n c
            WHERE q.vec_id < {N_RRF_QUERIES}
        ), sem AS (
            SELECT q_id, doc_id,
                   CAST(row_number() OVER (
                       PARTITION BY q_id ORDER BY cos DESC, doc_id
                   ) AS BIGINT) AS sem_rank
            FROM sem_scored
            QUALIFY sem_rank <= {RRF_POOL}
        ), fused AS (
            SELECT q_id, doc_id, lex_rank, sem_rank, {rrf} AS rrf_score
            FROM lex FULL OUTER JOIN sem USING (q_id, doc_id)
        )
        SELECT q_id, doc_id,
               CAST(row_number() OVER (
                   PARTITION BY q_id ORDER BY rrf_score DESC, doc_id
               ) AS BIGINT) AS rank,
               COALESCE(lex_rank, CAST(0 AS BIGINT)) AS lex_rank,
               COALESCE(sem_rank, CAST(0 AS BIGINT)) AS sem_rank,
               ROUND(rrf_score, 6) AS rrf_score
        FROM fused
        QUALIFY rank <= {RRF_TOP_K}
    """


# ---------------------------------------------------------------------------
# rag_context_pack — budget-bounded context assembly: for each query
# vector, take the exact cosine top-k documents in relevance order and
# pack them into the prompt until the next document would blow the
# token budget (monotone prefix take-while: cumulative tokens <=
# budget). The output is the per-query packed context manifest a
# generation job would read.
# ---------------------------------------------------------------------------

RAG_TOP_K = TOP_K
RAG_TOKEN_BUDGET = 300


def rag_context_pack(
    spark: SparkSession,
    sf_dir: str,
    *,
    top_k: int = RAG_TOP_K,
    token_budget: int = RAG_TOKEN_BUDGET,
) -> DataFrame:
    corpus = _with_norm(_emb(spark, sf_dir))
    queries = corpus.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    rank_w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    top = (
        corpus.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id"))
        .withColumn(
            "cos", F.expr(dot_expr("qv", "v")) / (F.col("qnorm") * F.col("norm"))
        )
        .withColumn("rank", F.row_number().over(rank_w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select("q_id", F.col("vec_id").alias("doc_id"), "rank", "cos")
    )
    doc_tokens = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr(f"CAST(size({tokens_expr('text')}) AS BIGINT)").alias("n_tokens"),
    )
    cum_w = (
        Window.partitionBy("q_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        top.join(doc_tokens, "doc_id")
        .withColumn("cum_tokens", F.sum("n_tokens").over(cum_w))
        .filter(F.col("cum_tokens") <= token_budget)
        .select(
            "q_id",
            "rank",
            "doc_id",
            "n_tokens",
            "cum_tokens",
            F.round("cos", 4).alias("cosine"),
        )
    )


def _rag_context_pack_sql() -> str:
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), n AS (
            SELECT vec_id, v, sqrt({dot_sql('v', 'v')}) AS norm FROM e
        ), scored AS (
            SELECT q.vec_id AS q_id, c.vec_id AS doc_id,
                   {dot_sql('q.v', 'c.v')} / (q.norm * c.norm) AS cos
            FROM n q JOIN n c ON c.vec_id != q.vec_id
            WHERE q.vec_id < {N_QUERY_VECS}
        ), top AS (
            SELECT q_id, doc_id, cos,
                   CAST(row_number() OVER (
                       PARTITION BY q_id ORDER BY cos DESC, doc_id
                   ) AS BIGINT) AS rank
            FROM scored
            QUALIFY rank <= {RAG_TOP_K}
        ), dt AS (
            SELECT doc_id, CAST(len({tokens_sql('text')}) AS BIGINT) AS n_tokens
            FROM documents
        ), packed AS (
            SELECT t.q_id, t.rank, t.doc_id, dt.n_tokens, t.cos,
                   CAST(SUM(dt.n_tokens) OVER (
                       PARTITION BY t.q_id ORDER BY t.rank
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_tokens
            FROM top t JOIN dt ON dt.doc_id = t.doc_id
        )
        SELECT q_id, rank, doc_id, n_tokens, cum_tokens, ROUND(cos, 4) AS cosine
        FROM packed WHERE cum_tokens <= {RAG_TOKEN_BUDGET}
    """


QUERIES = {
    "hybrid_search_rrf": hybrid_search_rrf,
    "rag_context_pack": rag_context_pack,
}

ORACLE = {
    "hybrid_search_rrf": _hybrid_search_rrf_sql(),
    "rag_context_pack": _rag_context_pack_sql(),
}

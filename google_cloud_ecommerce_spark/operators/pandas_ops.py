"""Grouped-map Pandas operators (SURVEY.md §2.10): the vectorized,
Arrow-batched replacement for the reference's row-at-a-time Python
(``rdd.map(get_product_information)`` at write_session_batch.py:42-43
and the Beam DoFn at write_session_stream.py:51-59).

``session_stats_pandas`` intentionally computes something a pure-SQL
plan could also express, so it can carry a full DuckDB oracle — the
point is proving the applyInPandas bridge (shuffle by key -> Arrow
batch per group -> pandas -> Arrow back) is semantics-preserving.
Integer microsecond arithmetic keeps pandas/numpy int64 math identical
to the engines'.

Scale: groupBy(user_id).applyInPandas shuffles once on a
high-cardinality key and holds ONE group in memory at a time per task —
the right shape for per-entity custom logic at 100 TB (a group here is
a user's events, thousands at most, never a partition).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from google_cloud_ecommerce_spark.catalog import load_table

SESSION_GAP_US = 30 * 60 * 1_000_000

SESSION_STATS_SCHEMA = (
    "user_id bigint, n_events bigint, n_sessions bigint, "
    "max_session_events bigint, max_session_span_seconds double"
)


def _session_stats_one_user(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["us", "event_id"]).reset_index(drop=True)
    gaps = pdf["us"].diff()
    is_new = (gaps.isna()) | (gaps > SESSION_GAP_US)
    session_id = is_new.cumsum()
    by_session = pdf.groupby(session_id)["us"]
    sizes = by_session.size()
    spans = by_session.max() - by_session.min()
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_events": [int(len(pdf))],
            "n_sessions": [int(sizes.shape[0])],
            "max_session_events": [int(sizes.max())],
            # unrounded int/1e6: bit-identical IEEE division everywhere;
            # Python round() is half-even and disagrees with SQL ROUND
            "max_session_span_seconds": [int(spans.max()) / 1_000_000],
        }
    )


def session_stats_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id"
    )
    return ev.groupBy("user_id").applyInPandas(_session_stats_one_user, SESSION_STATS_SCHEMA)


SESSION_STATS_SQL = f"""
    WITH ev AS (
        SELECT user_id, epoch_us(ts) AS us, event_id FROM events
    ), flagged AS (
        SELECT *, CASE WHEN COALESCE(us - lag(us) OVER w, {SESSION_GAP_US + 1})
                            > {SESSION_GAP_US} THEN 1 ELSE 0 END AS is_new
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), sess AS (
        SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ), per_session AS (
        SELECT user_id, session_id, count(*) AS n_ev, max(us) - min(us) AS span_us
        FROM sess GROUP BY 1, 2
    )
    -- outer CAST: DuckDB SUM(BIGINT) widens to HUGEINT (driver-hash mismatch)
    SELECT user_id, CAST(SUM(n_ev) AS BIGINT) AS n_events, count(*) AS n_sessions,
           MAX(n_ev) AS max_session_events,
           MAX(span_us) / 1000000.0 AS max_session_span_seconds
    FROM per_session GROUP BY 1
"""


# ---------------------------------------------------------------------------
# doc_tokens_udtf — the PySpark UDTF surface (SURVEY.md §2.10 notes the
# reference has none; the API is exposed for table-generating custom
# logic). The UDTF expands each document into (doc_id, pos, token)
# rows via a LATERAL join — per-row Python, so strictly the SLOW path:
# the production equivalent is the built-in posexplode (JVM generator,
# used everywhere else in this repo). It exists to prove the
# row->table bridge is semantics-preserving — the DuckDB oracle is the
# same expansion via unnest WITH ORDINALITY semantics.
# ---------------------------------------------------------------------------


def doc_tokens_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos bigint, token string")
    class Tokenize:
        def eval(self, text: str):
            pos = 0
            for tok in (text or "").split(" "):
                if tok:
                    pos += 1
                    yield pos, tok

    spark.udtf.register("graft_tokenize", Tokenize)
    docs = load_table(spark, sf_dir, "documents")
    docs.select("doc_id", "text").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.token "
        "FROM _udtf_docs d, LATERAL graft_tokenize(d.text) t"
    )


DOC_TOKENS_UDTF_SQL = """
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
        FROM documents
    )
    SELECT doc_id, i AS pos, toks[i] AS token
    FROM toks, unnest(range(1, len(toks) + 1)) t(i)
"""


QUERIES = {
    "session_stats_pandas": session_stats_pandas,
    "doc_tokens_udtf": doc_tokens_udtf,
}

ORACLE = {
    "session_stats_pandas": SESSION_STATS_SQL,
    "doc_tokens_udtf": DOC_TOKENS_UDTF_SQL,
}


# ---------------------------------------------------------------------------
# Scalar pandas_udf — the remaining Python-surface form (grouped-map =
# session_stats_pandas, mapInPandas = media_features, UDTF =
# doc_tokens_udtf). Arrow-vectorized text normalization: lowercase,
# trim, collapse internal whitespace. String ops are byte-exact across
# engines (unlike float reductions), so this one CAN carry a DuckDB
# oracle. At scale the batch size is bounded by
# spark.sql.execution.arrow.maxRecordsPerBatch — memory per task is
# O(batch), not O(partition). (returnType is a DataType object, not a
# DDL string: DDL parsing at decoration time needs an active session,
# which breaks plain module import.)
# ---------------------------------------------------------------------------


@pandas_udf(StringType())
def _normalize_text(s: pd.Series) -> pd.Series:
    return s.str.lower().str.strip().str.replace(r"\s+", " ", regex=True)


def text_normalize_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    normed = docs.select(
        "doc_id",
        "lang",
        F.length("text").alias("raw_len"),
        F.length(_normalize_text(F.col("text"))).alias("norm_len"),
    )
    return normed.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("raw_len").alias("total_raw_len"),
        F.sum("norm_len").alias("total_norm_len"),
        F.sum((F.col("raw_len") != F.col("norm_len")).cast("long")).alias("n_changed"),
    )


TEXT_NORMALIZE_PANDAS_SQL = """
    WITH n AS (
        SELECT doc_id, lang, length(text) AS raw_len,
               length(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS norm_len
        FROM documents
    )
    SELECT lang, count(*) AS n_docs,
           CAST(SUM(raw_len) AS BIGINT) AS total_raw_len,
           CAST(SUM(norm_len) AS BIGINT) AS total_norm_len,
           CAST(SUM(CASE WHEN raw_len <> norm_len THEN 1 ELSE 0 END) AS BIGINT)
               AS n_changed
    FROM n GROUP BY 1
"""


QUERIES["text_normalize_pandas"] = text_normalize_pandas
ORACLE["text_normalize_pandas"] = TEXT_NORMALIZE_PANDAS_SQL


# ---------------------------------------------------------------------------
# event_type_stats_arrow — the Arrow-NATIVE grouped-map bridge
# (applyInArrow): the group arrives as a pyarrow.Table and never
# materializes a pandas frame, which cuts the conversion layer out of
# the pandas path above — the right variant when the custom logic is
# expressible in Arrow compute kernels. Value math goes through integer
# cents (the true values are 2-decimal quantized), so the result is
# bit-equal to the oracle's DECIMAL pipeline.
# ---------------------------------------------------------------------------

TYPE_STATS_SCHEMA = (
    "event_type string, n_events bigint, n_users bigint, sum_value double"
)


def _type_stats_one_group(tbl):
    import pyarrow as pa
    import pyarrow.compute as pc

    cents = pc.cast(pc.round(pc.multiply(tbl["value"], 10000)), pa.int64())
    return pa.table(
        {
            "event_type": [tbl["event_type"][0].as_py()],
            "n_events": [tbl.num_rows],
            "n_users": [pc.count_distinct(tbl["user_id"]).as_py()],
            "sum_value": [pc.sum(cents).as_py() / 10000.0],
        }
    )


def event_type_stats_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id", "value")
    return ev.groupBy("event_type").applyInArrow(
        _type_stats_one_group, TYPE_STATS_SCHEMA
    )


EVENT_TYPE_STATS_ARROW_SQL = """
    SELECT event_type, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
"""

QUERIES["event_type_stats_arrow"] = event_type_stats_arrow
ORACLE["event_type_stats_arrow"] = EVENT_TYPE_STATS_ARROW_SQL


# ---------------------------------------------------------------------------
# ngram_udtf_polymorphic — the POLYMORPHIC UDTF corner of the Spark 4
# Python UDTF API: a static ``analyze()`` decides the output schema at
# PLAN time from the call's literal argument (n), so ONE registered
# function serves any n-gram width with typed per-position columns
# (w1..wn) plus the joined gram. doc_tokens_udtf above proves the
# fixed-schema row->table bridge; this proves the schema-from-arguments
# bridge (AnalyzeResult), which is what separates Spark 4 UDTFs from
# classic generators. Per-row Python — the slow path by design; the
# JVM form is the nested-lambda window used by skipgram_pairs.
# ---------------------------------------------------------------------------

NGRAM_UDTF_N = 3


def ngram_udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class NGrams:
        @staticmethod
        def analyze(n: AnalyzeArgument, text: AnalyzeArgument) -> AnalyzeResult:
            width = int(n.value)
            fields = [StructField("pos", LongType())]
            fields += [StructField(f"w{i + 1}", StringType()) for i in range(width)]
            fields.append(StructField("gram", StringType()))
            return AnalyzeResult(schema=StructType(fields))

        def eval(self, n: int, text: str):
            toks = [t for t in (text or "").split(" ") if t]
            for i in range(len(toks) - n + 1):
                window = toks[i : i + n]
                yield (i + 1, *window, " ".join(window))

    spark.udtf.register("graft_ngrams", NGrams)
    docs = load_table(spark, sf_dir, "documents")
    docs.select("doc_id", "text").createOrReplaceTempView("_udtf_docs_ng")
    grams = spark.sql(
        f"SELECT d.doc_id, t.pos, t.w1, t.w{NGRAM_UDTF_N}, t.gram "
        f"FROM _udtf_docs_ng d, LATERAL graft_ngrams({NGRAM_UDTF_N}, d.text) t"
    )
    return (
        grams.groupBy("gram", "w1", F.col(f"w{NGRAM_UDTF_N}").alias("w_last"))
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("gram"))
        .limit(20)
    )


NGRAM_UDTF_SQL = f"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
        FROM documents
    ), grams AS (
        SELECT array_to_string(list_slice(toks, i, i + {NGRAM_UDTF_N} - 1), ' ')
                   AS gram,
               toks[i] AS w1,
               toks[i + {NGRAM_UDTF_N} - 1] AS w_last
        FROM toks, unnest(range(1, len(toks) - {NGRAM_UDTF_N} + 2)) t(i)
        WHERE len(toks) >= {NGRAM_UDTF_N}
    )
    SELECT gram, w1, w_last, count(*) AS n_occurrences
    FROM grams GROUP BY 1, 2, 3
    ORDER BY n_occurrences DESC, gram LIMIT 20
"""


QUERIES["ngram_udtf_polymorphic"] = ngram_udtf_polymorphic
ORACLE["ngram_udtf_polymorphic"] = NGRAM_UDTF_SQL


# ---------------------------------------------------------------------------
# doc_bytes_profile — the Arrow-native MAP bridge (mapInArrow), the
# last of the Arrow UDF quadrants (mapInPandas / applyInPandas /
# applyInArrow / pandas_udf elsewhere in this repo): each partition
# streams through as pyarrow.RecordBatches and the transform runs
# entirely in Arrow COMPUTE KERNELS — no pandas frame, no per-row
# Python, zero copies beyond the kernel outputs. The profile itself is
# the cheap byte-level pre-tokenization pass a curator runs before
# paying for real tokenization: UTF-8 byte length, codepoint count,
# separator count, and the single-space word estimate.
# ---------------------------------------------------------------------------

DOC_BYTES_SCHEMA = (
    "doc_id bigint, n_codepoints bigint, n_bytes bigint, "
    "n_spaces bigint, est_words bigint"
)


def _bytes_profile_batches(batches):
    import pyarrow as pa
    import pyarrow.compute as pc

    for b in batches:
        text = b.column("text")
        n_space = pc.count_substring(text, " ")
        yield pa.record_batch(
            {
                "doc_id": b.column("doc_id"),
                "n_codepoints": pc.cast(pc.utf8_length(text), pa.int64()),
                "n_bytes": pc.cast(pc.binary_length(pc.cast(text, pa.binary())), pa.int64()),
                "n_spaces": pc.cast(n_space, pa.int64()),
                "est_words": pc.cast(pc.add(n_space, 1), pa.int64()),
            }
        )


def doc_bytes_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(_bytes_profile_batches, DOC_BYTES_SCHEMA)


DOC_BYTES_PROFILE_SQL = """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_codepoints,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)
               AS n_spaces,
           CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
               AS est_words
    FROM documents
"""

QUERIES["doc_bytes_profile"] = doc_bytes_profile
ORACLE["doc_bytes_profile"] = DOC_BYTES_PROFILE_SQL

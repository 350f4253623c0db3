"""Multimodal columns: media as opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched Pandas functions over
``mapInPandas``.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic stub (``_fake_decode``); everything
Spark-side — schema, binary payload handling, batch iteration, the UDF
signature and output shape — is real and tested. Swapping the stub for
a real decoder (PIL/torchaudio/ffmpeg) changes one function body and
nothing in the plan.

Scale posture: payloads stay in executors end-to-end (no collect);
``mapInPandas`` streams Arrow batches, so peak memory is one batch of
payloads per core, not one partition; metadata-only queries never
deserialize the payload column thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from google_cloud_ecommerce_spark.catalog import load_table

CHUNK_BYTES = 256

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "width int, height int, mean_intensity double"
)


def media_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed manifest over binary payloads (here: utf-8 text bytes as the
    stand-in payload). Everything is metadata arithmetic on the binary
    column — no decode, fully codegen'd, and oracle-checkable."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(F.col("text")).alias("checksum"),
        F.ceil(F.length(payload) / F.lit(CHUNK_BYTES)).cast("long").alias("n_chunks"),
    )


MEDIA_MANIFEST_SQL = f"""
    SELECT doc_id, 'text/plain' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS checksum,
           CAST(ceil(octet_length(encode(text)) / {CHUNK_BYTES}.0) AS BIGINT) AS n_chunks
    FROM documents
"""


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """STUB decoder — deterministic fake in place of a real media codec.

    Real implementation would be e.g. PIL.Image.open(io.BytesIO(payload));
    this derives (width, height, mean_intensity) from the byte content so
    the pipeline shape and determinism are testable without codecs.
    """
    n = len(payload)
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    mean_intensity = round(sum(payload[:256]) / max(min(n, 256), 1) / 255.0, 6)
    return width, height, mean_intensity


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> decoded feature rows via mapInPandas.

    The Arrow batch iterator is the real plumbing a media pipeline needs;
    only ``_fake_decode`` is a stand-in. No oracle (Python-side decode is
    not SQL-expressible) — driver records the rows-only check.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "text/plain",
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_intensity": [d[2] for d in decoded],
                }
            )

    return docs.mapInPandas(decode_batches, FEATURE_SCHEMA)


def media_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size chunking (frame-sample / tile analog): one row per
    CHUNK_BYTES slice, chunk boundaries computed JVM-side. Slicing is on
    the character payload (ASCII here, so chars == bytes); the binary
    path is exercised by media_features."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.expr(
                f"posexplode(transform(sequence(0, CAST(ceil(length(text)/{CHUNK_BYTES}.0) AS INT) - 1), "
                f"i -> substring(text, i * {CHUNK_BYTES} + 1, {CHUNK_BYTES})))"
            ).alias("chunk_index", "chunk"),
        )
        .select(
            "doc_id",
            F.col("chunk_index").cast("long").alias("chunk_index"),
            F.length(F.encode(F.col("chunk"), "UTF-8")).cast("long").alias("chunk_bytes"),
            F.md5("chunk").alias("chunk_checksum"),
        )
    )


MEDIA_CHUNKS_SQL = f"""
    WITH idx AS (
        SELECT doc_id, text,
               unnest(range(0, CAST(ceil(length(text) / {CHUNK_BYTES}.0) AS BIGINT)))
                   AS chunk_index
        FROM documents
    )
    SELECT doc_id, CAST(chunk_index AS BIGINT) AS chunk_index,
           CAST(octet_length(encode(substring(text, CAST(chunk_index * {CHUNK_BYTES} + 1 AS INT),
                                              {CHUNK_BYTES}))) AS BIGINT) AS chunk_bytes,
           md5(substring(text, CAST(chunk_index * {CHUNK_BYTES} + 1 AS INT),
                         {CHUNK_BYTES})) AS chunk_checksum
    FROM idx
"""


FRAME_BYTES = 64
FRAME_STRIDE = 4  # keep every 4th frame
THUMB_W, THUMB_H = 8, 8

FRAME_SAMPLE_SCHEMA = (
    "doc_id bigint, frame_index bigint, frame_bytes bigint, "
    "thumb_width int, thumb_height int, frame_intensity double"
)


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample + resize, the video-pipeline shape: payload ->
    fixed-size frames -> keep every FRAME_STRIDE-th -> per-frame decode +
    thumbnail resize (STUB: deterministic byte stats in place of a real
    codec; a real impl swaps the two marked lines for ffmpeg/PIL calls).

    One output row per SAMPLED frame — mapInPandas may emit more rows
    than its input, which is exactly what distinguishes it from a scalar
    pandas_udf. No oracle (Python decode); rows-only check + unit tests.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "doc_id", "frame_index", "frame_bytes",
                "thumb_width", "thumb_height", "frame_intensity",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                for i in range(0, max(len(raw), 1), FRAME_BYTES * FRAME_STRIDE):
                    frame = raw[i : i + FRAME_BYTES]  # STUB: real codec reads a frame here
                    intensity = round(sum(frame) / max(len(frame), 1) / 255.0, 6)  # STUB resize
                    out["doc_id"].append(doc_id)
                    out["frame_index"].append(i // FRAME_BYTES)
                    out["frame_bytes"].append(len(frame))
                    out["thumb_width"].append(THUMB_W)
                    out["thumb_height"].append(THUMB_H)
                    out["frame_intensity"].append(intensity)
            yield pd.DataFrame(out)

    return docs.mapInPandas(sample_batches, FRAME_SAMPLE_SCHEMA)


QUERIES = {
    "media_manifest": media_manifest,
    "media_features": media_features,
    "media_chunks": media_chunks,
    "media_frame_sample": media_frame_sample,
}

ORACLE = {
    "media_manifest": MEDIA_MANIFEST_SQL,
    "media_chunks": MEDIA_CHUNKS_SQL,
    # media_features / media_frame_sample: intentionally no oracle —
    # Python decode stubs (driver records the rows-only check).
}

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


# ---------------------------------------------------------------------------
# REAL decoders — WAV/PCM audio and BMP image parsing need no codec
# library (stdlib struct + numpy), so unlike the _fake_decode stub
# above these two paths decode actual standard file formats in
# executors. Each registry entry synthesizes a deterministic payload
# per document (a real RIFF/WAVE file, a real 24-bit BMP), runs the
# REAL parser on the bytes, and — because the synthesized signal is a
# closed-form function of (doc_id, i) — carries a FULL value oracle:
# DuckDB recomputes the expected sample statistics analytically from
# the same formula. Arrow batches stream through mapInPandas; payloads
# never leave executors. sqrt is IEEE-correctly-rounded in numpy and
# DuckDB alike, and every sum is integer, so the doubles match
# bit-for-bit.
# ---------------------------------------------------------------------------

import struct

import numpy as np

WAV_SAMPLE_RATE = 16_000
WAV_MAX_CHARS = 200  # n_samples = 4 * min(n_chars, 200)

WAV_FEATURE_SCHEMA = (
    "doc_id bigint, sample_rate int, n_channels int, bits int, "
    "n_samples bigint, rms double"
)


def encode_wav(samples: "np.ndarray", sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """Mono 16-bit PCM RIFF/WAVE encoder (stdlib only)."""
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[int, int, int, int, float]:
    """Parse a RIFF/WAVE file: walk chunks, read fmt + PCM data.

    Returns (sample_rate, n_channels, bits, n_samples, rms). A real
    chunk walker (not fixed offsets): tolerates extra chunks the way
    decoders must in the wild."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    _, n_channels, sample_rate, _, _, bits = fmt
    samples = np.frombuffer(data, dtype="<i2")
    ssq = int((samples.astype(np.int64) ** 2).sum())
    n = len(samples)
    rms = float(np.sqrt(float(ssq) / n)) if n else 0.0
    return sample_rate, n_channels, bits, n, rms


def _wav_samples(doc_id: int, n_chars: int) -> "np.ndarray":
    """The deterministic test signal — closed form, so SQL can verify."""
    n = 4 * min(int(n_chars), WAV_MAX_CHARS)
    i = np.arange(n, dtype=np.int64)
    return ((int(doc_id) * 31 + 37 * i) % 65536 - 32768).astype(np.int16)


def media_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                wav = encode_wav(_wav_samples(doc_id, n_chars))
                sr, ch, bits, n, rms = decode_wav(wav)
                rows.append((doc_id, sr, ch, bits, n, rms))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_channels", "bits",
                    "n_samples", "rms",
                ],
            )

    return docs.mapInPandas(run, WAV_FEATURE_SCHEMA)


MEDIA_WAV_DECODE_SQL = f"""
    WITH s AS (
        SELECT doc_id,
               unnest(range(0, 4 * least(n_chars, {WAV_MAX_CHARS}))) AS i
        FROM documents
    ), x AS (
        SELECT doc_id, ((doc_id * 31 + 37 * i) % 65536 - 32768) AS v FROM s
    )
    SELECT doc_id, {WAV_SAMPLE_RATE} AS sample_rate, 1 AS n_channels,
           16 AS bits, count(*) AS n_samples,
           sqrt(CAST(CAST(SUM(v * v) AS BIGINT) AS DOUBLE) / count(*)) AS rms
    FROM x GROUP BY 1
"""


BMP_W, BMP_H = 8, 8

BMP_FEATURE_SCHEMA = (
    "doc_id bigint, width int, height int, bpp int, "
    "mean_r double, mean_g double, mean_b double"
)


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """24-bit uncompressed BMP encoder. pixels: (h, w, 3) uint8 RGB."""
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    body = b"".join(
        pixels[y, :, ::-1].tobytes() + b"\x00" * pad  # rows bottom-up, BGR
        for y in range(h - 1, -1, -1)
    )
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + body


def decode_bmp(payload: bytes) -> tuple[int, int, int, float, float, float]:
    """Parse an uncompressed 24-bit BMP: header fields + per-channel
    means over the (padded, bottom-up, BGR) pixel rows."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    row_bytes = w * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    rows = [
        np.frombuffer(payload, np.uint8, row_bytes, offset + y * stride)
        for y in range(abs(h))
    ]
    px = np.stack(rows[::-1]).reshape(abs(h), w, 3)[:, :, ::-1]  # to top-down RGB
    sums = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
    n = abs(h) * w
    return (
        w, abs(h), bpp,
        float(sums[0]) / n, float(sums[1]) / n, float(sums[2]) / n,
    )


def _bmp_pixels(doc_id: int) -> "np.ndarray":
    y, x = np.mgrid[0:BMP_H, 0:BMP_W]
    r = (int(doc_id) + 3 * x + 7 * y) % 256
    g = (2 * int(doc_id) + 5 * x + 11 * y) % 256
    b = (3 * int(doc_id) + 13 * x + 17 * y) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def media_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                bmp = encode_bmp(_bmp_pixels(doc_id))
                rows.append((doc_id, *decode_bmp(bmp)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "bpp", "mean_r", "mean_g", "mean_b"],
            )

    return docs.mapInPandas(run, BMP_FEATURE_SCHEMA)


MEDIA_BMP_DECODE_SQL = f"""
    WITH px AS (
        SELECT doc_id, i % {BMP_W} AS x, i // {BMP_W} AS y
        FROM documents, unnest(range(0, {BMP_W * BMP_H})) t(i)
    )
    SELECT doc_id, {BMP_W} AS width, {BMP_H} AS height, 24 AS bpp,
           CAST(CAST(SUM((doc_id + 3 * x + 7 * y) % 256) AS BIGINT) AS DOUBLE)
               / count(*) AS mean_r,
           CAST(CAST(SUM((2 * doc_id + 5 * x + 11 * y) % 256) AS BIGINT) AS DOUBLE)
               / count(*) AS mean_g,
           CAST(CAST(SUM((3 * doc_id + 13 * x + 17 * y) % 256) AS BIGINT) AS DOUBLE)
               / count(*) AS mean_b
    FROM px GROUP BY 1
"""


QUERIES["media_wav_decode"] = media_wav_decode
QUERIES["media_bmp_decode"] = media_bmp_decode
ORACLE["media_wav_decode"] = MEDIA_WAV_DECODE_SQL
ORACLE["media_bmp_decode"] = MEDIA_BMP_DECODE_SQL


# ---------------------------------------------------------------------------
# Real resize + real frame sampling. media_bmp_thumbnail block-mean
# pools the decoded 8x8 BMP to 2x2 (the "resize" step, actually
# computed from pixels, not stubbed); media_bmp_stream_sample walks a
# MULTI-FRAME payload (N concatenated BMPs — sizes read from each
# header, the way any container demuxer works) and keeps every 2nd
# frame. Both carry analytical oracles over the closed-form pixel
# pattern. Every mean is an integer sum divided once — bit-stable.
# ---------------------------------------------------------------------------

THUMB_POOL = 4  # 8x8 -> 2x2 thumbnail via 4x4 block means

BMP_THUMB_SCHEMA = (
    "doc_id bigint, cell_x int, cell_y int, thumb_r double, "
    "thumb_g double, thumb_b double"
)


def bmp_thumbnail(payload: bytes) -> "np.ndarray":
    """Decode + nearest-block-mean resize: (H/P, W/P, 3) float64."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    row_bytes = w * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    rows = [
        np.frombuffer(payload, np.uint8, row_bytes, offset + y * stride)
        for y in range(abs(h))
    ]
    px = np.stack(rows[::-1]).reshape(abs(h), w, 3)[:, :, ::-1].astype(np.int64)
    p = THUMB_POOL
    hh, ww = abs(h) // p, w // p
    pooled = px[: hh * p, : ww * p].reshape(hh, p, ww, p, 3).sum(axis=(1, 3))
    return pooled / float(p * p)


def media_bmp_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                thumb = bmp_thumbnail(encode_bmp(_bmp_pixels(doc_id)))
                for cy in range(thumb.shape[0]):
                    for cx in range(thumb.shape[1]):
                        r, g, b = thumb[cy, cx]
                        rows.append((doc_id, cx, cy, float(r), float(g), float(b)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "cell_x", "cell_y", "thumb_r", "thumb_g", "thumb_b"],
            )

    return docs.mapInPandas(run, BMP_THUMB_SCHEMA)


MEDIA_BMP_THUMBNAIL_SQL = f"""
    WITH px AS (
        SELECT doc_id, i % {BMP_W} AS x, i // {BMP_W} AS y
        FROM documents, unnest(range(0, {BMP_W * BMP_H})) t(i)
    )
    SELECT doc_id,
           CAST(x // {THUMB_POOL} AS INT) AS cell_x,
           CAST(y // {THUMB_POOL} AS INT) AS cell_y,
           CAST(CAST(SUM((doc_id + 3 * x + 7 * y) % 256) AS BIGINT) AS DOUBLE)
               / {THUMB_POOL * THUMB_POOL} AS thumb_r,
           CAST(CAST(SUM((2 * doc_id + 5 * x + 11 * y) % 256) AS BIGINT) AS DOUBLE)
               / {THUMB_POOL * THUMB_POOL} AS thumb_g,
           CAST(CAST(SUM((3 * doc_id + 13 * x + 17 * y) % 256) AS BIGINT) AS DOUBLE)
               / {THUMB_POOL * THUMB_POOL} AS thumb_b
    FROM px GROUP BY 1, 2, 3
"""


N_STREAM_FRAMES = 6
FRAME_KEEP_STRIDE = 2  # keep frames 0, 2, 4

BMP_STREAM_SCHEMA = (
    "doc_id bigint, frame_index bigint, frame_mean_r double"
)


def split_bmp_stream(payload: bytes) -> list[bytes]:
    """Demux a concatenated-BMP stream by reading each header's
    declared file size — the container-walking step of any video
    pipeline, on a format this container can actually parse."""
    frames = []
    pos = 0
    while pos + 6 <= len(payload):
        if payload[pos : pos + 2] != b"BM":
            raise ValueError(f"bad frame magic at {pos}")
        (size,) = struct.unpack_from("<I", payload, pos + 2)
        frames.append(payload[pos : pos + size])
        pos += size
    return frames


def _frame_pixels(doc_id: int, f: int) -> "np.ndarray":
    y, x = np.mgrid[0:BMP_H, 0:BMP_W]
    r = (int(doc_id) + 3 * x + 7 * y + 19 * f) % 256
    g = (2 * int(doc_id) + 5 * x + 11 * y + 23 * f) % 256
    b = (3 * int(doc_id) + 13 * x + 17 * y + 29 * f) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def media_bmp_stream_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                stream = b"".join(
                    encode_bmp(_frame_pixels(doc_id, f)) for f in range(N_STREAM_FRAMES)
                )
                for idx, frame in enumerate(split_bmp_stream(stream)):
                    if idx % FRAME_KEEP_STRIDE:
                        continue
                    _, _, _, mean_r, _, _ = decode_bmp(frame)
                    rows.append((doc_id, idx, mean_r))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_index", "frame_mean_r"]
            )

    return docs.mapInPandas(run, BMP_STREAM_SCHEMA)


MEDIA_BMP_STREAM_SQL = f"""
    WITH fr AS (
        SELECT doc_id, f
        FROM documents, unnest(range(0, {N_STREAM_FRAMES})) t(f)
        WHERE f % {FRAME_KEEP_STRIDE} = 0
    ), px AS (
        SELECT doc_id, f, i % {BMP_W} AS x, i // {BMP_W} AS y
        FROM fr, unnest(range(0, {BMP_W * BMP_H})) t(i)
    )
    SELECT doc_id, CAST(f AS BIGINT) AS frame_index,
           CAST(CAST(SUM((doc_id + 3 * x + 7 * y + 19 * f) % 256) AS BIGINT)
                AS DOUBLE) / {BMP_W * BMP_H} AS frame_mean_r
    FROM px GROUP BY 1, 2
"""


QUERIES["media_bmp_thumbnail"] = media_bmp_thumbnail
QUERIES["media_bmp_stream_sample"] = media_bmp_stream_sample
ORACLE["media_bmp_thumbnail"] = MEDIA_BMP_THUMBNAIL_SQL
ORACLE["media_bmp_stream_sample"] = MEDIA_BMP_STREAM_SQL

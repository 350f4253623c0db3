"""Multimodal columns: media as opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched Pandas functions over
``mapInPandas``.

The container has no codec *libraries*, but WAV/PCM and BMP need none:
every decode path here parses REAL standard file formats (RIFF/WAVE
chunk walking, BMP headers + padded bottom-up BGR rows) with stdlib
struct + numpy in executors. Payloads are synthesized deterministically
per document, so each operator carries a FULL analytical oracle —
DuckDB recomputes the expected statistics in closed form. A production
pipeline swaps the synthesizer for real stored bytes and (for formats
that genuinely need codecs, e.g. JPEG/H.264) the parser body for
PIL/ffmpeg — the Spark plumbing (schema, Arrow batching, mapInPandas
row fan-out, partitioning) is unchanged.

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


QUERIES = {
    "media_manifest": media_manifest,
    "media_chunks": media_chunks,
}

ORACLE = {
    "media_manifest": MEDIA_MANIFEST_SQL,
    "media_chunks": MEDIA_CHUNKS_SQL,
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
                if n == 0:
                    continue  # a 0-char doc has no samples; the oracle's
                    # unnest over an empty range emits no row either
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


def decode_bmp_pixels(payload: bytes) -> "np.ndarray":
    """Parse an uncompressed 24-bit BMP into a (h, w, 3) top-down RGB
    uint8 pixel array (undoing the padded, bottom-up, BGR row layout)."""
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
    return np.stack(rows[::-1]).reshape(abs(h), w, 3)[:, :, ::-1]


def decode_bmp(payload: bytes) -> tuple[int, int, int, float, float, float]:
    """Header fields + per-channel means from the decoded pixels."""
    px = decode_bmp_pixels(payload)
    h, w, _ = px.shape
    sums = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
    n = h * w
    return (
        w, h, 24,
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
# media_features — REAL audio feature extraction (replaces the round-1
# _fake_decode stub): each document's synthesized RIFF/WAVE payload is
# parsed by the real chunk walker, then zero-crossing count, peak
# amplitude and mean absolute amplitude are computed from the decoded
# PCM samples — the waveform statistics a speech/music pipeline
# gates on. All sums are integer (no float accumulation), so the
# closed-form oracle matches bit-for-bit; the ZCR is defined as strict
# sign products (v[i] * v[i-1] < 0) in both engines.
#
# media_frame_sample — REAL windowed frame sampling: decoded samples
# split into fixed 64-sample frames, keep every FRAME_STRIDE-th frame,
# per-frame RMS (integer sum of squares, one sqrt). One output row per
# SAMPLED frame — mapInPandas emits more rows than its input, which is
# what distinguishes it from a scalar pandas_udf. Closed-form oracle
# over (doc_id, frame_index).
#
# Scale posture (both): payloads never leave executors, Arrow batches
# bound peak memory to one batch per core, and output is pure map-side
# fan-out — no shuffle until whatever aggregation a caller adds.
# ---------------------------------------------------------------------------

FRAME_SAMPLES = 64  # samples per frame
FRAME_STRIDE = 4  # keep every 4th frame

WAV_FEATURES_SCHEMA = (
    "doc_id bigint, n_samples bigint, zero_crossings bigint, "
    "peak_abs bigint, mean_abs double"
)

FRAME_SAMPLE_SCHEMA = (
    "doc_id bigint, frame_index bigint, n_samples bigint, frame_rms double"
)


def wav_data(payload: bytes) -> "np.ndarray":
    """Real RIFF/WAVE chunk walker returning the PCM samples."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        if cid == b"data":
            return np.frombuffer(payload[pos + 8 : pos + 8 + size], dtype="<i2")
        pos += 8 + size + (size % 2)
    raise ValueError("missing data chunk")


def wav_feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batch decode: synthesize the WAV payload, parse it with the
    real chunk walker, emit waveform features. Shared by the batch and
    streaming forms (mapInPandas is stateless, so the same iterator
    serves both)."""
    for pdf in batches:
        rows = []
        for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
            s = wav_data(encode_wav(_wav_samples(doc_id, n_chars))).astype(
                np.int64
            )
            n = len(s)
            if n == 0:
                continue  # match the oracle: no samples, no row
            zc = int(((s[1:] * s[:-1]) < 0).sum()) if n > 1 else 0
            peak = int(np.abs(s).max())
            mean_abs = float(int(np.abs(s).sum())) / n
            rows.append((doc_id, n, zc, peak, mean_abs))
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_samples", "zero_crossings", "peak_abs", "mean_abs",
            ],
        )


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return docs.mapInPandas(wav_feature_batches, WAV_FEATURES_SCHEMA)


MEDIA_FEATURES_SQL = f"""
    WITH s AS (
        SELECT doc_id,
               unnest(range(0, 4 * least(n_chars, {WAV_MAX_CHARS}))) AS i
        FROM documents
    ), x AS (
        SELECT doc_id, i, ((doc_id * 31 + 37 * i) % 65536 - 32768) AS v FROM s
    ), lagged AS (
        SELECT doc_id, v,
               lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
        FROM x
    )
    SELECT doc_id, count(*) AS n_samples,
           CAST(COALESCE(SUM(CASE WHEN v * pv < 0 THEN 1 END), 0) AS BIGINT)
               AS zero_crossings,
           CAST(MAX(abs(v)) AS BIGINT) AS peak_abs,
           CAST(CAST(SUM(abs(v)) AS BIGINT) AS DOUBLE) / count(*) AS mean_abs
    FROM lagged GROUP BY 1
"""


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_index": [], "n_samples": [], "frame_rms": [],
            }
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                s = wav_data(encode_wav(_wav_samples(doc_id, n_chars))).astype(
                    np.int64
                )
                for start in range(0, len(s), FRAME_SAMPLES * FRAME_STRIDE):
                    frame = s[start : start + FRAME_SAMPLES]
                    ssq = int((frame ** 2).sum())
                    out["doc_id"].append(doc_id)
                    out["frame_index"].append(start // FRAME_SAMPLES)
                    out["n_samples"].append(len(frame))
                    out["frame_rms"].append(
                        float(np.sqrt(float(ssq) / len(frame)))
                    )
            yield pd.DataFrame(out)

    return docs.mapInPandas(run, FRAME_SAMPLE_SCHEMA)


MEDIA_FRAME_SAMPLE_SQL = f"""
    WITH s AS (
        SELECT doc_id,
               unnest(range(0, 4 * least(n_chars, {WAV_MAX_CHARS}))) AS i
        FROM documents
    ), x AS (
        SELECT doc_id, i // {FRAME_SAMPLES} AS frame_index,
               ((doc_id * 31 + 37 * i) % 65536 - 32768) AS v
        FROM s
    )
    SELECT doc_id, CAST(frame_index AS BIGINT) AS frame_index,
           count(*) AS n_samples,
           sqrt(CAST(CAST(SUM(v * v) AS BIGINT) AS DOUBLE) / count(*))
               AS frame_rms
    FROM x
    WHERE frame_index % {FRAME_STRIDE} = 0
    GROUP BY 1, 2
"""


QUERIES["media_features"] = media_features
QUERIES["media_frame_sample"] = media_frame_sample
ORACLE["media_features"] = MEDIA_FEATURES_SQL
ORACLE["media_frame_sample"] = MEDIA_FRAME_SAMPLE_SQL


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


# ---------------------------------------------------------------------------
# media_phash_clusters — perceptual-hash image deduplication, the
# first stage of production image dedup: each document's BMP payload
# is decoded by the REAL decoder (decode_bmp_pixels above), its dHash
# computed (difference hash: per pixel row, bit = gray(x,y) <
# gray(x+1,y) with gray = r+g+b — on the 8x8 fixture images the
# canonical 9x8-resize step is the identity, and comparing channel
# SUMS is exactly comparing means), and exact-hash clusters reported
# with the keeper (lowest doc_id) per cluster. The 56-bit hash ships
# as four 14-bit band keys — the same banding a Hamming-distance
# near-dup join would bucket on, so the exact-match clusters here are
# stage one of the standard band-join pipeline (dedup_embedding_cosine
# documents the amplification math).
#
# Scale shape: decode + hash are mapInPandas (Arrow batches, payloads
# never leave executors); the cluster step is ONE hash aggregate on
# the four band ints — fixed-width keys, map-side partials, no joins.
# Oracle: the synthetic pixel closed form (doc_id + 3x + 7y etc.,
# see _bmp_pixels) makes every hash bit an integer comparison DuckDB
# evaluates analytically — the Python decode path is value-verified
# bit-for-bit, like the other media ops.
# ---------------------------------------------------------------------------

PHASH_BANDS_SCHEMA = (
    "doc_id bigint, b0 bigint, b1 bigint, b2 bigint, b3 bigint"
)


def _dhash_bands(px: "np.ndarray") -> list:
    """56-bit dHash of a (h, w, 3) RGB array as four 14-bit ints."""
    gray = px.astype(np.int64).sum(axis=-1)
    bits = (gray[:, :-1] < gray[:, 1:]).flatten()  # y-major, (w-1)*h bits
    out = []
    for b in range(4):
        v = 0
        for j in range(14):
            v |= int(bits[b * 14 + j]) << j
        out.append(v)
    return out


def media_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (doc_id, *_dhash_bands(decode_bmp_pixels(encode_bmp(_bmp_pixels(doc_id)))))
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "b0", "b1", "b2", "b3"])

    bands = docs.mapInPandas(run, PHASH_BANDS_SCHEMA)
    return bands.groupBy("b0", "b1", "b2", "b3").agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id")
    )


def _phash_gray_sql(xe: str, ye: str) -> str:
    return (
        f"((doc_id + 3 * ({xe}) + 7 * ({ye})) % 256"
        f" + (2 * doc_id + 5 * ({xe}) + 11 * ({ye})) % 256"
        f" + (3 * doc_id + 13 * ({xe}) + 17 * ({ye})) % 256)"
    )


def _media_phash_clusters_sql() -> str:
    lt = (
        f"{_phash_gray_sql('k % 7', 'k // 7')}"
        f" < {_phash_gray_sql('k % 7 + 1', 'k // 7')}"
    )
    return f"""
        WITH bits AS (
            SELECT doc_id, k // 14 AS band,
                   CASE WHEN {lt} THEN (1::BIGINT << (k % 14))
                        ELSE 0 END AS v
            FROM documents, unnest(range(0, 56)) t(k)
        ), bands AS (
            SELECT doc_id,
                   CAST(COALESCE(SUM(CASE WHEN band = 0 THEN v END), 0) AS BIGINT) AS b0,
                   CAST(COALESCE(SUM(CASE WHEN band = 1 THEN v END), 0) AS BIGINT) AS b1,
                   CAST(COALESCE(SUM(CASE WHEN band = 2 THEN v END), 0) AS BIGINT) AS b2,
                   CAST(COALESCE(SUM(CASE WHEN band = 3 THEN v END), 0) AS BIGINT) AS b3
            FROM bits GROUP BY 1
        )
        SELECT b0, b1, b2, b3, count(*) AS n_docs,
               min(doc_id) AS keep_doc_id
        FROM bands GROUP BY 1, 2, 3, 4
    """


QUERIES["media_phash_clusters"] = media_phash_clusters
ORACLE["media_phash_clusters"] = _media_phash_clusters_sql()


# ---------------------------------------------------------------------------
# media_autocorrelation — lag-L autocorrelation of the decoded PCM
# signal: the classic periodicity/pitch feature (and the first thing
# an audio-dedup or silence-detection pass computes). The REAL
# RIFF/WAVE decode path runs in executors (same chunk walker as
# media_wav_decode); the numerator and energy are exact int64 sums
# over the decoded samples, so the oracle — which re-derives the
# closed-form signal per (doc, i) — must match bit-for-bit; the
# normalized coefficient is one double division.
#
# Scale shape: mapInPandas over Arrow batches (payloads never leave
# executors), output is one row per document — no shuffle at all
# until someone aggregates downstream.
# ---------------------------------------------------------------------------

AUTOCORR_LAG = 8


def decode_wav_samples(payload: bytes) -> "np.ndarray":
    """Chunk-walk a RIFF/WAVE payload and return the raw int16 PCM."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, data = 12, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        if cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size % 2)
    if data is None:
        raise ValueError("missing data chunk")
    return np.frombuffer(data, dtype="<i2")


def media_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    lag = AUTOCORR_LAG

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                wav = encode_wav(_wav_samples(doc_id, n_chars))
                v = decode_wav_samples(wav).astype(np.int64)
                n = len(v)
                if n <= lag:
                    continue
                num = int((v[:-lag] * v[lag:]).sum())
                ssq = int((v * v).sum())
                rows.append(
                    (doc_id, n, num, ssq, round(float(num) / float(ssq), 6))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "autocorr_raw", "energy", "r_lag"],
            )

    return docs.mapInPandas(
        run,
        "doc_id bigint, n_samples bigint, autocorr_raw bigint, "
        "energy bigint, r_lag double",
    )


MEDIA_AUTOCORRELATION_SQL = f"""
    WITH s AS (
        SELECT doc_id,
               4 * least(n_chars, {WAV_MAX_CHARS}) AS n,
               unnest(range(0, 4 * least(n_chars, {WAV_MAX_CHARS}))) AS i
        FROM documents
    ), x AS (
        SELECT doc_id, n, i,
               ((doc_id * 31 + 37 * i) % 65536 - 32768) AS v,
               ((doc_id * 31 + 37 * (i + {AUTOCORR_LAG})) % 65536 - 32768) AS v_lag
        FROM s
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
           CAST(SUM(CASE WHEN i + {AUTOCORR_LAG} < n THEN v * v_lag ELSE 0 END)
                AS BIGINT) AS autocorr_raw,
           CAST(SUM(v * v) AS BIGINT) AS energy,
           ROUND(CAST(SUM(CASE WHEN i + {AUTOCORR_LAG} < n THEN v * v_lag ELSE 0 END)
                      AS DOUBLE)
                 / CAST(SUM(v * v) AS DOUBLE), 6) AS r_lag
    FROM x
    WHERE n > {AUTOCORR_LAG}
    GROUP BY 1, 2
"""


QUERIES["media_autocorrelation"] = media_autocorrelation
ORACLE["media_autocorrelation"] = MEDIA_AUTOCORRELATION_SQL


# ---------------------------------------------------------------------------
# media_rms_windows — windowed energy profile (the time-resolved DSP
# cousin of media_autocorrelation's whole-stream statistic): samples
# bucket into fixed 100-sample windows, each reporting its exact sum
# of squares and mean energy — the per-segment loudness curve a
# silence-trim / segmentation pass consumes. The Spark side decodes
# the REAL RIFF/WAVE container in executors (Arrow batches); the
# oracle re-derives the same windows analytically from the synthetic
# sample formula. Exact int64 sums; mean = ssq/count is a single IEEE
# division of ints < 2^53 — bit-identical, no rounding needed.
# ---------------------------------------------------------------------------

RMS_WINDOW = 100  # samples per energy window


def media_rms_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = RMS_WINDOW

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                wav = encode_wav(_wav_samples(doc_id, n_chars))
                v = decode_wav_samples(wav).astype(np.int64)
                for win in range(0, len(v), w):
                    seg = v[win : win + w]
                    ssq = int((seg * seg).sum())
                    rows.append(
                        (
                            doc_id,
                            win // w,
                            len(seg),
                            ssq,
                            float(ssq) / float(len(seg)),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "win_id", "n_samples", "ssq", "mean_energy"],
            )

    return docs.mapInPandas(
        run,
        "doc_id bigint, win_id bigint, n_samples bigint, ssq bigint, "
        "mean_energy double",
    )


MEDIA_RMS_WINDOWS_SQL = f"""
    WITH s AS (
        SELECT doc_id,
               unnest(range(0, 4 * least(n_chars, {WAV_MAX_CHARS}))) AS i
        FROM documents
    ), x AS (
        SELECT doc_id, i // {RMS_WINDOW} AS win_id,
               ((doc_id * 31 + 37 * i) % 65536 - 32768) AS v
        FROM s
    )
    SELECT doc_id, CAST(win_id AS BIGINT) AS win_id,
           count(*) AS n_samples,
           CAST(SUM(v * v) AS BIGINT) AS ssq,
           CAST(SUM(v * v) AS DOUBLE) / count(*) AS mean_energy
    FROM x
    GROUP BY 1, 2
"""


QUERIES["media_rms_windows"] = media_rms_windows
ORACLE["media_rms_windows"] = MEDIA_RMS_WINDOWS_SQL

"""Multimodal-column plumbing (north-star extension): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` — the shape a 100 TB media pipeline needs.

No media tables ship in the testdata and no codec libraries ship in this
container, so the *assets* are derived deterministically from ``documents``
(payload = utf-8 bytes of the text; media_type round-robins image/audio/
video) and the decode step is STUBBED: ``decode_asset`` raises
``NotImplementedError`` while ``fake_decode_features`` provides the
deterministic stand-in (a 16-bin byte histogram). Everything around the
stub — schema, Arrow batch shape, UDF signature, partition preservation —
is real and tested, so swapping in a true decoder (PIL/ffmpeg) changes one
function.

Scale notes: ``mapInPandas`` is a narrow transformation — no shuffle; each
Arrow batch holds ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows, so
executor memory is bounded by batch size x max payload, not partition size.
The metadata query is pure JVM (sha2/octet_length equivalents) and stays in
whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from tutorial_iceberg_spark.io import load_table
from tutorial_iceberg_spark.registry import register

if TYPE_CHECKING:
    import pandas as pd

MEDIA_TYPES = ("image", "audio", "video")
FEATURE_DIM = 16


def assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multimodal asset table derived from documents:
    (doc_id, media_type, payload binary, meta struct<format,nbytes,width,height>)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    media = (
        F.when(F.col("doc_id") % 3 == 0, MEDIA_TYPES[0])
        .when(F.col("doc_id") % 3 == 1, MEDIA_TYPES[1])
        .otherwise(MEDIA_TYPES[2])
    )
    nbytes = F.octet_length(payload)
    return docs.select(
        "doc_id",
        media.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.concat(media, F.lit("/fake")).alias("format"),
            nbytes.alias("nbytes"),
            (F.pmod(F.col("doc_id"), F.lit(4)) * 160 + 320).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), F.lit(3)) * 120 + 240).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_asset(payload: bytes, fmt: str) -> bytes:
    """True decoder entry point — intentionally unimplemented: the container
    ships no codec libraries. Swap in PIL/soundfile/ffmpeg here; the rest of
    the pipeline (schema, batching, partitioning) is already real."""
    raise NotImplementedError(
        f"no codec for {fmt!r} in this environment - use fake_decode_features"
    )


def fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic decode stand-in: 16-bin byte histogram, L1-normalized.
    Pure-python on bytes already in the Arrow batch — no extra deps."""
    counts = [0] * FEATURE_DIM
    for b in payload:
        counts[b % FEATURE_DIM] += 1
    total = float(len(payload)) or 1.0
    return [c / total for c in counts]


FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("nbytes", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_features(assets_df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: decode(stub) -> fixed-dim feature
    vector + fake frame count. Narrow (partition-preserving), Arrow-batched."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            feats = [fake_decode_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "nbytes": [m["nbytes"] for m in pdf["meta"]],
                    "n_frames": [
                        (m["nbytes"] // 1024) + 1 for m in pdf["meta"]
                    ],
                    "features": feats,
                }
            )

    return assets_df.mapInPandas(run, FEATURES_SCHEMA)


@register(
    "x_asset_metadata",
    oracle="""
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'image'
                               WHEN 1 THEN 'audio'
                               ELSE 'video' END AS media_type,
               octet_length(encode(text)) AS nbytes,
               sha256(text) AS payload_sha
        FROM documents
        ORDER BY doc_id
    """,
    doc="Multimodal asset catalog: typed binary payload + metadata struct; "
    "content hash and sizes stay JVM-side (sha2/octet_length in codegen)",
    tags=("multimodal", "extension"),
)
def x_asset_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = assets(spark, sf_dir)
    return a.select(
        "doc_id",
        "media_type",
        F.col("meta.nbytes").alias("nbytes"),
        F.sha2(F.col("payload"), 256).alias("payload_sha"),
    ).orderBy("doc_id")


@register(
    "x_multimodal_features",
    oracle="""
        SELECT CASE doc_id % 3 WHEN 0 THEN 'image'
                               WHEN 1 THEN 'audio'
                               ELSE 'video' END AS media_type,
               COUNT(*) AS n_assets,
               CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               CAST(SUM((octet_length(encode(text)) // 1024) + 1) AS BIGINT) AS total_frames
        FROM documents
        GROUP BY 1
        ORDER BY 1
    """,
    doc="Arrow-batched mapInPandas decode(stub)+featurize over binary "
    "payloads, rolled up per media type. The per-asset feature vectors are "
    "pytest-checked; the rollup (counts/bytes/frames) hash-matches the oracle",
    tags=("multimodal", "extension", "pandas-udf"),
)
def x_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(assets(spark, sf_dir))
    return (
        feats.groupBy("media_type")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("nbytes").alias("total_bytes"),
            F.sum("n_frames").alias("total_frames"),
        )
        .orderBy("media_type")
    )


N_SAMPLE_FRAMES = 4
AUDIO_CHUNK_BYTES = 64


@register(
    "x_video_frame_sample",
    oracle=f"""
        WITH v AS (
            SELECT doc_id,
                   text,
                   (octet_length(encode(text)) // 1024) + 1 AS n_frames
            FROM documents
            WHERE doc_id % 3 = 2
        ), k AS (
            SELECT doc_id, text, n_frames,
                   least(n_frames, {N_SAMPLE_FRAMES}) AS k
            FROM v
        )
        SELECT doc_id,
               n_frames,
               CAST(unnest(list_transform(generate_series(0, k - 1),
                           j -> (j * n_frames) // k)) AS INTEGER) AS frame_idx,
               sha256(text || ':' ||
                      CAST(unnest(list_transform(generate_series(0, k - 1),
                           j -> (j * n_frames) // k)) AS VARCHAR)) AS frame_sha
        FROM k
        ORDER BY doc_id, frame_idx
    """,
    doc="Video frame sampling: uniform-stride selection of up to "
    f"{N_SAMPLE_FRAMES} frame indices per video (j*n_frames//k — distinct "
    "because n_frames >= k), exploded to one row per sampled frame with a "
    "deterministic frame-content hash standing in for the decoded frame "
    "(decode itself stays the stubbed decode_asset). The whole fan-out is "
    "JVM column algebra — sequence/transform/explode in codegen, no UDF, "
    "narrow (no shuffle): exactly how a 100 TB video corpus fans out to "
    "per-frame rows before a GPU decode stage",
    tags=("multimodal", "extension"),
)
def x_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = assets(spark, sf_dir).filter(F.col("media_type") == "video")
    n = (F.col("meta.nbytes").cast("bigint") / 1024).cast("bigint") + 1
    k = F.least(n, F.lit(N_SAMPLE_FRAMES))
    idxs = F.transform(
        F.sequence(F.lit(0).cast("bigint"), k - 1),
        lambda j: ((j * n) / k).cast("bigint"),
    )
    return (
        a.select(
            "doc_id",
            n.alias("n_frames"),
            "payload",
            F.explode(idxs).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "n_frames",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.sha2(
                F.concat(
                    F.col("payload"),
                    F.lit(":").cast("binary"),
                    F.col("frame_idx").cast("string").cast("binary"),
                ),
                256,
            ).alias("frame_sha"),
        )
        .orderBy("doc_id", "frame_idx")
    )


@register(
    "x_audio_chunk",
    oracle=f"""
        WITH a AS (
            SELECT doc_id, text, octet_length(encode(text)) AS nbytes
            FROM documents
            WHERE doc_id % 3 = 1
        )
        SELECT doc_id,
               CAST(unnest(generate_series(0,
                    CAST(ceil(CAST(nbytes AS DOUBLE) / {AUDIO_CHUNK_BYTES})
                         AS BIGINT) - 1)) AS INTEGER) AS chunk_idx,
               -- DuckDB cannot substring a BLOB; the corpus is pure ASCII
               -- (verified octet_length==length at every SF), so char
               -- slicing the text equals byte-slicing the payload
               octet_length(encode(substring(text,
                    CAST(unnest(generate_series(0,
                         CAST(ceil(CAST(nbytes AS DOUBLE) / {AUDIO_CHUNK_BYTES})
                              AS BIGINT) - 1)) AS INTEGER) * {AUDIO_CHUNK_BYTES} + 1,
                    {AUDIO_CHUNK_BYTES}))) AS chunk_bytes
        FROM a
        ORDER BY doc_id, chunk_idx
    """,
    doc="Audio chunking: split each waveform payload into fixed "
    f"{AUDIO_CHUNK_BYTES}-byte windows (the resample/VAD pre-segmentation "
    "shape), one row per chunk with its byte length — binary substring "
    "arithmetic entirely in codegen; the chunk payloads would feed the "
    "stubbed decoder. Narrow fan-out, executor memory bounded by "
    "chunk size not payload size",
    tags=("multimodal", "extension"),
)
def x_audio_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = assets(spark, sf_dir).filter(F.col("media_type") == "audio")
    nchunks = F.ceil(F.col("meta.nbytes").cast("double") / AUDIO_CHUNK_BYTES)
    # zero-byte payloads must yield ZERO chunks: Spark's sequence(0, -1) is
    # the descending [0, -1] (unlike DuckDB's empty generate_series), so
    # guard before exploding (same edge as dedup.shingles)
    idxs = F.when(
        nchunks >= 1, F.sequence(F.lit(0).cast("bigint"), nchunks - 1)
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        a.select(
            "doc_id",
            "payload",
            F.explode(idxs).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.octet_length(
                F.expr(
                    f"substring(payload, chunk_idx * {AUDIO_CHUNK_BYTES} + 1, "
                    f"{AUDIO_CHUNK_BYTES})"
                )
            ).alias("chunk_bytes"),
        )
        .orderBy("doc_id", "chunk_idx")
    )

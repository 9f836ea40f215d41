"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content is carried as opaque ``binary`` columns with
typed metadata alongside. The Spark-side plumbing — schema, Arrow batch
shape, ``mapInPandas`` signatures, partitioning — is real and tested; the
actual codec step is stubbed (the decode libraries are not in this
container) behind a deterministic fake keyed on payload bytes, with the
real-codec entry point raising ``NotImplementedError``.

The fixture lake has no binary table, so payloads are derived from
``documents.text`` utf-8 bytes — which also makes the fake-decode
arithmetic SQL-expressible, so even the pandas-UDF path is oracle-checked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_compactor_spark.registry import load, register

META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, n_frames int, modality string"
)


def fake_decode_meta(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for a codec header parse.

    STUB — a real deployment replaces this with PIL/ffprobe/soundfile; see
    :func:`decode_image`. Keyed only on payload length so the DuckDB oracle
    can replicate it.
    """
    n = len(payload)
    width = 64 + n % 512
    height = 64 + (n * 7) % 512
    n_frames = 1 + n % 30
    modality = ("image", "audio", "video")[n % 3]
    return width, height, n_frames, modality


def decode_image(payload: bytes):
    """Real image decode — NOT IMPLEMENTED in this container (no PIL/cv2).

    Kept as the explicit seam where a codec library plugs in; the Spark
    plumbing around it (binary column → mapInPandas → struct metadata) is
    exercised via :func:`fake_decode_meta`.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as err:
        raise NotImplementedError(
            "image decoding requires PIL/opencv, not available in this environment"
        ) from err
    raise NotImplementedError("real decode path intentionally stubbed")


def extract_media_meta(df: DataFrame) -> DataFrame:
    """``mapInPandas`` metadata extraction over (doc_id, payload: binary).

    Arrow-batched: each pandas batch maps payload bytes → typed metadata
    columns. This is the canonical shape for any per-blob Python work
    (decode, feature-extract, resize) — swap ``fake_decode_meta`` for the
    real codec and the distributed plumbing is unchanged.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [fake_decode_meta(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in pdf["payload"]],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "n_frames": [m[2] for m in metas],
                    "modality": [m[3] for m in metas],
                }
            )

    return df.mapInPandas(batches, schema=META_SCHEMA)


@register(
    "q_multimodal_meta",
    oracle="""
    WITH meta AS (
        SELECT doc_id,
               source,
               strlen(text)                    AS n_bytes,
               64 + strlen(text) % 512         AS width,
               64 + (strlen(text) * 7) % 512   AS height,
               1 + strlen(text) % 30           AS n_frames,
               ['image', 'audio', 'video'][1 + strlen(text) % 3] AS modality
        FROM documents
    )
    SELECT source,
           modality,
           COUNT(*)        AS n_blobs,
           CAST(SUM(n_bytes) AS BIGINT)    AS total_bytes,
           MAX(width)      AS max_width,
           MAX(height)     AS max_height,
           CAST(SUM(n_frames) AS BIGINT)   AS total_frames
    FROM meta
    GROUP BY source, modality
    """,
    doc="Multimodal metadata pipeline: binary payload column → Arrow-"
    "batched mapInPandas decode (deterministic fake; real codec is the "
    "documented stub seam) → typed metadata → relational agg. Proves the "
    "full binary-column plumbing end-to-end against a SQL oracle.",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id", "source", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    meta = extract_media_meta(payloads.select("doc_id", "payload"))
    return (
        meta.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source", "modality")
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("width").alias("max_width"),
            F.max("height").alias("max_height"),
            F.sum("n_frames").alias("total_frames"),
        )
    )


def sample_frames(meta: DataFrame, every_k: int = 5) -> DataFrame:
    """Frame sampling over video metadata: one output row per sampled frame.

    Takes the ``extract_media_meta`` output, keeps videos, and explodes a
    stride-``every_k`` frame-index sequence with the byte offset each frame
    would be decoded from. This is the distributed frame-sampling plumbing
    (explode keeps it JVM-side and shuffle-free); the per-frame pixel
    decode plugs in at :func:`decode_image`.
    """
    return (
        meta.filter(F.col("modality") == "video")
        .select(
            "doc_id",
            "n_frames",
            "n_bytes",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
            ).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "n_frames",
            "frame_idx",
            (F.col("frame_idx") * (F.col("n_bytes") / F.col("n_frames")).cast("bigint"))
            .alias("byte_offset"),
        )
    )


@register(
    "q_frame_sample",
    oracle="""
    WITH meta AS (
        SELECT doc_id,
               strlen(text)                  AS n_bytes,
               1 + strlen(text) % 30         AS n_frames,
               strlen(text) % 3              AS m_idx
        FROM documents
    ),
    vids AS (SELECT * FROM meta WHERE m_idx = 2)
    SELECT doc_id,
           n_frames,
           unnest(range(0, n_frames, 5))                         AS frame_idx,
           unnest(range(0, n_frames, 5)) * (n_bytes // n_frames) AS byte_offset
    FROM vids
    """,
    doc="Video frame sampling: binary payloads → mapInPandas metadata → "
    "every-5th-frame index/byte-offset explosion (the decode-ready work "
    "list a video pipeline feeds to per-frame codecs). Narrow ops only — "
    "no shuffle; at 100 TB each executor samples its own blobs.",
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    meta = extract_media_meta(payloads)
    return sample_frames(meta, every_k=5)


def ingest_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw blob directory → the engine's (doc_id, payload) multimodal shape.

    Reads whole files via the ``binaryFile`` source (one row per blob,
    parallel across executors), derives a stable ``doc_id`` from the file
    path (xxhash64 — deterministic across runs, unlike
    ``monotonically_increasing_id``), and carries ``source_path`` for
    lineage. Output plugs straight into :func:`extract_media_meta`.
    """
    from parquet_compactor_spark.sources.io import read_binary_files

    blobs = read_binary_files(spark, path, glob=glob)
    return blobs.select(
        F.xxhash64("path").alias("doc_id"),
        F.col("path").alias("source_path"),
        F.col("length").alias("n_bytes"),
        F.col("content").alias("payload"),
    )

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content is carried as opaque ``binary`` columns with
typed metadata alongside. The Spark-side plumbing — schema, Arrow batch
shape, ``mapInPandas`` signatures, partitioning — is real and tested.
Image HEADER decoding (dimensions/bit-depth/mode for PNG, JPEG, GIF) is
real too — a pure-Python byte parse, no codec library (``decode_image``).
Pixel decoding and non-image codecs remain the documented external-
library seam; non-image payloads take a deterministic fake keyed on
payload bytes so the pipeline stays SQL-oracle-expressible.

The fixture lake has no binary table, so payloads are derived from
``documents.text`` utf-8 bytes — which also makes the fake-decode
arithmetic SQL-expressible, so even the pandas-UDF path is oracle-checked.
"""

from __future__ import annotations

import struct
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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}
_JPEG_MODES = {1: "L", 3: "RGB", 4: "CMYK"}
# SOF0..SOF15 carry frame dimensions, EXCEPT the non-frame members of
# the 0xC0 block: DHT (C4), JPG (C8), DAC (CC).
_JPEG_NON_FRAME = (0xC4, 0xC8, 0xCC)


def decode_image(payload: bytes) -> dict:
    """Real image HEADER decode — pure Python, no codec library.

    Parses the three formats whose headers are fully specified by public
    byte layouts: PNG (8-byte magic + IHDR at offset 12: width/height as
    big-endian u32, bit depth, color type — PNG spec §11.2.2), JPEG
    (SOI then marker segments; the first SOF frame header carries
    precision/height/width/components — ITU T.81 §B.2.2), and GIF
    (``GIF87a``/``GIF89a`` + little-endian u16 logical screen size).

    Returns ``{"format", "width", "height", "bit_depth", "mode"}``.
    Raises ``ValueError`` for a recognized-but-corrupt payload (loud
    failure, same discipline as the avro decoder) and
    ``NotImplementedError`` for genuinely unsupported codecs — PIXEL
    decoding (and every other format) still needs an external library;
    this seam is where it plugs in.
    """
    if payload[:8] == _PNG_MAGIC:
        if len(payload) < 26 or payload[12:16] != b"IHDR":
            raise ValueError("corrupt PNG: IHDR chunk not at byte 12")
        w, h, depth, color_type = struct.unpack(">IIBB", payload[16:26])
        if not w or not h:
            raise ValueError(f"corrupt PNG: zero dimension {w}x{h}")
        return {
            "format": "png",
            "width": w,
            "height": h,
            "bit_depth": depth,
            "mode": _PNG_MODES.get(color_type, f"type{color_type}"),
        }
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                raise ValueError(f"corrupt JPEG: expected marker at byte {i}")
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte padding before a marker
                i += 1
                continue
            if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            if marker == 0xD9:  # EOI before any SOF
                break
            (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
            if 0xC0 <= marker <= 0xCF and marker not in _JPEG_NON_FRAME:
                if i + 10 > len(payload):
                    raise ValueError("corrupt JPEG: truncated SOF header")
                depth, h, w, ncomp = struct.unpack(
                    ">BHHB", payload[i + 4 : i + 10]
                )
                return {
                    "format": "jpeg",
                    "width": w,
                    "height": h,
                    "bit_depth": depth,
                    "mode": _JPEG_MODES.get(ncomp, f"{ncomp}comp"),
                }
            i += 2 + seg_len
        raise ValueError("corrupt JPEG: no SOF frame header before EOI")
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 10:
            raise ValueError("corrupt GIF: truncated logical screen descriptor")
        w, h = struct.unpack("<HH", payload[6:10])
        return {"format": "gif", "width": w, "height": h, "bit_depth": 8, "mode": "P"}
    raise NotImplementedError(
        f"unsupported image format (magic {payload[:8]!r}): PNG/JPEG/GIF "
        "headers are parsed natively; other codecs (and pixel decoding) "
        "require an external library at this seam"
    )


def _blob_meta(payload: bytes) -> tuple[int, int, int, str]:
    """Per-blob metadata: real header parse for real images, fake elsewhere.

    Only the pure-binary magics (PNG ``\\x89PNG``, JPEG ``\\xff\\xd8``) are
    auto-sniffed here: neither byte sequence can occur in utf-8 text, so
    the fixture's text-derived payloads deterministically take the fake
    path and stay SQL-oracle-expressible, while any genuine image blob
    (e.g. via :func:`ingest_binary_dir`) gets its actual dimensions. GIF's
    ASCII magic could collide with text content, so GIF decoding is
    explicit-call only (:func:`decode_image`).

    A magic match is a HINT, not proof: arbitrary binary (audio, video,
    truncated uploads) hits the two-byte JPEG magic at ~1/65536, which
    is a certainty across a real lake. A failed parse therefore degrades
    to the fake-meta path instead of propagating — one corrupt blob must
    never abort a whole extract job; :func:`decode_image` stays strict
    for callers that want the loud failure.
    """
    b = b"" if payload is None else bytes(payload)  # NULL cell ≠ job abort
    if b[:8] == _PNG_MAGIC or b[:2] == b"\xff\xd8":
        try:
            m = decode_image(b)
        except (ValueError, NotImplementedError, struct.error):
            return fake_decode_meta(b)
        return m["width"], m["height"], 1, "image"
    return fake_decode_meta(b)


def extract_media_meta(df: DataFrame) -> DataFrame:
    """``mapInPandas`` metadata extraction over (doc_id, payload: binary).

    Arrow-batched: each pandas batch maps payload bytes → typed metadata
    columns. This is the canonical shape for any per-blob Python work
    (decode, feature-extract, resize): PNG/JPEG payloads get a real
    header parse (:func:`_blob_meta`), everything else the deterministic
    fake — swap in a full codec at the same seam and the distributed
    plumbing is unchanged.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [_blob_meta(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [0 if b is None else len(b) for b in pdf["payload"]],
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
        -- a NULL payload has no modality: pinned out on BOTH engines
        -- (the decode stage skips it; the oracle would otherwise grow a
        -- NULL-modality group — r7 hostile NULL-text sweep find)
        FROM documents WHERE text IS NOT NULL
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
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
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

"""Multimodal (binary) columns: SURVEY.md §2.1 REF-data row — the
reference lands raw HTML pages and images as opaque objects
(``minio/data/bronze/web/04-01-2025/{html,image}/``, 51 HTML + 100
images; the writer is absent from the snapshot).

Engine treatment: media are opaque ``BinaryType`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The image/audio codecs are not in
this container, so the decode step is STUBBED: ``decode_image_batch``
raises ``NotImplementedError`` unless a deterministic fake decoder is
injected — tests exercise the real Spark plumbing (schema, batching,
partitioning) with the fake.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table

ASSET_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


_EXT_MEDIA_TYPE = {
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "gif": "image/gif",
    "wav": "audio/wav",
    "mp3": "audio/mpeg",
    "mp4": "video/mp4",
    "html": "text/html",
    "htm": "text/html",
    "pdf": "application/pdf",
}


def land_binary_assets(
    spark: SparkSession, assets_dir: str, glob: str | None = None
) -> DataFrame:
    """REAL raw-object landing via ``spark.read.format('binaryFile')``
    (the reference's bronze raw dump: ``minio/data/bronze/web/
    04-01-2025/{html,image}/``, 51 HTML + 100 images). Produces
    ASSET_SCHEMA rows: media type from the file extension, a stable
    64-bit doc_id from the file path hash, content as an opaque binary
    column. The binaryFile source parallelizes by file and prunes the
    ``content`` column when only metadata is selected."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(assets_dir)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    media_map = F.create_map(
        *[F.lit(x) for kv in _EXT_MEDIA_TYPE.items() for x in kv]
    )
    return raw.select(
        F.xxhash64("path").alias("doc_id"),
        F.coalesce(media_map[ext], F.lit("application/octet-stream")).alias(
            "media_type"
        ),
        "content",
        F.col("length").alias("n_bytes"),
    )


_MEDIA_TYPE_EXT = {v: k for k, v in reversed(_EXT_MEDIA_TYPE.items())}


def write_binary_objects(assets: DataFrame, out_dir: str) -> int:
    """Raw-object sink: the inverse of :func:`land_binary_assets` — each
    ASSET_SCHEMA row becomes one object file named
    ``<media-kind>/<doc_id>.<ext>`` (the reference's bronze raw dump
    layout, ``minio/data/bronze/web/04-01-2025/{html,image}/``).
    Runs as ``foreachPartition`` so each task streams its rows straight
    to storage (no driver collect); on an object store the same loop
    does put_object per row. Returns the number of objects written."""
    import os

    def write_partition(rows) -> None:
        for row in rows:
            media = row.media_type or "application/octet-stream"
            ext = _MEDIA_TYPE_EXT.get(media, "bin")
            kind = media.split("/", 1)[0]
            d = os.path.join(out_dir, kind)
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{row.doc_id}.{ext}"), "wb") as fh:
                fh.write(bytes(row.content or b""))

    assets.foreachPartition(write_partition)
    import glob

    return len(glob.glob(os.path.join(out_dir, "*", "*")))


def assets_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a binary-asset table from documents (UTF-8 payloads
    standing in for image/audio bytes; in production this is a
    ``spark.read.format('binaryFile')`` landing of the raw-object dump)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )


@register(
    "q_binary_meta",
    oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                    WHEN doc_id % 3 = 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS content_sha
        FROM documents
    """,
    doc="Typed metadata over opaque binary columns (multimodal landing"
    " shape: bronze/web raw-object dump as BinaryType + metadata)."
    " Hash/length run JVM-side on the binary column; at 100 TB this is"
    " the dedup/integrity pass over a binaryFile-format scan.",
)
def q_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = assets_table(spark, sf_dir)
    return assets.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.sha2("content", 256).alias("content_sha"),
    )


# decoder: bytes -> (width, height, channels); injectable for tests
DecodeFn = Callable[[bytes], tuple[int, int, int]]


def _require_real_decoder(content: bytes) -> tuple[int, int, int]:
    raise NotImplementedError(
        "Real image decoding requires an image codec (e.g. Pillow), which"
        " is not available in this environment. Inject a decode_fn"
        " (tests use fake_decode) or install a codec in production."
    )


def fake_decode(content: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in decoder: derive plausible dimensions from a
    content hash (stable across runs/partitions)."""
    h = int.from_bytes(hashlib.md5(content or b"").digest()[:8], "big")
    return (64 + h % 512, 64 + (h >> 16) % 512, 3)


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("byte_histogram", ArrayType(LongType())),
    ]
)


def media_features(
    df: DataFrame, decode_fn: DecodeFn = _require_real_decoder, bins: int = 16
) -> DataFrame:
    """Decode + feature-extract media binaries via mapInPandas: per-asset
    dimensions (decoder) and a 16-bin byte histogram (pure numpy). The
    Arrow batch shape keeps bytes off the Python heap until needed; at
    100 TB, repartition(n) bounds per-task decode memory."""

    def feat_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode_fn(c) for c in pdf["content"]]
            hists = [
                np.histogram(
                    np.frombuffer(c or b"", dtype=np.uint8), bins=bins, range=(0, 256)
                )[0].astype(np.int64).tolist()
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": pdf["media_type"].values,
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                    "byte_histogram": hists,
                }
            )

    return df.mapInPandas(feat_map, schema=FEATURE_SCHEMA)


@register(
    "q_media_features",
    oracle=None,  # decoder is a stub; plumbing checked rows-only + pytest
    doc="Media decode + feature extraction over binary columns via"
    " Arrow-batched mapInPandas (fake decoder injected — real codecs"
    " absent in this container; see media_features()). Schema,"
    " batching and partitioning are the production shape.",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_features(assets_table(spark, sf_dir), decode_fn=fake_decode)


def frame_sample(
    df: DataFrame, n_frames: int = 4, frame_bytes: int = 256
) -> DataFrame:
    """Frame-sampling stub for video binaries: emit n_frames evenly-spaced
    byte windows per asset as (doc_id, frame_idx, frame_stub). Real frame
    extraction would decode via a video codec inside the same mapInPandas
    shape; the slicing here is deterministic plumbing."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_stub", BinaryType()),
        ]
    )

    def frames_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                blob = bytes(content or b"")
                stride = max(len(blob) // n_frames, 1)
                for i in range(n_frames):
                    rows.append((doc_id, i, blob[i * stride : i * stride + frame_bytes]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_stub"])

    return df.mapInPandas(frames_map, schema=schema)

"""Raw binary-asset ingestion via Spark's built-in ``binaryFile`` source.

The front door of the multimodal path: image/audio/video assets arrive
as FILES (an object-store prefix of .jpg/.wav/.mp4), not as rows.
``spark.read.format("binaryFile")`` turns that listing into the
(path, modificationTime, length, content) frame the
``operators/multimodal`` pipeline consumes — executor-side file reads,
no driver IO, partitioned by Spark's normal file-split planning (one
task per file group; binary files never split mid-file).

Scale contract:
- the LISTING is the driver-side cost (same as any file source); at
  100 TB with millions of assets, point the reader at partitioned
  prefixes (``.../dt=2024-01-01/``) so each incremental run lists one
  partition, not the bucket.
- ``maxBytesPerFile`` guards the single-file blowup: one 40 GB video
  in a batch of thumbnails would otherwise pin an executor; oversized
  assets route to the quarantine frame for a dedicated pipeline.
- content bytes stay opaque (SURVEY §multimodal: decode is a
  mapInPandas seam) — this module only standardizes the envelope:
  a stable ``asset_id`` (md5 of path — reproducible across relistings,
  unlike modificationTime), the media kind from the extension, and the
  raw payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: extension → coarse media kind; anything else is "other" (kept, not
#: dropped — an unknown extension is a routing decision, not an error)
_KIND = {
    "jpg": "image", "jpeg": "image", "png": "image", "bmp": "image",
    "gif": "image", "webp": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio", "ogg": "audio",
    "mp4": "video", "mkv": "video", "webm": "video", "avi": "video",
}


def read_binary_assets(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """List-and-read a prefix of binary assets into the standard
    envelope: (asset_id, path, media_kind, length, mod_time, content).

    ``glob`` narrows the listing server-side (``pathGlobFilter`` —
    files that don't match are never opened); ``recursive`` walks
    nested prefixes without requiring partition-style directory names.
    """
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recursive).lower())
    )
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    kind_map = F.create_map(
        *[F.lit(x) for kv in _KIND.items() for x in kv]
    )
    return raw.select(
        F.md5(F.col("path")).alias("asset_id"),
        "path",
        F.coalesce(kind_map[ext], F.lit("other")).alias("media_kind"),
        "length",
        F.col("modificationTime").alias("mod_time"),
        "content",
    )


def split_oversized(
    assets: DataFrame, max_bytes: int
) -> tuple[DataFrame, DataFrame]:
    """(in_band, oversized) split on payload size — the guard that
    keeps one multi-GB asset from pinning an executor in a batch of
    small ones.  Both halves keep the full envelope; the oversized
    frame is the input to a dedicated large-asset pipeline (chunked
    reads, different batch shape), not a discard.
    """
    in_band = assets.where(F.col("length") <= max_bytes)
    oversized = assets.where(F.col("length") > max_bytes)
    return in_band, oversized


def assets_as_documents(assets: DataFrame) -> DataFrame:
    """Adapt the asset envelope to the multimodal operators' input
    contract (id + content): a stable long id derived from the md5
    asset_id (15 nibbles — strictly positive in a signed 64-bit long,
    the ``functions.hashing.h60`` convention) plus the opaque payload.
    """
    return assets.select(
        F.conv(F.substring("asset_id", 1, 15), 16, 10)
        .cast("long")
        .alias("doc_id"),
        "media_kind",
        "content",
    )

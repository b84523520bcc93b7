"""Multimodal column plumbing: opaque binary + typed metadata.

Image/audio/video payloads are carried as opaque ``binary`` columns with
typed metadata extracted by Arrow-batched ``mapInPandas`` — the Spark
pattern for per-blob Python work: whole Arrow record batches cross the
JVM↔Python boundary (no per-row pickling), partitions stream batch by
batch, and the output schema is declared up front so Catalyst can plan
downstream.

The actual codec work (image decode / resize / frame sampling) is
STUBBED: the container has no image/audio libraries. ``decode_real`` is
the clearly-marked extension point; ``decode_binary_metadata`` performs
a deterministic md5-derived *fake* decode so the plumbing — schema,
batching, partitioning, UDF signature — is real and oracle-testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: Output schema of the metadata extractor — declared explicitly so the
#: plan has stable types (SURVEY §1.3: no inferred schemas).
METADATA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("content_hash_prefix", T.StringType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
        T.StructField("fake_channels", T.LongType()),
    ]
)


def decode_real(payload: bytes) -> dict:
    """Real codec hook (image/audio decode). Not available here.

    In production: PIL/av/soundfile decode, dimension extraction,
    resizing, frame sampling. The container ships none of these, so the
    engine exposes the seam and fails loudly if invoked.
    """
    raise NotImplementedError(
        "codec libraries (PIL/av) are not installed in this environment; "
        "use decode_binary_metadata's deterministic fake decode instead"
    )


def _fake_decode(payload: bytes) -> tuple[str, int, int, int]:
    """Deterministic fake decode: md5-derived dimensions.

    Same md5 the SQL engines compute over the source text, so the DuckDB
    oracle can reproduce the values exactly (md5 of UTF-8 bytes == md5
    of the VARCHAR in DuckDB).
    """
    h = hashlib.md5(payload).hexdigest()
    return (
        h[:8],
        320 + int(h[0:4], 16) % 1600,
        240 + int(h[4:8], 16) % 1200,
        1 + int(h[8:10], 16) % 3,
    )


def decode_binary_metadata(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "content"
) -> DataFrame:
    """Extract typed metadata from an opaque binary column.

    Arrow-batched ``mapInPandas``: each partition streams in as pandas
    batches; Python touches only the two input columns (prune before
    calling this at scale). Output schema is METADATA_SCHEMA.
    """
    import pandas as pd

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = pdf[bin_col]
            decoded = [_fake_decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": payloads.map(len).astype("int64"),
                    "content_hash_prefix": [d[0] for d in decoded],
                    "fake_width": pd.Series([d[1] for d in decoded], dtype="int64"),
                    "fake_height": pd.Series([d[2] for d in decoded], dtype="int64"),
                    "fake_channels": pd.Series([d[3] for d in decoded], dtype="int64"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(extract, METADATA_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_width", T.LongType()),
        T.StructField("out_height", T.LongType()),
        T.StructField("thumbnail", T.BinaryType()),
    ]
)


def resize_binary(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    bin_col: str = "content",
) -> DataFrame:
    """Thumbnail/resize plumbing over opaque image bytes.

    Real path (stubbed — see :func:`decode_real`): decode → resample to
    (width, height) → re-encode. The deterministic fake emits an
    md5-keyed placeholder payload so batch shape, schema and
    distribution are real and testable. Binary in/binary out keeps the
    payload Arrow-batched end to end.
    """
    import pandas as pd

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = pdf[bin_col]
            thumbs = [
                hashlib.md5(bytes(p) + f":{width}x{height}".encode()).digest()
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "out_width": pd.Series([width] * len(pdf), dtype="int64"),
                    "out_height": pd.Series([height] * len(pdf), dtype="int64"),
                    "thumbnail": thumbs,
                }
            )

    return df.select(id_col, bin_col).mapInPandas(resize, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_hash", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    stride: int = 4,
    id_col: str = "doc_id",
    bin_col: str = "content",
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame.

    The fake "video" has ``8 + md5[10:12] % 8`` frames; every
    ``stride``-th frame is emitted with a deterministic per-frame hash
    (``md5(payload ':' idx)``), so a SQL oracle can reproduce the exact
    fan-out. Real decode (av/ffmpeg) plugs in at :func:`decode_real`.
    One input row → many output rows inside the same Arrow batch — the
    explode stays in Python, the schema stays declared.
    """
    import pandas as pd

    def frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            hashes: list[str] = []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(payload)
                n_frames = 8 + int(hashlib.md5(raw).hexdigest()[10:12], 16) % 8
                for i in range(0, n_frames, stride):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    hashes.append(
                        hashlib.md5(raw + b":" + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_hash": hashes,
                }
            )

    return df.select(id_col, bin_col).mapInPandas(frames, FRAME_SCHEMA)

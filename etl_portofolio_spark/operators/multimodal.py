"""Multimodal column plumbing: opaque binary + typed metadata.

Image/audio/video payloads are carried as opaque ``binary`` columns with
typed metadata extracted by Arrow-batched ``mapInPandas`` — the Spark
pattern for per-blob Python work: whole Arrow record batches cross the
JVM↔Python boundary (no per-row pickling), partitions stream batch by
batch, and the output schema is declared up front so Catalyst can plan
downstream.

Two decode tiers:

- **Real header decode** (:func:`decode_container_metadata`): PNG /
  GIF / BMP / WAV container headers are parsed for real with
  stdlib-only codecs (operators/codecs.py) — signature sniffing,
  big/little-endian struct unpacks, RIFF chunk walking. No external
  libraries needed.
- **Stubbed pixel/sample decode** (:func:`decode_real`): anything
  needing an actual image/audio library (JPEG entropy decode,
  resampling) fails loudly; ``decode_binary_metadata`` keeps the
  original deterministic md5-derived *fake* decode so the plumbing —
  schema, batching, partitioning, UDF signature — stays testable
  against formats the real parser doesn't cover.
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
    """Real COMPRESSED-codec decode.

    Baseline-sequential JPEG (SOF0, 8-bit Huffman) is decoded FOR REAL
    by the repo's own pure-Python codec
    (:mod:`operators.jpeg_baseline` — segment parse, entropy decode,
    dequantize, IDCT, chroma upsample, YCbCr->RGB), round-trip-tested
    against its paired encoder.  Uncompressed formats were already
    real (`codecs.decode_bmp_pixels`, `codecs.decode_wav_samples`,
    `codecs.resize_bmp`).  Anything else that genuinely needs external
    codec libraries (video, lossy audio, progressive JPEG) still fails
    loudly — per the seam policy, never a silent fake.
    """
    if payload[:2] == b"\xff\xd8":
        from etl_portofolio_spark.operators.jpeg_baseline import decode_jpeg

        h, w, n, px = decode_jpeg(payload)
        return {
            "width": w,
            "height": h,
            "channels": n,
            "pixels": px,
        }
    raise NotImplementedError(
        "codec libraries (av/soundfile) are not installed here; real "
        "decode covers baseline JPEG (operators/jpeg_baseline.py) and "
        "the uncompressed formats (operators/codecs.py) — video and "
        "lossy audio bitstreams still fail loudly"
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


CONTAINER_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def synthesize_containers(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministically build REAL media containers per row.

    Format by ``id % 4`` (png/gif/bmp/wav); dimensions / audio params
    derived from md5(text) so a SQL oracle can predict what got
    embedded. The payloads are spec-valid files (operators/codecs.py),
    not hash blobs — a downstream real parser must recover the params
    from the bytes alone. (id, binary) out, Arrow-batched.
    """
    import pandas as pd

    from etl_portofolio_spark.operators import codecs

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("content", T.BinaryType())]
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = []
            for doc_id, txt in zip(pdf[id_col], pdf[text_col]):
                h = hashlib.md5(txt.encode("utf-8")).hexdigest()
                w = 1 + int(h[0:4], 16) % 64
                ht = 1 + int(h[4:8], 16) % 48
                kind = int(doc_id) % 4
                if kind == 0:
                    color_type = (0, 2, 6)[int(h[8:10], 16) % 3]
                    payloads.append(codecs.make_png(w, ht, color_type))
                elif kind == 1:
                    payloads.append(codecs.make_gif(w, ht))
                elif kind == 2:
                    payloads.append(codecs.make_bmp(w, ht))
                else:
                    channels = 1 + int(h[8:10], 16) % 2
                    rate = 8000 + (int(h[10:14], 16) % 8) * 4000
                    n_samples = 1 + int(h[14:18], 16) % 256
                    payloads.append(codecs.make_wav(rate, channels, n_samples))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "content": payloads}
            )

    return df.select(id_col, text_col).mapInPandas(gen, schema)


def decode_container_metadata(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "content"
) -> DataFrame:
    """REAL container decode: parse PNG/GIF/BMP/WAV headers from bytes.

    Arrow-batched ``mapInPandas`` over :func:`codecs.parse_container` —
    actual signature sniffing and struct unpacking, no hash tricks.
    Unknown formats yield ``format='unknown'`` with NULL fields rather
    than failing the batch (corrupt blobs are data, not errors, at
    100 TB). Output schema is CONTAINER_SCHEMA.
    """
    import pandas as pd

    from etl_portofolio_spark.operators.codecs import parse_container

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            meta = [parse_container(bytes(p)) for p in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "format": [m["format"] for m in meta],
                    "width": pd.Series([m["width"] for m in meta], dtype="Int64"),
                    "height": pd.Series([m["height"] for m in meta], dtype="Int64"),
                    "channels": pd.Series([m["channels"] for m in meta], dtype="Int64"),
                    "sample_rate": pd.Series(
                        [m["sample_rate"] for m in meta], dtype="Int64"
                    ),
                    "n_samples": pd.Series(
                        [m["n_samples"] for m in meta], dtype="Int64"
                    ),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(extract, CONTAINER_SCHEMA)


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


# --- REAL content decode: BMP pixels / WAV PCM samples ------------------------

PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_units", T.LongType()),
        T.StructField("level", T.DoubleType()),
    ]
)


def _filled_payload(doc_id: int, txt: str) -> bytes:
    """One document's md5-derived BMP (even ids) or WAV (odd ids)
    payload. Shared by the standalone synthesizer and the fused
    synthesize+stats operator so both emit byte-identical streams."""
    from etl_portofolio_spark.operators import codecs

    h = hashlib.md5(txt.encode("utf-8")).hexdigest()
    if int(doc_id) % 2 == 0:
        w = 1 + int(h[0:4], 16) % 64
        ht = 1 + int(h[4:8], 16) % 48
        fill = int(h[18:20], 16)
        return codecs.make_bmp(w, ht, fill=fill)
    channels = 1 + int(h[8:10], 16) % 2
    n_samples = 1 + int(h[14:18], 16) % 256
    sample = int(h[18:22], 16) % 2001 - 1000
    return codecs.make_wav(8000, channels, n_samples, sample_value=sample)


def _pixel_stats_tuple(payload: bytes) -> tuple[str, int | None, float | None]:
    """(kind, n_units, level) of one decoded payload — the per-doc body
    of :func:`pixel_sample_stats`, shared with the fused operator."""
    import numpy as np

    from etl_portofolio_spark.operators import codecs

    try:
        if payload[:2] == b"BM":
            w, h, px = codecs.decode_bmp_pixels(payload)
            arr = np.frombuffer(px, dtype=np.uint8)
            return "bmp", int(arr.size), float(np.mean(arr.astype(np.float64)))
        if payload[:4] == b"RIFF":
            rate, ch, samples = codecs.decode_wav_samples(payload)
            arr = np.asarray(samples, dtype=np.float64)
            return "wav", int(arr.size), float(np.sqrt(np.mean(arr * arr)))
    except ValueError:
        pass
    return "unknown", None, None


def synthesize_filled_media(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """BMP/WAV payloads whose CONTENT (not just headers) is md5-derived:
    every pixel byte / PCM sample carries a value computed from the
    text hash. A downstream decoder must recover that value from the
    raw bytes — through the BMP row stride and the WAV chunk walk — so
    content-level decode bugs are observable, not just header bugs."""
    import pandas as pd

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("content", T.BinaryType())]
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = [
                _filled_payload(doc_id, txt)
                for doc_id, txt in zip(pdf[id_col], pdf[text_col])
            ]
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "content": payloads}
            )

    return df.select(id_col, text_col).mapInPandas(gen, schema)


def synthesize_filled_pixel_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fused synthesize->decode->stats: mathematically identical to
    ``pixel_sample_stats(synthesize_filled_media(df))`` (same two
    per-doc helpers), but in ONE Arrow-batched mapInPandas — the
    chained form ships every BMP/WAV payload across the JVM<->Python
    boundary twice, while here the payload lives and dies inside one
    worker and only (doc_id, text) in and four narrow stats columns out
    ever cross. Guide §4: pass the Python boundary the columns the
    function needs, nothing else."""
    import pandas as pd

    def gen_stats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "kind": [], "n_units": [], "level": []}
            for doc_id, txt in zip(pdf[id_col], pdf[text_col]):
                kind, n_units, level = _pixel_stats_tuple(
                    _filled_payload(doc_id, txt)
                )
                out["doc_id"].append(int(doc_id))
                out["kind"].append(kind)
                out["n_units"].append(n_units)
                out["level"].append(level)
            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(gen_stats, PIXEL_STATS_SCHEMA)


def pixel_sample_stats(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "content"
) -> DataFrame:
    """REAL content statistics from raw media bytes: mean pixel level
    for 24bpp BMP (padding-stripped, numpy over the decoded rows) and
    PCM RMS for 16-bit WAV (numpy over the frame array). Arrow-batched
    mapInPandas; undecodable payloads degrade to kind='unknown' rows,
    never failing the batch."""
    import pandas as pd

    def stats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "kind": [], "n_units": [], "level": []}
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                kind, n_units, level = _pixel_stats_tuple(bytes(payload))
                out["doc_id"].append(int(doc_id))
                out["kind"].append(kind)
                out["n_units"].append(n_units)
                out["level"].append(level)
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(stats, PIXEL_STATS_SCHEMA)


AUDIO_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("win_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sumsq", T.LongType()),
    ]
)


def synthesize_ramp_audio(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic ramp-WAV payloads keyed on the id alone:
    seed = id, n_samples = 1 + (id·37) % 300 — fully recomputable in
    SQL, so content-level decode checks need no side channel."""
    import pandas as pd

    from etl_portofolio_spark.operators import codecs

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("content", T.BinaryType())]
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "content": [
                        codecs.make_wav_ramp(8000, 1 + (int(i) * 37) % 300, int(i))
                        for i in ids
                    ],
                }
            )

    return df.select(id_col).mapInPandas(gen, schema)


def audio_window_energy(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "content",
    window: int = 64,
) -> DataFrame:
    """Windowed audio energy from raw WAV bytes: per ``window``-sample
    frame, the sample count and the EXACT integer sum of squares
    (int64 — RMS is the caller's one division, so nothing floats and
    the result is bit-stable at any scale). Arrow-batched mapInPandas,
    numpy int64 kernels; the per-window fan-out happens inside the
    worker (each payload yields n/window rows), so no Spark-side
    explode of sample-level rows ever exists."""
    import numpy as np
    import pandas as pd

    from etl_portofolio_spark.operators import codecs

    def energy(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "win_id": [], "n_samples": [], "sumsq": []
            }
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                _, _, samples = codecs.decode_wav_samples(bytes(payload))
                arr = np.asarray(samples, dtype=np.int64)
                for w in range(0, len(arr), window):
                    chunk = arr[w : w + window]
                    out["doc_id"].append(int(doc_id))
                    out["win_id"].append(w // window)
                    out["n_samples"].append(int(chunk.size))
                    out["sumsq"].append(int(np.sum(chunk * chunk)))
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(energy, AUDIO_ENERGY_SCHEMA)


# --- baseline-JPEG content decode ---------------------------------------------

#: Deterministic constant-color JPEG synthesis parameters: the palette
#: formula and quality ladder are restated by the DuckDB oracle (via the
#: committed decoded-RGB lookup in plans/round11_queries.py), so the
#: decoded pixel statistics are arithmetically checkable from md5(text).
JPEG_QUALITIES = (35, 50, 75, 90)


def jpeg_palette(idx: int) -> tuple[int, int, int]:
    """64-color integer palette: idx -> (r, g, b), all three channels
    distinct so the chroma planes carry nonzero DC coefficients and the
    decode exercises dequantization + YCbCr->RGB for real (a constant
    GRAY fill round-trips exactly at q>=35 and would prove much less)."""
    return ((idx * 37 + 11) % 256, (idx * 101 + 73) % 256, (idx * 197 + 151) % 256)


JPEG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("sum_level", T.LongType()),
    ]
)


def _jpeg_payload_from_text(txt: str) -> bytes:
    """One document's synthesized constant-color JPEG payload: palette,
    quality and dimensions from md5(text) nibbles, encoded by the repo's
    pure-Python encoder. Shared by the standalone synthesizer and the
    fused synthesize+decode operator so both emit byte-identical
    streams."""
    import numpy as np

    from etl_portofolio_spark.operators.jpeg_baseline import encode_jpeg

    h = hashlib.md5(txt.encode("utf-8")).hexdigest()
    r, g, b = jpeg_palette(int(h[0:2], 16) % 64)
    quality = JPEG_QUALITIES[int(h[2:4], 16) % 4]
    w = 5 + int(h[4:6], 16) % 44
    ht = 5 + int(h[6:8], 16) % 28
    img = np.empty((ht, w, 3), dtype=np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = r, g, b
    return encode_jpeg(img, quality=quality)


def _jpeg_stats_tuple(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, n_pixels, sum_level) of one REAL-decoded payload.
    Shared by the standalone stats operator and the fused operator."""
    import numpy as np

    dec = decode_real(payload)
    arr = np.frombuffer(dec["pixels"], dtype=np.uint8)
    return (
        int(dec["width"]),
        int(dec["height"]),
        int(arr.size),
        int(arr.astype(np.int64).sum()),
    )


def synthesize_jpeg_media(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Baseline-JPEG payloads (SOF0, 4:4:4, Huffman) whose content is a
    CONSTANT color tile derived from md5(text): palette index, quality,
    and dimensions all come from hash nibbles, encoded by the repo's own
    pure-Python encoder (operators/jpeg_baseline.py). Constant fill is
    the one content class whose DECODED pixels are exactly predictable
    (all DCT blocks identical, AC coefficients quantize to zero), so a
    SQL oracle can verify the decoder's output bit-for-bit without
    replaying the IDCT. Dimensions are deliberately NOT multiples of 8
    so the decode also exercises MCU padding + crop."""
    import pandas as pd

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("content", T.BinaryType())]
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = [_jpeg_payload_from_text(txt) for txt in pdf[text_col]]
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "content": payloads}
            )

    return df.select(id_col, text_col).mapInPandas(gen, schema)


def synthesize_jpeg_pixel_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fused synthesize->decode->stats: mathematically identical to
    ``jpeg_pixel_stats(synthesize_jpeg_media(df))`` (same two per-doc
    helpers), but in ONE Arrow-batched mapInPandas — the chained form
    ships every multi-KB JPEG payload across the JVM<->Python boundary
    twice (Python->JVM out of the synthesizer, JVM->Python into the
    decoder; chained mapInPandas stages never fuse), while here the
    payload lives and dies inside one worker and only (doc_id, text) in
    and five int64 stats out ever cross. Guide §4: pass the Python
    boundary the columns the function needs, nothing else."""
    import pandas as pd

    def gen_stats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "width": [], "height": [], "n_pixels": [], "sum_level": []
            }
            for doc_id, txt in zip(pdf[id_col], pdf[text_col]):
                w, ht, n_px, s = _jpeg_stats_tuple(_jpeg_payload_from_text(txt))
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(ht)
                out["n_pixels"].append(n_px)
                out["sum_level"].append(s)
            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(gen_stats, JPEG_STATS_SCHEMA)


def jpeg_pixel_stats(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "content"
) -> DataFrame:
    """REAL baseline-JPEG content decode over an opaque binary column:
    segment parse, Huffman entropy decode, dequantize, IDCT, YCbCr->RGB
    (operators/jpeg_baseline.decode_jpeg via multimodal.decode_real),
    reduced to exact integer pixel statistics — dimensions from the SOF0
    header, n_pixels from the cropped plane, sum_level as the int64 sum
    of every decoded RGB byte. Arrow-batched mapInPandas, map-only: at
    100 TB this is a scan-shaped stage with zero shuffle."""
    import pandas as pd

    def stats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "width": [], "height": [], "n_pixels": [], "sum_level": []
            }
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                w, ht, n_px, s = _jpeg_stats_tuple(bytes(payload))
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(ht)
                out["n_pixels"].append(n_px)
                out["sum_level"].append(s)
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(stats, JPEG_STATS_SCHEMA)

"""Baseline JPEG codec: round-trip accuracy, error paths, and the
executor-side decode plumbing through mapInPandas.

The decoder is the product seam (multimodal.decode_real); the paired
encoder exists because this container has no PIL to make fixtures.
Round-trip bounds are loose on purpose (JPEG is lossy) except where
the math is exact: a flat image is DC-only and must reconstruct
exactly at any quality.
"""

from __future__ import annotations

import numpy as np
import pytest

from etl_portofolio_spark.operators.jpeg_baseline import (
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 5 + y * 3) % 256).astype(np.uint8)


def test_flat_image_roundtrips_exactly():
    img = np.full((16, 16), 128, dtype=np.uint8)
    h, w, n, px = decode_jpeg(encode_jpeg(img, quality=50))
    assert (h, w, n) == (16, 16, 1)
    assert int(np.max(np.abs(px.astype(int) - 128))) == 0


def test_gradient_grayscale_close():
    img = _gradient(24, 40)
    h, w, n, px = decode_jpeg(encode_jpeg(img, quality=95))
    assert (h, w, n) == (24, 40, 1)
    assert float(np.mean(np.abs(px.astype(int) - img.astype(int)))) < 1.0


def test_rgb_and_non_multiple_of_8_dims():
    img = np.zeros((20, 30, 3), dtype=np.uint8)
    img[..., 0] = _gradient(20, 30)
    img[..., 1] = 255 - _gradient(20, 30)
    img[..., 2] = 77
    h, w, n, px = decode_jpeg(encode_jpeg(img, quality=90))
    assert (h, w, n) == (20, 30, 3)
    assert px.shape == (20, 30, 3)
    assert float(np.mean(np.abs(px.astype(int) - img.astype(int)))) < 3.0


def test_quality_100_near_lossless():
    img = _gradient(24, 40)
    _, _, _, px = decode_jpeg(encode_jpeg(img, quality=100))
    assert float(np.mean(np.abs(px.astype(int) - img.astype(int)))) < 0.05


def test_non_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)


def test_progressive_rejected_loudly():
    # minimal stream: SOI + SOF2 header -> must refuse, not mis-decode
    import struct

    sof2 = b"\xff\xc2" + struct.pack(">H", 11) + bytes(
        [8, 0, 8, 0, 8, 1, 1, 0x11, 0]
    )
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(b"\xff\xd8" + sof2 + b"\xff\xd9")


def test_truncated_entropy_rejected():
    img = _gradient(16, 16)
    data = encode_jpeg(img, quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) // 2])


def test_decode_real_dispatches_jpeg_and_fails_loudly_otherwise():
    from etl_portofolio_spark.operators.multimodal import decode_real

    img = _gradient(16, 24)
    meta = decode_real(encode_jpeg(img, quality=90))
    assert (meta["height"], meta["width"], meta["channels"]) == (16, 24, 1)
    assert meta["pixels"].shape == (16, 24)
    with pytest.raises(NotImplementedError):
        decode_real(b"\x00\x00\x00\x20ftypisom" + b"\x00" * 16)  # MP4


def test_executor_side_jpeg_decode_via_map_in_pandas(spark):
    """The codec runs where it will at scale: inside Arrow-batched
    mapInPandas workers, binary column in, typed metadata out."""
    import pandas as pd
    from pyspark.sql import types as T

    rows = [
        (i, encode_jpeg(_gradient(8 * (i + 1), 16), quality=90))
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, "img_id long, content binary")
    schema = T.StructType(
        [
            T.StructField("img_id", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("width", T.LongType()),
            T.StructField("channels", T.LongType()),
        ]
    )

    def decode(batches):
        from etl_portofolio_spark.operators.jpeg_baseline import decode_jpeg

        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                h, w, n, _px = decode_jpeg(bytes(r["content"]))
                out.append((int(r["img_id"]), h, w, n))
            yield pd.DataFrame(
                out, columns=["img_id", "height", "width", "channels"]
            )

    got = {
        r["img_id"]: (r["height"], r["width"], r["channels"])
        for r in df.mapInPandas(decode, schema).collect()
    }
    assert got == {0: (8, 16, 1), 1: (16, 16, 1), 2: (24, 16, 1)}

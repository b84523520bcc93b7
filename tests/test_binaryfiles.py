"""binaryFile ingestion: file-prefix listing → multimodal pipeline input.

Real container payloads (the stdlib codecs from ``operators/codecs``)
land on disk as files; the source must list, classify, guard and adapt
them into the frame ``operators/multimodal`` consumes — executor-side
reads, stable ids, no driver IO on the content path.
"""

from __future__ import annotations

import pytest

from etl_portofolio_spark.operators import codecs, multimodal
from etl_portofolio_spark.sources import binaryfiles


@pytest.fixture(scope="module")
def asset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("assets")
    (root / "img").mkdir()
    (root / "snd").mkdir()
    (root / "img" / "a.bmp").write_bytes(codecs.make_bmp(8, 6))
    (root / "img" / "b.png").write_bytes(codecs.make_png(4, 4))
    (root / "img" / "c.jpeg").write_bytes(codecs.make_jpeg(10, 2))
    (root / "snd" / "d.wav").write_bytes(codecs.make_wav(8000, 1, 64))
    (root / "snd" / "notes.txt").write_bytes(b"not a media file")
    return str(root)


def test_listing_classifies_and_keys_assets(spark, asset_dir):
    assets = binaryfiles.read_binary_assets(spark, asset_dir)
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in assets.collect()}
    assert set(rows) == {"a.bmp", "b.png", "c.jpeg", "d.wav", "notes.txt"}
    assert rows["a.bmp"]["media_kind"] == "image"
    assert rows["d.wav"]["media_kind"] == "audio"
    assert rows["notes.txt"]["media_kind"] == "other"
    # payload integrity end-to-end and length from the listing
    assert bytes(rows["a.bmp"]["content"]) == codecs.make_bmp(8, 6)
    assert rows["b.png"]["length"] == len(codecs.make_png(4, 4))
    # asset ids are md5(path): 32 hex chars, all distinct
    ids = {r["asset_id"] for r in rows.values()}
    assert len(ids) == 5 and all(len(i) == 32 for i in ids)


def test_glob_filters_server_side(spark, asset_dir):
    imgs = binaryfiles.read_binary_assets(spark, asset_dir, glob="*.bmp")
    assert [r["media_kind"] for r in imgs.collect()] == ["image"]


def test_oversized_guard_routes_not_drops(spark, asset_dir):
    assets = binaryfiles.read_binary_assets(spark, asset_dir)
    small, big = binaryfiles.split_oversized(assets, max_bytes=150)
    n_small, n_big = small.count(), big.count()
    assert n_small + n_big == 5
    assert n_big >= 1  # the 8x6 BMP (198 bytes) routes to the big lane
    assert all(r["length"] > 150 for r in big.collect())


def test_assets_feed_the_multimodal_pipeline(spark, asset_dir):
    """The adapted frame flows straight into the container decoder —
    the contract that makes binaryFile the multimodal front door."""
    docs = binaryfiles.assets_as_documents(
        binaryfiles.read_binary_assets(spark, asset_dir, glob="*.{bmp,png,wav,jpeg}")
    )
    assert docs.schema["doc_id"].dataType.simpleString() == "bigint"
    meta = {
        r["format"]: r
        for r in multimodal.decode_container_metadata(docs).collect()
    }
    assert meta["bmp"]["width"] == 8 and meta["bmp"]["height"] == 6
    assert meta["png"]["width"] == 4
    assert meta["wav"]["sample_rate"] == 8000 and meta["wav"]["n_samples"] == 64
    # ids are strictly positive longs (h60 convention)
    assert all(r["doc_id"] > 0 for r in docs.collect())

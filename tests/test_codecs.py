"""Container codec round-trips: the parser must recover exactly what
the writers embedded, from the bytes alone — plus structural validity
checks on the emitted files (magic numbers, CRCs, chunk sizes)."""

from __future__ import annotations

import struct
import zlib

import pytest

from etl_portofolio_spark.operators import codecs


def test_png_roundtrip_and_crc():
    for color_type, channels in ((0, 1), (2, 3), (6, 4)):
        payload = codecs.make_png(13, 7, color_type)
        meta = codecs.parse_container(payload)
        assert meta["format"] == "png"
        assert (meta["width"], meta["height"], meta["channels"]) == (13, 7, channels)
        # IHDR CRC must be a real CRC32 over tag+data
        ihdr_crc = struct.unpack(">I", payload[29:33])[0]
        assert ihdr_crc == zlib.crc32(payload[12:29]) & 0xFFFFFFFF
        # IDAT decompresses to height * (1 + width*channels) filter+pixel bytes
        idat_len = struct.unpack(">I", payload[33:37])[0]
        raw = zlib.decompress(payload[41 : 41 + idat_len])
        assert len(raw) == 7 * (1 + 13 * channels)


def test_gif_roundtrip():
    payload = codecs.make_gif(640, 480)
    assert payload[:6] == b"GIF89a" and payload[-1:] == b"\x3b"
    meta = codecs.parse_container(payload)
    assert (meta["format"], meta["width"], meta["height"]) == ("gif", 640, 480)


def test_bmp_roundtrip_and_declared_size():
    payload = codecs.make_bmp(31, 9)  # odd width exercises row padding
    meta = codecs.parse_container(payload)
    assert (meta["format"], meta["width"], meta["height"], meta["channels"]) == (
        "bmp", 31, 9, 3,
    )
    declared = struct.unpack("<I", payload[2:6])[0]
    assert declared == len(payload)


def test_wav_roundtrip_chunk_walk():
    payload = codecs.make_wav(16000, 2, 123)
    meta = codecs.parse_container(payload)
    assert meta["format"] == "wav"
    assert meta["sample_rate"] == 16000
    assert meta["channels"] == 2
    assert meta["n_samples"] == 123
    declared = struct.unpack("<I", payload[4:8])[0]
    assert declared == len(payload) - 8


def test_wav_parser_skips_foreign_chunks():
    # a LIST chunk before fmt/data must be walked over, not break parsing
    base = codecs.make_wav(8000, 1, 4)
    injected = base[:12] + b"LIST" + struct.pack("<I", 4) + b"INFO" + base[12:]
    fixed = injected[:4] + struct.pack("<I", len(injected) - 8) + injected[8:]
    meta = codecs.parse_container(fixed)
    assert meta["format"] == "wav" and meta["n_samples"] == 4


def test_jpeg_roundtrip_and_segment_walk():
    for channels in (1, 3):
        payload = codecs.make_jpeg(320, 200, channels)
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        meta = codecs.parse_container(payload)
        assert (meta["format"], meta["width"], meta["height"], meta["channels"]) == (
            "jpeg", 320, 200, channels,
        )
    # a COM segment before SOF0 must be walked over, not break parsing
    base = codecs.make_jpeg(64, 48)
    com = b"\xff\xfe" + struct.pack(">H", 2 + 5) + b"hello"
    injected = base[:2] + com + base[2:]
    meta = codecs.parse_container(injected)
    assert (meta["format"], meta["width"], meta["height"]) == ("jpeg", 64, 48)
    # truncated: SOI + APP0 marker only -> unknown, no raise
    assert codecs.parse_container(base[:4])["format"] == "unknown"


def test_unknown_bytes_are_unknown():
    meta = codecs.parse_container(b"\x00\x01\x02not a container")
    assert meta["format"] == "unknown"
    assert meta["width"] is None and meta["sample_rate"] is None


def test_truncated_payloads_parse_as_unknown():
    """Bytes that pass the signature sniff but are cut short must yield
    format='unknown', not raise — one bad blob must never kill a whole
    mapInPandas batch (ADVICE r2)."""
    full_wav = codecs.make_wav(8000, 1, 4)
    truncated = [
        b"GIF89a",                      # bare GIF signature, no descriptor
        b"GIF89a\x10",                  # half a screen descriptor
        codecs.make_png(4, 4)[:20],     # PNG sig + IHDR tag, cut before w/h
        codecs.make_png(4, 4)[:25],     # cut mid-IHDR (w/h ok, no color type)
        full_wav[:20],                  # RIFF/WAVE + fmt tag, truncated body
        # fmt chunk whose declared size exceeds the remaining buffer
        full_wav[:12] + b"fmt " + struct.pack("<I", 64) + b"\x00" * 8,
    ]
    for payload in truncated:
        meta = codecs.parse_container(payload)
        assert meta["format"] == "unknown", payload[:16]
        assert meta["width"] is None and meta["n_samples"] is None


def test_bmp_pixel_decode_strips_stride_padding():
    # odd width -> 1-byte row padding; fill must survive, padding must not
    payload = codecs.make_bmp(5, 3, fill=201)
    w, h, px = codecs.decode_bmp_pixels(payload)
    assert (w, h) == (5, 3)
    assert len(px) == 5 * 3 * 3
    assert set(px) == {201}  # any 0 here means padding leaked into pixels
    with pytest.raises(ValueError):
        codecs.decode_bmp_pixels(payload[:40])  # truncated pixel data
    with pytest.raises(ValueError):
        codecs.decode_bmp_pixels(b"\x00" * 60)  # not a BMP


def test_wav_sample_decode_recovers_signed_values():
    payload = codecs.make_wav(16000, 2, 7, sample_value=-12345)
    rate, ch, samples = codecs.decode_wav_samples(payload)
    assert (rate, ch) == (16000, 2)
    assert len(samples) == 14 and set(samples) == {-12345}
    with pytest.raises(ValueError):
        codecs.decode_wav_samples(b"RIFF\x00\x00\x00\x00WAVE")  # no chunks


def test_resize_bmp_real_nearest_neighbor():
    src = codecs.make_bmp(8, 4, fill=90)
    out = codecs.resize_bmp(src, 3, 2)
    meta = codecs.parse_container(out)
    assert (meta["format"], meta["width"], meta["height"]) == ("bmp", 3, 2)
    w, h, px = codecs.decode_bmp_pixels(out)
    assert (w, h) == (3, 2) and set(px) == {90}
    # upscale round-trip preserves the constant fill too
    up = codecs.resize_bmp(out, 10, 10)
    _, _, px_up = codecs.decode_bmp_pixels(up)
    assert set(px_up) == {90} and len(px_up) == 300
    with pytest.raises(ValueError):
        codecs.resize_bmp(src, 0, 5)

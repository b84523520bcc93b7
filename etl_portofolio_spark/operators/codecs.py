"""Real container codecs, stdlib-only: PNG / GIF / BMP / WAV.

No image/audio libraries ship in this environment, but the *container
formats* themselves are simple enough to read and write with ``struct``
and ``zlib`` — so the multimodal metadata path can do a REAL decode
(signature sniffing + header/chunk parsing of well-formed files)
instead of a hash-derived fake. Pixel/sample processing beyond headers
(JPEG entropy decode, resampling) still lives behind
:func:`etl_portofolio_spark.operators.multimodal.decode_real`.

Writers emit minimal but spec-valid files:

- PNG: signature + IHDR (CRC'd) + IDAT (zlib'd zero scanlines) + IEND.
- GIF: GIF89a header + logical screen descriptor + 2-color global
  color table + image descriptor + minimal LZW stream + trailer.
- BMP: BITMAPFILEHEADER + BITMAPINFOHEADER (24bpp, 4-byte row padding).
- WAV: RIFF/WAVE with canonical ``fmt `` and ``data`` chunks (PCM).

The parser is the real thing for these formats: it unpacks the actual
header fields (big-endian IHDR, little-endian LSD/DIB/fmt) and walks
RIFF chunks — it does not trust anything derived from the payload hash.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> sample channels (grayscale, RGB, gray+alpha, RGBA)
PNG_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def make_png(width: int, height: int, color_type: int = 2) -> bytes:
    """Valid 8-bit PNG of the given dims: zero-filled scanlines."""
    channels = PNG_COLOR_CHANNELS[color_type]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(width * channels) for _ in range(height))
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def make_gif(width: int, height: int) -> bytes:
    """Valid GIF89a: screen descriptor + 2-color table + 1 image."""
    screen = struct.pack("<HHBBB", width, height, 0x80, 0, 0)
    gct = bytes(6)  # two RGB entries
    image = (
        b"\x2c"
        + struct.pack("<HHHHB", 0, 0, width, height, 0)
        + b"\x02\x02\x44\x01\x00"  # min code size 2, clear+end stream
    )
    return b"GIF89a" + screen + gct + image + b"\x3b"


def make_bmp(width: int, height: int, fill: int = 0) -> bytes:
    """Valid 24bpp bottom-up BMP (BITMAPINFOHEADER). Pixel bytes carry
    ``fill``; the per-row alignment padding stays zero — a correct
    pixel decoder must skip the padding, so a non-zero fill makes
    stride bugs measurable."""
    row_px = width * 3
    row = (row_px + 3) & ~3
    data_size = row * height
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + data_size, 0, 0, 14 + 40)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    scanline = bytes([fill & 0xFF]) * row_px + bytes(row - row_px)
    return header + info + scanline * height


def make_wav(
    sample_rate: int,
    channels: int,
    n_samples: int,
    bits: int = 16,
    sample_value: int = 0,
) -> bytes:
    """Valid PCM WAV: RIFF/WAVE + fmt + data. Every sample carries
    ``sample_value`` (16-bit signed LE) — silence by default."""
    block = channels * bits // 8
    if sample_value and bits == 16:
        data = struct.pack("<h", sample_value) * (n_samples * channels)
    else:
        data = bytes(n_samples * block)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


#: JPEG SOFn markers that carry frame dimensions (C4=DHT, C8=JPG ext,
#: CC=DAC are NOT frame headers and are excluded per ITU T.81)
_JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def make_jpeg(width: int, height: int, channels: int = 3) -> bytes:
    """Structurally valid JPEG header stream: SOI + JFIF APP0 + SOF0 +
    EOI. Carries real frame dimensions in a spec-correct segment walk;
    contains no entropy-coded data (header-level validity only — this
    repo's codec layer parses containers, it does not decode pixels)."""
    app0 = b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    sof_comps = b"".join(
        struct.pack(">BBB", i + 1, 0x11, 0) for i in range(channels)
    )
    sof = struct.pack(">BHHB", 8, height, width, channels) + sof_comps
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
        + b"\xff\xd9"
    )


def parse_container(payload: bytes) -> dict:
    """Sniff + parse a PNG/GIF/BMP/WAV payload's real header fields.

    Returns ``{format, width, height, channels, sample_rate,
    n_samples}`` with ``None`` for fields the format lacks, and
    ``format='unknown'`` (all None) for unrecognized bytes. This reads
    the actual on-disk structures — IHDR ints are big-endian, GIF/BMP/
    RIFF little-endian, WAV via a proper chunk walk — so it works on
    files produced by any writer, not just the ones above.
    """
    out: dict = {
        "format": "unknown",
        "width": None,
        "height": None,
        "channels": None,
        "sample_rate": None,
        "n_samples": None,
    }
    try:
        return _parse_container_strict(payload, out)
    except (struct.error, IndexError):
        # Truncated payload that passed the signature sniff (bare
        # b"GIF89a", a PNG cut before IHDR byte 24, a WAV fmt chunk
        # shorter than its declared size): corrupt bytes must yield
        # format='unknown', never kill the surrounding Arrow batch.
        return {
            "format": "unknown",
            "width": None,
            "height": None,
            "channels": None,
            "sample_rate": None,
            "n_samples": None,
        }


def _parse_container_strict(payload: bytes, out: dict) -> dict:
    if payload.startswith(PNG_SIG) and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        color_type = payload[25]
        out.update(
            format="png", width=w, height=h,
            channels=PNG_COLOR_CHANNELS.get(color_type),
        )
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        out.update(format="gif", width=w, height=h, channels=3)
    elif payload[:2] == b"BM" and len(payload) >= 30:
        w, h = struct.unpack("<ii", payload[18:26])
        bpp = struct.unpack("<H", payload[28:30])[0]
        out.update(format="bmp", width=w, height=abs(h), channels=bpp // 8)
    elif payload[:2] == b"\xff\xd8":
        # JPEG: walk marker segments to the first SOFn frame header.
        # Big-endian lengths INCLUDE the 2 length bytes; SOS/EOI end
        # the metadata region (entropy data follows SOS).
        pos = 2
        while pos + 4 <= len(payload) and payload[pos] == 0xFF:
            marker = payload[pos + 1]
            if marker in (0xD9, 0xDA):  # EOI / SOS
                break
            seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
            if marker in _JPEG_SOF_MARKERS:
                h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
                out.update(
                    format="jpeg", width=w, height=h,
                    channels=payload[pos + 9],
                )
                break
            pos += 2 + seg_len
    elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        pos = 12
        channels = rate = bits = data_len = None
        while pos + 8 <= len(payload):
            tag = payload[pos : pos + 4]
            size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
            if tag == b"fmt " and size >= 16:
                _, channels, rate, _, _, bits = struct.unpack(
                    "<HHIIHH", payload[pos + 8 : pos + 24]
                )
            elif tag == b"data":
                data_len = size
            pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
        if channels and bits and data_len is not None:
            out.update(
                format="wav",
                channels=channels,
                sample_rate=rate,
                n_samples=data_len // (channels * (bits // 8)),
            )
    return out


def decode_bmp_pixels(payload: bytes):
    """REAL pixel decode for uncompressed 24bpp BMP: honor the header's
    data offset, per-row 4-byte alignment stride, and bottom-up row
    order. Returns (width, height, pixel_bytes) where pixel_bytes is
    the h*w*3 BGR bytes in top-down row order, padding stripped.
    Raises ValueError on non-BMP / compressed / non-24bpp input."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP")
    data_offset = struct.unpack("<I", payload[10:14])[0]
    w, h = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    compression = struct.unpack("<I", payload[30:34])[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = h > 0
    h = abs(h)
    row_px = w * 3
    stride = (row_px + 3) & ~3
    rows = []
    for r in range(h):
        src_row = (h - 1 - r) if bottom_up else r
        start = data_offset + src_row * stride
        row = payload[start : start + row_px]
        if len(row) != row_px:
            raise ValueError("truncated BMP pixel data")
        rows.append(row)
    return w, h, b"".join(rows)


def decode_wav_samples(payload: bytes):
    """REAL sample decode for 16-bit PCM WAV: chunk-walk to ``data``,
    unpack little-endian int16 frames. Returns (sample_rate, channels,
    samples) with samples a flat tuple of ints (frame-major). Raises
    ValueError on non-WAV / non-16-bit input."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, channels, rate, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        if tag == b"fmt " and size >= 16:
            _, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[pos + 8 : pos + 24]
            )
        elif tag == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if not channels or bits != 16 or data is None:
        raise ValueError("unsupported WAV (need fmt + data, 16-bit PCM)")
    n = len(data) // 2
    return rate, channels, struct.unpack(f"<{n}h", data[: n * 2])


def resize_bmp(payload: bytes, new_w: int, new_h: int) -> bytes:
    """REAL nearest-neighbor resample of a 24bpp BMP: decode the pixel
    rows (stride/orientation-aware), index-sample into the new grid,
    re-encode a spec-valid BMP. Pure stdlib byte work — the resize
    path for uncompressed images needs no codec library."""
    if new_w < 1 or new_h < 1:
        raise ValueError("target dimensions must be >= 1")
    w, h, px = decode_bmp_pixels(payload)
    src_rows = [px[r * w * 3 : (r + 1) * w * 3] for r in range(h)]
    out_rows = []
    for r in range(new_h):
        sr = src_rows[r * h // new_h]
        row = bytearray()
        for c in range(new_w):
            sc = c * w // new_w
            row += sr[sc * 3 : sc * 3 + 3]
        out_rows.append(bytes(row))
    # re-encode: reuse the writer's header layout, bottom-up rows
    stride = (new_w * 3 + 3) & ~3
    pad = bytes(stride - new_w * 3)
    data = b"".join(row + pad for row in reversed(out_rows))
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 14 + 40)
    info = struct.pack(
        "<IiiHHIIiiII", 40, new_w, new_h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + info + data


def make_wav_ramp(sample_rate: int, n_samples: int, seed: int) -> bytes:
    """Mono 16-bit PCM WAV whose sample i is ``((seed+i) % 2001) - 1000``
    — a deterministic ramp, so a decoder must recover not just the
    sample COUNT but the exact sample ORDER (constant-fill payloads
    can't catch byte-order or offset bugs; a ramp can)."""
    data = struct.pack(
        f"<{n_samples}h", *(((seed + i) % 2001) - 1000 for i in range(n_samples))
    )
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body

"""Pure-Python baseline-sequential JPEG codec (ITU-T T.81 subset).

Retires the compressed-codec ``NotImplementedError`` seam in
``operators/multimodal.py`` for the one compressed format the fixture
pipeline actually needs: baseline DCT JPEG (SOF0, 8-bit, Huffman).  No
external libraries — stdlib ``struct`` + numpy for the 8x8 transforms.

Decoder (`decode_jpeg`) is the product path: parses DQT/SOF0/DHT/
DRI/SOS, entropy-decodes the interleaved MCU scan (byte unstuffing,
restart markers, DC prediction), dequantizes, inverse-zigzags, IDCTs,
upsamples subsampled chroma (factors 1-2), and converts YCbCr->RGB.
Huffman tables come from the bitstream's DHT segments, so the decoder
is not coupled to the encoder's table choice.

Encoder (`encode_jpeg`) exists to BUILD fixtures (this container has no
PIL to make test JPEGs): 4:4:4, quality-scaled Annex-K quantization
tables, and deliberately simple VALID Huffman tables (all DC symbols at
4 bits, all AC symbols at 8 bits — canonical, all-ones codeword unused
as T.81 requires).  Compression ratio is irrelevant for fixtures;
validity and exact round-trip behavior are what the tests pin.

Scale note: this codec runs INSIDE Arrow-batched ``mapInPandas``
workers (operators/multimodal.py) — per-blob Python work on executor
partitions, never on the driver.
"""

from __future__ import annotations

import functools
import struct

try:
    import numpy as np
except ImportError:  # pragma: no cover - numpy ships in this env
    np = None

# --- constants ---------------------------------------------------------------

#: Annex-K luminance/chrominance base quantization tables (zigzag order
#: is NOT used here; these are in natural row-major order).
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

#: Zigzag scan order: ZIGZAG[i] = natural index of the i-th zigzag coeff.
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


_DCTM = None


def _dct_matrix():
    """8x8 orthonormal DCT-II matrix (a constant — computed once per
    process; rebuilding it dominated short decodes)."""
    global _DCTM
    if _DCTM is not None:
        return _DCTM
    c = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            c[k, n] = np.cos((2 * n + 1) * k * np.pi / 16.0)
    c *= 0.5
    c[0, :] *= 1.0 / np.sqrt(2.0)
    _DCTM = c
    return c


# --- Huffman -----------------------------------------------------------------


class _HuffTable:
    """Canonical Huffman table: (length, code) per symbol, plus a
    decode map from (length, code) -> symbol."""

    def __init__(self, bits: list[int], values: list[int]):
        # bits[i] = number of codes of length i+1 (16 entries)
        if len(bits) != 16:
            raise ValueError("DHT BITS must have 16 entries")
        if sum(bits) != len(values):
            raise ValueError("DHT symbol count mismatch")
        self.encode: dict[int, tuple[int, int]] = {}
        self.decode: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                sym = values[k]
                self.encode[sym] = (length, code)
                self.decode[(length, code)] = sym
                code += 1
                k += 1
            code <<= 1


@functools.lru_cache(maxsize=64)
def _huff_table_cached(bits: tuple[int, ...], values: tuple[int, ...]) -> _HuffTable:
    """Memoized canonical-table construction keyed on the DHT payload
    itself — a pure function of the segment bytes (decoding a stream of
    same-table JPEGs otherwise rebuilds identical 174-symbol tables per
    image). Instances are read-only after __init__, so sharing is safe."""
    return _HuffTable(list(bits), list(values))


#: Encoder tables: deliberately simple, VALID canonical tables.
#: DC: 12 category symbols, all 4 bits (code 15 = all-ones unused).
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALUES = list(range(12))
#: AC: EOB, ZRL and (run<<4)|size for run 0-15 / size 1-10 -> 162
#: symbols, all 8 bits (codes 0..161; all-ones 255 unused).
_ENC_AC_VALUES = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, length: int, code: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._n -= 8
            self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write(pad, (1 << pad) - 1)  # pad with 1-bits


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing and RSTn
    awareness (``restart()`` skips the marker and byte-aligns)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _next_byte(self) -> int:
        while True:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                m = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if m == 0x00:
                    self.pos += 1
                    return 0xFF
                # a real marker: signal end of entropy data
                self.pos -= 1
                raise _MarkerReached()
            return b

    def read_bit(self) -> int:
        if self._n == 0:
            self._acc = self._next_byte()
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self._n = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("expected RSTn marker at restart interval")


class _MarkerReached(Exception):
    pass


def _decode_huff(reader: _BitReader, table: _HuffTable) -> int:
    length = 0
    code = 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.decode.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map ``size``-bit magnitude bits to a signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    """Bit-size category of a signed DCT value."""
    a = abs(v)
    size = 0
    while a:
        a >>= 1
        size += 1
    return size


# --- decoder ----------------------------------------------------------------


def decode_jpeg(data: bytes):
    """Decode a baseline-sequential JPEG.

    Returns ``(height, width, n_components, pixels)`` with ``pixels`` a
    ``uint8`` numpy array of shape (h, w) for grayscale or (h, w, 3)
    RGB.  Raises ``ValueError`` on non-baseline (progressive SOF2,
    arithmetic coding, 12-bit) streams — loudly, per the repo's seam
    policy.
    """
    if np is None:  # pragma: no cover
        raise NotImplementedError("numpy required for JPEG decode")
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        seg_len = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    qtables[tq] = list(seg[p : p + 64])
                    p += 64
                else:  # 16-bit table
                    qtables[tq] = [
                        struct.unpack(">H", seg[p + 2 * i : p + 2 * i + 2])[0]
                        for i in range(64)
                    ]
                    p += 128
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = tuple(seg[p + 1 : p + 17])
                n = sum(bits)
                values = tuple(seg[p + 17 : p + 17 + n])
                htables[(tc, th)] = _huff_table_cached(bits, values)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) not supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tda = seg[1 + 2 * i : 3 + 2 * i]
                scan.append({"cs": cs, "td": tda >> 4, "ta": tda & 0x0F})
            return _decode_scan(
                data,
                pos + seg_len,
                frame,
                scan,
                qtables,
                htables,
                restart_interval,
            )
        pos += seg_len
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    dctm = _dct_matrix()
    # per-component coefficient planes (in 8x8 block units)
    planes = {}
    for c in comps:
        bw, bh = mcus_x * c["h"], mcus_y * c["v"]
        planes[c["id"]] = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    by_id = {s["cs"]: s for s in scan}
    reader = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    try:
        _decode_mcus(
            reader, comps, by_id, htables, qtables, planes,
            mcus_x, mcus_y, restart_interval, pred, dctm,
        )
    except _MarkerReached:
        raise ValueError("JPEG entropy data ended before the MCU grid")
    # assemble components at full resolution
    out_planes = []
    for c in comps:
        p = planes[c["id"]] + 128.0
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(
                np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return h, w, 1, gray
    y, cb, cr = out_planes[0], out_planes[1], out_planes[2]
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.round(ch), 0, 255).astype(np.uint8) for ch in (r, g, b)],
        axis=-1,
    )
    return h, w, 3, rgb


def _decode_mcus(
    reader, comps, by_id, htables, qtables, planes,
    mcus_x, mcus_y, restart_interval, pred, dctm,
):
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                s = by_id[c["id"]]
                dc_t = htables.get((0, s["td"]))
                ac_t = htables.get((1, s["ta"]))
                q = qtables[c["tq"]]
                if dc_t is None or ac_t is None:
                    raise ValueError("scan references missing DHT table")
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        block = _decode_block(reader, dc_t, ac_t, q, pred, c["id"])
                        px = dctm.T @ block @ dctm  # IDCT
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1


def _decode_block(reader, dc_t, ac_t, q, pred, cid):
    # zigzag-order coefficients in a plain Python list: int scalar
    # stores are ~4x cheaper than per-element numpy assignments, and
    # the single fancy-indexed store below converts int->float64
    # exactly (values bounded far below 2**53)
    zz = [0] * 64
    size = _decode_huff(reader, dc_t)
    diff = _extend(reader.read_bits(size), size) if size else 0
    pred[cid] += diff
    zz[0] = pred[cid] * q[0]
    k = 1
    while k < 64:
        rs = _decode_huff(reader, ac_t)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(reader.read_bits(size), size) * q[k]
        k += 1
    block = np.zeros(64, dtype=np.float64)
    block[ZIGZAG] = zz  # inverse zigzag (q tables stored in zigzag order)
    return block.reshape(8, 8)


# --- encoder ----------------------------------------------------------------


def _scaled_quant(base: list[int], quality: int) -> list[int]:
    """libjpeg-style quality scaling of a base table (natural order in,
    zigzag order OUT — DQT/encode/decode all use zigzag storage)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    nat = [min(255, max(1, (b * scale + 50) // 100)) for b in base]
    return [nat[ZIGZAG[i]] for i in range(64)]


def encode_jpeg(pixels, quality: int = 90) -> bytes:
    """Encode a uint8 array — (h, w) grayscale or (h, w, 3) RGB — as a
    baseline 4:4:4 JPEG.  Fixture builder for the decoder's tests."""
    if np is None:  # pragma: no cover
        raise NotImplementedError("numpy required for JPEG encode")
    arr = np.asarray(pixels)
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise ValueError("pixels must be uint8 (h,w) or (h,w,3)")
    h, w = arr.shape[:2]
    if arr.ndim == 2:
        comps = [arr.astype(np.float64)]
    else:
        r = arr[..., 0].astype(np.float64)
        g = arr[..., 1].astype(np.float64)
        b = arr[..., 2].astype(np.float64)
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    q_luma = _scaled_quant(QUANT_LUMA, quality)
    q_chroma = _scaled_quant(QUANT_CHROMA, quality)
    dc_t = _huff_table_cached(tuple(_ENC_DC_BITS), tuple(_ENC_DC_VALUES))
    ac_t = _huff_table_cached(tuple(_ENC_AC_BITS), tuple(_ENC_AC_VALUES))
    dctm = _dct_matrix()

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 JFIF
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    # DQT (zigzag order per spec)
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x00]) + bytes(q_luma)
    n_comp = len(comps)
    if n_comp == 3:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x01]) + bytes(q_chroma)
    # SOF0
    sof = bytearray(struct.pack(">BHHB", 8, h, w, n_comp))
    for i in range(n_comp):
        sof += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT: same simple tables for both classes/ids used
    for tc_th, (bits, values) in (
        (0x00, (_ENC_DC_BITS, _ENC_DC_VALUES)),
        (0x10, (_ENC_AC_BITS, _ENC_AC_VALUES)),
        (0x01, (_ENC_DC_BITS, _ENC_DC_VALUES)),
        (0x11, (_ENC_AC_BITS, _ENC_AC_VALUES)),
    ):
        if n_comp == 1 and tc_th in (0x01, 0x11):
            continue
        payload = bytes([tc_th]) + bytes(bits) + bytes(values)
        out += b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload
    # SOS
    sos = bytearray([n_comp])
    for i in range(n_comp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    # entropy-coded data: pad to 8-multiples by edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    nby, nbx = ph // 8, pw // 8
    writer = _BitWriter()
    pred = [0] * n_comp
    zigzag_idx = np.asarray(ZIGZAG)
    # Forward DCT + quantization for ALL blocks of a plane in one
    # batched numpy expression (the per-block 64-element Python
    # comprehension was the encoder's hot loop). np.round and the old
    # int(round(float64)) are both round-half-even over the identical
    # float64 quotient, so every quantized coefficient is bit-identical
    # to the scalar loop's.
    zz_planes = []
    for ci, plane in enumerate(comps):
        p = np.empty((ph, pw))
        p[:h, :w] = plane
        p[h:, :w] = plane[h - 1 : h, :]
        p[:, w:] = p[:, w - 1 : w]
        p -= 128.0
        qv = np.asarray(q_luma if ci == 0 else q_chroma, dtype=np.float64)
        blocks = p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        coef = dctm @ blocks @ dctm.T  # broadcasts over the block grid
        zz = np.round(coef.reshape(nby, nbx, 64)[..., zigzag_idx] / qv)
        zz = zz.astype(np.int64)
        # AC size categories top out at 10 (|v| <= 1023) in the
        # emitted tables — clamp, as real encoders do at q=1
        zz[..., 1:] = np.clip(zz[..., 1:], -1023, 1023)
        zz_planes.append(zz)
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(n_comp):
                _encode_block(writer, zz_planes[ci][by, bx], pred, ci, dc_t, ac_t)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_block(writer, zz, pred, ci, dc_t, ac_t):
    zzl = zz.tolist()  # one bulk conversion; the loop below sees plain ints
    diff = zzl[0] - pred[ci]
    pred[ci] = zzl[0]
    size = _category(diff)
    length, code = dc_t.encode[size]
    writer.write(length, code)
    if size:
        v = diff if diff >= 0 else diff + (1 << size) - 1
        writer.write(size, v)
    # visit only the NONZERO AC positions (run lengths fall out of the
    # index gaps) instead of scanning all 63 coefficients per block —
    # for the near-empty blocks quantization produces, this is the
    # difference between 63 iterations and 0
    nz = (np.nonzero(zz[1:])[0] + 1).tolist()
    prev = 0
    for k in nz:
        run = k - prev - 1
        while run > 15:
            length, code = ac_t.encode[0xF0]  # ZRL
            writer.write(length, code)
            run -= 16
        v = zzl[k]
        size = _category(v)
        length, code = ac_t.encode[(run << 4) | size]
        writer.write(length, code)
        bits_v = v if v >= 0 else v + (1 << size) - 1
        writer.write(size, bits_v)
        prev = k
    if not nz or nz[-1] < 63:
        length, code = ac_t.encode[0x00]  # EOB
        writer.write(length, code)

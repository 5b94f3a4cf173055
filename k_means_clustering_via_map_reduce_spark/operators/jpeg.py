"""Baseline JPEG (ITU-T T.81) — a REAL, dependency-free encoder/decoder
pair for 8-bit grayscale, closing the compressed-image half of the
multimodal codec boundary the same way round 4 closed PNG: the engine
synthesizes valid compressed bytes itself, then decodes them for real
(marker walk → huffman entropy decode → dequantize → inverse DCT →
level shift), so a byte-offset, bit-reader, table, or transform bug
anywhere in the chain is observable.

Scope (and the honest boundary that remains): baseline sequential DCT,
8-bit, grayscale AND 3-component YCbCr 4:2:0 color (interleaved MCUs,
both Annex K quant tables, all four Annex K huffman tables, BT.601
full-range color transform). Progressive / arithmetic coding and
WebP/AVIF stay out of scope. Pure numpy float64 DCT via an orthonormal
matrix product: deterministic across partitions and runs (same
BLAS-free einsum path), which is what the golden-hash pin requires.

Reference: the format itself is public (ITU-T T.81, Annex K tables);
the reference repo has no media surface at all (SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Tables
# ---------------------------------------------------------------------------

# Quantization: an all-ones table makes quantization error = DCT float
# rounding only (≤1 per pixel after the round trip) — the exactness
# anchor the tests pin. STD_LUMA is the conventional Annex K table for
# realistic compression ratios.
Q_ONES = np.ones((8, 8), dtype=np.int32)
STD_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# Annex K.1 Table K.2 — the conventional chroma quantization table.
STD_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# Annex K huffman specs: (BITS counts per code length 1..16, HUFFVAL).
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


# Annex K.3.3.2 chroma huffman specs.
_DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_VALS_C = list(range(12))
_AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _build_codes(bits, vals):
    """(BITS, HUFFVAL) → {symbol: (code, length)} per T.81 C.2."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_ENC = _build_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _build_codes(_AC_BITS, _AC_VALS)


def _build_decode(bits, vals):
    """(BITS, HUFFVAL) → {(length, code): symbol} for the bit-reader."""
    out = {}
    for sym, (code, length) in _build_codes(bits, vals).items():
        out[(length, code)] = sym
    return out


_DC_DEC = _build_decode(_DC_BITS, _DC_VALS)
_AC_DEC = _build_decode(_AC_BITS, _AC_VALS)
_DC_ENC_C = _build_codes(_DC_BITS_C, _DC_VALS_C)
_AC_ENC_C = _build_codes(_AC_BITS_C, _AC_VALS_C)

# Orthonormal DCT-II matrix (float64): coeffs = C @ x @ C.T.
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            # Stuffed zero follows a literal FF in entropy data.
            assert self.data[self.pos] == 0x00, "unexpected marker in scan"
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huffman(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")


def _receive_extend(r: _BitReader, cat: int) -> int:
    if cat == 0:
        return 0
    v = r.bits(cat)
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _marker(mk: int, payload: bytes) -> bytes:
    return bytes([0xFF, mk]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dht_payload(cls_id: int, bits, vals) -> bytes:
    return bytes([cls_id]) + bytes(bits) + bytes(vals)


def _encode_block(bw, block, qt, dc_enc, ac_enc, prev_dc: int) -> int:
    """DCT → quantize → zigzag → huffman one level-shifted 8×8 block;
    returns the new DC predictor. Shared by the gray and color paths —
    byte-for-byte the original grayscale emission."""
    coeffs = _C @ block @ _C.T
    q = np.round(coeffs / qt).astype(np.int64).flatten()[_ZIGZAG]
    diff = int(q[0]) - prev_dc
    prev_dc = int(q[0])
    cat = _category(diff)
    code, length = dc_enc[cat]
    bw.write(code, length)
    if cat:
        bw.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)
    run = 0
    for i in range(1, 64):
        v = int(q[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_enc[0xF0]  # ZRL
            bw.write(zc, zl)
            run -= 16
        cat = _category(v)
        ac, al = ac_enc[(run << 4) | cat]
        bw.write(ac, al)
        bw.write(v if v > 0 else v + (1 << cat) - 1, cat)
        run = 0
    if run:
        ec, el = ac_enc[0x00]  # EOB
        bw.write(ec, el)
    return prev_dc


def _decode_block(r, dc_dec, ac_dec, qt, prev_dc: int):
    """Huffman → dezigzag → dequantize → inverse DCT one block; returns
    (level-shifted-back float block, new DC predictor)."""
    zz = np.zeros(64, dtype=np.int64)
    cat = r.huffman(dc_dec)
    prev_dc += _receive_extend(r, cat)
    zz[0] = prev_dc
    i = 1
    while i < 64:
        sym = r.huffman(ac_dec)
        if sym == 0x00:  # EOB
            break
        run, cat = sym >> 4, sym & 0x0F
        if sym == 0xF0:  # ZRL
            i += 16
            continue
        i += run
        zz[i] = _receive_extend(r, cat)
        i += 1
    q = np.zeros(64, dtype=np.int64)
    q[_ZIGZAG] = zz
    coeffs = q.reshape(8, 8).astype(np.float64) * qt
    return _C.T @ coeffs @ _C + 128.0, prev_dc


def encode_gray(pixels: np.ndarray, qtable: np.ndarray = STD_LUMA) -> bytes:
    """Encode an (h, w) uint8 array as a baseline grayscale JPEG.
    Dimensions must be multiples of 8 (the fixtures' contract; general
    inputs would pad — padding policy is presentation, not codec)."""
    h, w = pixels.shape
    assert h % 8 == 0 and w % 8 == 0, "dimensions must be 8-aligned"
    qt = qtable.astype(np.int32)

    head = bytearray()
    head += b"\xff\xd8"  # SOI
    head += _marker(0xDB, bytes([0]) + bytes(qt.flatten()[_ZIGZAG].tolist()))
    head += _marker(
        0xC0,
        bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),  # 1 component, 1x1 sampling, qtable 0
    )
    head += _marker(0xC4, _dht_payload(0x00, _DC_BITS, _DC_VALS))
    head += _marker(0xC4, _dht_payload(0x10, _AC_BITS, _AC_VALS))
    head += _marker(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    bw = _BitWriter()
    prev_dc = 0
    shifted = pixels.astype(np.float64) - 128.0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            block = shifted[by : by + 8, bx : bx + 8]
            prev_dc = _encode_block(bw, block, qt, _DC_ENC, _AC_ENC, prev_dc)
    bw.flush()
    return bytes(head) + bytes(bw.out) + b"\xff\xd9"


def decode_gray(blob: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG produced by any encoder within
    this module's scope. Full marker walk: DQT/SOF0/DHT are READ, not
    assumed — a table or geometry mismatch raises rather than
    mis-decoding silently."""
    assert blob[:2] == b"\xff\xd8", "not a JPEG (SOI missing)"
    pos = 2
    qt = None
    h = w = None
    dc_dec = ac_dec = None
    scan_start = None
    while pos < len(blob):
        assert blob[pos] == 0xFF, "marker expected"
        mk = blob[pos + 1]
        if mk == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(blob[pos + 2 : pos + 4], "big")
        payload = blob[pos + 4 : pos + 2 + seg_len]
        if mk == 0xDB:
            assert payload[0] == 0, "single qtable id 0 supported"
            z = np.array(list(payload[1:65]), dtype=np.int32)
            qt = np.zeros(64, dtype=np.int32)
            qt[_ZIGZAG] = z
            qt = qt.reshape(8, 8)
        elif mk == 0xC0:
            assert payload[0] == 8 and payload[5] == 1, \
                "8-bit single-component baseline only"
            h = int.from_bytes(payload[1:3], "big")
            w = int.from_bytes(payload[3:5], "big")
        elif mk == 0xC4:
            cls_id = payload[0]
            bits = list(payload[1:17])
            nvals = sum(bits)
            vals = list(payload[17 : 17 + nvals])
            if cls_id >> 4 == 0:
                dc_dec = _build_decode(bits, vals)
            else:
                ac_dec = _build_decode(bits, vals)
        elif mk == 0xDA:
            scan_start = pos + 2 + seg_len
            break
        elif mk in (0xC2, 0xC1, 0xC3):
            raise NotImplementedError(
                "progressive/extended JPEG out of baseline scope"
            )
        pos += 2 + seg_len
    assert not any(
        v is None for v in (qt, h, w, dc_dec, ac_dec, scan_start)
    ), "truncated JPEG header"

    r = _BitReader(blob[scan_start : len(blob) - 2])
    out = np.zeros((h, w), dtype=np.uint8)
    prev_dc = 0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            block, prev_dc = _decode_block(r, dc_dec, ac_dec, qt, prev_dc)
            out[by : by + 8, bx : bx + 8] = np.clip(
                np.round(block), 0, 255
            ).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# Color: 3-component YCbCr, 4:2:0 subsampling, interleaved MCUs
# ---------------------------------------------------------------------------

def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF full-range BT.601 forward transform, float64 (h, w, 3)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """Exact algebraic inverse of :func:`rgb_to_ycbcr` (float64)."""
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def encode_rgb420(
    pixels: np.ndarray,
    q_luma: np.ndarray = STD_LUMA,
    q_chroma: np.ndarray = STD_CHROMA,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline 4:2:0 color
    JPEG: BT.601 to YCbCr, chroma 2×2 box-averaged, MCU = four Y blocks
    + one Cb + one Cr interleaved in T.81 scan order, per-component DC
    predictors, luma tables for Y and chroma tables for Cb/Cr.
    Dimensions must be multiples of 16 (one MCU)."""
    h, w, nc = pixels.shape
    assert nc == 3, "RGB input required"
    assert h % 16 == 0 and w % 16 == 0, "dimensions must be 16-aligned"
    ql = q_luma.astype(np.int32)
    qc = q_chroma.astype(np.int32)

    ycc = rgb_to_ycbcr(pixels.astype(np.float64))
    ys = ycc[..., 0] - 128.0
    # 4:2:0: average each 2x2 chroma neighborhood
    cbs = ycc[..., 1].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)) - 128.0
    crs = ycc[..., 2].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)) - 128.0

    head = bytearray()
    head += b"\xff\xd8"  # SOI
    head += _marker(0xDB, bytes([0]) + bytes(ql.flatten()[_ZIGZAG].tolist()))
    head += _marker(0xDB, bytes([1]) + bytes(qc.flatten()[_ZIGZAG].tolist()))
    head += _marker(
        0xC0,
        bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        # 3 components: Y id 1 sampling 2x2 qtable 0; Cb/Cr 1x1 qtable 1
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    head += _marker(0xC4, _dht_payload(0x00, _DC_BITS, _DC_VALS))
    head += _marker(0xC4, _dht_payload(0x10, _AC_BITS, _AC_VALS))
    head += _marker(0xC4, _dht_payload(0x01, _DC_BITS_C, _DC_VALS_C))
    head += _marker(0xC4, _dht_payload(0x11, _AC_BITS_C, _AC_VALS_C))
    # Y uses DC0/AC0, Cb and Cr DC1/AC1
    head += _marker(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    bw = _BitWriter()
    dc = [0, 0, 0]  # per-component predictors
    for my in range(0, h, 16):
        for mx in range(0, w, 16):
            for dy, dx in ((0, 0), (0, 8), (8, 0), (8, 8)):
                block = ys[my + dy : my + dy + 8, mx + dx : mx + dx + 8]
                dc[0] = _encode_block(bw, block, ql, _DC_ENC, _AC_ENC, dc[0])
            cy, cx = my // 2, mx // 2
            dc[1] = _encode_block(
                bw, cbs[cy : cy + 8, cx : cx + 8], qc,
                _DC_ENC_C, _AC_ENC_C, dc[1],
            )
            dc[2] = _encode_block(
                bw, crs[cy : cy + 8, cx : cx + 8], qc,
                _DC_ENC_C, _AC_ENC_C, dc[2],
            )
    bw.flush()
    return bytes(head) + bytes(bw.out) + b"\xff\xd9"


def decode_color(blob: bytes) -> np.ndarray:
    """Decode a baseline 4:2:0 YCbCr JPEG within this module's scope to
    an (h, w, 3) uint8 RGB array. The marker walk READS both quant
    tables, all four huffman tables, and the per-component sampling
    factors/table ids — a mismatch raises instead of mis-decoding."""
    assert blob[:2] == b"\xff\xd8", "not a JPEG (SOI missing)"
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    h = w = None
    comp_spec = None  # [(comp_id, sampling, qtable_id)]
    scan_spec = None  # [(comp_id, dc_id, ac_id)]
    scan_start = None
    while pos < len(blob):
        assert blob[pos] == 0xFF, "marker expected"
        mk = blob[pos + 1]
        if mk == 0xD9:
            break
        seg_len = int.from_bytes(blob[pos + 2 : pos + 4], "big")
        payload = blob[pos + 4 : pos + 2 + seg_len]
        if mk == 0xDB:
            z = np.array(list(payload[1:65]), dtype=np.int32)
            qt = np.zeros(64, dtype=np.int32)
            qt[_ZIGZAG] = z
            qts[payload[0]] = qt.reshape(8, 8)
        elif mk == 0xC0:
            assert payload[0] == 8 and payload[5] == 3, \
                "8-bit 3-component baseline only"
            h = int.from_bytes(payload[1:3], "big")
            w = int.from_bytes(payload[3:5], "big")
            comp_spec = [
                (payload[6 + 3 * i], payload[7 + 3 * i], payload[8 + 3 * i])
                for i in range(3)
            ]
        elif mk == 0xC4:
            cls_id = payload[0]
            bits = list(payload[1:17])
            vals = list(payload[17 : 17 + sum(bits)])
            (huff_dc if cls_id >> 4 == 0 else huff_ac)[cls_id & 0x0F] = (
                _build_decode(bits, vals)
            )
        elif mk == 0xDA:
            n = payload[0]
            assert n == 3, "3-component scan expected"
            scan_spec = [
                (payload[1 + 2 * i], payload[2 + 2 * i] >> 4,
                 payload[2 + 2 * i] & 0x0F)
                for i in range(3)
            ]
            scan_start = pos + 2 + seg_len
            break
        elif mk in (0xC2, 0xC1, 0xC3):
            raise NotImplementedError(
                "progressive/extended JPEG out of baseline scope"
            )
        pos += 2 + seg_len
    assert None not in (h, w, comp_spec, scan_spec, scan_start), \
        "truncated JPEG header"
    assert [s for _, s, _ in comp_spec] == [0x22, 0x11, 0x11], \
        "only 4:2:0 sampling supported"
    assert h % 16 == 0 and w % 16 == 0, "16-aligned dimensions expected"

    table_ids = {cid: (dc, ac) for cid, dc, ac in scan_spec}
    q_by_comp = [qts[q] for _, _, q in comp_spec]
    r = _BitReader(blob[scan_start : len(blob) - 2])
    ys = np.zeros((h, w))
    cbs = np.zeros((h // 2, w // 2))
    crs = np.zeros((h // 2, w // 2))
    dc = [0, 0, 0]
    for my in range(0, h, 16):
        for mx in range(0, w, 16):
            for dy, dx in ((0, 0), (0, 8), (8, 0), (8, 8)):
                d_id, a_id = table_ids[comp_spec[0][0]]
                block, dc[0] = _decode_block(
                    r, huff_dc[d_id], huff_ac[a_id], q_by_comp[0], dc[0]
                )
                ys[my + dy : my + dy + 8, mx + dx : mx + dx + 8] = block
            cy, cx = my // 2, mx // 2
            for ci, plane in ((1, cbs), (2, crs)):
                d_id, a_id = table_ids[comp_spec[ci][0]]
                block, dc[ci] = _decode_block(
                    r, huff_dc[d_id], huff_ac[a_id], q_by_comp[ci], dc[ci]
                )
                plane[cy : cy + 8, cx : cx + 8] = block
    # nearest-neighbor (2x2 replicate) chroma upsample
    cb_full = np.kron(cbs, np.ones((2, 2)))
    cr_full = np.kron(crs, np.ones((2, 2)))
    rgb = ycbcr_to_rgb(np.stack([ys, cb_full, cr_full], axis=-1))
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)

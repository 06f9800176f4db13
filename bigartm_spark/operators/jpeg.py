"""Pure-Python baseline JPEG codec (ITU-T T.81 / ISO 10918-1, public
spec) so the multimodal pipeline can decode the one remaining common
real-world image format without any image library in the container
(VERDICT r7 next-round #6).

Scope: baseline sequential DCT (SOF0/SOF1) and progressive DCT (SOF2:
spectral selection + successive approximation, DC/AC first and
refinement scans, EOB runs — T.81 G.1.2), 8-bit samples, Huffman
entropy coding, grayscale or YCbCr with sampling factors 1-2 (4:4:4 /
4:2:2 / 4:2:0), restart intervals, JFIF/EXIF APPn and COM chunks
skipped. Arithmetic coding, 12-bit, lossless and hierarchical modes
raise NotImplementedError.

The encoders (used by tests to generate inputs) write 4:4:4/4:2:0
baseline with the Annex K example quantization + Huffman tables — the
same public constants every JPEG implementation ships — and
libjpeg-style multi-scan progressive streams.

This is a correctness-first scalar/numpy implementation: the hot
per-executor path for production-scale image decode remains the
decode_fn injection point in operators/multimodal.py; this codec keeps
the Spark-side plumbing end-to-end real and testable.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------ constants

# zigzag scan order: index i of the scan -> (row, col) flattened offset
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K Table K.1 / K.2 — example quantization tables (natural order)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K Tables K.3-K.6 — the standard Huffman tables as
# (BITS[1..16], HUFFVAL) pairs
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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

# orthonormal 8-point DCT-II matrix: F = A @ f @ A.T
_A = np.zeros((8, 8))
for _k in range(8):
    _c = np.sqrt(0.5) if _k == 0 else 1.0
    for _n in range(8):
        _A[_k, _n] = 0.5 * _c * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


# ------------------------------------------------------- huffman tables


def _canonical_codes(bits, vals):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} per T.81 Annex C."""
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


def _decode_table(bits, vals):
    """(BITS, HUFFVAL) -> {(length, code): symbol} for bit-serial decode."""
    out = {}
    for sym, (code, length) in _canonical_codes(bits, vals).items():
        out[(length, code)] = sym
    return out


# -------------------------------------------------------------- bit IO


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (F.1.2.3)
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


class _BitReader:
    """Entropy-coded-segment reader: un-stuffs 0xFF00, stops at markers
    (restart markers are consumed explicitly via sync_restart)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _next_byte(self) -> int:
        d = self.data
        while True:
            if self.pos >= len(d):
                raise ValueError("JPEG entropy data truncated")
            b = d[self.pos]
            if b != 0xFF:
                self.pos += 1
                return b
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:  # stuffed 0xFF
                self.pos += 2
                return 0xFF
            # a real marker: signal end of segment to the caller
            raise _MarkerHit(self.pos)

    def read_bit(self) -> int:
        if self.nbits == 0:
            self.acc = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker")


class _MarkerHit(Exception):
    def __init__(self, pos):
        self.pos = pos


def _huff_decode(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """DIFF/AC magnitude decode (T.81 F.2.2.1 EXTEND)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# -------------------------------------------------------------- encoder


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of a base table (public
    formula: scale = 5000/q below 50 else 200-2q)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (table * scale + 50) // 100
    return np.clip(t, 1, 255)


def _quantized_blocks(
    plane: np.ndarray, q: np.ndarray, min_blocks=None
) -> np.ndarray:
    """Float plane (level-shifted) -> (BY, BX, 64) zigzag-order
    quantized DCT coefficients, edge-replicated to whole 8x8 tiles
    (and up to `min_blocks` = (BY, BX) for MCU-padded layouts). One
    vectorized DCT shared by the baseline and progressive encoders so
    both quantize identically."""
    h, w = plane.shape
    by = max(-(-h // 8), min_blocks[0] if min_blocks else 0)
    bx = max(-(-w // 8), min_blocks[1] if min_blocks else 0)
    padded = np.pad(plane, ((0, by * 8 - h), (0, bx * 8 - w)), mode="edge")
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ij,abjk,kl->abil", _A, blocks, _A.T)
    quant = np.round(coef / q.reshape(8, 8)).astype(np.int64)
    return quant.reshape(by, bx, 64)[:, :, ZIGZAG]


def _encode_block_zz(writer, zz, dctab, actab, pred, ci):
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    cat = _category(diff)
    code, length = dctab[cat]
    writer.write(code, length)
    if cat:
        v = diff if diff >= 0 else diff + (1 << cat) - 1
        writer.write(v, cat)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = actab[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        cat = _category(v)
        code, length = actab[(run << 4) | cat]
        writer.write(code, length)
        vv = v if v >= 0 else v + (1 << cat) - 1
        writer.write(vv, cat)
        run = 0
    if run:
        code, length = actab[0x00]  # EOB
        writer.write(code, length)


_SUBSAMPLING = {
    "4:4:4": (1, 1),  # luma (v, h) factors; chroma always (1, 1)
    "4:2:2": (1, 2),
    "4:2:0": (2, 2),
}


def _plane_setup(arr, gray, subsampling, quality):
    """Shared encoder front end: level-shifted planes, per-component
    (v, h) factors, quantized zigzag grids padded to whole MCUs."""
    if subsampling not in _SUBSAMPLING:
        raise ValueError("subsampling must be one of " + ", ".join(_SUBSAMPLING))
    lv, lh = (1, 1) if gray else _SUBSAMPLING[subsampling]
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64) - 128.0]
        factors = [(1, 1)]
    else:
        y, cb, cr = _rgb_to_ycbcr(arr)
        planes = [y, _downsample(cb, lv, lh), _downsample(cr, lv, lh)]
        factors = [(lv, lh), (1, 1), (1, 1)]
    qluma = _quality_scale(QUANT_LUMA, quality)
    qchroma = _quality_scale(QUANT_CHROMA, quality)
    qtabs = [qluma] if gray else [qluma, qchroma]
    mcuy = (h + 8 * lv - 1) // (8 * lv)
    mcux = (w + 8 * lh - 1) // (8 * lh)
    grids = [
        _quantized_blocks(
            p,
            qtabs[0 if ci == 0 else min(1, len(qtabs) - 1)],
            min_blocks=(mcuy * factors[ci][0], mcux * factors[ci][1]),
        )
        for ci, p in enumerate(planes)
    ]
    return grids, factors, qtabs, (mcuy, mcux)


def encode_jpeg(
    arr: np.ndarray, quality: int = 85, subsampling: str = "4:4:4"
) -> bytes:
    """(H, W, 3) uint8 RGB (or (H, W) grayscale) -> baseline JPEG
    bytes (SOF0, Annex K Huffman tables). subsampling: '4:4:4',
    '4:2:2' (horizontal chroma decimation) or '4:2:0' (box-filtered
    chroma, 2x2 luma MCUs)."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("encode_jpeg wants (H, W, 3) RGB or (H, W) gray")
    h, w = arr.shape[:2]
    grids, factors, qtabs, (mcuy, mcux) = _plane_setup(
        arr, gray, subsampling, quality
    )
    enc_dc = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
              _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    enc_ac = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
              _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]
    writer = _BitWriter()
    pred = [0] * len(grids)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, grid in enumerate(grids):
                cv, chh = factors[ci]
                t = 0 if (ci == 0 or gray) else 1
                for v in range(cv):
                    for hh in range(chh):
                        _encode_block_zz(
                            writer, grid[my * cv + v, mx * chh + hh],
                            enc_dc[t], enc_ac[t], pred, ci,
                        )
    ecs = writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, qt in enumerate(qtabs):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq)
        out += bytes(int(qt[z]) for z in ZIGZAG)  # zigzag order
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        tq = 0 if ci == 0 else 1
        hv = (factors[ci][1] << 4) | factors[ci][0]
        out += struct.pack("BBB", ci + 1, hv, tq)
    hts = [
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
    ]
    if not gray:
        hts += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in hts:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        td_ta = 0x00 if ci == 0 else 0x11
        out += struct.pack("BB", ci + 1, td_ta)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0
    out += ecs
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -------------------------------------------------- progressive encoder
#
# Multi-scan SOF2 writer (spectral selection + successive approximation)
# so the progressive decode paths are testable against real streams.
# AC scans use a flat 256-symbol Huffman table: the Annex K tables lack
# the EOBn symbols (r<<4 for r>0) progressive needs, and a canonical
# table with every symbol at 8/9 bits is the simplest valid choice
# (compression is not the point here; correctness of the scan structure
# is).

FLAT_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0]
FLAT_AC_VALS = list(range(255)) + [255]

# libjpeg's default progressive scan script (public source layout):
# (component indices, Ss, Se, Ah, Al)
_PROG_SCRIPT_COLOR = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]
_PROG_SCRIPT_GRAY = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
]


def _ac_shift(v: int, al: int) -> int:
    """AC point transform: magnitude shift toward zero (T.81 G.1.2.1)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _rgb_to_ycbcr(arr: np.ndarray) -> list[np.ndarray]:
    """uint8 RGB -> level-shifted float [Y, Cb, Cr] planes."""
    r = arr[:, :, 0].astype(np.float64)
    g = arr[:, :, 1].astype(np.float64)
    b = arr[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return [y - 128.0, cb - 128.0, cr - 128.0]


def _downsample(p: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Box-filter decimation by (fy, fx), odd edges replicated."""
    if fy == fx == 1:
        return p
    pe = np.pad(
        p, ((0, (-p.shape[0]) % fy), (0, (-p.shape[1]) % fx)), mode="edge"
    )
    return pe.reshape(
        pe.shape[0] // fy, fy, pe.shape[1] // fx, fx
    ).mean(axis=(1, 3))


def _emit_eobrun(writer, actab, eobrun: int) -> int:
    if eobrun:
        r = eobrun.bit_length() - 1
        code, length = actab[r << 4]
        writer.write(code, length)
        if r:
            writer.write(eobrun - (1 << r), r)
    return 0


def _enc_dc_scan(writer, coef_list, comp_idx, dctabs, ah, al, factors, mcu):
    """DC scan in MCU-interleaved block order (reduces to plain raster
    at 1x1 factors); factors[ci] = (v, h), mcu = (mcuy, mcux)."""
    mcuy, mcux = mcu
    blocks = []
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in comp_idx:
                cv, chh = factors[ci]
                for v in range(cv):
                    for hh in range(chh):
                        blocks.append(
                            (ci, coef_list[ci][my * cv + v, mx * chh + hh])
                        )
    if ah == 0:
        pred = {ci: 0 for ci in comp_idx}
        for ci, blk in blocks:
            v = int(blk[0]) >> al
            diff = v - pred[ci]
            pred[ci] = v
            cat = _category(diff)
            code, length = dctabs[ci][cat]
            writer.write(code, length)
            if cat:
                writer.write(
                    diff if diff >= 0 else diff + (1 << cat) - 1, cat
                )
    else:
        for ci, blk in blocks:
            writer.write((int(blk[0]) >> al) & 1, 1)


def _enc_ac_first_scan(writer, coef, actab, ss, se, al, dims=None):
    by, bx = dims or coef.shape[:2]
    eobrun = 0
    for y in range(by):
        for x in range(bx):
            zz = coef[y, x]
            vals = [_ac_shift(int(zz[k]), al) for k in range(ss, se + 1)]
            nz = [i for i, v in enumerate(vals) if v]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    eobrun = _emit_eobrun(writer, actab, eobrun)
                continue
            eobrun = _emit_eobrun(writer, actab, eobrun)
            r = 0
            for i in range(nz[-1] + 1):
                v = vals[i]
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    code, length = actab[0xF0]  # ZRL
                    writer.write(code, length)
                    r -= 16
                s = _category(v)
                code, length = actab[(r << 4) | s]
                writer.write(code, length)
                writer.write(v if v >= 0 else v + (1 << s) - 1, s)
                r = 0
            if nz[-1] < se - ss:
                eobrun = 1  # this block ends with an EOB; run may grow
    _emit_eobrun(writer, actab, eobrun)


def _enc_ac_refine_scan(writer, coef, actab, ss, se, al, dims=None):
    """Refinement scan encoder, positionally exact against the decoder's
    traversal: after each symbol, emit exactly the correction bits of
    the already-nonzero coefficients the decoder passes in that
    symbol's span (EOB runs kept per-block for simplicity)."""
    by, bx = dims or coef.shape[:2]
    for y in range(by):
        for x in range(bx):
            zz = coef[y, x]
            band = list(range(ss, se + 1))
            t = [abs(int(zz[k])) >> al for k in band]
            newly = [i for i, v in enumerate(t) if v == 1]
            pos = 0
            for target in newly:
                # decoder span: break at the (r+1)th zero-history
                # position == target; correction bits along the way
                while True:
                    zeros = [
                        i for i in range(pos, target) if t[i] == 0
                    ]
                    if len(zeros) <= 15:
                        break
                    # ZRL consumes the first 16 zero-history positions;
                    # bits for already-nonzero positions before the
                    # 16th zero travel with it
                    cut = zeros[15]
                    code, length = actab[0xF0]
                    writer.write(code, length)
                    for i in range(pos, cut):
                        if t[i] > 1:
                            writer.write(t[i] & 1, 1)
                    pos = cut + 1
                r = len([i for i in range(pos, target) if t[i] == 0])
                code, length = actab[(r << 4) | 1]
                writer.write(code, length)
                writer.write(1 if int(zz[band[target]]) > 0 else 0, 1)
                for i in range(pos, target):
                    if t[i] > 1:
                        writer.write(t[i] & 1, 1)
                pos = target + 1
            if pos <= se - ss:
                code, length = actab[0x00]  # EOB (run of 1)
                writer.write(code, length)
                for i in range(pos, se - ss + 1):
                    if t[i] > 1:
                        writer.write(t[i] & 1, 1)


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 85,
    scans=None,
    subsampling: str = "4:4:4",
) -> bytes:
    """(H, W, 3) uint8 RGB or (H, W) gray -> progressive JPEG (SOF2,
    libjpeg-style default scan script: DC first+refine, AC spectral
    bands with two successive-approximation refinements). subsampling
    as in encode_jpeg — 4:2:0 exercises the decoder's interleaved-DC /
    per-component-AC grids, the layout real-world progressive color
    files use."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("wants (H, W, 3) RGB or (H, W) gray")
    h, w = arr.shape[:2]
    coef_list, factors, qtabs, mcu = _plane_setup(
        arr, gray, subsampling, quality
    )
    enc_dc = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
              _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    flat_ac = _canonical_codes(FLAT_AC_BITS, FLAT_AC_VALS)
    dctabs = {
        ci: enc_dc[0 if ci == 0 else 1] for ci in range(len(coef_list))
    }
    hmax = max(f[1] for f in factors)
    vmax = max(f[0] for f in factors)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, qt in enumerate(qtabs):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq)
        out += bytes(int(qt[z]) for z in ZIGZAG)
    ncomp = len(coef_list)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        hv = (factors[ci][1] << 4) | factors[ci][0]
        out += struct.pack("BBB", ci + 1, hv, 0 if ci == 0 else 1)
    hts = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS),
           (0x10, FLAT_AC_BITS, FLAT_AC_VALS)]
    if not gray:
        hts.append((0x01, DC_CHROMA_BITS, DC_CHROMA_VALS))
    for tc_th, bits, vals in hts:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)

    script = scans or (_PROG_SCRIPT_GRAY if gray else _PROG_SCRIPT_COLOR)
    for comp_idx, ss, se, ah, al in script:
        ns = len(comp_idx)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for ci in comp_idx:
            td = 0 if ci == 0 else 1
            out += struct.pack("BB", ci + 1, (td << 4) | 0)
        out += struct.pack("BBB", ss, se, (ah << 4) | al)
        writer = _BitWriter()
        if ss == 0:
            _enc_dc_scan(
                writer, coef_list, comp_idx, dctabs, ah, al, factors, mcu
            )
        else:
            # AC scans are non-interleaved: the component's TRUE block
            # grid (ceil of its subsampled dims), not the MCU-padded one
            ci = comp_idx[0]
            cw = -(-w * factors[ci][1] // hmax)
            chh = -(-h * factors[ci][0] // vmax)
            dims = (-(-chh // 8), -(-cw // 8))
            if ah == 0:
                _enc_ac_first_scan(
                    writer, coef_list[ci], flat_ac, ss, se, al, dims
                )
            else:
                _enc_ac_refine_scan(
                    writer, coef_list[ci], flat_ac, ss, se, al, dims
                )
        out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline (SOF0/SOF1) or progressive (SOF2) JPEG -> (H, W, 3)
    uint8 RGB (grayscale replicated).

    Per T.81: marker parse, Huffman entropy decode with byte
    un-stuffing and restart markers; progressive spectral-selection +
    successive-approximation scans (DC first/refine, AC first/refine
    with EOB runs, T.81 G.1.2) accumulate into per-component
    coefficient arrays; then one vectorized dequant + IDCT + chroma
    upsample + YCbCr->RGB reconstruction shared with baseline.
    Arithmetic coding, 12-bit, lossless and hierarchical modes raise
    NotImplementedError."""
    d = bytes(content)
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    coefs = None
    restart_interval = 0
    scans_done = 0
    while pos + 2 <= len(d):
        if d[pos] != 0xFF:
            pos += 1
            continue
        marker = d[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
            pos += 2
            continue
        if pos + 4 > len(d):
            break
        seglen = struct.unpack_from(">H", d, pos + 2)[0]
        body = d[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    tab = np.frombuffer(
                        body, np.uint8, 64, i
                    ).astype(np.int64)
                    i += 64
                else:
                    tab = np.frombuffer(body, ">u2", 64, i).astype(np.int64)
                    i += 128
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = tab  # stored zigzag -> natural
                qtabs[tq] = nat
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                tab = _decode_table(bits, vals)
                (huff_ac if tc else huff_dc)[th] = tab
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", body, 6 + 3 * c)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {
                "h": h,
                "w": w,
                "comps": comps,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) "
                "Huffman JPEG supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for s in range(ns):
                cs, tdta = struct.unpack_from("BB", body, 1 + 2 * s)
                scan.append({"id": cs, "td": tdta >> 4, "ta": tdta & 0xF})
            ss, se, ahal = struct.unpack_from("BBB", body, 1 + 2 * ns)
            ah, al = ahal >> 4, ahal & 0xF
            if coefs is None:
                coefs = _alloc_coefs(frame)
            pos = _decode_scan(
                d, pos + 2 + seglen, frame, scan, ss, se, ah, al,
                huff_dc, huff_ac, restart_interval, coefs,
            )
            scans_done += 1
            if scans_done > 256:
                raise ValueError("JPEG has too many scans")
            continue
        pos += 2 + seglen
    if scans_done == 0:
        raise ValueError("JPEG missing SOS")
    return _reconstruct(frame, coefs, qtabs)


def _geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("JPEG sampling factors above 2")
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _alloc_coefs(frame):
    """Per-component zigzag-order coefficient grids, padded to whole
    MCUs (progressive scans refine these across multiple passes)."""
    _, _, mcux, mcuy = _geometry(frame)
    return {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    }


def _comp_blocks(frame, c):
    """Non-interleaved block grid of one component: ceil of the
    component's true sample dimensions (T.81 A.2.2)."""
    hmax, vmax, _, _ = _geometry(frame)
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_scan(
    d, pos, frame, scan, ss, se, ah, al, huff_dc, huff_ac,
    restart_interval, coefs,
):
    """Decode one entropy-coded scan into `coefs`; returns the stream
    position after the scan's last entropy byte."""
    reader = _BitReader(d, pos)
    try:
        if not frame["progressive"]:
            _scan_baseline(
                reader, frame, scan, huff_dc, huff_ac, restart_interval,
                coefs,
            )
        elif ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan with Se != 0")
            _scan_dc(
                reader, frame, scan, huff_dc, restart_interval, coefs,
                ah, al,
            )
        else:
            if len(scan) != 1:
                raise ValueError("progressive AC scan must be 1 component")
            if not 1 <= ss <= se <= 63:
                raise ValueError("bad progressive spectral band")
            _scan_ac(
                reader, frame, scan[0], huff_ac, restart_interval, coefs,
                ss, se, ah, al,
            )
    except _MarkerHit:
        raise ValueError("JPEG entropy data ended early") from None
    return reader.pos


def _scan_baseline(
    reader, frame, scan, huff_dc, huff_ac, restart_interval, coefs
):
    by_id = {c["id"]: c for c in frame["comps"]}
    comps = [dict(by_id[s["id"]], td=s["td"], ta=s["ta"]) for s in scan]
    hmax, vmax, mcux, mcuy = _geometry(frame)
    pred = {c["id"]: 0 for c in comps}
    if len(comps) == 1 and len(frame["comps"]) > 1:
        # non-interleaved sequential scan: raster over the comp's blocks
        c = comps[0]
        bh, bw = _comp_blocks(frame, c)
        units = [(c, by, bx) for by in range(bh) for bx in range(bw)]
        unit_size = 1
    else:
        units = []
        for my in range(mcuy):
            for mx in range(mcux):
                for c in comps:
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            units.append(
                                (c, my * c["v"] + v, mx * c["h"] + hh)
                            )
        unit_size = sum(c["v"] * c["h"] for c in comps)
    count = 0
    for c, by, bx in units:
        if (
            restart_interval
            and count
            and count % (restart_interval * unit_size) == 0
        ):
            reader.sync_restart()
            pred = {cc["id"]: 0 for cc in comps}
        dctab = huff_dc[c["td"]]
        actab = huff_ac[c["ta"]]
        blk = coefs[c["id"]][by, bx]
        t = _huff_decode(reader, dctab)
        diff = _extend(reader.receive(t), t) if t else 0
        pred[c["id"]] += diff
        blk[0] = pred[c["id"]]
        k = 1
        while k < 64:
            rs = _huff_decode(reader, actab)
            r, size = rs >> 4, rs & 0xF
            if size == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("JPEG AC overrun")
            blk[k] = _extend(reader.receive(size), size)
            k += 1
        count += 1


def _scan_dc(reader, frame, scan, huff_dc, restart_interval, coefs, ah, al):
    """Progressive DC scan: first pass (Ah=0) Huffman diff-codes the
    point-transformed DC; refinement (Ah>0) reads one bit per block."""
    by_id = {c["id"]: c for c in frame["comps"]}
    comps = [dict(by_id[s["id"]], td=s["td"]) for s in scan]
    hmax, vmax, mcux, mcuy = _geometry(frame)
    if len(comps) == 1 and len(frame["comps"]) > 1:
        c = comps[0]
        bh, bw = _comp_blocks(frame, c)
        units = [(c, by, bx) for by in range(bh) for bx in range(bw)]
        unit_size = 1
    else:
        units = []
        for my in range(mcuy):
            for mx in range(mcux):
                for c in comps:
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            units.append(
                                (c, my * c["v"] + v, mx * c["h"] + hh)
                            )
        unit_size = sum(c["v"] * c["h"] for c in comps)
    pred = {c["id"]: 0 for c in comps}
    count = 0
    every = restart_interval * unit_size
    for c, by, bx in units:
        if every and count and count % every == 0:
            reader.sync_restart()
            pred = {cc["id"]: 0 for cc in comps}
        blk = coefs[c["id"]][by, bx]
        if ah == 0:
            dctab = huff_dc[c["td"]]
            t = _huff_decode(reader, dctab)
            diff = _extend(reader.receive(t), t) if t else 0
            pred[c["id"]] += diff
            blk[0] = pred[c["id"]] << al
        else:
            if reader.read_bit():
                blk[0] |= 1 << al
        count += 1


def _scan_ac(
    reader, frame, s, huff_ac, restart_interval, coefs, ss, se, ah, al
):
    """Progressive AC scan over one component's block raster, with EOB
    runs; first pass (Ah=0) per T.81 G.1.2.2, refinement per G.1.2.3."""
    by_id = {c["id"]: c for c in frame["comps"]}
    c = by_id[s["id"]]
    actab = huff_ac[s["ta"]]
    bh, bw = _comp_blocks(frame, c)
    grid = coefs[c["id"]]
    eobrun = 0
    count = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and count and count % restart_interval == 0:
                reader.sync_restart()
                eobrun = 0
            blk = grid[by, bx]
            if ah == 0:
                eobrun = _ac_first_block(
                    reader, actab, blk, ss, se, al, eobrun
                )
            else:
                eobrun = _ac_refine_block(
                    reader, actab, blk, ss, se, al, eobrun
                )
            count += 1


def _ac_first_block(reader, actab, blk, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(reader, actab)
        r, size = rs >> 4, rs & 0xF
        if size == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG AC overrun")
        blk[k] = _extend(reader.receive(size), size) << al
        k += 1
    return eobrun


def _ac_refine_block(reader, actab, blk, ss, se, al, eobrun):
    """Successive-approximation AC refinement (T.81 G.1.2.3 /
    the standard decode_mcu_AC_refine control flow): new coefficients
    carry (run, 1) symbols + sign bit; already-nonzero coefficients
    consume one positional correction bit as the band is traversed."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(reader, actab)
            r, size = rs >> 4, rs & 0xF
            if size == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                val = 0  # ZRL: skip 16 zero-history positions
            else:
                if size != 1:
                    raise ValueError("bad JPEG AC refinement symbol")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if reader.read_bit() and (int(blk[k]) & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if reader.read_bit() and (int(blk[k]) & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(frame, coefs, qtabs):
    """Shared final stage: vectorized dequant + 8x8 IDCT over every
    block of every component, stitch, upsample, color-convert."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for c in comps:
        grid = coefs[c["id"]].astype(np.float64)  # (BY, BX, 64) zigzag
        q = qtabs[c["tq"]]
        nat = np.zeros_like(grid)
        nat[:, :, ZIGZAG] = grid * q[ZIGZAG]
        by, bx = grid.shape[:2]
        blocks = nat.reshape(by, bx, 8, 8)
        pix = np.einsum("ij,abjk,kl->abil", _A.T, blocks, _A) + 128.0
        p = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1:
            p = np.repeat(p, ry, axis=0)
        if rx > 1:
            p = np.repeat(p, rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)

"""Pure-Python FLAC codec (public format spec / RFC 9639) — the
lossless-audio leg of the multimodal column, joining WAV-PCM in
operators/codecs.py so compressed audio is end-to-end real and
testable in a container with no audio libraries.

Decoder covers the format surface a real-world 16-bit file uses:
STREAMINFO + skipped metadata blocks, frame sync with CRC-8-checked
headers, UTF-8-style coded numbers, all blocksize/sample-size codes,
subframe types CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32), wasted
bits, 4- and 5-bit rice partitions with escape codes, and the four
channel assignments (independent, left/side, right/side, mid/side).

Encoder (for tests and the write path) emits fixed-predictor subframes
with per-subframe order selection, optional mid/side stereo
decorrelation and an LPC mode (fixed-polynomial coefficients expressed
as generic quantized-LPC subframes) so every decoder path is exercised
by round-trip data. Lossless by construction: decode(encode(pcm)) ==
pcm exactly.

Reference parity note: bigartm has no audio pipeline; this belongs to
the repo's LLM-training-data surface (decode / feature-extract as
Pandas-UDF stages over binary columns, operators/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _Writer:
    """MSB-first bit writer (no byte stuffing — FLAC is not JPEG)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zero bits then a one bit

    def align(self) -> bytes:
        if self.n:
            self.write(0, 8 - self.n)
        return bytes(self.buf)


class _Reader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0

    def read(self, bits: int) -> int:
        v = 0
        d = self.data
        while bits:
            if self.pos >= len(d):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(bits, avail)
            cur = d[self.pos]
            v = (v << take) | (
                (cur >> (avail - take)) & ((1 << take) - 1)
            )
            self.bit += take
            bits -= take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v & (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _zigzag(v: np.ndarray) -> np.ndarray:
    return (v << 1) ^ (v >> 63)  # int64: sign -> LSB


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index). An n-byte form
    carries (7 - n) + 6*(n - 1) payload bits."""
    if n < 0x80:
        return bytes([n])
    nbytes = 2
    while n.bit_length() > (7 - nbytes) + 6 * (nbytes - 1):
        nbytes += 1
        if nbytes > 7:
            raise ValueError("FLAC: coded number out of range")
    lead = (0xFF << (8 - nbytes)) & 0xFF
    out = [lead | (n >> (6 * (nbytes - 1)))]
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _read_utf8_number(r: _Reader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("FLAC: bad coded number")
    n = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        c = r.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("FLAC: bad coded-number continuation")
        n = (n << 6) | (c & 0x3F)
    return n


# --------------------------------------------------------------- encode


def _best_fixed_order(x: np.ndarray) -> int:
    best, best_cost = 0, None
    res = x.astype(np.int64)
    for order in range(5):
        if order > len(x) - 1 and order > 0:
            break
        cost = np.abs(res[order:]).sum() if len(res) > order else 0
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
        res = np.diff(res)
    return best


def _rice_param(res: np.ndarray) -> int:
    if not len(res):
        return 0
    mean = max(1.0, float(np.abs(res).mean()))
    return min(14, max(0, int(mean).bit_length()))


def _write_residual(w: _Writer, res: np.ndarray, order: int) -> None:
    """Partition order 0, 4-bit rice (method 00)."""
    w.write(0, 2)  # rice method, 4-bit params
    w.write(0, 4)  # partition order 0
    k = _rice_param(res)
    w.write(k, 4)
    zz = _zigzag(res.astype(np.int64))
    for v in zz.tolist():
        w.write_unary(int(v) >> k)
        w.write(int(v), k)


def _write_subframe(
    w: _Writer, x: np.ndarray, bps: int, as_lpc: bool
) -> None:
    x = x.astype(np.int64)
    if len(x) and np.all(x == x[0]):
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)  # no wasted bits
        w.write(int(x[0]), bps)
        return
    order = _best_fixed_order(x)
    if order and as_lpc:
        # express the fixed polynomial as a generic quantized-LPC
        # subframe (precision 4 bits covers coefs in [-6, 4], shift 0)
        # so round-trip tests drive the decoder's LPC path
        w.write(0, 1)
        w.write(0x20 | (order - 1), 6)  # LPC, order
        w.write(0, 1)
        for v in x[:order].tolist():
            w.write(int(v), bps)
        prec = 4
        w.write(prec - 1, 4)
        w.write(0, 5)  # shift 0
        for c in _FIXED_COEFS[order]:
            w.write(c, prec)
        res = x.copy()
        for _ in range(order):
            res = np.diff(res)
        _write_residual(w, res, order)
        return
    w.write(0, 1)
    w.write(0x08 | order, 6)  # FIXED
    w.write(0, 1)
    for v in x[:order].tolist():
        w.write(int(v), bps)
    res = x.copy()
    for _ in range(order):
        res = np.diff(res)
    _write_residual(w, res, order)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 16000,
    block_size: int = 4096,
    mid_side: bool = False,
    lpc_mode: bool = False,
) -> bytes:
    """int16 PCM, shape (N,) mono or (N, 2) stereo -> FLAC bytes.
    mid_side uses the mid/side channel assignment for stereo frames;
    lpc_mode writes LPC subframes instead of FIXED (both lossless)."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 1:
        chans = [samples]
    elif samples.ndim == 2 and samples.shape[1] in (1, 2):
        chans = [samples[:, i] for i in range(samples.shape[1])]
    else:
        raise ValueError("encode_flac wants (N,) or (N, ch<=2) int PCM")
    n = len(chans[0])
    nch = len(chans)
    bps = 16
    out = bytearray(b"fLaC")
    info = _Writer()
    info.write(block_size, 16)
    info.write(block_size, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(nch - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    body = info.align() + b"\x00" * 16  # md5 unset (allowed)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    frame_idx = 0
    for start in range(0, max(n, 1), block_size):
        blk = [c[start : start + block_size] for c in chans]
        bs = len(blk[0])
        if bs == 0:
            break
        w = _Writer()
        w.write(0b11111111111110, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocksize strategy: frame number coded
        w.write(0b0111, 4)  # blocksize: 16-bit at header end
        w.write(0, 4)  # sample rate: from STREAMINFO
        use_ms = mid_side and nch == 2
        if use_ms:
            w.write(10, 4)  # mid/side
        else:
            w.write(nch - 1, 4)  # independent
        w.write(0b100, 3)  # 16 bps
        w.write(0, 1)
        header = bytearray(w.align())
        header += _utf8_number(frame_idx)
        header += struct.pack(">H", bs - 1)
        header.append(_crc8(bytes(header)))
        w = _Writer()
        if use_ms:
            left, right = blk
            mid = (left + right) >> 1
            side = left - right
            _write_subframe(w, mid, bps, lpc_mode)
            _write_subframe(w, side, bps + 1, lpc_mode)
        else:
            for c in blk:
                _write_subframe(w, c, bps, lpc_mode)
        frame = bytes(header) + w.align()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_idx += 1
    return bytes(out)


# --------------------------------------------------------------- decode

_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_residual(r: _Reader, bs: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if bs % nparts:
        raise ValueError("FLAC: partition does not divide blocksize")
    out = np.empty(bs - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        cnt = (bs >> porder) - (order if p == 0 else 0)
        k = r.read(pbits)
        if k == escape:
            raw = r.read(5)
            for _ in range(cnt):
                out[idx] = r.read_signed(raw) if raw else 0
                idx += 1
        else:
            for _ in range(cnt):
                q = r.read_unary()
                v = (q << k) | r.read(k)
                out[idx] = _unzigzag(v)
                idx += 1
    return out


def _read_subframe(r: _Reader, bs: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
        bps -= wasted
    if stype == 0:  # CONSTANT
        out = np.full(bs, r.read_signed(bps), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array(
            [r.read_signed(bps) for _ in range(bs)], dtype=np.int64
        )
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        warm = [r.read_signed(bps) for _ in range(order)]
        res = _read_residual(r, bs, order)
        out = np.empty(bs, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, bs):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * out[i - 1 - j]
            out[i] = pred + res[i - order]
    elif stype >= 32:  # LPC
        order = (stype & 0x1F) + 1
        warm = [r.read_signed(bps) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC: invalid LPC precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _read_residual(r, bs, order)
        out = np.empty(bs, dtype=np.int64)
        out[:order] = warm
        for i in range(order, bs):
            pred = 0
            for j in range(order):
                pred += coefs[j] * out[i - 1 - j]
            out[i] = (pred >> shift) + res[i - order]
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    if wasted:
        out <<= wasted
    return out


def decode_flac(content: bytes) -> tuple[np.ndarray, int, int]:
    """FLAC bytes -> (samples int32 (N,) or (N, ch), sample_rate,
    num_channels)."""
    d = bytes(content)
    if d[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    sr = nch = bps = total = None
    while True:
        if pos + 4 > len(d):
            raise ValueError("FLAC: truncated metadata")
        hdr = d[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        blen = int.from_bytes(d[pos + 1 : pos + 4], "big")
        body = d[pos + 4 : pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            r = _Reader(body)
            r.read(16)
            r.read(16)
            r.read(24)
            r.read(24)
            sr = r.read(20)
            nch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
        pos += 4 + blen
        if last:
            break
    if sr is None:
        raise ValueError("FLAC: missing STREAMINFO")
    chans: list[list[int]] = [[] for _ in range(nch)]
    got = 0
    while pos < len(d) and (total == 0 or got < total):
        r = _Reader(d, pos)
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise ValueError("FLAC: lost frame sync")
        r.read(1)
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        bps_code = r.read(3)
        r.read(1)
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("FLAC: reserved blocksize code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        fbps = _BPS_CODES.get(bps_code, bps)
        # every header field is byte-aligned here; CRC-8 covers sync
        # through the last coded field
        stored_crc = r.read(8)
        if _crc8(d[pos : r.pos - 1]) != stored_crc:
            raise ValueError("FLAC: frame header CRC mismatch")
        if ch_code <= 7:
            n_sub = ch_code + 1
            subs = [_read_subframe(r, bs, fbps) for _ in range(n_sub)]
        elif ch_code == 8:  # left/side
            left = _read_subframe(r, bs, fbps)
            side = _read_subframe(r, bs, fbps + 1)
            subs = [left, left - side]
        elif ch_code == 9:  # right/side
            side = _read_subframe(r, bs, fbps + 1)
            right = _read_subframe(r, bs, fbps)
            subs = [right + side, right]
        elif ch_code == 10:  # mid/side
            mid = _read_subframe(r, bs, fbps)
            side = _read_subframe(r, bs, fbps + 1)
            mm = (mid << 1) | (side & 1)
            subs = [(mm + side) >> 1, (mm - side) >> 1]
        else:
            raise ValueError("FLAC: reserved channel assignment")
        if len(subs) != nch:
            raise ValueError("FLAC: channel count mismatch")
        r.align()
        frame_crc = r.read(16)
        if _crc16(d[pos : r.pos - 2]) != frame_crc:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        for c, s in zip(chans, subs):
            c.extend(s.tolist())
        got += bs
        pos = r.pos
    if total:
        chans = [c[:total] for c in chans]
    arrs = [np.asarray(c, dtype=np.int32) for c in chans]
    out = arrs[0] if nch == 1 else np.stack(arrs, axis=1)
    return out, sr, nch

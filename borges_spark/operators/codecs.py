"""Pure-numpy media codecs for the multimodal pipeline.

The image/audio libraries (PIL, ffmpeg, torchaudio) are not in this
image, but several REAL public formats need no codec library at all —
they are plain headers over raw sample arrays. This module implements
genuine decoders for those, so the multimodal pipeline's decode /
feature-extract / resize / frame-sample stages run real math on real
formats, with the deterministic byte-moment fallback reserved for
compressed formats that genuinely need an external codec:

  - BMP  (Windows bitmap, uncompressed 24-bit BI_RGB, bottom-up rows,
          4-byte row padding)
  - PPM  (Netpbm P6 binary, maxval <= 255, whitespace/comment header)
  - WAV  (RIFF/WAVE, PCM 8/16-bit, any channel count)
  - Y4M  (YUV4MPEG2 uncompressed video stream: text header + FRAME
          markers over raw 4:2:0 planes — the standard interchange
          format for raw video)
  - PNG  (zlib inflate + all five scanline filters)
  - GIF  (full LZW with code-width growth and dictionary clears)
  - JPEG (baseline sequential DCT: canonical Huffman, dequant, IDCT)
  - WebP lossless (the complete VP8L bitstream, below)

Everything is numpy-vectorized — these run inside Arrow-batched
mapInPandas workers, so per-sample Python loops are avoided.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# sniffing

def sniff(payload: bytes) -> str | None:
    """Magic-number format sniff; None = unknown (codec-bound) format."""
    if payload.startswith(b"BM"):
        return "bmp"
    if payload.startswith(b"P6"):
        return "ppm"
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return "wav"
    if payload.startswith(b"YUV4MPEG2"):
        return "y4m"
    if payload.startswith(b"\x89PNG\r\n\x1a\n"):
        return "png"
    if payload.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    if payload.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if payload.startswith(b"RIFF") and payload[8:12] == b"WEBP":
        return "webp"
    return None


# ---------------------------------------------------------------------------
# BMP

def decode_bmp(payload: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB from an uncompressed 24-bit BMP. Rows are
    stored bottom-up and padded to 4 bytes — both undone here."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP is codec-free")
    flip = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h, offset=data_off)
    rows = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[..., ::-1].copy()  # BGR -> RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """Inverse of decode_bmp (test fixture generator)."""
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    data = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


# ---------------------------------------------------------------------------
# PPM (P6)

def decode_ppm(payload: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB from a binary P6 PPM."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raw.reshape(h, w, 3).copy()


# ---------------------------------------------------------------------------
# WAV (PCM)

def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """(samples float32 in [-1, 1] shaped (n, channels), sample_rate)
    from a PCM RIFF/WAVE blob; walks the chunk list like any real
    parser (fmt may be followed by LIST/fact before data)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1:
        raise ValueError("only PCM WAV is codec-free")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    n = len(x) // channels
    return x[: n * channels].reshape(n, channels), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """PCM-16 encoder (test fixture generator). samples: (n, channels)
    float in [-1, 1]."""
    n, channels = samples.shape
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


# ---------------------------------------------------------------------------
# Y4M (uncompressed video)

def decode_y4m_frames(payload: bytes, every: int = 1, limit: int | None = None) -> tuple[list[np.ndarray], int, int]:
    """Frame-sample an uncompressed YUV4MPEG2 stream: returns (list of
    (H, W) uint8 LUMA planes for every `every`-th frame, width, height).
    4:2:0 chroma is skipped over, not decoded — frame sampling reads
    only what it keeps, exactly what a sampling pipeline should do."""
    nl = payload.index(0x0A)
    header = payload[:nl].decode("ascii", "replace")
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a Y4M stream")
    w = h = None
    for tok in header.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "C" and not tok[1:].startswith("420"):
            raise ValueError("only 4:2:0 Y4M supported")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    luma, chroma = w * h, (w // 2) * (h // 2) * 2
    frames: list[np.ndarray] = []
    pos, idx = nl + 1, 0
    while pos < len(payload):
        fnl = payload.index(0x0A, pos)  # FRAME [params]\n
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("corrupt Y4M frame marker")
        pos = fnl + 1
        if idx % every == 0 and (limit is None or len(frames) < limit):
            y = np.frombuffer(payload, dtype=np.uint8, count=luma, offset=pos)
            frames.append(y.reshape(h, w).copy())
        pos += luma + chroma
        idx += 1
    return frames, w, h


def encode_y4m(frames: list[np.ndarray]) -> bytes:
    """Y4M encoder over luma planes (test fixture generator); chroma
    planes are written neutral (128)."""
    h, w = frames[0].shape
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()]
    neutral = np.full(((w // 2) * (h // 2) * 2,), 128, dtype=np.uint8).tobytes()
    for f in frames:
        out.append(b"FRAME\n" + f.astype(np.uint8).tobytes() + neutral)
    return b"".join(out)


# ---------------------------------------------------------------------------
# PNG — stdlib zlib inflate + per-row unfilter; no codec library needed

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}  # gray, RGB, palette, RGBA


def decode_png(payload: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB from an 8-bit non-interlaced PNG (gray / RGB /
    palette / RGBA). Chunk walk -> concatenated-IDAT zlib inflate ->
    per-row unfilter. Filters None/Sub/Up are vectorized (Sub is a
    per-byte-lane cumsum mod 256); Average/Paeth carry a true left-pixel
    dependency, so those rows run a per-PIXEL loop of small vector ops —
    still bounded by row width, and encoders we meet in fixtures emit
    filter 0/1/2."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    import zlib

    pos, ihdr, plte, idat = len(_PNG_SIG), None, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    bpp = _PNG_CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * bpp
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    raw = raw[: h * (stride + 1)].reshape(h, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f, row = int(filters[y]), rows[y].astype(np.int64)
        if f == 0:
            rec = row
        elif f == 1:  # Sub: cumsum over pixels, per byte lane
            rec = np.cumsum(row.reshape(w, bpp), axis=0).reshape(-1) % 256
        elif f == 2:  # Up
            rec = (row + prev) % 256
        elif f in (3, 4):  # Average / Paeth: left-pixel dependency
            rec = np.zeros(stride, dtype=np.int64)
            up = prev.reshape(w, bpp)
            rw = row.reshape(w, bpp)
            rc = rec.reshape(w, bpp)
            left = np.zeros(bpp, dtype=np.int64)
            upleft = np.zeros(bpp, dtype=np.int64)
            for x in range(w):
                if f == 3:
                    rc[x] = (rw[x] + (left + up[x]) // 2) % 256
                else:
                    p = left + up[x] - upleft
                    pa, pb, pc = np.abs(p - left), np.abs(p - up[x]), np.abs(p - upleft)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up[x], upleft)
                    )
                    rc[x] = (rw[x] + pred) % 256
                left, upleft = rc[x].astype(np.int64), up[x].astype(np.int64)
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec.astype(np.int64)
    img = out.reshape(h, w, bpp)
    if color_type == 0:
        return np.repeat(img, 3, axis=2).copy()
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[img[..., 0]].copy()
    return img[..., :3].copy()  # RGB / RGBA (alpha dropped)


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """PNG encoder over (H, W, 3) uint8 RGB (test fixture generator).
    filter_type 0 (None) or 2 (Up) — both exactly invertible here."""
    import zlib

    h, w, _ = img.shape
    rows = img.reshape(h, w * 3).astype(np.int64)
    if filter_type == 0:
        filtered = rows
    elif filter_type == 2:
        prev = np.vstack([np.zeros((1, w * 3), dtype=np.int64), rows[:-1]])
        filtered = (rows - prev) % 256
    else:
        raise ValueError("fixture encoder supports filter 0/2 only")
    scan = np.concatenate(
        [np.full((h, 1), filter_type, dtype=np.uint8), filtered.astype(np.uint8)], axis=1
    ).tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# GIF — LZW (the 1984 Welch variant GIF specifies) + palette mapping

def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Decode a GIF LZW code stream into palette indices. The dictionary
    rebuild is inherently sequential (each code's expansion depends on
    the previous code's), so this is a per-CODE Python loop — bounded by
    compressed size, and each code appends a whole run of pixels."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    width = min_code_size + 1
    # dictionary as (prefix_code, first_byte, suffix_byte) tables
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    for i in range(clear):
        suffix[i] = i
    next_code = eoi + 1
    out = np.zeros(n_pixels, dtype=np.uint8)
    n_out = 0
    acc = bits = 0
    prev_code = -1
    buf = np.frombuffer(data, dtype=np.uint8)
    expand = bytearray(4096)
    for byte in buf:
        acc |= int(byte) << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                next_code, width, prev_code = eoi + 1, min_code_size + 1, -1
                continue
            if code == eoi:
                return out[:n_out]
            if prev_code < 0:
                out[n_out] = suffix[code]
                n_out += 1
                prev_code = code
                continue
            # expand `code` (or prev+firstbyte for the not-yet-defined code)
            c = code if code < next_code else prev_code
            n = 0
            while c >= clear + 2:
                expand[n] = suffix[c]
                n += 1
                c = prefix[c]
            expand[n] = suffix[c]
            n += 1
            first = expand[n - 1]
            run = bytes(expand[:n][::-1]) + (bytes([first]) if code >= next_code else b"")
            take = min(len(run), n_pixels - n_out)
            out[n_out : n_out + take] = np.frombuffer(run[:take], dtype=np.uint8)
            n_out += take
            if next_code < 4096:
                prefix[next_code] = prev_code
                suffix[next_code] = first
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev_code = code
            if n_out >= n_pixels:
                return out
    return out[:n_out]


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB of the FIRST frame of a GIF87a/89a stream:
    logical-screen + color-table parse, extension-block skip, LZW
    decode, interlace undo, palette mapping."""
    if not payload.startswith((b"GIF87a", b"GIF89a")):
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        intro = payload[pos]
        if intro == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif intro == 0x2C:  # image descriptor
            _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            palette = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                palette = np.frombuffer(
                    payload, dtype=np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3)
                pos += 3 * n
            if palette is None:
                raise ValueError("GIF image without a color table")
            min_code_size = payload[pos]
            pos += 1
            chunks = []
            while payload[pos] != 0:
                size = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + size])
                pos += 1 + size
            idx = _gif_lzw_decode(b"".join(chunks), min_code_size, w * h)
            if len(idx) < w * h:
                raise ValueError("truncated GIF pixel data")
            grid = idx.reshape(h, w)
            if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
                order = [
                    y for start, step in _GIF_INTERLACE_PASSES for y in range(start, h, step)
                ]
                undone = np.zeros_like(grid)
                undone[np.array(order)] = grid
                grid = undone
            return palette[grid].copy()
        elif intro == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"corrupt GIF block 0x{intro:02x}")
    raise ValueError("GIF contains no image")


def encode_gif(img_indices: np.ndarray, palette: np.ndarray) -> bytes:
    """GIF89a encoder (test fixture generator): one frame of palette
    indices + an (N, 3) palette. Emits literal LZW codes, mirroring the
    decoder's dictionary growth for code-width bookkeeping and clearing
    at 4096 — valid output any GIF reader accepts."""
    h, w = img_indices.shape
    n_colors = len(palette)
    ct_bits = max(2, int(np.ceil(np.log2(max(n_colors, 2)))))
    ct_size = 1 << ct_bits
    pal = np.zeros((ct_size, 3), dtype=np.uint8)
    pal[:n_colors] = palette
    mcs = ct_bits
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    codes: list[tuple[int, int]] = [(clear, mcs + 1)]  # (code, width-at-emit)
    width, next_code, since_clear = mcs + 1, eoi + 1, 0
    for v in img_indices.reshape(-1):
        codes.append((int(v), width))
        if since_clear > 0:  # decoder defines a new entry per code after the 1st
            next_code += 1
            if next_code == (1 << width):
                if width < 12:
                    width += 1
                else:
                    codes.append((clear, width))
                    width, next_code, since_clear = mcs + 1, eoi + 1, 0
                    continue
        since_clear += 1
    codes.append((eoi, width))
    acc = bits = 0
    out = bytearray()
    for code, cw in codes:
        acc |= code << bits
        bits += cw
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    blocks = b"".join(
        bytes([len(out[i : i + 255])]) + bytes(out[i : i + 255])
        for i in range(0, len(out), 255)
    )
    header = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (ct_bits - 1), 0, 0)
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    return header + pal.tobytes() + desc + bytes([mcs]) + blocks + b"\x00\x3b"

# ---------------------------------------------------------------------------
# JPEG — baseline sequential DCT (ITU-T T.81): pure-numpy Huffman +
# dequant + IDCT. Quant/Huffman tables below are the spec's own example
# tables (T.81 Annex K.1/K.3) — public constants, not tuned data. The
# reference repo contains no media code; this is an original
# implementation of the public format, like the PNG/GIF decoders above.

# Annex K.1 example quantization tables (natural row-major order)
_JPEG_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

_JPEG_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# zigzag scan order: _JPEG_ZIGZAG[i] = natural index of the i-th
# zigzag-ordered coefficient
_JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
_JPEG_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_JPEG_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct8_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: coeffs = C @ block @ C.T,
    block = C.T @ coeffs @ C (C is orthogonal)."""
    k = np.arange(8).reshape(-1, 1).astype(np.float64)
    n = np.arange(8).reshape(1, -1).astype(np.float64)
    c = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2.0 / 8.0)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


_DCT8 = _dct8_matrix()


def _huff_canonical(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical assignment of T.81
    Annex C (codes of ascending length, counting upward)."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 7 - ((self.n - 1) % 8) + 1)  # pad with 1s
        return bytes(self.buf)


def _jpeg_category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _jpeg_amplitude(v: int, cat: int) -> int:
    # negative amplitudes are stored as v - 1 in cat bits (one's
    # complement of |v|) — T.81 F.1.2.1.1
    return v if v >= 0 else v + (1 << cat) - 1


def encode_jpeg(img: np.ndarray) -> bytes:
    """Baseline JFIF encoder over (H, W, 3) uint8 RGB: 4:4:4 sampling,
    Annex-K quant + Huffman tables (test fixture generator — the same
    role encode_png/encode_gif play for their decoders)."""
    h, w, _ = img.shape
    rgb = img.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
    cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = []
    for p in (y, cb, cr):
        pad = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        planes.append(pad)

    dc_luma = _huff_canonical(*_JPEG_HUFF_DC_LUMA)
    dc_chroma = _huff_canonical(*_JPEG_HUFF_DC_CHROMA)
    ac_luma = _huff_canonical(*_JPEG_HUFF_AC_LUMA)
    ac_chroma = _huff_canonical(*_JPEG_HUFF_AC_CHROMA)
    quants = (_JPEG_QUANT_LUMA, _JPEG_QUANT_CHROMA, _JPEG_QUANT_CHROMA)
    dc_tabs = (dc_luma, dc_chroma, dc_chroma)
    ac_tabs = (ac_luma, ac_chroma, ac_chroma)

    # quantized zigzag coefficients per component, all blocks vectorized
    comp_coeffs = []
    for ci, plane in enumerate(planes):
        blocks = (
            plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
            - 128.0
        )
        coeffs = np.einsum("ij,njk,lk->nil", _DCT8, blocks, _DCT8)
        q = quants[ci].reshape(8, 8).astype(np.float64)
        qz = np.round(coeffs / q).astype(np.int32).reshape(-1, 64)[:, _JPEG_ZIGZAG]
        comp_coeffs.append(qz)

    bw = _BitWriter()
    n_by, n_bx = ph // 8, pw // 8
    pred = [0, 0, 0]
    for by in range(n_by):
        for bx in range(n_bx):
            bi = by * n_bx + bx
            for ci in range(3):
                z = comp_coeffs[ci][bi]
                diff = int(z[0]) - pred[ci]
                pred[ci] = int(z[0])
                cat = _jpeg_category(diff)
                code, length = dc_tabs[ci][cat]
                bw.write(code, length)
                if cat:
                    bw.write(_jpeg_amplitude(diff, cat), cat)
                run = 0
                last_nz = int(np.max(np.nonzero(z)[0])) if np.any(z[1:]) else 0
                for k in range(1, last_nz + 1):
                    v = int(z[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_tabs[ci][0xF0]  # ZRL
                        bw.write(code, length)
                        run -= 16
                    cat = _jpeg_category(v)
                    code, length = ac_tabs[ci][(run << 4) | cat]
                    bw.write(code, length)
                    bw.write(_jpeg_amplitude(v, cat), cat)
                    run = 0
                if last_nz < 63:
                    code, length = ac_tabs[ci][0x00]  # EOB
                    bw.write(code, length)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    out = b"\xff\xd8"  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(
        0xDB,
        b"\x00" + bytes(int(v) for v in _JPEG_QUANT_LUMA[_JPEG_ZIGZAG])
        + b"\x01" + bytes(int(v) for v in _JPEG_QUANT_CHROMA[_JPEG_ZIGZAG]),
    )
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += seg(
        0xC4,
        dht(0, 0, _JPEG_HUFF_DC_LUMA) + dht(1, 0, _JPEG_HUFF_AC_LUMA)
        + dht(0, 1, _JPEG_HUFF_DC_CHROMA) + dht(1, 1, _JPEG_HUFF_AC_CHROMA),
    )
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += scan + b"\xff\xd9"  # EOI
    return out


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with the
    0xFF00 stuffing already stripped by the caller."""

    def __init__(self, data: np.ndarray):
        self.data = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        b = (int(self.data[byte]) >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


class _HuffDecoder:
    """Canonical Huffman decode via per-length (mincode, maxcode,
    valptr) — the T.81 Annex F DECODE procedure."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, i = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = i
                self.mincode[length] = code
                code += bits[length - 1]
                i += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code, length = 0, 0
        while True:
            code = (code << 1) | br.bit()
            length += 1
            if length > 16:
                raise ValueError("bad JPEG Huffman code")
            if self.maxcode[length] >= code >= self.mincode[length]:
                return self.vals[self.valptr[length] + code - self.mincode[length]]


def _jpeg_extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB from a baseline sequential-DCT JPEG (SOF0):
    segment parse, canonical Huffman entropy decode, dequant, de-zigzag,
    IDCT, chroma upsample (replication), YCbCr->RGB. Supports 1- or
    3-component scans, arbitrary h/v sampling factors, restart markers.
    Progressive (SOF2) and arithmetic-coded streams raise."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    comps = None  # [(cid, h, v, tq)]
    h = w = 0
    restart_interval = 0
    scan_comps = None
    scan_start = None

    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker sync")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        ln = struct.unpack_from(">H", payload, pos)[0]
        body = payload[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_JPEG_ZIGZAG] = np.frombuffer(body[bpos + 1 : bpos + 65], dtype=np.uint8)
                quant[tq] = tbl
                bpos += 65
        elif marker == 0xC0:  # SOF0 baseline
            h, w = struct.unpack_from(">HH", body, 1)
            n_comp = body[5]
            comps = []
            for i in range(n_comp):
                cid, hv, tq = body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential JPEG (SOF0) supported")
        elif marker == 0xC4:  # DHT
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0xF
                bits = list(body[bpos + 1 : bpos + 17])
                nv = sum(bits)
                vals = list(body[bpos + 17 : bpos + 17 + nv])
                (huff_ac if tc else huff_dc)[th] = _HuffDecoder(bits, vals)
                bpos += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan_comps.append((cs, tt >> 4, tt & 0xF))
            scan_start = pos + ln
            break
        pos += ln
    if comps is None or scan_comps is None:
        raise ValueError("JPEG missing SOF0/SOS")

    # entropy-coded data runs to the next non-RST marker; strip stuffing
    raw = np.frombuffer(payload, dtype=np.uint8)
    end = len(payload) - 2  # EOI
    stream = raw[scan_start:end]
    # remove 0x00 bytes that follow 0xFF (stuffing); RST markers are
    # handled below by resetting at byte positions recorded here
    ff = stream == 0xFF
    stuffed = np.zeros(len(stream), dtype=bool)
    stuffed[1:] = ff[:-1] & (stream[1:] == 0x00)
    rst_mask = np.zeros(len(stream), dtype=bool)
    rst_mask[1:] = ff[:-1] & (stream[1:] >= 0xD0) & (stream[1:] <= 0xD7)
    # drop the stuffed 0x00 (its 0xFF is DATA and stays); drop BOTH
    # bytes of a restart marker
    rst_ff = np.zeros(len(stream), dtype=bool)
    rst_ff[:-1] = rst_mask[1:]
    data = stream[~(stuffed | rst_mask | rst_ff)]
    br = _BitReader(data)

    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * max_h, 8 * max_v
    mcus_x, mcus_y = -(-w // mcu_w), -(-h // mcu_h)
    planes = {
        cid: np.zeros((mcus_y * 8 * cv, mcus_x * 8 * ch), dtype=np.float64)
        for cid, ch, cv, _ in comps
    }
    comp_of = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}
    pred = {cid: 0 for cid, *_ in comps}
    n_mcu = 0

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                br.pos = (br.pos + 7) & ~7  # byte-align at restart
                for cid in pred:
                    pred[cid] = 0
            for cid, td, ta in scan_comps:
                ch, cv, tq = comp_of[cid]
                for by in range(cv):
                    for bx in range(ch):
                        z = np.zeros(64, dtype=np.int32)
                        cat = huff_dc[td].decode(br)
                        diff = _jpeg_extend(br.bits(cat), cat) if cat else 0
                        pred[cid] += diff
                        z[0] = pred[cid]
                        k = 1
                        while k < 64:
                            sym = huff_ac[ta].decode(br)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            size = sym & 0xF
                            z[k] = _jpeg_extend(br.bits(size), size)
                            k += 1
                        coeffs = np.zeros(64, dtype=np.float64)
                        coeffs[_JPEG_ZIGZAG] = z * quant[tq]
                        block = _DCT8.T @ coeffs.reshape(8, 8) @ _DCT8 + 128.0
                        py = (my * cv + by) * 8
                        px = (mx * ch + bx) * 8
                        planes[cid][py : py + 8, px : px + 8] = block
            n_mcu += 1

    # upsample to full resolution and convert
    full = {}
    for cid, ch, cv, _ in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, max_v // cv, axis=0), max_h // ch, axis=1)
        full[cid] = p[:h, :w]
    if len(comps) == 1:
        ych = np.clip(np.rint(full[comps[0][0]]), 0, 255)
        return np.repeat(ych[:, :, None], 3, axis=2).astype(np.uint8)
    y, cb, cr = (full[c[0]] for c in comps)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# WebP lossless (VP8L) — RIFF container + the VP8L bitstream: LSB-first
# bit packing, DEFLATE-style canonical prefix codes with the VP8L
# code-length code, optional meta-prefix (entropy image), color cache,
# LZ77 backward references with the 2D distance mapping, and all four
# transforms (predictor / color / subtract-green / color-indexing)
# inverted in reverse order. Spec: "WebP Lossless Bitstream
# Specification" (Google, public). Lossy VP8 (arithmetic-coded) stays
# codec-bound — VP8L is the self-contained half of WebP, like PNG.


class _LsbReader:
    """LSB-first bit reader (VP8L/DEFLATE bit order)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.data[self.pos >> 3]
            v |= ((byte >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class _LsbWriter:
    def __init__(self):
        self.out = bytearray()
        self.bitpos = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            if self.bitpos == 0:
                self.out.append(0)
            if (value >> i) & 1:
                self.out[-1] |= 1 << self.bitpos
            self.bitpos = (self.bitpos + 1) & 7

    def write_code(self, code: int, length: int) -> None:
        """Prefix codes are written MSB-of-code first (DEFLATE rule)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)


class _PrefixTree:
    """Canonical prefix decoder from code lengths; a tree whose only
    symbol has an implicit 0-bit code reads no bits at all (VP8L
    single-symbol rule)."""

    def __init__(self, lengths: list[int]):
        nz = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = {}
            return
        self.single = None
        # canonical assignment: shorter codes first, symbol order within
        self.table = {}
        code = 0
        for ln in range(1, 16):
            for s, sym_len in enumerate(lengths):
                if sym_len == ln:
                    self.table[(ln, code)] = s
                    code += 1
            code <<= 1

    def codes(self) -> dict[int, tuple[int, int]]:
        if self.single is not None:
            return {self.single: (0, 0)}
        return {s: (c, ln) for (ln, c), s in self.table.items()}

    def read(self, br: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        code, ln = 0, 0
        while True:
            code = (code << 1) | br.bits(1)
            ln += 1
            hit = self.table.get((ln, code))
            if hit is not None:
                return hit
            if ln > 15:
                raise ValueError("corrupt VP8L prefix stream")


_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _vp8l_read_prefix_code(br: _LsbReader, alphabet_size: int) -> _PrefixTree:
    if br.bits(1):  # simple code: 1 or 2 symbols
        num_symbols = br.bits(1) + 1
        if br.bits(1):
            first = br.bits(8)
        else:
            first = br.bits(1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[first] = 1  # single-symbol tree: read() consumes 0 bits
            t = _PrefixTree(lengths)
            t.single = first
            return t
        second = br.bits(8)
        # simple codes assign by READ order (first -> 0, second -> 1),
        # not by canonical symbol order
        t = _PrefixTree(lengths)
        t.single = None
        t.table = {(1, 0): first, (1, 1): second}
        return t
    # normal: code lengths coded with the code-length code
    num_cl = br.bits(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    cl_tree = _PrefixTree(cl_lengths)
    if br.bits(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        cl = cl_tree.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        else:
            extra_bits = (2, 3, 7)[cl - 16]
            offset = (3, 3, 11)[cl - 16]
            repeat = br.bits(extra_bits) + offset
            fill = prev_len if cl == 16 else 0
            for _ in range(repeat):
                if symbol >= alphabet_size:
                    break
                lengths[symbol] = fill
                symbol += 1
    return _PrefixTree(lengths)


def _vp8l_prefix_value(br: _LsbReader, prefix_code: int) -> int:
    """LZ77 length/distance prefix decoding (spec 'LZ77 prefix coding')."""
    if prefix_code < 4:
        return prefix_code + 1
    extra_bits = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra_bits
    return offset + br.bits(extra_bits) + 1


def _vp8l_dist_map() -> list[tuple[int, int]]:
    """The 120-entry 2D neighborhood for distance codes 1..120: (dx, dy)
    offsets ordered near-to-far (dx^2+dy^2 ascending, larger dy first on
    ties, positive dx before negative). Domain matches the spec's fixed
    plane-code table exactly (RFC 9649 / libwebp kCodeToPlaneCodes:
    xoffset = 8 - (code & 0xF) in [-7, 8], yoffset = code >> 4 in
    [0, 7]) — dy 0..7 x dx -7..8 is 120 entries on the nose, so nothing
    is truncated and far 2D distances decode per spec. (The pre-r6
    generator enumerated dy<=8 / |dx|<=8 and cut at 120, which displaced
    10 far entries.) Spot-pinned against the published table in
    tests/test_codecs.py."""
    cands = []
    for dy in range(0, 8):
        for dx in range(-7, 9):
            if dy == 0 and dx <= 0:
                continue
            cands.append((dx, dy))
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0] < 0))
    assert len(cands) == 120
    return cands


_DIST_MAP = _vp8l_dist_map()


def _vp8l_distance(dist_code: int, xsize: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DIST_MAP[dist_code - 1]
    return max(dy * xsize + dx, 1)


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _vp8l_decode_pixels(br: _LsbReader, w: int, h: int,
                        allow_meta: bool) -> np.ndarray:
    """One entropy-coded ARGB image (spec 'Decoding Image Data'):
    returns (h*w, 4) uint8 [A, R, G, B]."""
    cache_bits = 0
    if br.bits(1):
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("invalid color cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = np.zeros((cache_size, 4), dtype=np.uint8) if cache_size else None

    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.bits(1):
        meta_bits = br.bits(3) + 2
        mw, mh = _subsample_size(w, meta_bits), _subsample_size(h, meta_bits)
        meta_px = _vp8l_decode_pixels(br, mw, mh, allow_meta=False)
        meta = (meta_px[:, 1].astype(np.int64) << 8) | meta_px[:, 2]
        n_groups = int(meta.max()) + 1

    groups = []
    for _ in range(n_groups):
        green = _vp8l_read_prefix_code(br, 256 + 24 + cache_size)
        red = _vp8l_read_prefix_code(br, 256)
        blue = _vp8l_read_prefix_code(br, 256)
        alpha = _vp8l_read_prefix_code(br, 256)
        dist = _vp8l_read_prefix_code(br, 40)
        groups.append((green, red, blue, alpha, dist))

    out = np.zeros((h * w, 4), dtype=np.uint8)
    n = h * w
    pos = 0

    def cache_insert(px):
        if cache is not None:
            argb = (int(px[0]) << 24) | (int(px[1]) << 16) | (int(px[2]) << 8) | int(px[3])
            idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)
            cache[idx] = px

    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            gi = int(meta[(y >> meta_bits) * _subsample_size(w, meta_bits) + (x >> meta_bits)])
        else:
            gi = 0
        g_tree, r_tree, b_tree, a_tree, d_tree = groups[gi]
        s = g_tree.read(br)
        if s < 256:  # literal — spec channel order: green, red, blue, alpha
            r = r_tree.read(br)
            b = b_tree.read(br)
            a = a_tree.read(br)
            out[pos] = (a, r, s, b)
            cache_insert(out[pos])
            pos += 1
        elif s < 256 + 24:  # LZ77 backward reference
            length = _vp8l_prefix_value(br, s - 256)
            dist_code = _vp8l_prefix_value(br, d_tree.read(br))
            dist = _vp8l_distance(dist_code, w)
            if dist > pos or pos + length > n:
                raise ValueError("corrupt VP8L backward reference")
            for _ in range(length):
                out[pos] = out[pos - dist]
                cache_insert(out[pos])
                pos += 1
        else:  # color cache hit
            if cache is None:
                raise ValueError("cache symbol without color cache")
            out[pos] = cache[s - 256 - 24]
            pos += 1
    return out


def _inv_predictor(img: np.ndarray, w: int, h: int, pred_img: np.ndarray,
                   pred_bits: int) -> None:
    """In-place inverse predictor transform over (h*w, 4) residuals.
    Sequential by construction (L/TL neighbors are reconstructed
    pixels); fixture-scale images keep this loop cheap."""
    pw = _subsample_size(w, pred_bits)

    def avg2(a, b):
        return (a.astype(np.int32) + b.astype(np.int32)) >> 1

    for pos in range(h * w):
        x, y = pos % w, pos // w
        if pos == 0:
            pred = np.array([255, 0, 0, 0], dtype=np.int32)
        elif y == 0:
            pred = img[pos - 1].astype(np.int32)  # L
        elif x == 0:
            pred = img[pos - w].astype(np.int32)  # T
        else:
            mode = int(pred_img[(y >> pred_bits) * pw + (x >> pred_bits), 2])
            L = img[pos - 1].astype(np.int32)
            T = img[pos - w].astype(np.int32)
            TL = img[pos - w - 1].astype(np.int32)
            TR = img[pos - w + 1].astype(np.int32)  # x==w-1 wraps, still decoded
            if mode == 0:
                pred = np.array([255, 0, 0, 0], dtype=np.int32)
            elif mode == 1:
                pred = L
            elif mode == 2:
                pred = T
            elif mode == 3:
                pred = TR
            elif mode == 4:
                pred = TL
            elif mode == 5:
                pred = avg2(avg2(L, TR), T)
            elif mode == 6:
                pred = avg2(L, TL)
            elif mode == 7:
                pred = avg2(L, T)
            elif mode == 8:
                pred = avg2(TL, T)
            elif mode == 9:
                pred = avg2(T, TR)
            elif mode == 10:
                pred = avg2(avg2(L, TL), avg2(T, TR))
            elif mode == 11:  # Select
                # spec: strict pL < pT returns L, ties return T
                p = L + T - TL
                if np.abs(p - L).sum() < np.abs(p - T).sum():
                    pred = L
                else:
                    pred = T
            elif mode == 12:  # ClampAddSubtractFull
                pred = np.clip(L + T - TL, 0, 255)
            elif mode == 13:  # ClampAddSubtractHalf
                # spec: (a - TL) / 2 with C truncation toward zero (floor
                # division is off by one for negative odd deltas)
                a = avg2(L, T)
                d = a - TL
                half = np.where(d >= 0, d // 2, -((-d) // 2))
                pred = np.clip(a + half, 0, 255)
            else:
                raise ValueError(f"bad predictor mode {mode}")
        img[pos] = ((img[pos].astype(np.int32) + pred) & 0xFF).astype(np.uint8)


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(int8(t) * int8(c)) >> 5 — the VP8L color-transform multiplier."""
    return (t.astype(np.int8).astype(np.int32) * c.astype(np.int8).astype(np.int32)) >> 5


def decode_webp(payload: bytes) -> np.ndarray:
    """Decode a lossless WebP (RIFF + VP8L) to an (h, w, 3) RGB array.
    Implements the full level-0 stream: all four transforms, color
    cache, meta prefix codes, LZ77. Lossy 'VP8 ' payloads raise (they
    need the arithmetic-coded VP8 codec — the documented fallback)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    data = None
    while pos + 8 <= min(end, len(payload)):
        tag = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        if tag == b"VP8L":
            data = payload[pos + 8:pos + 8 + size]
            break
        if tag == b"VP8 ":
            raise ValueError("lossy VP8 payload needs the external codec")
        pos += 8 + size + (size & 1)
    if data is None:
        raise ValueError("no VP8L chunk")
    if data[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _LsbReader(data)
    br.pos = 8
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bits(1)  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("unknown VP8L version")

    # transforms (level 0 only), recorded for reverse-order inversion
    transforms = []
    xsize = w
    while br.bits(1):
        ttype = br.bits(2)
        if ttype in (0, 1):  # predictor / color transform
            tbits = br.bits(3) + 2
            tw, th = _subsample_size(xsize, tbits), _subsample_size(h, tbits)
            timg = _vp8l_decode_pixels(br, tw, th, allow_meta=False)
            transforms.append((ttype, tbits, timg))
        elif ttype == 2:  # subtract green
            transforms.append((2, None, None))
        else:  # color indexing
            n_colors = br.bits(8) + 1
            pal = _vp8l_decode_pixels(br, n_colors, 1, allow_meta=False)
            pal = np.cumsum(pal.astype(np.int32), axis=0).astype(np.uint8)  # delta-coded
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append((3, (width_bits, pal), None))
            xsize = _subsample_size(xsize, width_bits)

    img = _vp8l_decode_pixels(br, xsize, h, allow_meta=True)

    cur_w = xsize
    for ttype, arg, timg in reversed(transforms):
        if ttype == 3:  # color indexing: unbundle + palette lookup
            width_bits, pal = arg
            if width_bits:
                per = 1 << width_bits
                px_bits = 8 >> width_bits
                mask = (1 << px_bits) - 1
                packed = img[:, 2].reshape(h, cur_w)
                idx = np.zeros((h, cur_w * per), dtype=np.int64)
                for k in range(per):
                    idx[:, k::per] = (packed >> (px_bits * k)) & mask
                idx = idx[:, :w]
            else:
                idx = img[:, 2].reshape(h, cur_w).astype(np.int64)
            idx = np.clip(idx, 0, len(pal) - 1)
            img = pal[idx.reshape(-1)]
            cur_w = w
        elif ttype == 2:  # add green back
            g = img[:, 2].astype(np.int32)
            img[:, 1] = ((img[:, 1].astype(np.int32) + g) & 0xFF).astype(np.uint8)
            img[:, 3] = ((img[:, 3].astype(np.int32) + g) & 0xFF).astype(np.uint8)
        elif ttype == 1:  # color transform inverse
            tbits, tw = arg, _subsample_size(cur_w, arg)
            ys, xs = np.divmod(np.arange(h * cur_w), cur_w)
            te = timg[(ys >> tbits) * tw + (xs >> tbits)]
            g2r, g2b, r2b = te[:, 3], te[:, 2], te[:, 1]
            red = img[:, 1].astype(np.int32) + _ct_delta(g2r, img[:, 2])
            img[:, 1] = (red & 0xFF).astype(np.uint8)
            blue = img[:, 3].astype(np.int32) + _ct_delta(g2b, img[:, 2])
            blue = blue + _ct_delta(r2b, (red & 0xFF).astype(np.uint8))
            img[:, 3] = (blue & 0xFF).astype(np.uint8)
        else:  # predictor inverse
            _inv_predictor(img, cur_w, h, timg, arg)

    rgb = img.reshape(h, w, 4)[:, :, 1:4]
    return rgb.copy()


def _huff_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Code lengths for a frequency table (plain package-free Huffman —
    fixture alphabets are small, so the 15-bit cap is asserted, not
    enforced by package-merge)."""
    import heapq

    if not freqs:
        return {}
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, [s]) for s, f in freqs.items()]
    heapq.heapify(heap)
    depth = dict.fromkeys(freqs, 0)
    while len(heap) > 1:
        fa, sa = heapq.heappop(heap)
        fb, sb = heapq.heappop(heap)
        for s in sa + sb:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, sa + sb))
    assert max(depth.values()) <= max_len, "fixture alphabet too deep"
    return depth


def _write_prefix_code(bw: _LsbWriter, lengths_by_sym: dict[int, int],
                       alphabet_size: int) -> dict[int, tuple[int, int]]:
    """Emit one prefix-code header (simple form when <= 2 symbols, else
    the code-length-coded normal form, no 16/17/18 repeats) and return
    symbol -> (code, length)."""
    syms = sorted(lengths_by_sym)
    if len(syms) <= 2 and all(s < 256 for s in syms):
        bw.write(1, 1)  # simple
        bw.write(len(syms) - 1, 1)
        if syms[0] > 1:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        else:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        if len(syms) == 2:
            bw.write(syms[1], 8)
            return {syms[0]: (0, 1), syms[1]: (1, 1)}
        return {syms[0]: (0, 0)}
    bw.write(0, 1)  # normal
    assert sum(2.0 ** -ln for ln in lengths_by_sym.values()) <= 1.0 + 1e-9, \
        "lengths_by_sym must be CODE LENGTHS (use _huff_lengths), not frequencies"
    lengths = [0] * alphabet_size
    for s, ln in lengths_by_sym.items():
        lengths[s] = ln
    cl_freq = {}
    for ln in lengths:
        cl_freq[ln] = cl_freq.get(ln, 0) + 1
    cl_lengths_by_sym = _huff_lengths(cl_freq, max_len=7)
    bw.write(15, 4)  # num_code_lengths = 19
    cl_arr = [0] * 19
    for s, ln in cl_lengths_by_sym.items():
        cl_arr[s] = ln
    for i in range(19):
        bw.write(cl_arr[_CL_ORDER[i]], 3)
    bw.write(0, 1)  # no explicit max_symbol
    cl_codes = _PrefixTree(cl_arr).codes()
    for ln in lengths:
        c, cl = cl_codes[ln]
        bw.write_code(c, cl)
    return _PrefixTree(lengths).codes()


def encode_webp_lossless(img: np.ndarray) -> bytes:
    """Minimal-feature VP8L encoder for fixtures/tests: no transforms,
    no color cache, no meta codes, no LZ77 — every pixel a literal
    through real canonical prefix codes (single-symbol, simple and
    normal tree forms all get exercised depending on channel entropy)."""
    h, w = img.shape[:2]
    bw = _LsbWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    flat = img.reshape(-1, 3)
    chans = {
        "g": flat[:, 1].tolist(),
        "r": flat[:, 0].tolist(),
        "b": flat[:, 2].tolist(),
        "a": [255] * len(flat),
    }

    def freq(vals):
        f = {}
        for v in vals:
            f[v] = f.get(v, 0) + 1
        return f

    codes = {}
    codes["g"] = _write_prefix_code(bw, _huff_lengths(freq(chans["g"])), 256 + 24)
    codes["r"] = _write_prefix_code(bw, _huff_lengths(freq(chans["r"])), 256)
    codes["b"] = _write_prefix_code(bw, _huff_lengths(freq(chans["b"])), 256)
    codes["a"] = _write_prefix_code(bw, _huff_lengths(freq(chans["a"])), 256)
    _write_prefix_code(bw, {0: 1}, 40)  # distance tree: unused single symbol
    for g, r, b, a in zip(chans["g"], chans["r"], chans["b"], chans["a"]):
        for ch, v in (("g", g), ("r", r), ("b", b), ("a", a)):
            c, ln = codes[ch][v]
            bw.write_code(c, ln)
    vp8l = bytes(bw.out)
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    return riff


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via pure index math (the vectorized
    equivalent of PIL's NEAREST)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).astype(np.int64)
    xs = (np.arange(out_w) * w // out_w).astype(np.int64)
    return img[ys][:, xs]


def image_features(img: np.ndarray) -> list[float]:
    """Fixed-length feature vector from a decoded RGB image: dims,
    global mean/std, and a 2x2 grid of region luma means (an 8-point
    thumbnail embedding) — all exactly computable, test-assertable."""
    h, w = img.shape[:2]
    luma = img.astype(np.float32).mean(axis=2)
    grid = resize_nearest(luma, 2, 2)
    return [
        float(w), float(h),
        float(luma.mean()), float(luma.std()),
        *[float(v) for v in grid.reshape(-1)],
    ]


def audio_features(samples: np.ndarray, rate: int) -> list[float]:
    """duration_ms, RMS, peak, zero-crossing rate over the first channel."""
    mono = samples[:, 0]
    n = len(mono)
    zc = float(np.count_nonzero(np.diff(np.signbit(mono)))) / max(n - 1, 1)
    return [
        float(n * 1000.0 / rate),
        float(np.sqrt(np.mean(mono**2))) if n else 0.0,
        float(np.abs(mono).max()) if n else 0.0,
        zc,
    ]


def video_features(payload: bytes, every: int = 2, limit: int = 8) -> list[float]:
    """Frame-sampled luma means + dims from a Y4M stream."""
    frames, w, h = decode_y4m_frames(payload, every=every, limit=limit)
    means = [float(f.mean()) for f in frames]
    return [float(w), float(h), float(len(means)), *means]

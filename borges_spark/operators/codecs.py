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

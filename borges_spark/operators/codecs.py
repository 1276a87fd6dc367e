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
# transforms over decoded arrays

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

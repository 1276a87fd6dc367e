"""Real pure-numpy media decoders (operators/codecs): BMP/PPM/WAV/Y4M
roundtrips, resize, feature math, and the tiered dispatch through the
multimodal Spark pipeline."""

import numpy as np
import pytest

from borges_spark.operators import codecs as C


def _test_image(w=6, h=4):
    rng = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
    return rng


def test_bmp_roundtrip_and_padding():
    img = _test_image(6, 4)  # row 6*3=18 bytes -> padded to 20
    blob = C.encode_bmp(img)
    assert C.sniff(blob) == "bmp"
    out = C.decode_bmp(blob)
    assert out.shape == (4, 6, 3)
    assert np.array_equal(out, img)


def test_ppm_decode_with_comment():
    img = _test_image(3, 2)
    blob = b"P6\n# a comment\n3 2\n255\n" + img.tobytes()
    assert C.sniff(blob) == "ppm"
    assert np.array_equal(C.decode_ppm(blob), img)


def test_wav_roundtrip_features():
    rate = 8000
    t = np.arange(rate // 10) / rate  # 100 ms
    mono = np.sin(2 * np.pi * 440 * t).astype(np.float32).reshape(-1, 1)
    blob = C.encode_wav(mono, rate)
    assert C.sniff(blob) == "wav"
    samples, got_rate = C.decode_wav(blob)
    assert got_rate == rate and samples.shape == (len(t), 1)
    assert np.allclose(samples[:, 0], mono[:, 0], atol=1e-3)
    dur_ms, rms, peak, zcr = C.audio_features(samples, rate)
    assert dur_ms == pytest.approx(100.0)
    assert rms == pytest.approx(1 / np.sqrt(2), abs=0.01)  # sine RMS
    assert peak == pytest.approx(1.0, abs=0.01)
    assert zcr > 0


def test_y4m_frame_sampling():
    frames = [np.full((4, 6), v, dtype=np.uint8) for v in (10, 20, 30, 40, 50)]
    blob = C.encode_y4m(frames)
    assert C.sniff(blob) == "y4m"
    sampled, w, h = C.decode_y4m_frames(blob, every=2)
    assert (w, h) == (6, 4)
    assert [f.mean() for f in sampled] == [10, 30, 50]  # every 2nd frame
    feats = C.video_features(blob, every=2)
    assert feats[:3] == [6.0, 4.0, 3.0]
    assert feats[3:] == [10.0, 30.0, 50.0]


def test_png_roundtrip_filters_0_and_2():
    img = _test_image(6, 5)
    for ft in (0, 2):
        blob = C.encode_png(img, filter_type=ft)
        assert C.sniff(blob) == "png"
        assert np.array_equal(C.decode_png(blob), img)


def test_png_all_filter_types_and_color_types():
    """Hand-build scanlines exercising every PNG filter (None/Sub/Up/
    Average/Paeth) and the gray/palette/RGBA color types, checked
    against an independent scalar reference reconstruction."""
    import struct
    import zlib

    rng = np.random.RandomState(5)
    w, h = 7, 5
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)

    # reference scalar filterer (spec text, not the decoder's code)
    def filt_row(ft, cur, prev):
        out = [ft]
        for x in range(w * 3):
            raw = int(cur[x])
            left = int(cur[x - 3]) if x >= 3 else 0
            up = int(prev[x])
            ul = int(prev[x - 3]) if x >= 3 else 0
            if ft == 0:
                out.append(raw % 256)
            elif ft == 1:
                out.append((raw - left) % 256)
            elif ft == 2:
                out.append((raw - up) % 256)
            elif ft == 3:
                out.append((raw - (left + up) // 2) % 256)
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                out.append((raw - pred) % 256)
        return bytes(out)

    rows = img.reshape(h, w * 3)
    zero = np.zeros(w * 3, dtype=np.uint8)
    scan = b"".join(
        filt_row(ft, rows[y], rows[y - 1] if y else zero)
        for y, ft in enumerate([0, 1, 2, 3, 4])
    )

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(C.decode_png(blob), img)

    # grayscale (type 0) and palette (type 3)
    gray = rng.randint(0, 256, size=(3, 4), dtype=np.uint8)
    gscan = b"".join(b"\x00" + gray[y].tobytes() for y in range(3))
    gblob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(gscan))
        + chunk(b"IEND", b"")
    )
    out = C.decode_png(gblob)
    assert np.array_equal(out, np.repeat(gray[..., None], 3, axis=2))

    plte = rng.randint(0, 256, size=(4, 3), dtype=np.uint8)
    pidx = rng.randint(0, 4, size=(3, 4), dtype=np.uint8)
    pscan = b"".join(b"\x00" + pidx[y].tobytes() for y in range(3))
    pblob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte.tobytes())
        + chunk(b"IDAT", zlib.compress(pscan))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(C.decode_png(pblob), plte[pidx])


def test_gif_roundtrip_and_lzw_growth():
    """Palette roundtrip through the real LZW coder — enough pixels that
    the decoder's code width grows past its initial size."""
    rng = np.random.RandomState(9)
    palette = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = rng.randint(0, 4, size=(40, 50), dtype=np.uint8)  # 2000 px -> width growth
    blob = C.encode_gif(idx, palette)
    assert C.sniff(blob) == "gif"
    out = C.decode_gif(blob)
    assert out.shape == (40, 50, 3)
    assert np.array_equal(out, palette[idx])


def test_gif_large_stream_hits_dictionary_clear():
    """>4094 codes forces the encoder's CLEAR-and-reset path and the
    decoder's dictionary rebuild."""
    palette = np.arange(256 * 3, dtype=np.uint8).reshape(256, 3) % 256
    idx = (np.arange(90 * 80, dtype=np.int64) % 256).astype(np.uint8).reshape(90, 80)
    blob = C.encode_gif(idx, palette)
    assert np.array_equal(C.decode_gif(blob), palette[idx])


def test_resize_nearest():
    img = _test_image(8, 8)
    small = C.resize_nearest(img, 4, 2)
    assert small.shape == (2, 4, 3)
    assert np.array_equal(small[0, 0], img[0, 0])  # corner preserved


def test_image_features_exact():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[2:, :, :] = 200  # bottom half bright
    f = C.image_features(img)
    assert f[0] == 4.0 and f[1] == 4.0
    assert f[2] == pytest.approx(100.0)  # global mean
    # 2x2 grid: top row 0, bottom row 200
    assert f[4:] == [0.0, 0.0, 200.0, 200.0]


def test_tiered_dispatch_through_spark_pipeline(spark):
    """Real BMP/WAV/Y4M blobs decode for real; a codec-bound payload
    takes the byte-moment fallback; all through the same mapInPandas."""
    from borges_spark.operators.multimodal import extract_features

    img = _test_image(4, 4)
    wav = C.encode_wav(np.zeros((800, 1), dtype=np.float32), 8000)
    y4m = C.encode_y4m([np.full((2, 4), 7, dtype=np.uint8)] * 3)
    rows = [
        ("bmp1", "image", "image/bmp", bytearray(C.encode_bmp(img)), None),
        ("wav1", "audio", "audio/wav", bytearray(wav), None),
        ("vid1", "video", "video/x-y4m", bytearray(y4m), None),
        ("jpg1", "image", "image/jpeg", bytearray(b"\xff\xd8\xe0fakejpeg"), None),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id string, kind string, mime string, payload binary, "
        "meta struct<width:int,height:int,duration_ms:bigint,sample_rate:int>",
    )
    got = {r["media_id"]: r for r in extract_features(df).collect()}
    assert all(got[m]["decode_ok"] for m in ("bmp1", "wav1", "vid1", "jpg1"))
    assert got["bmp1"]["feature"][0] == 4.0 and got["bmp1"]["feature"][1] == 4.0
    assert got["wav1"]["feature"][0] == pytest.approx(100.0)  # 800/8000 s
    assert got["vid1"]["feature"][:3] == [4.0, 2.0, 2.0]  # W,H,frames(every=2 of 3)
    # codec-bound fallback: deterministic byte moments
    fake = got["jpg1"]["feature"]
    assert fake[0] == float(len(b"\xff\xd8\xe0fakejpeg") % 251)


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT, ITU-T T.81)


def _jpeg_seg(marker, body):
    import struct

    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _jpeg_tables_gray():
    import struct

    dqt = _jpeg_seg(0xDB, b"\x00" + bytes(int(v) for v in C._JPEG_QUANT_LUMA[C._JPEG_ZIGZAG]))
    bits_dc, vals_dc = C._JPEG_HUFF_DC_LUMA
    bits_ac, vals_ac = C._JPEG_HUFF_AC_LUMA
    dht = _jpeg_seg(
        0xC4,
        bytes([0x00]) + bytes(bits_dc) + bytes(vals_dc)
        + bytes([0x10]) + bytes(bits_ac) + bytes(vals_ac),
    )
    return struct, dqt, dht


def test_jpeg_roundtrip_solid_and_gradient():
    """Encoder->decoder agreement with tight error bounds: a solid color
    is DC-only (error <= 1 from quantization rounding); a smooth
    gradient stays within a few counts. Exact equality is impossible —
    JPEG is lossy — so the bounds ARE the spec-level assertion."""
    img = np.full((16, 24, 3), [200, 64, 90], dtype=np.uint8)
    dec = C.decode_jpeg(C.encode_jpeg(img))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2
    yy, xx = np.mgrid[0:40, 0:56]
    grad = np.stack(
        [np.clip(yy * 3 + 20, 0, 255), np.clip(xx * 2 + 50, 0, 255), np.clip(yy + xx + 30, 0, 255)],
        axis=2,
    ).astype(np.uint8)
    dec2 = C.decode_jpeg(C.encode_jpeg(grad))
    err = np.abs(dec2.astype(int) - grad.astype(int))
    assert err.mean() < 3.0 and err.max() <= 12


def test_jpeg_even_gray_exact_and_odd_sizes():
    # even v: luma DC divides the quant step exactly, chroma DC is 0 —
    # the decode is bit-exact despite the lossy codec (the property the
    # multimodal_codecs oracle rows rely on)
    for v in (0, 128, 160, 254):
        img = np.full((10, 13, 3), v, dtype=np.uint8)
        assert (C.decode_jpeg(C.encode_jpeg(img)) == v).all()
    rng = np.random.default_rng(7)
    for shape in [(7, 5), (8, 8), (17, 31)]:
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        assert C.decode_jpeg(C.encode_jpeg(img)).shape == img.shape


def test_jpeg_noise_bounded_and_ff_stuffing():
    """Noise maximizes entropy-coded 0xFF bytes, exercising the byte
    (un)stuffing path; the reconstruction must stay JPEG-plausible."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    enc = C.encode_jpeg(img)
    assert b"\xff\x00" in enc  # stuffing actually occurred
    dec = C.decode_jpeg(enc)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 64


def test_jpeg_hand_built_spec_vector_flat_gray():
    """Fully hand-assembled 8x8 grayscale JPEG, independent of
    encode_jpeg: DC category 5 is canonical code '110' in the Annex K.3
    DC-luma table, amplitude 16 = '10000', EOB = '1010'; quantized DC
    16 * q0 16 = 256 -> flat (256/8 + 128) = 160. Verifies canonical
    Huffman assignment, dequant, IDCT and level shift end to end."""
    struct, dqt, dht = _jpeg_tables_gray()
    sof = _jpeg_seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    sos = _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    scan = bytes([0b11010000, 0b10101111])  # 110 10000 1010 + 1111 pad
    out = C.decode_jpeg(b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9")
    assert out.shape == (8, 8, 3) and (out == 160).all()


def test_jpeg_restart_markers_reset_predictor():
    """DRI=1 with an RST0 between two MCUs: each MCU re-encodes the SAME
    DC diff (predictor reset), and the reader must byte-align across the
    marker. Both halves must decode to flat 160."""
    struct, dqt, dht = _jpeg_tables_gray()
    dri = _jpeg_seg(0xDD, struct.pack(">H", 1))
    sof = _jpeg_seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    sos = _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    mcu = bytes([0b11010000, 0b10101111])  # 12 bits + pad-to-byte
    scan = mcu + b"\xff\xd0" + mcu
    out = C.decode_jpeg(b"\xff\xd8" + dqt + dri + sof + dht + sos + scan + b"\xff\xd9")
    assert out.shape == (8, 16, 3) and (out == 160).all()


def test_jpeg_420_subsampling_hand_vector():
    """Hand-built 4:2:0 MCU (Y 2x2 blocks + Cb + Cr): Y DC cat5 code
    '110'+'10000' then three zero-diff Y blocks ('00'+'1010'), chroma
    DC cat0 '00' + chroma EOB '00'. Exercises multi-block MCU order,
    per-table Huffman selection and chroma replication upsampling."""
    import struct as _s

    dqt = _jpeg_seg(
        0xDB,
        b"\x00" + bytes(int(v) for v in C._JPEG_QUANT_LUMA[C._JPEG_ZIGZAG])
        + b"\x01" + bytes(int(v) for v in C._JPEG_QUANT_CHROMA[C._JPEG_ZIGZAG]),
    )
    dht = _jpeg_seg(
        0xC4,
        bytes([0x00]) + bytes(C._JPEG_HUFF_DC_LUMA[0]) + bytes(C._JPEG_HUFF_DC_LUMA[1])
        + bytes([0x10]) + bytes(C._JPEG_HUFF_AC_LUMA[0]) + bytes(C._JPEG_HUFF_AC_LUMA[1])
        + bytes([0x01]) + bytes(C._JPEG_HUFF_DC_CHROMA[0]) + bytes(C._JPEG_HUFF_DC_CHROMA[1])
        + bytes([0x11]) + bytes(C._JPEG_HUFF_AC_CHROMA[0]) + bytes(C._JPEG_HUFF_AC_CHROMA[1]),
    )
    sof = _jpeg_seg(
        0xC0,
        _s.pack(">BHHB", 8, 16, 16, 3) + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = _jpeg_seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    # bits: Y1: 110 10000 1010 | Y2-4: 00 1010 | Cb: 00 00 | Cr: 00 00
    bits = "110100001010" + "001010" * 3 + "0000" + "0000"
    bits += "1" * (-len(bits) % 8)
    scan = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    out = C.decode_jpeg(b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9")
    assert out.shape == (16, 16, 3) and (out == 160).all()


def test_jpeg_rejects_progressive_and_sniffs():
    struct, dqt, dht = _jpeg_tables_gray()
    sof2 = _jpeg_seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(ValueError):
        C.decode_jpeg(b"\xff\xd8" + dqt + sof2 + b"\xff\xd9")
    img = np.full((8, 8, 3), 100, dtype=np.uint8)
    assert C.sniff(C.encode_jpeg(img)) == "jpeg"
    # a JPEG payload now decodes FOR REAL through the tiered dispatch
    from borges_spark.operators.multimodal import _decode_image

    f = _decode_image(C.encode_jpeg(np.full((6, 9, 3), 44, dtype=np.uint8)))
    assert f[:4] == [9.0, 6.0, 44.0, 0.0]


# ---------------------------------------------------------------------------
# WebP lossless (VP8L)


def _vp8l_stream(body_fn):
    """Build a RIFF/VP8L payload from a function that writes the
    post-header bitstream (transforms + image data) into an _LsbWriter
    already holding signature + dims; returns bytes."""
    import struct

    bw = C._LsbWriter()

    def finish():
        vp8l = bytes(bw.out)
        chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
        if len(vp8l) & 1:
            chunk += b"\x00"
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    return bw, finish


def _write_header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _write_single(bw, sym):
    """Simple prefix code, one symbol (0 bits per read)."""
    bw.write(1, 1)
    bw.write(0, 1)
    if sym > 1:
        bw.write(1, 1)
        bw.write(sym, 8)
    else:
        bw.write(0, 1)
        bw.write(sym, 1)


def _write_pair(bw, a, b):
    """Simple prefix code, two symbols: a -> bit 0, b -> bit 1."""
    bw.write(1, 1)
    bw.write(1, 1)
    if a > 1:
        bw.write(1, 1)
        bw.write(a, 8)
    else:
        bw.write(0, 1)
        bw.write(a, 1)
    bw.write(b, 8)


def test_webp_roundtrip_random_and_edge_shapes():
    rng = np.random.default_rng(3)
    for shape in [(1, 1), (2, 3), (9, 7), (16, 16)]:
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        webp = C.encode_webp_lossless(img)
        assert C.sniff(webp) == "webp"
        assert np.array_equal(C.decode_webp(webp), img)
    const = np.full((4, 6, 3), 77, dtype=np.uint8)
    assert np.array_equal(C.decode_webp(C.encode_webp_lossless(const)), const)


def test_webp_lz77_vertical_and_linear_distance():
    """Hand-built stream: row 0 as literals, row 1 via distance code 1
    (the (0,1) neighborhood entry -> the pixel directly above), plus a
    1x4 stream using a LINEAR distance (code 121 -> dist 1)."""
    w, h = 4, 2
    bw, finish = _vp8l_stream(None)
    _write_header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # green: literals {10, 20} + length-prefix sym 256 -> needs 3 syms,
    # use a NORMAL code via the encoder helper for exactness
    gcodes = C._write_prefix_code(bw, C._huff_lengths({10: 2, 20: 2, 256: 1}), 256 + 24)
    rcodes = C._write_prefix_code(bw, {1: 1, 2: 1}, 256)
    bcodes = C._write_prefix_code(bw, {5: 1, 6: 1}, 256)
    _write_single(bw, 255)  # alpha
    _write_single(bw, 0)    # distance tree: prefix 0 -> dist_code 1 -> (0,1)
    # row 0 literals: (r,g,b) = (1,10,5),(2,20,6),(1,10,5),(2,20,6)
    for g, r, b in [(10, 1, 5), (20, 2, 6), (10, 1, 5), (20, 2, 6)]:
        c, ln = gcodes[g]; bw.write_code(c, ln)
        c, ln = rcodes[r]; bw.write_code(c, ln)
        c, ln = bcodes[b]; bw.write_code(c, ln)
    # row 1: four length-1 copies from dist_code 1 == pixel above
    for _ in range(4):
        c, ln = gcodes[256]; bw.write_code(c, ln)  # length prefix 0 -> len 1
    img = C.decode_webp(finish())
    assert np.array_equal(img[1], img[0])
    assert [tuple(p) for p in img[0]] == [(1, 10, 5), (2, 20, 6), (1, 10, 5), (2, 20, 6)]

    # linear distance: 1x4, literal then 3 copies at dist 1 (code 121 =
    # prefix 13 + 5 extra bits of 24)
    bw, finish = _vp8l_stream(None)
    _write_header(bw, 4, 1)
    bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    gcodes = C._write_prefix_code(bw, {33: 1, 256: 3}, 256 + 24)
    _write_single(bw, 7)    # red
    _write_single(bw, 9)    # blue
    _write_single(bw, 255)  # alpha
    _write_single(bw, 13)   # distance prefix 13
    c, ln = gcodes[33]; bw.write_code(c, ln)
    for _ in range(3):
        c, ln = gcodes[256]; bw.write_code(c, ln)
        bw.write(24, 5)  # extra bits: (2+1)<<5=96; 96+24+1 = 121 -> dist 1
    img = C.decode_webp(finish())
    assert [tuple(p) for p in img[0]] == [(7, 33, 9)] * 4


def test_webp_color_cache():
    """Literal inserts into a 2-entry cache; a cache symbol replays it."""
    argb = (255 << 24) | (1 << 16) | (2 << 8) | 3
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> 31  # cache_bits = 1
    bw, finish = _vp8l_stream(None)
    _write_header(bw, 2, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # cache present
    bw.write(1, 4)  # cache_bits = 1
    bw.write(0, 1)  # no meta
    # cache symbols exceed 8 bits, so the green tree must use the
    # NORMAL form (simple codes carry 8-bit symbols only)
    gcodes = C._write_prefix_code(bw, {2: 1, 280 + idx: 1}, 256 + 24 + 2)
    _write_single(bw, 1)    # red
    _write_single(bw, 3)    # blue
    _write_single(bw, 255)  # alpha
    _write_single(bw, 0)    # distance (unused)
    c, ln = gcodes[2]; bw.write_code(c, ln)
    c, ln = gcodes[280 + idx]; bw.write_code(c, ln)  # cache symbol
    img = C.decode_webp(finish())
    assert [tuple(p) for p in img[0]] == [(1, 2, 3), (1, 2, 3)]


def test_webp_subtract_green_transform():
    """Stored residuals r-g, b-g reconstruct to the original colors."""
    target = [(30, 100, 250), (200, 7, 7)]
    bw, finish = _vp8l_stream(None)
    _write_header(bw, 2, 1)
    bw.write(1, 1)  # transform present
    bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    g_syms = {t[1] for t in target}
    r_syms = {(t[0] - t[1]) % 256 for t in target}
    b_syms = {(t[2] - t[1]) % 256 for t in target}
    gcodes = C._write_prefix_code(bw, {s: 1 for s in g_syms}, 256 + 24)
    rcodes = C._write_prefix_code(bw, {s: 1 for s in r_syms}, 256)
    bcodes = C._write_prefix_code(bw, {s: 1 for s in b_syms}, 256)
    _write_single(bw, 255)
    _write_single(bw, 0)
    for r, g, b in target:
        c, ln = gcodes[g]; bw.write_code(c, ln)
        c, ln = rcodes[(r - g) % 256]; bw.write_code(c, ln)
        c, ln = bcodes[(b - g) % 256]; bw.write_code(c, ln)
    img = C.decode_webp(finish())
    assert [tuple(p) for p in img[0]] == target


def test_webp_predictor_modes_inverse_matches_forward():
    """_inv_predictor inverts an independently-written forward predictor
    for every mode 0..13 (random images, 2x2 blocks, edge rules)."""
    rng = np.random.default_rng(11)

    def fwd_pred(orig, w, h, mode, bits):
        def avg2(a, b):
            return (a.astype(np.int32) + b.astype(np.int32)) >> 1
        res = np.zeros_like(orig)
        for pos in range(h * w):
            x, y = pos % w, pos // w
            if pos == 0:
                p = np.array([255, 0, 0, 0], dtype=np.int32)
            elif y == 0:
                p = orig[pos - 1].astype(np.int32)
            elif x == 0:
                p = orig[pos - w].astype(np.int32)
            else:
                L, T = orig[pos - 1].astype(np.int32), orig[pos - w].astype(np.int32)
                TL, TR = orig[pos - w - 1].astype(np.int32), orig[pos - w + 1].astype(np.int32)
                # spec semantics (r6/ADVICE): Select is strict pL < pT
                # (ties -> T); AddSubtractHalf truncates toward zero
                half = np.array(
                    [int((int(a) - int(b)) / 2) for a, b in zip(avg2(L, T), TL)],
                    dtype=np.int32,
                )
                p = [np.array([255, 0, 0, 0], dtype=np.int32), L, T, TR, TL,
                     avg2(avg2(L, TR), T), avg2(L, TL), avg2(L, T), avg2(TL, T),
                     avg2(T, TR), avg2(avg2(L, TL), avg2(T, TR)),
                     L if np.abs((L + T - TL) - L).sum() < np.abs((L + T - TL) - T).sum() else T,
                     np.clip(L + T - TL, 0, 255),
                     np.clip(avg2(L, T) + half, 0, 255)][mode]
            res[pos] = ((orig[pos].astype(np.int32) - p) & 0xFF).astype(np.uint8)
        return res

    w, h, bits = 5, 4, 1
    pw, ph = C._subsample_size(w, bits), C._subsample_size(h, bits)
    for mode in range(14):
        orig = rng.integers(0, 256, (h * w, 4), dtype=np.uint8)
        pred_img = np.zeros((pw * ph, 4), dtype=np.uint8)
        pred_img[:, 2] = mode
        res = fwd_pred(orig, w, h, mode, bits)
        C._inv_predictor(res, w, h, pred_img, bits)
        assert np.array_equal(res, orig), f"mode {mode}"


def test_webp_color_indexing_bundled():
    """3-color palette (delta-coded) with 2-pixels-per-byte bundling."""
    pal = [(9, 18, 27), (100, 110, 120), (250, 0, 5)]
    idx = [0, 1, 2, 1, 0]  # 5 pixels wide, 1 row -> bundled width 3
    bw, finish = _vp8l_stream(None)
    _write_header(bw, 5, 1)
    bw.write(1, 1)  # transform present
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(2, 8)  # n_colors - 1 = 2
    # palette stream (3x1 image): literals are DELTAS (a delta 255, r/g/b deltas)
    deltas = []
    prev = (0, 0, 0, 0)  # a, r, g, b
    for p in pal:
        cur = (255, *p)
        deltas.append(tuple((c - q) % 256 for c, q in zip(cur, prev)))
        prev = cur
    bw.write(0, 1)  # palette stream: no cache
    gcodes = C._write_prefix_code(bw, C._huff_lengths({d[2]: 1 for d in deltas}), 256 + 24)
    rcodes = C._write_prefix_code(bw, C._huff_lengths({d[1]: 1 for d in deltas}), 256)
    bcodes = C._write_prefix_code(bw, C._huff_lengths({d[3]: 1 for d in deltas}), 256)
    acodes = C._write_prefix_code(bw, C._huff_lengths({d[0]: 1 for d in deltas}), 256)
    _write_single(bw, 0)
    for a, r, g, b in deltas:
        c, ln = gcodes[g]; bw.write_code(c, ln)
        c, ln = rcodes[r]; bw.write_code(c, ln)
        c, ln = bcodes[b]; bw.write_code(c, ln)
        c, ln = acodes[a]; bw.write_code(c, ln)
    bw.write(0, 1)  # no more transforms
    # main (bundled) stream: 3 colors -> width_bits=2 (four 2-bit
    # indices per byte, first pixel in the LOW bits), width ceil(5/4)=2
    packed = [idx[0] | (idx[1] << 2) | (idx[2] << 4) | (idx[3] << 6), idx[4]]
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    gcodes = C._write_prefix_code(bw, C._huff_lengths({v: 1 for v in set(packed)}), 256 + 24)
    _write_single(bw, 0)
    _write_single(bw, 0)
    _write_single(bw, 255)
    _write_single(bw, 0)
    for v in packed:
        c, ln = gcodes[v]; bw.write_code(c, ln)
    img = C.decode_webp(finish())
    assert [tuple(p) for p in img[0]] == [pal[i] for i in idx]


def test_webp_color_transform():
    """1x1 transform element applied to a 2x1 image — inverse per spec:
    red += (int8(g2r)*int8(g)) >> 5, blue += g2b- and r2b-deltas."""
    g2r, g2b, r2b = 64, 32, 16  # positive multipliers
    stored = [(10, 200, 77), (250, 40, 1)]  # stored (r, g, b) residuals

    def delta(t, c):
        t8 = t - 256 if t > 127 else t
        c8 = c - 256 if c > 127 else c
        return (t8 * c8) >> 5

    expect = []
    for r, g, b in stored:
        red = (r + delta(g2r, g)) & 0xFF
        blue = (b + delta(g2b, g) + delta(r2b, red)) & 0xFF
        expect.append((red, g, blue))

    bw, finish = _vp8l_stream(None)
    _write_header(bw, 2, 1)
    bw.write(1, 1)  # transform present
    bw.write(1, 2)  # COLOR_TRANSFORM
    bw.write(1, 3)  # size_bits = 3 -> 1x1 element image
    bw.write(0, 1)  # element stream: no cache
    _write_single(bw, g2b)  # green channel = green_to_blue
    _write_single(bw, r2b)  # red channel = red_to_blue
    _write_single(bw, g2r)  # blue channel = green_to_red
    _write_single(bw, 255)
    _write_single(bw, 0)
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    gcodes = C._write_prefix_code(bw, {s[1]: 1 for s in stored}, 256 + 24)
    rcodes = C._write_prefix_code(bw, {s[0]: 1 for s in stored}, 256)
    bcodes = C._write_prefix_code(bw, {s[2]: 1 for s in stored}, 256)
    _write_single(bw, 255)
    _write_single(bw, 0)
    for r, g, b in stored:
        c, ln = gcodes[g]; bw.write_code(c, ln)
        c, ln = rcodes[r]; bw.write_code(c, ln)
        c, ln = bcodes[b]; bw.write_code(c, ln)
    img = C.decode_webp(finish())
    assert [tuple(p) for p in img[0]] == expect


def test_webp_meta_prefix_groups():
    """8x1 image, huffman_bits=2 -> two 4-pixel groups with different
    literal trees; the entropy image routes each half to its tree."""
    bw, finish = _vp8l_stream(None)
    _write_header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta prefix codes present
    bw.write(0, 3)  # huffman_bits = 2 -> meta image 2x1
    # entropy image (2x1): group ids 0 and 1 in (red<<8 | green)
    bw.write(0, 1)  # entropy stream: no cache
    _write_pair(bw, 0, 1)   # green: group id
    _write_single(bw, 0)    # red
    _write_single(bw, 0)    # blue
    _write_single(bw, 255)  # alpha
    _write_single(bw, 0)    # distance
    bw.write_code(0, 1)  # first meta pixel -> group 0
    bw.write_code(1, 1)  # second -> group 1
    # group 0 trees: literal green 11 / r 1 / b 2
    _write_single(bw, 11); _write_single(bw, 1); _write_single(bw, 2)
    _write_single(bw, 255); _write_single(bw, 0)
    # group 1 trees: literal green 99 / r 3 / b 4
    _write_single(bw, 99); _write_single(bw, 3); _write_single(bw, 4)
    _write_single(bw, 255); _write_single(bw, 0)
    # 8 pixels, all zero-bit reads from their group's single-symbol trees
    img = C.decode_webp(finish())
    assert [tuple(p) for p in img[0][:4]] == [(1, 11, 2)] * 4
    assert [tuple(p) for p in img[0][4:]] == [(3, 99, 4)] * 4


def test_webp_dispatch_and_lossy_fallback(spark):
    from borges_spark.operators.multimodal import _decode_image

    f = _decode_image(C.encode_webp_lossless(np.full((6, 9, 3), 44, dtype=np.uint8)))
    assert f[:4] == [9.0, 6.0, 44.0, 0.0]
    # a lossy 'VP8 ' payload routes to the documented fallback, not a crash
    import struct as _s
    body = b"VP8 " + _s.pack("<I", 4) + b"\x00\x00\x00\x00"
    lossy = b"RIFF" + _s.pack("<I", 4 + len(body)) + b"WEBP" + body
    assert C.sniff(lossy) == "webp"
    f = _decode_image(lossy)
    assert len(f) == 4  # byte-moment fallback vector


def test_vp8l_distance_map_matches_spec_table():
    """r6 (ADVICE): the 2D distance map must be the spec's fixed
    120-entry table (RFC 9649 'distance mapping' / libwebp
    kCodeToPlaneCodes with xoffset = 8-(b&0xF), yoffset = b>>4) —
    domain dy 0..7 x dx -7..8, nothing truncated. Spot-pin the
    published head of the table, the far tail the old generator
    displaced, and the plane-code domain."""
    m = C._vp8l_dist_map()
    assert len(m) == 120
    # head of the published table
    assert m[:12] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
                      (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2)]
    # far entries that the off-spec dy<=8/|dx|<=8 enumeration displaced
    assert (8, 4) in m and (7, 6) in m and (7, 7) in m and (8, 7) in m
    assert m[-1] == (8, 7) and m[-2] == (8, 6)
    # plane-code domain: every entry encodes to a valid code byte
    for dx, dy in m:
        assert 0 <= dy <= 7 and -7 <= dx <= 8
        b = (dy << 4) | (8 - dx)
        assert 0 <= b < 128
    assert len(set(m)) == 120

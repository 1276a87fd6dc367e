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

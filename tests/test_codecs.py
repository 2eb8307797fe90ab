"""Round-trip tests for the real dependency-free media codecs."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mex_extractors_ray.stages.multimodal import (
    StdlibCodec,
    decode_ppm,
    decode_wav,
    decode_wav_pcm16,
    encode_ppm,
    encode_wav,
    resize_nearest,
)


def test_ppm_roundtrip_rgb_and_gray():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    gray = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(gray)), gray)


def test_ppm_header_comments_tolerated():
    img = np.full((2, 3, 3), 9, np.uint8)
    raw = encode_ppm(img)
    # inject a comment line after the magic
    commented = b"P6\n# made by a test\n" + raw[3:]
    assert np.array_equal(decode_ppm(commented), img)


def test_ppm_rejects_non_netpbm_and_16bit():
    with pytest.raises(ValueError):
        decode_ppm(b"\x89PNG\r\n")
    img = np.zeros((1, 1, 3), np.uint8)
    deep = encode_ppm(img).replace(b"255", b"65535")
    with pytest.raises(ValueError):
        decode_ppm(deep)


def test_resize_nearest_exact_on_integer_scale():
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    up = resize_nearest(img, 4, 4)
    assert up.shape == (4, 4, 3)
    assert np.array_equal(up[::2, ::2], img)
    down = resize_nearest(up, 2, 2)
    assert np.array_equal(down, img)


def test_wav_roundtrip_int16_and_float():
    pcm = np.array([0, 1000, -1000, 32767, -32767], dtype=np.int16)
    got, rate = decode_wav_pcm16(encode_wav(pcm, rate=8000))
    assert rate == 8000 and np.array_equal(got, pcm)
    f = np.array([0.0, 0.5, -0.5, 1.0, -1.0])
    gotf, _ = decode_wav(encode_wav(f, rate=16000))
    assert np.allclose(gotf, f, atol=1.5 / 32767)


def test_wav_tolerates_extra_riff_chunks():
    pcm = np.array([7, -7], dtype=np.int16)
    raw = encode_wav(pcm, rate=8000)
    # splice a LIST chunk between fmt and data (odd size -> pad byte)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    spliced = raw[:fmt_end] + extra + raw[fmt_end:]
    got, rate = decode_wav_pcm16(spliced)
    assert rate == 8000 and np.array_equal(got, pcm)


def test_wav_rejects_non_pcm_and_garbage():
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"OggS" + b"\x00" * 40)
    raw = bytearray(encode_wav(np.array([1], dtype=np.int16)))
    raw[20] = 3  # fmt code -> IEEE float
    with pytest.raises(NotImplementedError):
        decode_wav_pcm16(bytes(raw))


def test_stdlib_codec_dispatch_and_honest_stub():
    img = np.full((2, 2, 3), 4, np.uint8)
    c = StdlibCodec()
    assert np.array_equal(
        c.decode(encode_ppm(img), "image/x-portable-pixmap"), img)
    wav = encode_wav(np.array([100], dtype=np.int16))
    assert c.decode(wav, "audio/wav").shape == (1,)
    with pytest.raises(NotImplementedError):
        c.decode(b"\xff\xd8\xff", "image/jpeg")  # PIL absent in this container
    with pytest.raises(NotImplementedError):
        c.decode(b"x", "video/mp4")


# --- PNG (round 5: pure-stdlib zlib + five filters) ----------------------


def _png_mods():
    from mex_extractors_ray.stages.multimodal import (
        _png_chunk, _PNG_SIG, decode_png, encode_png,
    )
    return _png_chunk, _PNG_SIG, decode_png, encode_png


def test_png_roundtrip_all_shapes_and_filters():
    _, _, decode_png, encode_png = _png_mods()
    rng = np.random.default_rng(3)
    for shape in [(7, 5), (6, 4, 2), (9, 3, 3), (5, 8, 4), (1, 1), (3, 1, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for f in [0, 1, 2, 3, 4, "cycle"]:
            out = decode_png(encode_png(img, f))
            assert out.shape == img.shape and np.array_equal(out, img), (shape, f)


def test_png_palette_decode():
    import zlib

    _png_chunk, _PNG_SIG, decode_png, _ = _png_mods()
    idx = np.array([[0, 1], [2, 1]], np.uint8)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = b"".join(b"\x00" + r.tobytes() for r in idx)
    png = (_PNG_SIG
           + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
           + _png_chunk(b"PLTE", plte)
           + _png_chunk(b"IDAT", zlib.compress(raw))
           + _png_chunk(b"IEND", b""))
    out = decode_png(png)
    assert out.shape == (2, 2, 3)
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[1, 0].tolist() == [0, 0, 255]
    assert out[0, 1].tolist() == [0, 255, 0]


def test_png_crc_tamper_and_refusals():
    import zlib

    _png_chunk, _PNG_SIG, decode_png, encode_png = _png_mods()
    bad = bytearray(encode_png(np.zeros((2, 2), np.uint8)))
    bad[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    # Adam7 interlace: honest refusal
    png_i = (_PNG_SIG
             + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1))
             + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
             + _png_chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="Adam7"):
        decode_png(png_i)
    # 16-bit depth: refusal
    png_16 = (_PNG_SIG
              + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0))
              + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
              + _png_chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(png_16)


def test_stdlib_codec_dispatches_png():
    _, _, _, encode_png = _png_mods()
    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    out = StdlibCodec().decode(encode_png(img, "cycle"), "image/png")
    assert np.array_equal(out, img)


def test_kmeans_train_history_monotone(ray_session):
    import pyarrow as pa
    import ray

    from mex_extractors_ray.stages.clustering import kmeans_train

    rng = np.random.default_rng(5)
    vecs = np.concatenate([rng.normal(c, 0.3, size=(30, 4))
                           for c in (0.0, 5.0, 10.0)])
    t = pa.table({
        "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
    })
    c, hist = kmeans_train(ray.data.from_arrow(t), k=3, n_iter=4,
                           return_history=True)
    assert c.shape == (3, 4)
    assert len(hist) == 4
    assert all(b <= a * (1 + 1e-12) + 1e-12 for a, b in zip(hist, hist[1:]))


def test_png_truncated_chunk_raises_valueerror():
    _, _, decode_png, encode_png = _png_mods()
    full = encode_png(np.full((16, 16), 7, np.uint8))
    idat = full.index(b"IDAT")
    # cut mid-IDAT: the header still parses, the declared length overruns
    with pytest.raises(ValueError, match="truncated"):
        decode_png(full[:idat + 10])


def test_media_stats_gray_alpha_png_excludes_alpha(ray_session):
    import pyarrow as pa
    import ray

    from mex_extractors_ray.stages import multimodal as mm

    img = np.zeros((3, 5, 2), np.uint8)
    img[..., 0] = 10   # gray channel: sum = 150
    img[..., 1] = 255  # alpha: must NOT leak into sum_g
    t = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "media_type": pa.array(["image/png"]),
        "payload": pa.array([mm.encode_png(img)], pa.binary()),
    })
    out = mm.media_stats(ray.data.from_arrow(t), concurrency=(1, 2)).to_pandas()
    r = out.iloc[0]
    assert (r["width"], r["height"]) == (5, 3)
    assert r["sum_r"] == 150 and r["sum_g"] == 0 and r["sum_b"] == 0

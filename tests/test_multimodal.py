"""Multimodal binary-column plumbing tests (SURVEY §2.D D5): schema,
batch shape, determinism, and strict-mode stubs for the codec-free
environment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
    attach_binary_payload,
    decode_features,
    resize_images,
    sample_frames,
)
from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load


def _media(spark, sf_dir):
    return attach_binary_payload(load(spark, sf_dir, "documents"), "text", "doc_id")


def test_resize_images_exact_target_size(spark, sf_dir):
    media = _media(spark, sf_dir)
    out = resize_images(media, width=16, height=8)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "media_type", "payload", "width", "height",
    ]
    sizes = out.select(F.length("payload").alias("n")).distinct().collect()
    assert [r["n"] for r in sizes] == [16 * 8]
    assert out.count() == media.count()


def test_resize_images_deterministic(spark, sf_dir):
    media = _media(spark, sf_dir)
    a = {r["media_id"]: bytes(r["payload"]) for r in resize_images(media, 8, 8).collect()}
    b = {r["media_id"]: bytes(r["payload"]) for r in resize_images(media, 8, 8).collect()}
    assert a == b


def test_sample_frames_real_avi_demux(spark):
    """sample_frames is a REAL AVI demux: frame counts follow the
    container's movi chunks, every frame re-encodes as a decodable BMP
    whose pixels match the generator's closed form."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        _bmp_decode_px,
        attach_avi_payload,
    )

    ids = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    media = attach_avi_payload(ids, "doc_id")
    frames = sample_frames(media, every_n=2).collect()
    by_media: dict[int, list] = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    for i in range(20):
        n_frames = 2 + i % 5
        expected_idx = list(range(0, n_frames, 2))
        rows = sorted(by_media[i], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rows] == expected_idx
        for r in rows:
            px = _bmp_decode_px(bytes(r["frame"]))
            f = r["frame_idx"]
            assert px.shape == (4, 6, 3)
            assert (px[..., 0] == (i + f) % 256).all()
            assert (px[..., 1] == (i * 3 + f * 5) % 256).all()
            assert (px[..., 2] == (i * 7 + f * 11) % 256).all()


def test_strict_mode_raises_where_codec_would_plug_in(spark, sf_dir):
    media = _media(spark, sf_dir).limit(2)
    for op, pat in (
        (lambda: decode_features(media, strict=True).collect(),
         "NotImplementedError|not present"),
        (lambda: resize_images(media, 4, 4, strict=True).collect(),
         "NotImplementedError|not present"),
        # sample_frames has NO fake path left: non-AVI bytes always raise
        (lambda: sample_frames(media).collect(), "RIFF|AVI|Python worker"),
    ):
        with pytest.raises(Exception, match=pat):
            op()


def test_resize_images_real_bmp_and_png_path(spark):
    """resize_images on BMP/PNG input is a real decode -> NN resample ->
    BMP re-encode, exact to the pixel — strict mode included."""
    import numpy as np

    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        _bmp_decode_px,
        _bmp_gradient_bytes,
        _nn_resample,
        _png_bytes,
        attach_bmp_gradient_payload,
    )

    ids = spark.range(0, 15).select(F.col("id").alias("doc_id"))
    media = attach_bmp_gradient_payload(ids, "doc_id").withColumn(
        "media_type", F.lit("image/bmp")
    )
    out = {
        r["media_id"]: bytes(r["payload"])
        for r in resize_images(media, width=5, height=4, strict=True).collect()
    }
    for i in range(15):
        got = _bmp_decode_px(out[i])
        want = _nn_resample(_bmp_decode_px(_bmp_gradient_bytes(i)), 5, 4)
        assert np.array_equal(got, want), f"pixel mismatch for id {i}"

    # PNG input takes the same real path (decode -> resample -> BMP out)
    png_media = spark.createDataFrame(
        [(9, "image/png", _png_bytes(9))],
        "media_id long, media_type string, payload binary",
    )
    r = resize_images(png_media, width=4, height=4, strict=True).collect()[0]
    px = _bmp_decode_px(bytes(r["payload"]))
    # solid-color PNG: every resampled pixel keeps the generator color
    assert (px[..., 0] == 9 % 256).all()
    assert (px[..., 1] == (9 * 11) % 256).all()
    assert (px[..., 2] == (9 * 3) % 256).all()
    assert r["media_type"] == "image/bmp"


def test_strict_mode_real_codec_for_self_describing_formats(spark):
    """decode_features(strict=True) must NOT raise for WAV/BMP payloads:
    magic-byte sniffing routes them to the real pure-stdlib codecs, and
    the feature vector carries the parsed header fields."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        _bmp_bytes,
        _wav_bytes,
    )

    rows = [
        (1, "audio/wav", _wav_bytes(1)),
        (2, "image/bmp", _bmp_bytes(2)),
    ]
    media = spark.createDataFrame(rows, "media_id long, media_type string, payload binary")
    got = {r["media_id"]: r["features"] for r in decode_features(media, strict=True).collect()}
    # WAV id=1: rate 8000, n = 100 + (1 % 50) * 10 = 110 samples, rms 1000
    assert got[1][0] == 8000.0
    assert got[1][1] == 110.0
    assert got[1][3] == 1000.0
    # BMP id=2: width 4 + 2 % 13 = 6, height 3 + 2 % 7 = 5, mean_r = 2
    assert got[2][:3] == [6.0, 5.0, 2.0]


def test_wav_decode_real_parse(spark):
    """The WAV path is a real parser: it reads rate/bits/samples from the
    bytes (not from metadata), and rejects non-RIFF payloads."""
    import numpy as np
    import pytest

    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        _wav_bytes,
        attach_wav_payload,
        decode_wav_features,
    )

    # driver-side: parse is byte-faithful
    b = _wav_bytes(7)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    df = spark.createDataFrame([(7,)], "media_id LONG")
    feats = decode_wav_features(attach_wav_payload(df, "media_id")).collect()[0]
    n = 100 + (7 % 50) * 10
    assert feats["n_samples"] == n
    assert feats["sample_rate"] == 8000
    assert feats["duration_ms"] == n / 8.0
    assert feats["rms"] == 1000.0 and feats["peak"] == 1000

    # corrupt payload fails loudly, not silently
    from pyspark.sql import functions as F

    bad = spark.createDataFrame([(1,)], "media_id LONG").select(
        "media_id", F.lit(b"not a wav at all").alias("payload")
    )
    with pytest.raises(Exception, match="RIFF|WAVE|Python worker"):
        decode_wav_features(bad).collect()


def test_bmp_decode_real_parse(spark):
    """BMP parse is byte-faithful: stride padding handled, BGR order
    flipped to RGB means, non-BMP rejected."""
    import pytest

    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        _bmp_bytes,
        attach_bmp_payload,
        decode_bmp_features,
    )

    assert _bmp_bytes(5)[:2] == b"BM"
    df = spark.createDataFrame([(5,)], "media_id LONG")
    r = decode_bmp_features(attach_bmp_payload(df, "media_id")).collect()[0]
    assert (r["width"], r["height"]) == (4 + 5 % 13, 3 + 5 % 7)
    assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (5 % 256, 35 % 256, 65 % 256)

    from pyspark.sql import functions as F

    bad = spark.createDataFrame([(1,)], "media_id LONG").select(
        "media_id", F.lit(b"GIF89a nope").alias("payload")
    )
    with pytest.raises(Exception, match="BMP|Python worker"):
        decode_bmp_features(bad).collect()


def test_png_codec_roundtrip_and_integrity(spark):
    """PNG path is a real decoder: filter-cycling payloads round-trip to
    the generator's closed-form geometry/colors, corrupted CRCs are
    rejected, and strict-mode decode_features routes PNG to the real
    parser."""
    import pytest

    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        _png_bytes,
        _png_feats,
        attach_png_payload,
        decode_png_features,
    )
    from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load  # noqa: F401

    # distributed decode matches the closed form
    ids = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    media = attach_png_payload(ids, "doc_id")
    for r in decode_png_features(media).collect():
        i = r["media_id"]
        assert (r["width"], r["height"]) == (3 + i % 11, 2 + i % 5)
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (
            i % 256, (i * 11) % 256, (i * 3) % 256,
        )

    # integrity: flipping a payload byte must fail the CRC check
    p = bytearray(_png_bytes(5))
    p[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        _png_feats(bytes(p))

    # strict mode real-codec dispatch
    m = spark.createDataFrame(
        [(9, "image/png", _png_bytes(9))],
        "media_id long, media_type string, payload binary",
    )
    feats = decode_features(m, strict=True).collect()[0]["features"]
    assert feats[:2] == [3.0 + 9 % 11, 2.0 + 9 % 5]


# --- GIF / LZW codec --------------------------------------------------------


def test_gif_lzw_roundtrip_edge_cases():
    import numpy as np

    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    cases = [
        [0],                          # single pixel
        [5] * 400,                    # KwKwK territory: long single-symbol run
        [0, 1] * 300,                 # repeating bigram
        list(range(16)) * 60,         # cycles through the whole palette
        ((np.arange(9000) * 7) % 16).tolist(),  # long stream: width growth + reset
    ]
    for seq in cases:
        enc = _gif_lzw_encode(seq, 4)
        dec = _gif_lzw_decode(enc, 4, len(seq))
        assert dec.tolist() == seq


def test_gif_lzw_roundtrip_random_streams():
    import numpy as np

    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    rng = np.random.default_rng(11)
    # 30000 incompressible symbols push past 4096 dictionary entries, so
    # the 12-bit table-full re-CLEAR path is exercised, not just growth.
    for n in (1, 7, 80, 1000, 5000, 30000):
        seq = rng.integers(0, 16, n).tolist()
        assert _gif_lzw_decode(_gif_lzw_encode(seq, 4), 4, n).tolist() == seq


def test_gif_full_decode_matches_generator_closed_form():
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        _gif_bytes,
        _gif_feats,
        _gif_palette,
    )

    for mid in (0, 3, 17, 88, 255, 1001):
        w, h, n, sr, sg, sb = _gif_feats(_gif_bytes(mid))
        assert (w, h, n) == (4 + mid % 9, 3 + mid % 5, 2 + mid % 3)
        pal = _gif_palette(mid)
        exp = [0, 0, 0]
        for f in range(n):
            for y in range(h):
                for x in range(w):
                    c = pal[(mid + 3 * x + 5 * y + 7 * f) % 16]
                    for j in range(3):
                        exp[j] += c[j]
        assert [sr, sg, sb] == exp


def test_gif_sniff_routes_to_real_decoder_in_strict_mode():
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        _gif_bytes,
        _sniff_decode,
    )

    mid = 42
    feats = _sniff_decode(_gif_bytes(mid), strict=True)
    assert feats[0] == float(4 + mid % 9)
    assert feats[1] == float(3 + mid % 5)
    assert feats[2] == float(2 + mid % 3)


def test_jpeg_tile_roundtrip_bit_exact():
    """The synthesized constant-tile JPEGs decode BIT-EXACTLY (quantized
    DCs are integers by construction) — the property the hash-checked
    oracle relies on."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        _jpeg_bytes,
        _jpeg_decode_px,
        _jpeg_tile_value,
    )

    for mid in range(24):
        px = _jpeg_decode_px(_jpeg_bytes(mid))
        wt, ht = 2 + (mid % 3), 1 + (mid % 2)
        assert px.shape == (8 * ht, 8 * wt)
        for t in range(wt * ht):
            by, bx = (t // wt) * 8, (t % wt) * 8
            assert (px[by : by + 8, bx : bx + 8] == _jpeg_tile_value(mid, t)).all()


def test_jpeg_general_encode_decode_error_bound():
    """Full-FDCT encode -> decode on arbitrary images stays within the
    flat-q=16 quantization error envelope; smooth gradients come back
    near-losslessly; the Nyquist checkerboard (nonzero AC at zigzag 63,
    the no-EOB path) survives."""
    import numpy as np

    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        _jpeg_decode_px,
        _jpeg_encode_px,
    )

    rng = np.random.default_rng(11)
    for _ in range(3):
        px = rng.integers(0, 256, (16, 24)).astype(np.uint8)
        back = _jpeg_decode_px(_jpeg_encode_px(px))
        err = np.abs(back.astype(int) - px.astype(int))
        assert err.max() <= 40 and err.mean() <= 10

    ys, xs = np.mgrid[0:16, 0:24]
    smooth = ((ys * 3 + xs * 2) % 200 + 20).astype(np.uint8)
    back = _jpeg_decode_px(_jpeg_encode_px(smooth))
    assert np.abs(back.astype(int) - smooth.astype(int)).max() <= 8

    checker = np.zeros((8, 8), dtype=np.uint8)
    checker[::2, 1::2] = 255
    checker[1::2, ::2] = 255
    back = _jpeg_decode_px(_jpeg_encode_px(checker))
    assert back.shape == (8, 8)
    # high-frequency content survives with the right polarity
    assert back[0, 1] > back[0, 0]


def test_jpeg_decoder_rejects_unsupported_layouts():
    import pytest

    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        _jpeg_bytes,
        _jpeg_decode_px,
    )

    with pytest.raises(ValueError, match="SOI"):
        _jpeg_decode_px(b"not a jpeg")
    # flip SOF0 -> SOF2 (progressive) in a real stream
    b = bytearray(_jpeg_bytes(3))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        _jpeg_decode_px(bytes(b))


def test_sniff_decode_routes_jpeg_in_strict_mode():
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        _jpeg_bytes,
        _sniff_decode,
    )

    feats = _sniff_decode(_jpeg_bytes(5), strict=True)
    wt, ht = 2 + (5 % 3), 1 + (5 % 2)
    assert feats[0] == 8 * wt and feats[1] == 8 * ht and feats[2] > 0


def test_jpeg_color_444_roundtrip():
    """4:4:4 YCbCr color: interleaved-MCU decode with per-component DC
    predictors and BT.601 conversion. Smooth images come back within a
    tight envelope; pure noise within the conversion-amplified
    quantization envelope; grayscale output shape is unchanged."""
    import numpy as np

    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        _jpeg_decode_px,
        _jpeg_encode_rgb,
    )

    ys, xs = np.mgrid[0:16, 0:24]
    smooth = np.stack(
        [(ys * 5 + 20) % 230, (xs * 4 + 10) % 230, (ys + xs) % 230], axis=-1
    ).astype(np.uint8)
    back = _jpeg_decode_px(_jpeg_encode_rgb(smooth))
    assert back.shape == (16, 24, 3)
    assert np.abs(back.astype(int) - smooth.astype(int)).max() <= 25

    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)
    back = _jpeg_decode_px(_jpeg_encode_rgb(noise))
    err = np.abs(back.astype(int) - noise.astype(int))
    assert err.mean() <= 35 and err.max() <= 160

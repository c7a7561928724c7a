"""Multimodal (binary payload) column operators (SURVEY §2.D D5).

Design: image/audio/video payloads are opaque ``binary`` columns plus a
typed metadata struct, processed with Arrow-batched ``mapInPandas`` — the
schema, partition sizing, and UDF batch shape are the real, tested part.

Codec status: formats parseable with pure stdlib+numpy have REAL codecs —
RIFF/WAVE 16-bit PCM (``_wav_feats``: chunk walk, sample lift, acoustic
features), uncompressed 24-bit BMP (``_bmp_decode_px``/``_bmp_encode``:
full decode AND re-encode), COMPRESSED 8-bit RGB PNG (``_png_decode_px``:
chunk walk with CRC verify, zlib inflate, full five-filter scanline
reconstruction — zlib is stdlib), and uncompressed RIFF/AVI video
(``_avi_frames_px``: nested LIST chunk walk, avih geometry, '00db' DIB
frame lift) — exercised by the oracle-backed ``multimodal_wav_decode`` /
``multimodal_bmp_decode`` / ``multimodal_png_decode`` /
``multimodal_frame_sample`` / ``multimodal_resize_roundtrip`` queries.
``resize_images`` is likewise REAL for BMP/PNG input (decode ->
nearest-neighbor resample -> BMP re-encode) and ``sample_frames`` is a
real AVI demux; animated GIF89a gets a complete pure-stdlib LZW
codec (``multimodal_gif_decode``). ``decode_features`` sniffs magic
bytes and routes all of these to the real parsers even in strict mode.
Baseline grayscale JPEG (SOF0) is a full stdlib+numpy implementation
too (``multimodal_jpeg_decode``): marker walk, carried-DHT Huffman
entropy decode, dezigzag/dequantize/IDCT. Only formats whose codec libs
are genuinely absent (MP3, compressed video — ffmpeg-class) keep a
stub: ``NotImplementedError`` in strict mode, a deterministic
byte-histogram fake otherwise. Swapping in a real decoder changes only
``_sniff_decode``'s dispatch table.

At 100 TB: payloads dominate row size -> keep
``spark.sql.files.maxPartitionBytes`` at default 128 MB so tasks hold a
handful of payloads, and always select() metadata-only columns before
wide shuffles (column pruning keeps payload bytes out of the exchange).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", StructType([])),  # replaced below
    ]
)

# features are DOUBLE, not FLOAT: the fake-decode moments carry ~6
# significant digits, and a float32 round-trip would shift values across
# rounding boundaries in the cross-engine compare
FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


# Sizing for the codec repartition: at scale a Python codec task should own
# ~32 MB of input (same order as clustering's assignment stage); below that
# the count is boosted up to the session's core count so a one-file fixture
# still parallelizes, but never beyond one task per ~512 KB — r13's flat
# defaultParallelism made 32 near-empty tasks for the CHEAP codecs (wav,
# frame-sample: r14 warm 32-core A/B read ~1.5-2x over their single-task r12
# cells) while only the expensive ones (jpeg: 946 ms single-task stage)
# gained.
_CODEC_TARGET_BYTES = 32 << 20
_CODEC_MIN_BYTES_PER_TASK = 512 << 10


def _spread(src: DataFrame, heavy: bool = False) -> DataFrame:
    """Round-robin repartition before a Python codec map (guide §2/§4):
    a one-file fixture scan is a single input split, so every per-row
    synth/encode/decode otherwise runs in ONE task (r13 profile: 0.6-1.2 s
    single-task stages across the codec family). The count is derived from
    input bytes (guide §2 scale-adaptive, see the sizing constants above),
    falling back to the session's core count when the source size is
    unknowable; codec outputs are per-row deterministic and downstream
    aggregates partition-invariant.

    ``heavy=True`` marks the LZW/DEFLATE-class codecs (gif, png, jpeg)
    whose per-row Python cost dwarfs the bytes scanned: their minimum
    bytes-per-task drops 8x so the fixture-scale fan stays near the core
    count (the r14 A/B: size-derived 7 tasks cost gif +40%..2x while the
    byte-light wav/bmp/avi/tiff family gained 28-45% from fewer tasks)."""
    import math
    import os
    from urllib.parse import unquote, urlparse

    spark = src.sparkSession
    cores = spark.sparkContext.defaultParallelism
    try:
        total = 0
        for uri in src.inputFiles():
            if not uri.startswith("file:"):
                total = 0
                break
            total += os.path.getsize(unquote(urlparse(uri).path))
    except Exception:
        total = 0
    if total <= 0:
        return src.repartition(cores)
    min_bytes = _CODEC_MIN_BYTES_PER_TASK // 8 if heavy else _CODEC_MIN_BYTES_PER_TASK
    n = max(
        math.ceil(total / _CODEC_TARGET_BYTES),
        min(cores, math.ceil(total / min_bytes)),
    )
    return src.repartition(n)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a multimodal-shaped table from a text fixture: payload =
    utf-8 bytes (stand-in for image bytes), metadata struct alongside."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
            F.lit(64).alias("feat_dim"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real image decode + feature extraction:
    byte-histogram moments (unrounded — consumers round at output time so
    the rounding mode is the SQL engines', not Python's half-even).
    Replace with a real codec in production."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    n = max(len(payload), 1)
    return [a / n for a in acc]


def _wav_feats(payload: bytes) -> tuple[int, int, float, float, int]:
    """Parse a RIFF/WAVE payload (16-bit PCM): chunk walk with struct,
    PCM lift with numpy. Returns (sample_rate, n_samples, duration_ms,
    rms, peak). Pure-stdlib real codec — no PIL/ffmpeg needed."""
    import struct

    import numpy as np

    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    off = 12
    rate, bits, data = None, None, None
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        (size,) = struct.unpack("<I", payload[off + 4 : off + 8])
        body = payload[off + 8 : off + 8 + size]
        if cid == b"fmt ":
            _, _, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        off += 8 + size + (size & 1)
    if rate is None or data is None or bits != 16:
        raise ValueError("unsupported WAV layout")
    s = np.frombuffer(data, dtype="<i2").astype(np.float64)
    return (
        int(rate),
        len(s),
        len(s) * 1000.0 / rate,
        float(np.sqrt(np.mean(s * s))),
        int(np.abs(s).max()),
    )


def _dib_rows_to_rgb(pixel_data: bytes, w: int, h: int):
    """Lift a stride-padded DIB pixel array (the layout shared by BMP
    bodies and uncompressed-AVI '00db' frames) to a TOP-DOWN (h, w, 3)
    RGB uint8 array. Positive h means bottom-up storage (flipped here);
    negative h means top-down."""
    import numpy as np

    stride = (w * 3 + 3) & ~3
    px = (
        np.frombuffer(pixel_data[: stride * abs(h)], dtype=np.uint8)
        .reshape(abs(h), stride)[:, : w * 3]
        .reshape(abs(h), w, 3)
    )
    if h > 0:
        px = px[::-1]  # bottom-up -> top-down
    return px[..., ::-1].copy()  # BGR -> RGB


def _rgb_to_dib_rows(px) -> bytes:
    """Inverse of ``_dib_rows_to_rgb``: top-down RGB array -> bottom-up
    stride-padded BGR pixel bytes."""
    import numpy as np

    h, w = px.shape[:2]
    bgr = px[::-1, :, ::-1]  # top-down RGB -> bottom-up BGR
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return rows.tobytes()


def _bmp_decode_px(payload: bytes):
    """REAL uncompressed 24-bit BMP decode to a top-down (h, w, 3) RGB
    uint8 array: header walk with struct, stride/orientation handling in
    ``_dib_rows_to_rgb``. Pure-stdlib codec."""
    import struct

    if payload[0:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack("<I", payload[10:14])
    _hdr_size, w, h, _planes, bpp = struct.unpack("<IiiHH", payload[14:30])
    if bpp != 24:
        raise ValueError(f"unsupported bit depth {bpp}")
    return _dib_rows_to_rgb(payload[data_off:], w, h)


def _bmp_encode(px) -> bytes:
    """REAL 24-bit BMP encode of a top-down (h, w, 3) RGB uint8 array
    (BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up padded BGR rows) —
    the exact inverse of ``_bmp_decode_px``."""
    import struct

    h, w = px.shape[:2]
    pixels = _rgb_to_dib_rows(px)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    filehdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40)
    return filehdr + info + pixels


def _bmp_feats(payload: bytes) -> tuple[int, int, float, float, float]:
    """Parse an uncompressed 24-bit BMP payload via ``_bmp_decode_px``.
    Returns (width, height, mean_r, mean_g, mean_b)."""
    import numpy as np

    px = _bmp_decode_px(payload)
    means = px.astype(np.float64).mean(axis=(0, 1))  # R, G, B
    return (
        int(px.shape[1]),
        int(px.shape[0]),
        float(means[0]),
        float(means[1]),
        float(means[2]),
    )


def _sniff_decode(payload: bytes | None, strict: bool, dim: int = 8) -> list[float]:
    """Per-payload decode dispatch by MAGIC BYTES: self-describing formats
    with pure-stdlib codecs (RIFF/WAVE, BMP, PNG, GIF, AVI, baseline
    JPEG) get a REAL parse — acoustic features for audio, geometry +
    channel means for images — padded to ``dim``. Formats that need
    env-blocked codec libs (MP3/compressed video)
    raise in strict mode and fall back to the deterministic byte-histogram
    fake otherwise."""
    if payload is None:
        return [0.0] * dim
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        rate, n, dur, rms, peak = _wav_feats(payload)
        return [float(rate), float(n), dur, rms, float(peak)] + [0.0] * (dim - 5)
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        import numpy as np

        frames = _avi_frames_px(payload)
        stack = np.stack(frames).astype(np.float64)
        h, w = frames[0].shape[:2]
        means = stack.mean(axis=(0, 1, 2))  # per-channel over all frames
        return [float(len(frames)), float(w), float(h)] + [
            float(m) for m in means
        ] + [0.0] * (dim - 6)
    if payload[:2] == b"BM":
        w, h, mr, mg, mb = _bmp_feats(payload)
        return [float(w), float(h), mr, mg, mb] + [0.0] * (dim - 5)
    if payload[:8] == PNG_SIG:
        w, h, mr, mg, mb = _png_feats(payload)
        return [float(w), float(h), mr, mg, mb] + [0.0] * (dim - 5)
    if payload[:4] == b"GIF8":
        w, h, n, sr, sg, sb = _gif_feats(payload)
        px = float(w * h * n)
        return [float(w), float(h), float(n), sr / px, sg / px, sb / px] + [
            0.0
        ] * (dim - 6)
    if payload[:2] == b"\xff\xd8":
        w, h, mg = _jpeg_feats(payload)
        return [float(w), float(h), mg] + [0.0] * (dim - 3)
    if strict:
        raise NotImplementedError(
            "real decode for this format requires codec libs not present "
            "in this environment (MP3/compressed-video, ffmpeg-class); use "
            "strict=False for the deterministic fake-feature path"
        )
    return _fake_decode(payload, dim)


def decode_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """mapInPandas decode: binary payload -> feature vector.

    Arrow-batched; one Python worker pass per partition. WAV and BMP
    payloads always take the REAL codec path (see ``_sniff_decode``);
    ``strict=True`` turns the fake-feature fallback for env-blocked
    formats into a hard error instead of silently faking.
    """

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                    "features": pdf["payload"].map(lambda p: _sniff_decode(p, strict)),
                }
            )
            yield out

    return df.mapInPandas(_decode_batch, FEATURE_SCHEMA)

RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def _nn_resample(px, width: int, height: int):
    """Nearest-neighbor resample of a top-down (h, w, 3) array to
    (height, width, 3): pixel-center sampling, pure integer index math
    (sx = floor((2x+1)·w_src / 2·w_dst)) so the SQL oracle can mirror it
    exactly."""
    import numpy as np

    sh, sw = px.shape[:2]
    ys = ((2 * np.arange(height) + 1) * sh) // (2 * height)
    xs = ((2 * np.arange(width) + 1) * sw) // (2 * width)
    return px[ys][:, xs]


def resize_images(
    df: DataFrame, width: int, height: int, strict: bool = False
) -> DataFrame:
    """mapInPandas resize: binary payload -> binary payload of the target
    dimensions. BMP and PNG payloads take the REAL path — stdlib decode,
    nearest-neighbor resample (``_nn_resample``), 24-bit BMP re-encode —
    so ``strict=True`` works end-to-end for self-describing stdlib
    formats. Opaque formats (no codec libs in this environment) keep the
    deterministic byte-tiling stand-in, or raise when ``strict``.
    Payload-in/payload-out keeps the operator pipelineable: no shuffle,
    output partitioning == input partitioning.
    """
    target = width * height

    def _resize_one(p: bytes | None) -> tuple[bytes, str]:
        if p is None or len(p) == 0:
            return bytes(target), "application/octet-stream"
        p = bytes(p)
        if p[:2] == b"BM":
            return _bmp_encode(_nn_resample(_bmp_decode_px(p), width, height)), "image/bmp"
        if p[:8] == PNG_SIG:
            return _bmp_encode(_nn_resample(_png_decode_px(p), width, height)), "image/bmp"
        if strict:
            raise NotImplementedError(
                "real resize for this format requires codec libs not "
                "present in this environment (PIL-class); use strict=False "
                "for the deterministic byte-tiling stand-in"
            )
        reps = (target + len(p) - 1) // len(p)
        return (p * reps)[:target], "application/octet-stream"

    def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [_resize_one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pd.Series([t for _, t in resized], dtype="object"),
                    "payload": pd.Series([b for b, _ in resized], dtype="object"),
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(_resize_batch, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 4) -> DataFrame:
    """mapInPandas frame sampling over REAL video containers: one
    uncompressed RIFF/AVI payload -> every n-th '00db' DIB frame as its
    own row, re-encoded as a standalone 24-bit BMP (so downstream image
    operators — decode_bmp_features, resize_images — consume frames
    unchanged). The demux is a real chunk walk (``_avi_frames_px``), the
    same RIFF skills as the WAV path; compressed codecs (MP4/H.264-class)
    need ffmpeg, absent in this environment, and raise.

    1->N row explosion happens in-place per input partition — no shuffle;
    at 100 TB follow with repartition() only if downstream work is
    CPU-bound per frame.
    """

    def _frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue
                for fi, px in enumerate(_avi_frames_px(bytes(p))):
                    if fi % every_n == 0:
                        ids.append(mid)
                        idxs.append(fi)
                        frames.append(_bmp_encode(px))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": pd.Series(frames, dtype="object"),
                    "n_bytes": pd.Series([len(f) for f in frames], dtype="int64"),
                }
            )

    return df.mapInPandas(_frames_batch, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Real codec path: WAV/PCM (pure struct + numpy — no external libs needed)

WAV_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", LongType()),
    ]
)


def _wav_bytes(media_id: int) -> bytes:
    """Deterministic 16-bit mono PCM WAV: square wave, amplitude 1000,
    period 8 samples, n = 100 + (id % 50) * 10 samples @ 8 kHz. A real
    RIFF container — the decoder below does a real parse, not a fake."""
    import struct

    import numpy as np

    n = 100 + (media_id % 50) * 10
    i = np.arange(n)
    samples = np.where((i // 4) % 2 == 0, 1000, -1000).astype("<i2")
    data = samples.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def attach_wav_payload(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize a WAV-bytes payload column (deterministic per id)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["media_id"].map(lambda i: _wav_bytes(int(i))),
                }
            )

    src = _spread(df.select(F.col(id_col).alias("media_id")))
    return src.mapInPandas(
        _gen,
        StructType(
            [
                StructField("media_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


def decode_wav_features(df: DataFrame) -> DataFrame:
    """REAL audio decode over binary payloads with mapInPandas: parse the
    RIFF/fmt/data chunks (struct), lift PCM samples into numpy, and emit
    per-file acoustic features (duration, RMS, peak). This is the shape a
    production audio pipeline uses — swap the feature block for an
    encoder call; PIL/ffmpeg-class formats remain env-blocked and keep
    the stubbed path in decode_features."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_wav_feats(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                rows,
                columns=["sample_rate", "n_samples", "duration_ms", "rms", "peak"],
            )
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            yield out

    return df.mapInPandas(_decode, WAV_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Real codec path: BMP (uncompressed 24-bit — pure struct + numpy)

BMP_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
    ]
)


def _bmp_bytes(media_id: int) -> bytes:
    """Deterministic 24-bit BMP: width 4 + (id % 13), height 3 + (id % 7),
    solid color (r, g, b) = (id % 256, (id * 7) % 256, (id * 13) % 256).
    Real BITMAPFILEHEADER + BITMAPINFOHEADER + padded BGR rows."""
    import struct

    import numpy as np

    w = 4 + (media_id % 13)
    h = 3 + (media_id % 7)
    r, g, b = media_id % 256, (media_id * 7) % 256, (media_id * 13) % 256
    row = np.tile(np.array([b, g, r], dtype=np.uint8), w).tobytes()
    pad = b"\x00" * ((4 - (len(row) % 4)) % 4)
    pixels = (row + pad) * h
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    filehdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40)
    return filehdr + info + pixels


def attach_bmp_payload(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize a BMP-bytes payload column (deterministic per id)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["media_id"].map(lambda i: _bmp_bytes(int(i))),
                }
            )

    src = _spread(df.select(F.col(id_col).alias("media_id")))
    return src.mapInPandas(
        _gen,
        StructType(
            [
                StructField("media_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


def decode_bmp_features(df: DataFrame) -> DataFrame:
    """REAL image decode: parse the BMP headers, lift the padded BGR pixel
    rows into numpy, and emit (width, height, per-channel means). Same
    mapInPandas shape as a PIL/torchvision decode — only the body of
    `feats` changes when richer codecs are available."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_bmp_feats(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                rows, columns=["width", "height", "mean_r", "mean_g", "mean_b"]
            )
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            yield out

    return df.mapInPandas(_decode, BMP_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Real codec path: PNG (8-bit RGB, non-interlaced — zlib IS stdlib, so the
# full pipeline is a real decoder: chunk walk + CRC verify + inflate + all
# five scanline filters)

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_bytes(media_id: int) -> bytes:
    """Deterministic 8-bit RGB PNG: width 3 + (id % 11), height 2 +
    (id % 5), solid color (id % 256, (id * 11) % 256, (id * 3) % 256).
    Scanline filters CYCLE through all five types (row % 5) so a decoder
    that shortcuts filter reconstruction cannot round-trip it."""
    import struct
    import zlib

    import numpy as np

    w = 3 + (media_id % 11)
    h = 2 + (media_id % 5)
    r, g, b = media_id % 256, (media_id * 11) % 256, (media_id * 3) % 256

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, RGB
    raw = np.tile(np.array([r, g, b], dtype=np.uint8), w)  # one unfiltered row
    bpp = 3
    scanlines = []
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        ft = y % 5
        cur = raw
        if ft == 0:  # None
            filt = cur.copy()
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.uint8), cur[:-bpp]])
            filt = (cur.astype(np.int16) - left).astype(np.uint8)
        elif ft == 2:  # Up
            filt = (cur.astype(np.int16) - prev).astype(np.uint8)
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.uint8), cur[:-bpp]])
            avg = (left.astype(np.int16) + prev.astype(np.int16)) // 2
            filt = (cur.astype(np.int16) - avg).astype(np.uint8)
        else:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.uint8), cur[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
            a, bb, c = (x.astype(np.int16) for x in (left, prev, ul))
            p = a + bb - c
            pa, pb, pc = np.abs(p - a), np.abs(p - bb), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, bb, c))
            filt = (cur.astype(np.int16) - pred).astype(np.uint8)
        scanlines.append(bytes([ft]) + filt.tobytes())
        prev = cur
    idat = zlib.compress(b"".join(scanlines), 9)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _png_decode_px(payload: bytes):
    """Full real PNG decode (8-bit RGB, non-interlaced) to a top-down
    (h, w, 3) RGB uint8 array: chunk walk with CRC32 verification, zlib
    inflate, scanline reconstruction for ALL FIVE filter types
    (None/Sub/Up/Average/Paeth, per the PNG spec's byte-wise mod-256
    arithmetic)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    off = 8
    w = h = None
    idat = b""
    while off + 8 <= len(payload):
        (size,) = struct.unpack(">I", payload[off : off + 4])
        ctype = payload[off + 4 : off + 8]
        data = payload[off + 8 : off + 8 + size]
        (crc,) = struct.unpack(">I", payload[off + 8 + size : off + 12 + size])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError("unsupported PNG layout (need 8-bit RGB, no interlace)")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        off += 12 + size
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(idat)
    bpp, stride = 3, w * 3
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw[pos + 1 : pos + 1 + stride], dtype=np.uint8).astype(
            np.int32
        )
        pos += 1 + stride
        cur = np.zeros(stride, dtype=np.int32)
        if ft == 0:
            cur = line
        elif ft == 2:
            cur = (line + prev) % 256
        else:
            # Sub/Average/Paeth need the reconstructed left pixel ->
            # sequential per pixel, vector over the 3 channel bytes
            for x in range(0, stride, bpp):
                left = cur[x - bpp : x] if x else np.zeros(bpp, np.int32)
                up = prev[x : x + bpp]
                ul = prev[x - bpp : x] if x else np.zeros(bpp, np.int32)
                seg = line[x : x + bpp]
                if ft == 1:
                    rec = seg + left
                elif ft == 3:
                    rec = seg + (left + up) // 2
                elif ft == 4:
                    p = left + up - ul
                    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
                    )
                    rec = seg + pred
                else:
                    raise ValueError(f"bad filter type {ft}")
                cur[x : x + bpp] = rec % 256
        img[y] = cur.astype(np.uint8)
        prev = cur
    return img.reshape(h, w, 3)


def _png_feats(payload: bytes) -> tuple[int, int, float, float, float]:
    """Decode via ``_png_decode_px``; returns (width, height, mean_r,
    mean_g, mean_b)."""
    px = _png_decode_px(payload).astype("float64")
    means = px.mean(axis=(0, 1))  # R, G, B
    return (
        int(px.shape[1]),
        int(px.shape[0]),
        float(means[0]),
        float(means[1]),
        float(means[2]),
    )


def attach_png_payload(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize a PNG-bytes payload column (deterministic per id)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["media_id"].map(lambda i: _png_bytes(int(i))),
                }
            )

    src = _spread(df.select(F.col(id_col).alias("media_id")), heavy=True)
    return src.mapInPandas(
        _gen,
        StructType(
            [
                StructField("media_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


def decode_png_features(df: DataFrame) -> DataFrame:
    """REAL compressed-image decode over binary payloads: PNG chunk walk,
    CRC verify, zlib inflate, five-filter scanline reconstruction — all
    stdlib+numpy. Emits (width, height, per-channel means); same
    mapInPandas shape as the BMP/WAV paths."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_png_feats(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                rows, columns=["width", "height", "mean_r", "mean_g", "mean_b"]
            )
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            yield out

    return df.mapInPandas(_decode, BMP_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Real codec path: gradient BMP (a non-solid image so resampling is actually
# exercised — a solid color can't distinguish a real resize from a fake)


def _bmp_gradient_bytes(media_id: int) -> bytes:
    """Deterministic 24-bit gradient BMP: width 4 + (id % 13), height
    3 + (id % 7); pixel (x, y) — top-down coordinates — has
    r = (id + x) % 256, g = (id + y) % 256, b = (id + x + y) % 256.
    Closed-form per-pixel colors let a SQL oracle mirror a real
    nearest-neighbor resample exactly."""
    import numpy as np

    w = 4 + (media_id % 13)
    h = 3 + (media_id % 7)
    xs = np.arange(w)
    ys = np.arange(h)
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[..., 0] = (media_id + xs[None, :]) % 256
    px[..., 1] = (media_id + ys[:, None]) % 256
    px[..., 2] = (media_id + xs[None, :] + ys[:, None]) % 256
    return _bmp_encode(px)


def attach_bmp_gradient_payload(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize a gradient-BMP payload column (deterministic per id)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["media_id"].map(
                        lambda i: _bmp_gradient_bytes(int(i))
                    ),
                }
            )

    src = _spread(df.select(F.col(id_col).alias("media_id")))
    return src.mapInPandas(
        _gen,
        StructType(
            [
                StructField("media_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


# ---------------------------------------------------------------------------
# Real codec path: uncompressed RIFF/AVI video ('DIB ' vids stream, '00db'
# frames) — the same chunk-walk machinery as WAV, one level deeper (nested
# LIST chunks). Compressed codecs (H.264/MP4-class) need ffmpeg, absent in
# this environment, and are rejected loudly.

AVI_FRAME_W, AVI_FRAME_H = 6, 4


def _avi_bytes(media_id: int) -> bytes:
    """Deterministic uncompressed AVI: 2 + (id % 5) frames of a 6x4
    24-bit DIB video stream; frame f is the solid color
    (r, g, b) = ((id + f) % 256, (id*3 + f*5) % 256, (id*7 + f*11) % 256).
    Real RIFF structure: LIST hdrl (avih + LIST strl (strh 'vids'/'DIB ',
    strf BITMAPINFOHEADER)) + LIST movi with one '00db' chunk per frame."""
    import struct

    import numpy as np

    w, h = AVI_FRAME_W, AVI_FRAME_H
    n_frames = 2 + (media_id % 5)

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def list_chunk(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    frames = []
    for f in range(n_frames):
        px = np.zeros((h, w, 3), dtype=np.uint8)
        px[..., 0] = (media_id + f) % 256
        px[..., 1] = (media_id * 3 + f * 5) % 256
        px[..., 2] = (media_id * 7 + f * 11) % 256
        frames.append(chunk(b"00db", _rgb_to_dib_rows(px)))
    frame_bytes = ((w * 3 + 3) & ~3) * h

    avih = struct.pack(
        "<14I", 40_000, frame_bytes * 25, 0, 0, n_frames, 0, 1, frame_bytes,
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, 25, 0,
                                        n_frames, frame_bytes, 0, 0, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 2835, 2835, 0, 0
    )
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = list_chunk(b"movi", b"".join(frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi_frames_px(payload: bytes):
    """REAL AVI demux: verify the RIFF/'AVI ' signature, walk the
    top-level chunks, read frame geometry from the 'avih' header inside
    LIST hdrl, and lift every uncompressed '00db' DIB frame inside LIST
    movi to a top-down (h, w, 3) RGB array. Compressed '00dc' frames are
    rejected (no ffmpeg in this environment)."""
    import struct

    if payload[0:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    def walk(buf: bytes):
        off = 0
        while off + 8 <= len(buf):
            cid = buf[off : off + 4]
            (size,) = struct.unpack("<I", buf[off + 4 : off + 8])
            yield cid, buf[off + 8 : off + 8 + size]
            off += 8 + size + (size & 1)

    w = h = None
    frames = []
    for cid, body in walk(payload[12:]):
        if cid != b"LIST":
            continue
        ltype, inner = body[:4], body[4:]
        if ltype == b"hdrl":
            for sid, sbody in walk(inner):
                if sid == b"avih":
                    fields = struct.unpack("<14I", sbody[:56])
                    w, h = fields[8], fields[9]
        elif ltype == b"movi":
            for sid, sbody in walk(inner):
                if sid == b"00db":
                    frames.append(sbody)
                elif sid == b"00dc":
                    raise NotImplementedError(
                        "compressed AVI frames need ffmpeg, not present "
                        "in this environment"
                    )
    if w is None or not frames:
        raise ValueError("missing avih header or movi frames")
    return [_dib_rows_to_rgb(fb, w, h) for fb in frames]


def attach_avi_payload(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize an uncompressed-AVI payload column (deterministic per id)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["media_id"].map(lambda i: _avi_bytes(int(i))),
                }
            )

    src = _spread(df.select(F.col(id_col).alias("media_id")))
    return src.mapInPandas(
        _gen,
        StructType(
            [
                StructField("media_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


# ---------------------------------------------------------------------------
# Real codec path: animated GIF89a (LZW). Retires the "GIF is env-blocked"
# residual: GIF's only compression is LZW, which needs no codec library —
# encoder and decoder below are complete pure-stdlib implementations of the
# spec (variable-width codes, dictionary growth, clear/EOI, sub-block
# framing, KwKwK case), so `.gif` joins WAV/BMP/PNG/AVI on the REAL path.
# (Baseline grayscale JPEG gained its own stdlib implementation below;
# only MP3/compressed-video remain env-blocked.)

GIF_SIG = b"GIF89a"


def _gif_lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF-variant LZW compress of palette indices: emits CLEAR, greedy
    longest-match codes against a growing dictionary, EOI; variable code
    width starting at min_code_size+1, growing when the next free code
    would not fit (cap 12 bits, re-CLEAR at table full)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    cur = b""
    for p in indices:
        nxt = cur + bytes([int(p)])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
        else:  # table full: reset (keeps the encoder total)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([int(p)])
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int):
    """GIF-variant LZW decompress: variable-width little-endian codes,
    dictionary rebuild on CLEAR, the KwKwK (code == next free) case."""
    import numpy as np

    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0  # bit position
    total_bits = len(data) * 8

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > total_bits:
            return eoi
        byte0 = pos >> 3
        val = int.from_bytes(data[byte0 : byte0 + 3], "little")
        val >>= pos & 7
        pos += width
        return val & ((1 << width) - 1)

    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    table: list[bytes] = []
    width = min_code_size + 1
    prev = b""

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = b""

    reset()
    while n_out < n_pixels:
        code = read(width)
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table) and prev:
            entry = prev + prev[:1]  # KwKwK
        elif code < clear:
            entry = bytes([code])
        else:
            raise ValueError(f"corrupt LZW stream: code {code} of {len(table)}")
        out[n_out : n_out + len(entry)] = np.frombuffer(entry, dtype=np.uint8)[
            : n_pixels - n_out
        ]
        n_out += min(len(entry), n_pixels - n_out)
        if prev:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out != n_pixels:
        raise ValueError(f"LZW stream ended early: {n_out}/{n_pixels} pixels")
    return out


def _gif_palette(media_id: int):
    """Closed-form 16-color palette so a SQL oracle can mirror decode."""
    return [
        (
            (media_id + 17 * i) % 256,
            (media_id * 7 + 29 * i) % 256,
            (media_id * 3 + 41 * i) % 256,
        )
        for i in range(16)
    ]


def _gif_bytes(media_id: int) -> bytes:
    """Deterministic animated GIF89a: logical screen (4 + id%9) x
    (3 + id%5), 2 + id%3 full-frames, 16-color global table from
    ``_gif_palette``, pixel (x, y, frame f) indexing palette entry
    (id + 3x + 5y + 7f) % 16 — closed form for the oracle. Frames carry
    graphic-control extensions and REAL LZW-compressed index streams
    (dictionary growth exercised: frames are up to 84 pixels, codes
    outgrow the initial 5-bit width)."""
    import struct

    w = 4 + media_id % 9
    h = 3 + media_id % 5
    n_frames = 2 + media_id % 3
    buf = bytearray()
    buf += GIF_SIG
    buf += struct.pack("<HHBBB", w, h, 0xF3, 0, 0)  # GCT present, 16 colors
    for r, g, b in _gif_palette(media_id):
        buf += bytes((r, g, b))
    for f in range(n_frames):
        buf += bytes((0x21, 0xF9, 0x04, 0x00))  # GCE
        buf += struct.pack("<H", 10)  # delay
        buf += bytes((0x00, 0x00))  # transparent idx, terminator
        buf += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        idx = [
            (media_id + 3 * x + 5 * y + 7 * f) % 16
            for y in range(h)
            for x in range(w)
        ]
        lzw = _gif_lzw_encode(idx, 4)
        buf += bytes([4])  # LZW min code size
        for off in range(0, len(lzw), 255):
            block = lzw[off : off + 255]
            buf += bytes([len(block)]) + block
        buf += b"\x00"
    buf += b"\x3b"
    return bytes(buf)


def _gif_decode_frames(payload: bytes):
    """Full real GIF decode (89a, global color table) to a list of
    top-down (h, w, 3) RGB uint8 arrays: header + logical screen
    descriptor, color table, extension skip, image descriptors,
    sub-block reassembly, LZW decompress, palette mapping."""
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    off = 13
    gct = None
    if flags & 0x80:
        n_colors = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[off : off + 3 * n_colors], dtype=np.uint8).reshape(
            n_colors, 3
        )
        off += 3 * n_colors
    frames = []
    while off < len(payload):
        b0 = payload[off]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: skip label + sub-blocks
            off += 2
            while payload[off] != 0:
                off += 1 + payload[off]
            off += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        left, top, w, h, iflags = struct.unpack("<HHHHB", payload[off + 1 : off + 10])
        off += 10
        if iflags & 0x80:
            n_local = 2 << (iflags & 0x07)
            lct = np.frombuffer(payload[off : off + 3 * n_local], dtype=np.uint8).reshape(
                n_local, 3
            )
            off += 3 * n_local
        else:
            lct = gct
        if iflags & 0x40:
            raise ValueError("interlaced GIF not supported")
        min_code = payload[off]
        off += 1
        data = bytearray()
        while payload[off] != 0:
            size = payload[off]
            data += payload[off + 1 : off + 1 + size]
            off += 1 + size
        off += 1
        idx = _gif_lzw_decode(bytes(data), min_code, w * h)
        frames.append(lct[idx].reshape(h, w, 3).copy())
    if not frames:
        raise ValueError("GIF contained no image data")
    return frames


def _gif_feats(payload: bytes):
    """(width, height, n_frames, sum_r, sum_g, sum_b) — channel sums over
    every pixel of every frame, exact integers."""
    frames = _gif_decode_frames(payload)
    import numpy as np

    stack = np.stack(frames).astype(np.int64)
    sums = stack.sum(axis=(0, 1, 2))
    h, w = frames[0].shape[:2]
    return (w, h, len(frames), int(sums[0]), int(sums[1]), int(sums[2]))


GIF_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)


def attach_gif_payload(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize an animated-GIF payload column (deterministic per id)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["media_id"].map(lambda i: _gif_bytes(int(i))),
                }
            )

    src = _spread(df.select(F.col(id_col).alias("media_id")), heavy=True)
    return src.mapInPandas(
        _gen,
        StructType(
            [
                StructField("media_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


def decode_gif_features(df: DataFrame) -> DataFrame:
    """REAL compressed-animation decode over binary payloads: GIF block
    walk, sub-block reassembly, variable-width LZW inflate, palette
    mapping. Emits exact integer geometry + channel sums."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_gif_feats(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                rows,
                columns=["width", "height", "n_frames", "sum_r", "sum_g", "sum_b"],
            )
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            yield out

    return df.mapInPandas(_decode, GIF_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Real codec path: baseline JPEG (SOF0, 8-bit grayscale) — the full
# DCT/Huffman imaging stack in stdlib+numpy: marker walk, DHT canonical
# Huffman construction, entropy decode with byte unstuffing, differential DC,
# dezigzag, dequantize, 8x8 IDCT. The encoder exists to synthesize REAL
# JPEG bitstreams deterministically; its constant-8x8-tile images have
# DC-only spectra whose quantized coefficients are exact, so decode is
# bit-exact and closed-form checkable.

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
_JPEG_Q = 16  # flat quantization table entry (DC exactness: 8*even == 0 mod 16)
# custom (valid, canonical) Huffman tables carried in DHT: DC categories
# 0..11 all at 4 bits; AC needs only EOB (0x00) here -> one 1-bit code
_JPEG_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_JPEG_AC_VALS = [0x00]


def _huff_canonical(bits: list, vals: list) -> dict:
    """value -> (code, length) from a DHT (bits, values) spec."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _jpeg_tile_value(media_id: int, t: int) -> int:
    """The planted constant for tile t of image media_id: even offset from
    128 so the quantized DC (q=16) is exact."""
    return 128 + 2 * (((media_id * 7 + t * 13) % 121) - 60)


def _jpeg_bytes(media_id: int) -> bytes:
    """Deterministic baseline grayscale JPEG: width 8*(2+(id%3)), height
    8*(1+(id%2)); each 8x8 block is the constant _jpeg_tile_value(id, t)
    (raster order). A REAL bitstream — SOI/DQT/SOF0/DHT/SOS markers,
    canonical Huffman DC categories with magnitude bits, EOB-coded ACs,
    0xFF byte stuffing — decodable by any baseline JPEG reader."""
    import struct

    wt, ht = 2 + (media_id % 3), 1 + (media_id % 2)
    w, h = 8 * wt, 8 * ht
    dc_huff = _huff_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_huff = _huff_canonical(_JPEG_AC_BITS, _JPEG_AC_VALS)

    bitbuf: list = []

    def put(code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            bitbuf.append((code >> i) & 1)

    pred = 0
    for t in range(wt * ht):
        v = _jpeg_tile_value(media_id, t)
        dc = (8 * (v - 128)) // _JPEG_Q  # quantized DC, exact by design
        diff = dc - pred
        pred = dc
        mag = abs(diff)
        s = mag.bit_length()
        code, ln = dc_huff[s]
        put(code, ln)
        if s:
            bits = diff if diff > 0 else diff + (1 << s) - 1
            put(bits & ((1 << s) - 1), s)
        code, ln = ac_huff[0x00]  # EOB: all ACs zero
        put(code, ln)
    while len(bitbuf) % 8:
        bitbuf.append(1)  # pad with 1s per spec
    scan = bytearray()
    for i in range(0, len(bitbuf), 8):
        byte = 0
        for b in bitbuf[i : i + 8]:
            byte = (byte << 1) | b
        scan.append(byte)
        if byte == 0xFF:
            scan.append(0x00)  # byte stuffing

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    dqt = seg(0xFFDB, bytes([0]) + bytes([_JPEG_Q] * 64))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS),
    )
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + bytes(scan) + b"\xff\xd9"


def _jpeg_decode_px(payload: bytes):
    """General baseline-JPEG decoder for 8-bit SOF0 streams, grayscale or
    4:4:4 YCbCr color: marker walk, DQT/DHT parsing (canonical Huffman
    from any carried table), entropy decode with 0xFF00 unstuffing,
    per-component differential DC + run-length AC over interleaved MCUs,
    dezigzag, dequantize, float64 8x8 IDCT, level shift, BT.601 color
    conversion. Returns (h, w) uint8 for grayscale, (h, w, 3) RGB for
    color. Rejects progressive/subsampled layouts explicitly."""
    import math
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict = {}
    huff: dict = {}  # (class, id) -> decode map {(code, len): value}
    w = h = None
    comps: list = []  # (component id, quant table id) in SOF order
    scan_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker desync")
        marker = struct.unpack(">H", payload[pos : pos + 2])[0]
        if marker == 0xFFD9:
            break
        (size,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + size]
        if marker == 0xFFDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = list(body[off + 1 : off + 65])
                off += 65
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xFFC0:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8 or nc not in (1, 3):
                raise ValueError("only 8-bit grayscale or 3-component supported")
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError("only 4:4:4 (no subsampling) supported")
                comps.append((cid, tq))
        elif marker == 0xFFC4:
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(body[off + 17 : off + 17 + nv])
                huff[(tc, th)] = {
                    (c, ln): v for v, (c, ln) in _huff_canonical(bits, vals).items()
                }
                off += 17 + nv
        elif marker == 0xFFDA:
            scan_start = pos + 2 + size
            ns = body[0]
            scan_tabs = {}  # component id -> (dc table, ac table)
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                scan_tabs[cs] = (tt >> 4, tt & 0xF)
            break
        pos += 2 + size
    if scan_start is None or w is None:
        raise ValueError("missing SOS/SOF0")

    # unstuff the entropy segment up to EOI
    data = bytearray()
    i = scan_start
    while i < len(payload):
        b = payload[i]
        if b == 0xFF:
            nxt = payload[i + 1] if i + 1 < len(payload) else 0xD9
            if nxt == 0x00:
                data.append(0xFF)
                i += 2
                continue
            break  # a real marker (EOI) ends the scan
        data.append(b)
        i += 1

    bit_pos = 0

    def read_bit() -> int:
        nonlocal bit_pos
        byte = data[bit_pos >> 3]
        bit = (byte >> (7 - (bit_pos & 7))) & 1
        bit_pos += 1
        return bit

    def read_huff(table: dict) -> int:
        code, ln = 0, 0
        while ln <= 16:
            code = (code << 1) | read_bit()
            ln += 1
            if (code, ln) in table:
                return table[(code, ln)]
        raise ValueError("invalid Huffman code")

    def receive_extend(s: int) -> int:
        if s == 0:
            return 0
        v = 0
        for _ in range(s):
            v = (v << 1) | read_bit()
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    m = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / math.sqrt(2.0) if u == 0 else 1.0) / 2.0
        for x in range(8):
            m[u, x] = cu * math.cos((2 * x + 1) * u * math.pi / 16.0)
    wt, ht = (w + 7) // 8, (h + 7) // 8
    planes = [
        np.zeros((ht * 8, wt * 8), dtype=np.float64) for _ in comps
    ]
    preds = [0] * len(comps)
    for t in range(wt * ht):  # MCU raster; at 4:4:4 one block/component
        for ci, (cid, tq) in enumerate(comps):
            dc_id, ac_id = scan_tabs[cid]
            dc_tab, ac_tab = huff[(0, dc_id)], huff[(1, ac_id)]
            zz = np.zeros(64, dtype=np.float64)
            s = read_huff(dc_tab)
            preds[ci] += receive_extend(s)
            zz[0] = preds[ci]
            k = 1
            while k < 64:
                rs = read_huff(ac_tab)
                r, s = rs >> 4, rs & 0xF
                if rs == 0x00:
                    break  # EOB
                if rs == 0xF0:
                    k += 16  # ZRL
                    continue
                k += r
                zz[k] = receive_extend(s)
                k += 1
            coef = np.zeros(64, dtype=np.float64)
            coef[_ZIGZAG] = zz * np.array(qt[tq], dtype=np.float64)
            block = m.T @ coef.reshape(8, 8) @ m + 128.0
            by, bx = (t // wt) * 8, (t % wt) * 8
            planes[ci][by : by + 8, bx : bx + 8] = block
    if len(comps) == 1:
        return (
            np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:h, :w]
        )
    y, cb, cr = (p[:h, :w] for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _jpeg_feats(payload: bytes) -> tuple[int, int, float]:
    px = _jpeg_decode_px(payload).astype("float64")
    return (int(px.shape[1]), int(px.shape[0]), float(px.mean()))


JPEG_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_gray", DoubleType()),
    ]
)


def attach_jpeg_payload(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize a real baseline-JPEG payload column (deterministic per
    id; constant-tile spectra -> exact roundtrip by construction)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["media_id"].map(lambda i: _jpeg_bytes(int(i))),
                }
            )

    src = _spread(df.select(F.col(id_col).alias("media_id")), heavy=True)
    return src.mapInPandas(
        _gen,
        StructType(
            [
                StructField("media_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


def decode_jpeg_features(df: DataFrame) -> DataFrame:
    """REAL DCT-compressed-image decode over binary payloads: JPEG marker
    walk, carried-DHT canonical Huffman entropy decode (byte unstuffing,
    differential DC, run-length AC), dezigzag, dequantize, 8x8 IDCT —
    stdlib+numpy only. Emits (width, height, mean_gray)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_jpeg_feats(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(rows, columns=["width", "height", "mean_gray"])
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            yield out

    return df.mapInPandas(_decode, JPEG_FEATURE_SCHEMA)


def _jpeg_encode_px(px, q: int = _JPEG_Q) -> bytes:
    """General baseline grayscale JPEG encoder: see _jpeg_encode_planes."""
    return _jpeg_encode_planes([px], q)


def _jpeg_encode_rgb(px3, q: int = _JPEG_Q) -> bytes:
    """General baseline 4:4:4 COLOR JPEG encoder: BT.601 RGB -> YCbCr
    forward transform, then the shared-plane pipeline (interleaved MCUs,
    one block per component)."""
    import numpy as np

    r = px3[..., 0].astype(np.float64)
    g = px3[..., 1].astype(np.float64)
    b = px3[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.331264 * b + 128.0
    return _jpeg_encode_planes(
        [np.clip(np.round(c), 0, 255) for c in (y, cb, cr)], q
    )


def _jpeg_encode_planes(planes, q: int = _JPEG_Q) -> bytes:
    """Shared baseline-JPEG encode core (1 plane = grayscale, 3 planes =
    4:4:4 YCbCr): full 8x8 FDCT, flat-q quantization, zigzag, run-length
    AC with ZRL/EOB, per-component differential DC over interleaved MCUs
    — and PER-FILE canonical Huffman tables built from exactly the symbol
    set this image emits (all symbols at one code length satisfying Kraft
    with the all-ones code avoided), carried in DHT like any optimizing
    encoder. Dimensions must be multiples of 8."""
    import math
    import struct

    import numpy as np

    h, w = planes[0].shape
    if h % 8 or w % 8:
        raise ValueError("pad to 8x8 blocks first")
    m = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / math.sqrt(2.0) if u == 0 else 1.0) / 2.0
        for x in range(8):
            m[u, x] = cu * math.cos((2 * x + 1) * u * math.pi / 16.0)
    wt, ht = w // 8, h // 8
    # pass 1: quantized coefficients + symbol sets
    blocks = []
    preds = [0] * len(planes)
    dc_syms, ac_syms = set(), set()
    for t in range(wt * ht):
      for ci, plane in enumerate(planes):  # interleaved MCU at 4:4:4
        by, bx = (t // wt) * 8, (t % wt) * 8
        blk = np.asarray(plane)[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
        coef = m @ blk @ m.T
        zz = np.round(coef.reshape(64)[_ZIGZAG] / q).astype(np.int64)
        diff = int(zz[0]) - preds[ci]
        preds[ci] = int(zz[0])
        dc_syms.add(abs(diff).bit_length())
        runs = []
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                runs.append((0xF0, 0))
                ac_syms.add(0xF0)
                run -= 16
            s = abs(v).bit_length()
            runs.append(((run << 4) | s, v))
            ac_syms.add((run << 4) | s)
            run = 0
        if run:  # zeros remain after the last nonzero AC -> EOB
            runs.append((0x00, 0))
            ac_syms.add(0x00)
        blocks.append((diff, runs))
      # (per-MCU component loop ends here)

    def table(syms: set) -> tuple[list, list, dict]:
        vals = sorted(syms)
        ln = max(1, (len(vals) + 1 - 1).bit_length())  # leave all-ones free
        while (1 << ln) - 1 < len(vals):
            ln += 1
        bits = [0] * 16
        bits[ln - 1] = len(vals)
        return bits, vals, _huff_canonical(bits, vals)

    dc_bits, dc_vals, dc_huff = table(dc_syms)
    ac_bits, ac_vals, ac_huff = table(ac_syms or {0x00})

    bitbuf: list = []

    def put(code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            bitbuf.append((code >> i) & 1)

    for diff, runs in blocks:
        s = abs(diff).bit_length()
        c, ln = dc_huff[s]
        put(c, ln)
        if s:
            bits_v = diff if diff > 0 else diff + (1 << s) - 1
            put(bits_v & ((1 << s) - 1), s)
        for rs, v in runs:
            c, ln = ac_huff[rs]
            put(c, ln)
            s = rs & 0xF
            if s:
                bits_v = v if v > 0 else v + (1 << s) - 1
                put(bits_v & ((1 << s) - 1), s)
    while len(bitbuf) % 8:
        bitbuf.append(1)
    scan = bytearray()
    for i in range(0, len(bitbuf), 8):
        byte = 0
        for b in bitbuf[i : i + 8]:
            byte = (byte << 1) | b
        scan.append(byte)
        if byte == 0xFF:
            scan.append(0x00)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    nc = len(planes)
    dqt = seg(0xFFDB, bytes([0]) + bytes([q] * 64))
    sof_body = struct.pack(">BHHB", 8, h, w, nc)
    for cid in range(1, nc + 1):
        sof_body += bytes([cid, 0x11, 0])
    sof = seg(0xFFC0, sof_body)
    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
        + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals),
    )
    sos_body = bytes([nc])
    for cid in range(1, nc + 1):
        sos_body += bytes([cid, 0x00])
    sos = seg(0xFFDA, sos_body + bytes([0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + bytes(scan) + b"\xff\xd9"


# ---------------------------------------------------------------------------
# Real codec path: TIFF (baseline uncompressed RGB, both byte orders — the
# IFD tag walk is the whole format; pure struct + numpy)

TIFF_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("byte_order", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
    ]
)


def _tiff_bytes(media_id: int) -> bytes:
    """Deterministic baseline TIFF: width 5 + (id % 9), height 2 + (id % 6),
    solid (r, g, b) = ((id*5) % 256, (id*17) % 256, (id*23) % 256);
    little-endian ('II') for even ids, big-endian ('MM') for odd — a real
    reader must honor the byte-order mark, so the synthesizer exercises
    both. One strip, uncompressed, 9 IFD entries."""
    import struct

    import numpy as np

    w = 5 + (media_id % 9)
    h = 2 + (media_id % 6)
    r, g, b = (media_id * 5) % 256, (media_id * 17) % 256, (media_id * 23) % 256
    le = media_id % 2 == 0
    e = "<" if le else ">"
    pixels = np.tile(np.array([r, g, b], dtype=np.uint8), w * h).tobytes()

    # layout: 8-byte header | BitsPerSample array (6 bytes @ off 8) | pad |
    # pixel strip | IFD
    bits_off = 8
    strip_off = 16
    ifd_off = strip_off + len(pixels)
    header = struct.pack(e + "2sHI", b"II" if le else b"MM", 42, ifd_off)

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        # SHORT values sit in the low half of the value field per spec
        if typ == 3 and count == 1:
            return struct.pack(e + "HHIHH", tag, typ, count, value, 0)
        return struct.pack(e + "HHII", tag, typ, count, value)

    entries = [
        entry(256, 3, 1, w),            # ImageWidth
        entry(257, 3, 1, h),            # ImageLength
        entry(258, 3, 3, bits_off),     # BitsPerSample -> offset
        entry(259, 3, 1, 1),            # Compression: none
        entry(262, 3, 1, 2),            # Photometric: RGB
        entry(273, 4, 1, strip_off),    # StripOffsets
        entry(277, 3, 1, 3),            # SamplesPerPixel
        entry(278, 3, 1, h),            # RowsPerStrip
        entry(279, 4, 1, len(pixels)),  # StripByteCounts
    ]
    ifd = struct.pack(e + "H", len(entries)) + b"".join(entries) + struct.pack(
        e + "I", 0
    )
    bits = struct.pack(e + "HHH", 8, 8, 8)
    body = bytearray(b"\x00" * ifd_off)
    body[0:8] = header
    body[bits_off : bits_off + 6] = bits
    body[strip_off : strip_off + len(pixels)] = pixels
    return bytes(body) + ifd


def _tiff_feats(payload: bytes) -> tuple[str, int, int, float, float, float]:
    """REAL TIFF decode: byte-order mark, magic 42, IFD tag walk (SHORT
    values read from the value field per spec), single-strip uncompressed
    RGB lift, per-channel means."""
    import struct

    import numpy as np

    bom = payload[0:2]
    if bom == b"II":
        e = "<"
    elif bom == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    magic, ifd_off = struct.unpack_from(e + "HI", payload, 2)
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")
    (n_entries,) = struct.unpack_from(e + "H", payload, ifd_off)
    tags: dict[int, int] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(e + "HHI", payload, off)
        if typ == 3 and count == 1:
            (val,) = struct.unpack_from(e + "H", payload, off + 8)
        else:
            (val,) = struct.unpack_from(e + "I", payload, off + 8)
        tags[tag] = val
    if tags.get(259, 1) != 1:
        raise ValueError("compressed TIFF not supported")
    w, h = tags[256], tags[257]
    spp = tags.get(277, 1)
    strip_off, strip_len = tags[273], tags[279]
    px = np.frombuffer(payload, dtype=np.uint8, count=strip_len, offset=strip_off)
    img = px.reshape(h, w, spp).astype(np.float64)
    means = img.reshape(-1, spp).mean(axis=0)
    return (
        "II" if e == "<" else "MM",
        int(w),
        int(h),
        float(means[0]),
        float(means[1]),
        float(means[2]),
    )


def attach_tiff_payload(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize a TIFF-bytes payload column (deterministic per id)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["media_id"].map(lambda i: _tiff_bytes(int(i))),
                }
            )

    src = _spread(df.select(F.col(id_col).alias("media_id")))
    return src.mapInPandas(
        _gen,
        StructType(
            [
                StructField("media_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


def decode_tiff_features(df: DataFrame) -> DataFrame:
    """REAL image decode for TIFF: IFD walk in both byte orders, strip
    lift, per-channel means — same mapInPandas shape as the BMP/PNG/JPEG
    decoders."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_tiff_feats(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                rows,
                columns=["byte_order", "width", "height", "mean_r", "mean_g", "mean_b"],
            )
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            yield out

    return df.mapInPandas(_decode, TIFF_FEATURE_SCHEMA)

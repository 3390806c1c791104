"""Multimodal (image/audio/video) column plumbing (north-star extension).

Media assets are opaque ``binary`` columns + typed metadata structs; all
Spark-side machinery — schemas, partition-aware batch processing, Arrow
transfer shapes, UDF signatures — is real and tested. Codec work is REAL
for the container formats implemented from scratch in this module: PCM WAV,
binary PPM, PNG (all five filters), baseline + progressive JPEG, ISO-BMFF
MP4 box/sample-table walks, and MJPEG-in-MP4 frame decode; the gate
entries m01-m04 run these real codecs end-to-end against arithmetic SQL
oracles. What remains stubbed is inter-frame video decode (H.26x needs
ffmpeg-class machinery): those paths raise loudly via
``decode_unavailable``, and ``_decode_media_stub`` stays available as an
explicitly-labeled deterministic fake for plumbing tests over arbitrary
bytes.

Scale design:
- payloads never pass through Python row-at-a-time: ``mapInPandas``
  processes Arrow batches, so a 100 TB media corpus streams through
  executors in columnar chunks;
- feature extraction emits fixed-width vectors (``array<float>``), which
  feed the similarity/dedup operators directly;
- media tables should be written partitioned by ``media_type`` (partition
  pruning) and bucketed by ``asset_id`` for join co-location.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _decode_media_stub(payload: bytes, media_type: str) -> list[float]:
    """STUB — deterministic fake decode.

    Real implementation requires Pillow (image), soundfile/librosa (audio),
    or pyav/ffmpeg (video), none of which ship in this container. The fake
    derives a FEATURE_DIM-vector from the payload md5 so downstream plumbing
    (similarity joins, dedup) is exercised with stable values.
    """
    digest = hashlib.md5(media_type.encode() + b"|" + payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def decode_unavailable(payload: bytes, media_type: str):
    """The real-codec entry point for formats WITHOUT an in-repo codec,
    kept as an explicit NotImplementedError so callers choosing
    ``stub=False`` fail loudly rather than silently faking. In-repo REAL
    codecs cover WAV PCM (decode_wav_pcm), PPM (decode_ppm), PNG
    (decode_png), baseline + progressive JPEG (decode_jpeg) and
    MJPEG-in-MP4 frame decode (decode_mp4_mjpeg_frames); what remains
    stubbed is inter-frame video decode (H.26x needs ffmpeg-class
    machinery — the MP4 metadata and sample-table walks are real, see
    parse_mp4_metadata / parse_mp4_samples)."""
    raise NotImplementedError(
        f"real {media_type} decode needs native codec libraries "
        "(ffmpeg) not present in this environment; use stub=True, one "
        "of the in-repo codecs (WAV/PPM/PNG/JPEG/MJPEG-MP4), or plug a "
        "native decoder into the external-decoder seam "
        "(register_video_decoder)"
    )


def extract_features(media: DataFrame, stub: bool = True) -> DataFrame:
    """Decode + featurize media payloads via ``mapInPandas`` (Arrow batches,
    never per-row Python). Output feeds similarity.cosine_topk_bruteforce /
    dedup on the ``features`` column.

    ``stub=False`` routes payloads through the REAL in-repo codecs by
    container magic — ``P6`` PPM images (:func:`decode_ppm`), ``RIFF``
    WAV audio (:func:`decode_wav_pcm`), ISO-BMFF MJPEG video
    (:func:`decode_mp4_mjpeg_frames`) — and summarizes the decoded
    pixels/samples as a FEATURE_DIM vector of exact stats (see
    :func:`_image_features_real` and siblings). Unrecognized payloads
    raise loudly via :func:`decode_unavailable`."""

    decode = _decode_media_stub if stub else _decode_media_real

    def batches(parts: Iterator) -> Iterator:
        import pandas as pd

        for pdf in parts:
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "payload_md5": [
                        hashlib.md5(p).hexdigest() for p in pdf["payload"]
                    ],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "features": [
                        decode(p, m)
                        for p, m in zip(pdf["payload"], pdf["media_type"])
                    ],
                }
            )
            yield out

    return _fan_out(media).mapInPandas(batches, FEATURES_SCHEMA)


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, stub: bool = True
) -> DataFrame:
    """Frame sampling: one output row per sampled frame.

    The frame-count arithmetic and the explode to per-frame rows are pure
    Spark column expressions (JVM-side, codegen) — Python sees data only in
    the decode stage, an Arrow-batched ``mapInPandas`` whose single list
    comprehension is the per-frame codec call itself. No ``iterrows``:
    columns are zipped directly.

    With ``stub=False`` the decode is REAL for MJPEG-in-MP4 payloads:
    each exploded (payload, frame_ms) row routes through
    :func:`_mjpeg_frame_features` — sample-table walk, decode of ONLY
    the frame at that timestamp through the in-repo JPEG codec, pixel
    stats as the feature vector. Non-MJPEG codecs raise loudly."""

    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_ms", T.IntegerType()),
            T.StructField("frame_features", T.ArrayType(T.FloatType())),
        ]
    )
    decode = _decode_media_stub

    # sequence(0, n-1) with n<=0 would generate a DESCENDING sequence in
    # Spark, so gate the explode on a positive frame count (empty array
    # drops the row, matching "no frames for zero-duration media")
    n_frames = F.greatest(
        (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms).cast(
            "int"
        ),
        F.lit(0),
    )
    frames = (
        media.filter(F.col("media_type") == "video")
        .withColumn("__nf", n_frames)
        .withColumn(
            "frame_idx",
            F.explode(
                F.when(
                    F.col("__nf") > 0,
                    F.sequence(F.lit(0), F.col("__nf") - 1),
                ).otherwise(F.array().cast("array<int>"))
            ),
        )
        .select(
            "asset_id",
            "frame_idx",
            (F.col("frame_idx") * every_ms).cast("int").alias("frame_ms"),
            "payload",
        )
    )

    def batches(parts: Iterator) -> Iterator:
        import pandas as pd

        for pdf in parts:
            if stub:
                feats = [
                    decode(p + str(int(i)).encode(), "video-frame")
                    for p, i in zip(pdf["payload"], pdf["frame_idx"])
                ]
            else:
                feats = [
                    _mjpeg_frame_features(bytes(p), int(ms))
                    for p, ms in zip(pdf["payload"], pdf["frame_ms"])
                ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_ms": pdf["frame_ms"],
                    "frame_features": feats,
                }
            )

    return _fan_out(frames).mapInPandas(batches, out_schema)


def resize_images(media: DataFrame, width: int, height: int, stub: bool = True) -> DataFrame:
    """Image resize over the binary column. ``stub=True`` rewrites only the
    metadata struct (payload untouched); ``stub=False`` is a REAL pixel
    resample for PPM payloads: decode (:func:`decode_ppm`), nearest-neighbor
    sample with the top-left-anchored integer mapping
    ``src_x = (dst_x * src_w) // dst_w`` (exact integer arithmetic, so an
    SQL oracle can replicate every output pixel), re-encode
    (:func:`encode_ppm`). Arrow-batched ``mapInPandas``; one map stage, no
    shuffle. Non-PPM payloads raise loudly."""
    images = media.filter(F.col("media_type") == "image")
    if stub:
        return images.withColumn(
            "meta",
            F.struct(
                F.lit(width).alias("width"),
                F.lit(height).alias("height"),
                F.col("meta.duration_ms").alias("duration_ms"),
                F.col("meta.codec").alias("codec"),
            ),
        )

    def batches(parts: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in parts:
            rows = []
            for aid, mt, payload in zip(
                pdf["asset_id"], pdf["media_type"], pdf["payload"]
            ):
                p = bytes(payload)
                if p[:2] != b"P6":
                    decode_unavailable(p, "image")
                img = decode_ppm(p)
                sh, sw, _ = img.shape
                sx = (np.arange(width) * sw) // width
                sy = (np.arange(height) * sh) // height
                out = img[sy[:, None], sx[None, :], :]
                rows.append(
                    {
                        "asset_id": int(aid),
                        "media_type": mt,
                        "payload": encode_ppm(out),
                        "meta": {
                            "width": width,
                            "height": height,
                            "duration_ms": None,
                            "codec": "ppm",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _fan_out(images).mapInPandas(batches, MEDIA_SCHEMA)


def _fan_out(df: DataFrame) -> DataFrame:
    """Spread a narrow projection across every core before a
    python-heavy mapInPandas stage: a small single-file parquet reads as
    ONE partition, and mapInPandas preserves input partitioning, so the
    codec work would otherwise run on one core. No-op at real scale
    (inputs already in many partitions); values unaffected (all codec
    stages are per-row)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the ``documents`` testdata
    table: payload = utf-8 bytes of the text, media_type round-robins by
    doc_id, duration scales with n_chars. Pure column expressions — the
    point is to exercise the binary-column plumbing against a table the
    DuckDB oracle can also see (payload bytes == text bytes)."""
    mt = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    is_img = F.col("doc_id") % 3 == 0
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        mt.alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.when(is_img, F.lit(64)).cast("int").alias("width"),
            F.when(is_img, F.lit(48)).cast("int").alias("height"),
            F.when(~is_img, F.col("n_chars") * 10).cast("int").alias(
                "duration_ms"
            ),
            F.lit("stubcodec").alias("codec"),
        ).alias("meta"),
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests/demos (no testdata
    counterpart exists for binary payloads)."""
    rows = []
    for i in range(n):
        mt = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"asset-{i}".encode()).digest() * 8
        meta = (
            (64, 48, None, "fakejpeg")
            if mt == "image"
            else (None, None, 5000 + 1000 * (i % 3), "fakecodec")
            if mt == "video"
            else (None, None, 2000, "fakepcm")
        )
        rows.append((i, mt, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# REAL codecs for container-friendly formats. JPEG/PNG/MP4 still need
# native libraries (the loud stub above), but 16-bit PCM WAV decodes with
# the stdlib `wave` module and binary PPM (P6) is a pure-numpy parse — so
# for these two formats the decode step is real, not faked: bytes in,
# verified samples/pixels out, measured features downstream.
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples, sample_rate: int) -> bytes:
    """Encode an int16 numpy array (frames x channels, or 1-D mono) to a
    WAV payload — the test-side inverse of :func:`decode_wav_pcm`."""
    import io
    import wave

    import numpy as np

    x = np.asarray(samples, dtype="<i2")
    if x.ndim == 1:
        x = x[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(x.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def decode_wav_pcm(payload: bytes):
    """REAL audio decode (stdlib): parse a 16-bit PCM WAV payload into
    ``(sample_rate, frames x channels int16 array)``."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV is supported")
        ch = w.getnchannels()
        sr = w.getframerate()
        raw = w.readframes(w.getnframes())
    return sr, np.frombuffer(raw, dtype="<i2").reshape(-1, ch)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak_abs", T.DoubleType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)


def audio_wav_features(media: DataFrame) -> DataFrame:
    """Real audio feature extraction over WAV payload columns: duration,
    RMS level, absolute peak, zero-crossing count — the loudness/activity
    stats an audio-curation pipeline filters on (silence, clipping).
    Arrow-batched ``mapInPandas``; per batch the only Python loop is over
    payload byte-strings (unavoidable: variable-length blobs), everything
    per-sample is numpy."""

    def batches(parts: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in parts:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                sr, x = decode_wav_pcm(bytes(payload))
                mono = x.astype("f8").mean(axis=1) / 32768.0
                n = len(mono)
                rows.append(
                    {
                        "asset_id": aid,
                        "duration_ms": int(round(1000.0 * n / sr)),
                        "sample_rate": sr,
                        "rms": float(np.sqrt(np.mean(mono**2))) if n else 0.0,
                        "peak_abs": float(np.max(np.abs(mono))) if n else 0.0,
                        "zero_crossings": int(
                            np.sum(
                                np.signbit(mono[1:]) != np.signbit(mono[:-1])
                            )
                        )
                        if n > 1
                        else 0,
                    }
                )
            yield pd.DataFrame(rows)

    return _fan_out(media.select("asset_id", "payload")).mapInPandas(
        batches, AUDIO_FEATURES_SCHEMA
    )


def encode_ppm(img) -> bytes:
    """Encode an (H x W x 3) uint8 array as binary PPM (P6)."""
    import numpy as np

    a = np.asarray(img, dtype=np.uint8)
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(payload: bytes):
    """REAL image decode (pure numpy): binary PPM (P6) to an
    (H x W x 3) uint8 pixel array."""
    import re

    import numpy as np

    m = re.match(rb"^P6\s+(?:#[^\n]*\s+)*(\d+)\s+(\d+)\s+(\d+)\s", payload)
    if not m:
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxv = (int(g) for g in m.groups())
    if maxv != 255:
        raise ValueError("only maxval=255 PPM supported")
    data = payload[m.end() : m.end() + w * h * 3]
    if len(data) != w * h * 3:
        raise ValueError("truncated PPM payload")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("luma_mean", T.DoubleType()),
    ]
)


def image_ppm_stats(media: DataFrame) -> DataFrame:
    """Real image stats over PPM payload columns: dimensions, per-channel
    means, Rec.601 luma mean — the brightness/size screens an image-
    curation pipeline applies before expensive model scoring."""

    def batches(parts: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in parts:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                img = decode_ppm(bytes(payload)).astype("f8")
                means = img.reshape(-1, 3).mean(axis=0)
                rows.append(
                    {
                        "asset_id": aid,
                        "width": img.shape[1],
                        "height": img.shape[0],
                        "mean_r": float(means[0]),
                        "mean_g": float(means[1]),
                        "mean_b": float(means[2]),
                        "luma_mean": float(
                            0.299 * means[0]
                            + 0.587 * means[1]
                            + 0.114 * means[2]
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return _fan_out(media.select("asset_id", "payload")).mapInPandas(
        batches, IMAGE_STATS_SCHEMA
    )


def encode_png(img) -> bytes:
    """Encode a uint8 array (H x W gray, H x W x 3 RGB, or H x W x 4
    RGBA) as a real PNG: filter-0 scanlines, one zlib IDAT, CRC-correct
    chunks — stdlib only. Test-side inverse of :func:`decode_png`."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        color, arr = 0, a[:, :, None]
    elif a.shape[2] == 3:
        color, arr = 2, a
    elif a.shape[2] == 4:
        color, arr = 6, a
    else:
        raise ValueError("expected gray, RGB or RGBA uint8 array")
    h, w = arr.shape[:2]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """REAL PNG decode — stdlib ``zlib`` + numpy, no Pillow: 8-bit
    greyscale/RGB/RGBA, non-interlaced, ALL FIVE scanline filters
    (None/Sub/Up/Average/Paeth, RFC 2083 §6). Returns an
    (H x W x channels) uint8 array. Filters None and Up are vectorized;
    Sub/Average/Paeth carry a left-neighbor dependency and run the
    per-byte recurrence in Python — correct first, and external PNGs are
    a cold path next to the PPM/WAV fixtures. Palette, 16-bit and
    interlaced files raise loudly rather than mis-decode."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, idat, w, h, color = 8, b"", None, None, None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError("only 8-bit PNG supported")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            if color not in (0, 2, 6):
                raise ValueError("palette / grey-alpha PNG not supported")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    ch = {0: 1, 2: 3, 6: 4}[color]
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("truncated PNG scanline data")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p = 0
    for y in range(h):
        ftype = raw[p]
        line = np.frombuffer(raw[p + 1 : p + 1 + stride], dtype=np.uint8)
        p += 1 + stride
        if ftype == 0:
            cur = line.copy()
        elif ftype == 2:  # Up: wraps mod 256 like all PNG filters
            cur = line + prev
        elif ftype in (1, 3, 4):
            cur = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                a_ = int(cur[i - ch]) if i >= ch else 0
                b_ = int(prev[i])
                if ftype == 1:  # Sub
                    pred = a_
                elif ftype == 3:  # Average
                    pred = (a_ + b_) // 2
                else:  # Paeth
                    c_ = int(prev[i - ch]) if i >= ch else 0
                    est = a_ + b_ - c_
                    pa, pb, pc = abs(est - a_), abs(est - b_), abs(est - c_)
                    pred = a_ if pa <= pb and pa <= pc else (
                        b_ if pb <= pc else c_
                    )
                cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, ch)


def image_png_stats(media: DataFrame) -> DataFrame:
    """Real image stats over PNG payload columns (same screens as
    :func:`image_ppm_stats`: dimensions, channel means, Rec.601 luma).
    Greyscale broadcasts its single channel; RGBA ignores alpha for the
    luma (composited screening belongs to a real pipeline stage)."""

    def batches(parts: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in parts:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                img = decode_png(bytes(payload)).astype("f8")
                rgb = (
                    np.repeat(img, 3, axis=2)
                    if img.shape[2] == 1
                    else img[:, :, :3]
                )
                means = rgb.reshape(-1, 3).mean(axis=0)
                rows.append(
                    {
                        "asset_id": aid,
                        "width": img.shape[1],
                        "height": img.shape[0],
                        "mean_r": float(means[0]),
                        "mean_g": float(means[1]),
                        "mean_b": float(means[2]),
                        "luma_mean": float(
                            0.299 * means[0]
                            + 0.587 * means[1]
                            + 0.114 * means[2]
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return _fan_out(media.select("asset_id", "payload")).mapInPandas(
        batches, IMAGE_STATS_SCHEMA
    )


def encode_mp4_skeleton(
    duration_ms: int, width: int, height: int, brand: bytes = b"isom"
) -> bytes:
    """Build a minimal-but-well-formed MP4 box skeleton (ftyp + moov
    with mvhd and one trak/tkhd) — the test-side inverse of
    :func:`parse_mp4_metadata`. Carries NO media samples; it exists so
    the metadata parser can be closed-form verified without ffmpeg."""
    import struct

    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    timescale = 1000
    mvhd = box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0
        + struct.pack(">II", 0, 0)  # creation, modification
        + struct.pack(">II", timescale, duration_ms)
        + b"\x00" * 80,  # rate/volume/matrix/reserved/next_track
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIII", 0, 0, 1, 0)  # times, track id, reserved
        + struct.pack(">I", duration_ms)
        + b"\x00" * 52  # reserved/layer/volume/matrix
        + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
    )
    trak = box(b"trak", tkhd)
    moov = box(b"moov", mvhd + trak)
    ftyp = box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    return ftyp + moov


def _mp4_walk(buf: bytes, start: int, end: int):
    """Yield ``(tag, body_offset, end_offset)`` for each ISO-BMFF box in
    ``buf[start:end]`` (64-bit largesize and size-0 run-to-end boxes
    handled); raises on malformed structure."""
    import struct

    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
            body = pos + 8
        else:
            body = pos + 8
        if size < 8 or pos + size > end:
            raise ValueError("malformed MP4 box structure")
        yield tag, body, pos + size
        pos += size


def parse_mp4_metadata(payload: bytes) -> dict:
    """REAL MP4 container metadata — a pure ``struct`` walk of the ISO
    BMFF box tree (no frame decode, no ffmpeg): major brand from
    ``ftyp``, duration from ``moov/mvhd`` (timescale-normalized to ms),
    presentation width/height from the first ``moov/trak/tkhd`` (16.16
    fixed point). Everything a curation pipeline filters on BEFORE
    deciding to decode (length screens, aspect screens, brand routing).
    Pixel decode is real for MJPEG tracks (:func:`decode_mp4_mjpeg_frames`
    — the box walk composed with the in-repo JPEG codec); other codecs
    (H.26x) still need libraries this container doesn't ship and stay
    behind the loud stub."""

    import struct

    walk = _mp4_walk
    meta = {"brand": None, "duration_ms": None, "width": None, "height": None}
    for tag, body, stop in walk(payload, 0, len(payload)):
        if tag == b"ftyp":
            meta["brand"] = payload[body : body + 4].decode("latin-1")
        elif tag == b"moov":
            for t2, b2, s2 in walk(payload, body, stop):
                if t2 == b"mvhd":
                    version = payload[b2]
                    if version == 1:
                        ts, dur = struct.unpack(
                            ">IQ", payload[b2 + 20 : b2 + 32]
                        )
                    else:
                        ts, dur = struct.unpack(
                            ">II", payload[b2 + 12 : b2 + 20]
                        )
                    if ts:
                        meta["duration_ms"] = int(round(1000.0 * dur / ts))
                elif t2 == b"trak" and meta["width"] is None:
                    for t3, b3, _ in walk(payload, b2, s2):
                        if t3 == b"tkhd":
                            version = payload[b3]
                            off = b3 + (88 if version == 1 else 76)
                            w_fx, h_fx = struct.unpack(
                                ">II", payload[off : off + 8]
                            )
                            meta["width"] = w_fx >> 16
                            meta["height"] = h_fx >> 16
    if meta["brand"] is None:
        raise ValueError("no ftyp box: not an MP4/ISO-BMFF payload")
    return meta


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("brand", T.StringType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def video_mp4_metadata(media: DataFrame) -> DataFrame:
    """Container-level video screening over MP4 payload columns (the
    pre-decode filters: duration, dimensions, brand)."""

    def batches(parts: Iterator) -> Iterator:
        import pandas as pd

        for pdf in parts:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                m = parse_mp4_metadata(bytes(payload))
                rows.append(
                    {
                        "asset_id": aid,
                        "brand": m["brand"],
                        "duration_ms": m["duration_ms"],
                        "width": m["width"],
                        "height": m["height"],
                    }
                )
            yield pd.DataFrame(rows)

    return _fan_out(media.select("asset_id", "payload")).mapInPandas(
        batches, VIDEO_META_SCHEMA
    )


def encode_jpeg_skeleton(width: int, height: int, progressive: bool = False) -> bytes:
    """Build a structurally-valid JPEG header stream (SOI, JFIF APP0,
    SOFn with real dimensions, EOI — no entropy-coded data): the
    test-side inverse of :func:`parse_jpeg_metadata`."""
    import struct

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    app0 = seg(0xFFE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    sof = seg(
        0xFFC2 if progressive else 0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01",
    )
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def parse_jpeg_metadata(payload: bytes) -> dict:
    """REAL JPEG container metadata — a marker-segment walk (no entropy
    decode): dimensions and component count from the first SOFn frame
    header, progressive-vs-baseline from which SOFn appears. The
    pre-decode screening fields (size/aspect filters, progressive
    routing); pixel decode stays a loud stub — a DCT entropy decoder
    needs libraries this container doesn't ship."""
    import struct

    if payload[:2] != b"\xff\xd8":
        raise ValueError("no SOI marker: not a JPEG payload")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("desynchronized JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # standalone
            pos += 2
            continue
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                      0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            precision, h, w, ncomp = struct.unpack(
                ">BHHB", payload[pos + 4 : pos + 10]
            )
            return {
                "width": w,
                "height": h,
                "n_components": ncomp,
                "precision": precision,
                "progressive": marker in (0xC2, 0xC6, 0xCA, 0xCE),
            }
        if marker == 0xDA:  # SOS: frame header must have come first
            break
        pos += 2 + length
    raise ValueError("no SOF frame header found")


# ---------------------------------------------------------------------------
# Perceptual hashing over the REAL PPM codec
# ---------------------------------------------------------------------------

# dHash geometry: a 9x8 grid of 4x4-pixel blocks (36x32 source image);
# each of the 8x8 horizontal block comparisons contributes one bit.
DHASH_BLOCK = 4
DHASH_GRID_W = 9
DHASH_GRID_H = 8
DHASH_IMG_W = DHASH_GRID_W * DHASH_BLOCK  # 36
DHASH_IMG_H = DHASH_GRID_H * DHASH_BLOCK  # 32


def _ppm_base_grid():
    """The doc-independent part of the synthetic 36x32 pixel formula
    ``(doc_id*7 + x*3 + y*5 + c*11) % 256`` — shared by
    :func:`synthetic_ppm_from_documents` (m04) and
    :func:`synthetic_media_real_from_documents` (m01/m03) so every
    image entry agrees with the same SQL-replicable generator."""
    import numpy as np

    y, x, c = np.meshgrid(
        np.arange(DHASH_IMG_H),
        np.arange(DHASH_IMG_W),
        np.arange(3),
        indexing="ij",
    )
    return x * 3 + y * 5 + c * 11


def synthetic_ppm_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic 36x32 binary-PPM payload per document:
    pixel channel value = ``(doc_id*7 + x*3 + y*5 + c*11) % 256``. A
    stand-in for real crawl image bytes (no image libraries ship in this
    container) whose generating formula an SQL oracle can replicate —
    while the Spark side still round-trips REAL P6 bytes through
    :func:`encode_ppm` / :func:`decode_ppm`, so the codec and the
    hashing pipeline are exercised end-to-end."""

    def batches(parts: Iterator) -> Iterator:
        import pandas as pd

        base = _ppm_base_grid()
        for pdf in parts:
            rows = [
                {
                    "asset_id": int(aid),
                    "payload": encode_ppm((int(aid) * 7 + base) % 256),
                }
                for aid in pdf["doc_id"]
            ]
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return _fan_out(docs.select("doc_id")).mapInPandas(batches, schema)


def synthetic_ppm_mirrored(
    docs: DataFrame,
    mirror_groups: int = 50,
    base_mod: int = 200,
    bright_mod: int = 40,
) -> DataFrame:
    """Mirrored variant of :func:`synthetic_ppm_from_documents` for the
    x04 image near-dup pipeline: pixel channel value =
    ``(idx * (2g+1) * 40503) % base_mod + (doc_id % bright_mod)`` with
    ``g = doc_id % mirror_groups`` and ``idx = (y*36 + x)*3 + c + 1``
    (the pixel's 1-based linear index) — every group of ~corpus/G
    documents shares one BASE image but each doc carries a doc-unique
    brightness offset, so payload bytes differ doc-to-doc while the
    dHash is group-identical (a uniform brightness shift moves every
    4x4 block sum by the same ``16*1000*offset`` milli-luma, leaving
    all strict ``>`` neighbor comparisons unchanged) — the
    repost/re-encode pattern image-level dedup exists for.

    The multiplicative per-pixel SCRAMBLE (not m04's x/y gradient)
    matters: a gradient image's block sums are monotone, so most dHash
    bits are 1 and different groups collide into the same 8-bit band
    buckets (measured: ~20 of 50 groups shared band value 255, making
    the sf0.1 band join quadratic in the corpus and the oracle's
    cluster closure explode). Scrambled, the 50 group hashes spread to
    band buckets of <= 4-5 with only a few genuine cross-group
    near-pairs left — which is test richness (cross-group merges DO
    get exercised), not degeneracy. ``base_mod + bright_mod <= 256``
    keeps channel values in byte range with NO wraparound, so the
    closed-form oracle needs only the group formula."""
    if base_mod + bright_mod > 256:
        raise ValueError("base_mod + bright_mod must stay within a byte")

    def batches(parts: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        y, x, c = np.meshgrid(
            np.arange(DHASH_IMG_H),
            np.arange(DHASH_IMG_W),
            np.arange(3),
            indexing="ij",
        )
        idx = (y * DHASH_IMG_W + x) * 3 + c + 1
        for pdf in parts:
            rows = [
                {
                    "asset_id": int(aid),
                    "payload": encode_ppm(
                        (idx * (2 * (int(aid) % mirror_groups) + 1) * 40503)
                        % base_mod
                        + int(aid) % bright_mod
                    ),
                }
                for aid in pdf["doc_id"]
            ]
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return _fan_out(docs.select("doc_id")).mapInPandas(batches, schema)


IMAGE_DHASH_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash over REAL decoded PPM payloads — the
    image-dedup analogue of SimHash: near-identical images agree on most
    of the 64 bits, so the existing hamming-pair machinery
    (`dedup.hamming_near_pairs`) clusters them without any pixel joins.

    Pipeline per image (all exact integer math, so an oracle can verify
    bit-for-bit): decode P6 bytes -> Rec.601 milli-luma
    ``299R + 587G + 114B`` per pixel -> 9x8 grid of 4x4 block sums ->
    bit(y, x) = 1 iff block(y, x+1) > block(y, x) -> 64 bits packed
    little-endian by index ``y*8 + x`` into a signed two's-complement
    BIGINT. Arrow-batched mapInPandas; one map stage, no shuffle."""

    def batches(parts: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in parts:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                img = decode_ppm(bytes(payload)).astype(np.int64)
                h, w, _ = img.shape
                luma = img[:, :, 0] * 299 + img[:, :, 1] * 587 + img[:, :, 2] * 114
                gh, gw = h // DHASH_BLOCK, w // DHASH_BLOCK
                blocks = luma[: gh * DHASH_BLOCK, : gw * DHASH_BLOCK].reshape(
                    gh, DHASH_BLOCK, gw, DHASH_BLOCK
                ).sum(axis=(1, 3))
                bits = blocks[:, 1:] > blocks[:, :-1]  # (gh, gw-1)
                val = 0
                for yy in range(min(gh, DHASH_GRID_H)):
                    for xx in range(min(gw - 1, DHASH_GRID_W - 1)):
                        if bits[yy, xx]:
                            val |= 1 << (yy * 8 + xx)
                if val >= 1 << 63:
                    val -= 1 << 64
                rows.append(
                    {"asset_id": aid, "width": w, "height": h, "dhash": val}
                )
            yield pd.DataFrame(rows)

    return _fan_out(media.select("asset_id", "payload")).mapInPandas(
        batches, IMAGE_DHASH_SCHEMA
    )


AUDIO_SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("dominant_hz", T.DoubleType()),
        T.StructField("spectral_centroid_hz", T.DoubleType()),
        T.StructField("spectral_rolloff_hz", T.DoubleType()),
        T.StructField("band_energy_low", T.DoubleType()),
        T.StructField("band_energy_mid", T.DoubleType()),
        T.StructField("band_energy_high", T.DoubleType()),
    ]
)


def audio_spectral_features(media: DataFrame) -> DataFrame:
    """REAL frequency-domain audio features over WAV payloads — the DSP
    screens an audio-curation pipeline uses to drop tones/hum (a single
    dominant spike), hiss (high rolloff), and band-limited junk before
    any model hears a sample: dominant frequency (argmax rFFT magnitude,
    DC excluded), spectral centroid, 85% energy rolloff, and the
    low/mid/high (<300 Hz / 300-3400 Hz / >3400 Hz, telephony bands)
    energy split.

    Decode is the real stdlib WAV codec; the FFT is numpy's rFFT inside
    the same Arrow batch — one map stage, no shuffle. No SQL oracle (no
    FFT in the oracle engine): verified closed-form in tests against
    pure sine and band-mix fixtures, the same standard the WAV/PPM/PNG
    codecs meet."""

    def batches(parts: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in parts:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                sr, x = decode_wav_pcm(bytes(payload))
                mono = x.astype("f8").mean(axis=1)
                mag = np.abs(np.fft.rfft(mono))
                freqs = np.fft.rfftfreq(len(mono), d=1.0 / sr)
                power = mag * mag
                p_ac = power.copy()
                p_ac[0] = 0.0  # exclude DC from every feature
                total = p_ac.sum()
                if total <= 0:
                    dom = cent = roll = 0.0
                    lo = mid = hi = 0.0
                else:
                    dom = float(freqs[int(p_ac.argmax())])
                    cent = float((freqs * p_ac).sum() / total)
                    cum = np.cumsum(p_ac)
                    roll = float(freqs[int(np.searchsorted(cum, 0.85 * total))])
                    lo = float(p_ac[freqs < 300.0].sum() / total)
                    mid = float(
                        p_ac[(freqs >= 300.0) & (freqs <= 3400.0)].sum() / total
                    )
                    hi = float(p_ac[freqs > 3400.0].sum() / total)
                rows.append(
                    {
                        "asset_id": aid,
                        "sample_rate": sr,
                        "dominant_hz": dom,
                        "spectral_centroid_hz": cent,
                        "spectral_rolloff_hz": roll,
                        "band_energy_low": lo,
                        "band_energy_mid": mid,
                        "band_energy_high": hi,
                    }
                )
            yield pd.DataFrame(rows)

    return _fan_out(media.select("asset_id", "payload")).mapInPandas(
        batches, AUDIO_SPECTRAL_SCHEMA
    )


# ---------------------------------------------------------------------------
# REAL baseline JPEG codec (pure numpy + stdlib — no Pillow/libjpeg)
# ---------------------------------------------------------------------------
# Closes the last loud pixel-decode stub: baseline sequential DCT JPEG
# (SOF0), the dominant crawl-image format. The decoder is fully
# stream-driven — quant tables, Huffman tables, sampling factors and
# restart intervals all come from the file's own segments — so it reads
# any 8-bit baseline JPEG (4:4:4 and subsampled 4:2:0/4:2:2 included).
# Progressive (SOF2) streams decode through the dedicated progressive
# codec further below; arithmetic and 12-bit streams raise loudly.
# Reference surface parity: the reference treats media as opaque S3
# objects (src/extract.py:122-156); pixel analytics are a north-star
# extension like the PNG/WAV codecs above.

# zigzag scan: ZIGZAG[i] = raster index of the i-th zigzag position
JPEG_ZIGZAG = [
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K quantization tables (luma K.1 / chroma K.2), raster order
JPEG_QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
JPEG_QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K typical Huffman specs: (bits[1..16], values). The DECODER never
# uses these — it builds tables from the stream's DHT segments; they are
# the encoder's tables (and are written into its DHT segments).
JPEG_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
JPEG_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
JPEG_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
JPEG_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _jpeg_dct_matrix():
    import numpy as np

    C = np.zeros((8, 8))
    for u in range(8):
        a = (1.0 / 8.0) ** 0.5 if u == 0 else (2.0 / 8.0) ** 0.5
        for x in range(8):
            C[u, x] = a * __import__("math").cos((2 * x + 1) * u * __import__("math").pi / 16.0)
    return C


def _huff_encode_table(bits, vals):
    """Canonical JPEG Huffman assignment: val -> (code, length)."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _huff_decode_table(bits, vals):
    """(length, code) -> symbol, plus the max code per length for fast
    invalid-stream detection."""
    enc = _huff_encode_table(bits, vals)
    return {(ln, code): v for v, (code, ln) in enc.items()}


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align_marker(self, marker_byte: int) -> None:
        """Byte-align (1-bit padding) and emit a raw RSTn marker —
        markers are never byte-stuffed."""
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)
        self.out.append(0xFF)
        self.out.append(marker_byte)

    def flush(self) -> bytes:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # pad with 1-bits
        return bytes(self.out)


class _JpegBitReader:
    """Bit reader over the entropy-coded segment with 0xFF00 destuffing;
    RSTn markers byte-align the stream and are consumed by restart()."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        try:
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    raise _JpegRestart()
                else:
                    raise ValueError("marker inside entropy data")
            else:
                self.pos += 1
        except IndexError:
            # a truncated payload must fail loudly as a decode error, not
            # leak the reader's internal IndexError
            raise ValueError("truncated JPEG entropy stream") from None
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    def restart(self) -> None:
        # drop partial bits, consume the RSTn marker (explicit raise, not
        # assert — asserts vanish under python -O and a corrupt stream
        # must fail loudly, not misparse)
        self.acc = 0
        self.nbits = 0
        if self.pos >= len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("expected RSTn marker in JPEG entropy stream")
        self.pos += 2


class _JpegRestart(Exception):
    pass


def _jpeg_scaled_qt(base, quality: int):
    import numpy as np

    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (np.array(base, dtype="i8") * scale + 50) // 100
    return np.clip(t, 1, 255).astype("i8")


def encode_jpeg_baseline(
    img,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode a uint8 array (H x W grey or H x W x 3 RGB) as a REAL
    baseline JPEG: JFIF YCbCr, Annex K tables scaled by the libjpeg
    quality formula, standard Huffman coding, byte stuffing. 4:4:4 by
    default; ``subsample=True`` emits 4:2:0 (box-averaged chroma, the
    dominant crawl-JPEG layout), ``restart_interval=N`` emits DRI + RSTn
    markers every N MCUs. The test-side inverse of
    :func:`decode_jpeg_baseline` — and any standard viewer reads its
    output."""
    import struct

    import numpy as np

    arr = np.asarray(img, dtype="u1")
    grey = arr.ndim == 2
    if not grey and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("expected grey (HxW) or RGB (HxWx3) uint8 array")
    h, w = arr.shape[:2]
    f = arr.astype("f8")
    if grey:
        planes = [f]
    else:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b,
        ]
    qts = [_jpeg_scaled_qt(JPEG_QT_LUMA, quality)]
    if not grey:
        qts.append(_jpeg_scaled_qt(JPEG_QT_CHROMA, quality))
    C = _jpeg_dct_matrix()
    zz = np.array(JPEG_ZIGZAG)

    dc_tabs = [_huff_encode_table(*JPEG_HUFF_DC_LUMA)]
    ac_tabs = [_huff_encode_table(*JPEG_HUFF_AC_LUMA)]
    if not grey:
        dc_tabs.append(_huff_encode_table(*JPEG_HUFF_DC_CHROMA))
        ac_tabs.append(_huff_encode_table(*JPEG_HUFF_AC_CHROMA))

    # sampling factors per component; 4:2:0 box-averages the chroma
    if subsample and not grey:
        samp = [(2, 2), (1, 1), (1, 1)]
        cb, cr = planes[1], planes[2]
        ch2, cw2 = -(-h // 2), -(-w // 2)
        # pad to even dims with edge replication, then 2x2 box average
        cbp = np.pad(cb, ((0, 2 * ch2 - h), (0, 2 * cw2 - w)), mode="edge")
        crp = np.pad(cr, ((0, 2 * ch2 - h), (0, 2 * cw2 - w)), mode="edge")
        planes = [
            planes[0],
            cbp.reshape(ch2, 2, cw2, 2).mean(axis=(1, 3)),
            crp.reshape(ch2, 2, cw2, 2).mean(axis=(1, 3)),
        ]
    else:
        samp = [(1, 1)] * len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = []
    for p, (si, sv) in zip(planes, samp):
        tw, th = mcus_x * 8 * si, mcus_y * 8 * sv
        padded.append(
            np.pad(
                p,
                ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                mode="edge",
            )
            - 128.0
        )
    wr = _JpegBitWriter()
    preds = [0] * len(planes)

    def emit_block(ci: int, by: int, bx: int) -> None:
        qt = qts[min(ci, len(qts) - 1)]
        dct = dc_tabs[min(ci, len(dc_tabs) - 1)]
        act = ac_tabs[min(ci, len(ac_tabs) - 1)]
        blk = padded[ci][by : by + 8, bx : bx + 8]
        coef = C @ blk @ C.T
        q = np.floor(coef.reshape(64) / qt + 0.5).astype("i8")[zz]
        diff = int(q[0]) - preds[ci]
        preds[ci] = int(q[0])
        s = abs(diff).bit_length()
        code, ln = dct[s]
        wr.put(code, ln)
        if s:
            wr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = max((i for i in range(1, 64) if q[i]), default=0)
        for k in range(1, last_nz + 1):
            v = int(q[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = act[0xF0]
                wr.put(code, ln)
                run -= 16
            s = abs(v).bit_length()
            code, ln = act[(run << 4) | s]
            wr.put(code, ln)
            wr.put(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            code, ln = act[0x00]
            wr.put(code, ln)

    mcu_count = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                wr.align_marker(0xD0 + rst_n % 8)
                rst_n += 1
                preds = [0] * len(planes)
            for ci, (si, sv) in enumerate(samp):
                for byi in range(sv):
                    for bxi in range(si):
                        emit_block(
                            ci,
                            (my * sv + byi) * 8,
                            (mx * si + bxi) * 8,
                        )
            mcu_count += 1
    entropy = wr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = b"\xff\xd8"
    out += seg(0xFFE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    for tid, qt in enumerate(qts):
        ztab = bytes(int(qt[JPEG_ZIGZAG[i]]) for i in range(64))
        out += seg(0xFFDB, bytes([tid]) + ztab)
    ncomp = 1 if grey else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hv = (samp[ci][0] << 4) | samp[ci][1]
        sof += bytes([ci + 1, hv, min(ci, len(qts) - 1)])
    out += seg(0xFFC0, sof)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    specs = [(0x00, JPEG_HUFF_DC_LUMA), (0x10, JPEG_HUFF_AC_LUMA)]
    if not grey:
        specs += [(0x01, JPEG_HUFF_DC_CHROMA), (0x11, JPEG_HUFF_AC_CHROMA)]
    for tc_th, (bits, vals) in specs:
        out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    return out + entropy + b"\xff\xd9"


def decode_jpeg_baseline(payload: bytes):
    """REAL baseline JPEG decode — stdlib + numpy: stream-driven DQT /
    DHT / SOF0 / SOS / DRI parsing, Huffman + run-length entropy decode
    with restart-marker support, dequantize, IDCT, chroma upsampling for
    subsampled scans (4:2:0 / 4:2:2), YCbCr -> RGB. Returns an
    (H x W x channels) uint8 array (channels 1 for greyscale scans, 3
    otherwise). Progressive (SOF2), arithmetic-coded, hierarchical and
    12-bit streams raise loudly rather than mis-decode."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("no SOI marker: not a JPEG payload")
    qts: dict[int, object] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
    scan: list[tuple[int, int, int]] = []  # (comp index, td, ta)
    height = width = 0
    restart_interval = 0
    pos = 2
    zz = np.array(JPEG_ZIGZAG)
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("desynchronized JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xFF:
            # spec-permitted 0xFF fill bytes before a marker (B.1.1.2):
            # skip padding rather than reject the stream
            pos += 1
            continue
        if marker == 0xD9:
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        data = payload[pos + 4 : pos + 2 + length]
        if marker in (0xC2, 0xC6, 0xCA, 0xCE):
            raise ValueError("progressive JPEG not supported (baseline only)")
        if marker in (0xC3, 0xC5, 0xC7, 0xC9, 0xCB, 0xCD, 0xCF):
            raise ValueError("non-baseline JPEG frame not supported")
        if marker in (0xC0, 0xC1):
            precision, height, width, ncomp = struct.unpack(">BHHB", data[:6])
            if precision != 8:
                raise ValueError("only 8-bit baseline JPEG supported")
            for i in range(ncomp):
                cid, hv, tq = data[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker == 0xDB:
            p = 0
            while p < len(data):
                pq_tq = data[p]
                if pq_tq >> 4:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.zeros(64, dtype="i8")
                for i in range(64):
                    tbl[JPEG_ZIGZAG[i]] = data[p + 1 + i]
                qts[pq_tq & 0xF] = tbl
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(data):
                tc_th = data[p]
                bits = list(data[p + 1 : p + 17])
                n = sum(bits)
                vals = list(data[p + 17 : p + 17 + n])
                huff[(tc_th >> 4, tc_th & 0xF)] = _huff_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:
            ns = data[0]
            for i in range(ns):
                cs, tda = data[1 + 2 * i : 3 + 2 * i]
                ci = next(
                    j for j, c in enumerate(comps) if c[0] == cs
                )
                scan.append((ci, tda >> 4, tda & 0xF))
            pos = pos + 2 + length
            break
        pos += 2 + length
    if not comps or not scan:
        raise ValueError("JPEG missing frame/scan headers")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-width // mcu_w)
    mcus_y = -(-height // mcu_h)
    planes = [
        np.zeros((mcus_y * 8 * c[2], mcus_x * 8 * c[1]), dtype="f8")
        for c in comps
    ]
    C = _jpeg_dct_matrix()
    reader = _JpegBitReader(payload, pos)
    preds = [0] * len(comps)

    def extend(v: int, s: int) -> int:
        return v - (1 << s) + 1 if v < (1 << (s - 1)) else v

    def decode_block(ci: int, td: int, ta: int, by: int, bx: int) -> None:
        dc_tab = huff[(0, td)]
        ac_tab = huff[(1, ta)]
        qt = qts[comps[ci][3]]
        coef = np.zeros(64, dtype="i8")
        s = reader.read_huff(dc_tab)
        diff = extend(reader.read(s), s) if s else 0
        preds[ci] += diff
        coef[0] = preds[ci]
        k = 1
        while k < 64:
            sym = reader.read_huff(ac_tab)
            if sym == 0x00:
                break
            if sym == 0xF0:
                k += 16
                continue
            k += sym >> 4
            size = sym & 0xF
            if k > 63:
                raise ValueError("AC coefficient index out of range")
            coef[k] = extend(reader.read(size), size)
            k += 1
        block = np.zeros(64, dtype="f8")
        block[zz] = coef * qt[zz]
        pix = C.T @ block.reshape(8, 8) @ C
        planes[ci][by : by + 8, bx : bx + 8] = pix

    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                preds = [0] * len(comps)
            try:
                for ci, td, ta in scan:
                    _, ch, cv, _tq = comps[ci]
                    for byi in range(cv):
                        for bxi in range(ch):
                            decode_block(
                                ci, td, ta,
                                (my * cv + byi) * 8,
                                (mx * ch + bxi) * 8,
                            )
            except _JpegRestart:
                # tolerated only exactly at a restart boundary
                raise ValueError("unexpected restart marker mid-MCU")
            mcu_count += 1

    out_planes = []
    for ci, (cid, ch, cv, _tq) in enumerate(comps):
        p = planes[ci]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out_planes.append(p[:height, :width] + 128.0)
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype("u1")[
            :, :, None
        ]
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype("u1")


# ---------------------------------------------------------------------------
# REAL progressive JPEG codec (spectral selection + successive approximation)
# ---------------------------------------------------------------------------
# Extends the baseline codec to SOF2 progressive streams — a large share
# of real crawl JPEGs. Both progressive dimensions of T.81 Annex G are
# implemented: spectral selection (AC coefficients split across scans by
# zigzag band) and successive approximation (coefficients delivered
# high-order-bits-first across first/refinement scans, with EOB-run
# coding and buffered correction bits). The encoder emits the standard
# libjpeg-style scan script so its output exercises BOTH modes, giving
# the decoder a closed-form round-trip oracle: a progressive stream
# reconstructs the exact same quantized coefficients as the baseline
# stream of the same image, so decode(progressive) == decode(baseline)
# bit-for-bit.

# Fixed Huffman table for progressive AC scans: all 176 symbols
# (r<<4)|s for r 0..15, s 0..10 — covering every EOBn (s=0, r<15), ZRL
# (0xF0) and run/size code a progressive AC scan can emit — assigned
# 9-bit canonical codes (176 < 2^9, all-ones code unused as T.81
# requires). Annex K's sequential AC tables lack the EOBn symbols, so
# progressive scans need their own table; a fixed table trades a few %
# of compression for a deterministic single-pass encoder.
JPEG_HUFF_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(11)],
)

# libjpeg's standard progressive scan script (jcparam.c): tuples of
# (component indices, Ss, Se, Ah, Al). DC first at Al=1, luma AC split
# 1-5 / 6-63 at Al=2, then successive-approximation refinements down to
# Al=0. Single-component variant for greyscale.
_JPEG_PROG_SCRIPT_COLOR = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((1,), 1, 63, 0, 1),
    ((2,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]
_JPEG_PROG_SCRIPT_GREY = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
]


class _ProgAcWriter:
    """Entropy state for one progressive AC scan: EOB-run accumulation
    plus the successive-approximation correction-bit buffer (T.81
    G.1.2.3 / figure G.7 semantics: correction bits buffered during an
    EOB run are emitted immediately after the symbol that ends it)."""

    def __init__(self, wr: "_JpegBitWriter", act: dict):
        self.wr = wr
        self.act = act
        self.eobrun = 0
        self.bebuf: list[int] = []  # correction bits riding the EOB run

    def emit_symbol(self, sym: int) -> None:
        code, ln = self.act[sym]
        self.wr.put(code, ln)

    def emit_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.emit_symbol(nbits << 4)
            if nbits:
                self.wr.put(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
        for bit in self.bebuf:
            self.wr.put(bit, 1)
        self.bebuf = []

    def end_block_eob(self, brbuf: list[int]) -> None:
        self.eobrun += 1
        self.bebuf.extend(brbuf)
        # force-flush before the EOBn value or the bit buffer can
        # overflow (T.81 caps EOBn extension at 14 bits)
        if self.eobrun == 0x7FFF or len(self.bebuf) > 930:
            self.emit_eobrun()


def _encode_ac_first(st: _ProgAcWriter, q, ss: int, se: int, al: int) -> None:
    """One block of an Ah=0 progressive AC scan (T.81 G.1.2.2): run/size
    coding of the point-transformed band, zero tails folded into the
    scan-wide EOB run. ``q`` is the block's 64 coefficients in natural
    order, indexed via zigzag."""
    r = 0
    for k in range(ss, se + 1):
        v = int(q[JPEG_ZIGZAG[k]])
        t = abs(v) >> al  # AC point transform: magnitude shift
        if t == 0:
            r += 1
            continue
        if st.eobrun > 0:
            st.emit_eobrun()
        while r > 15:
            st.emit_symbol(0xF0)
            r -= 16
        s = t.bit_length()
        st.emit_symbol((r << 4) | s)
        st.wr.put(t if v >= 0 else (t ^ ((1 << s) - 1)), s)
        r = 0
    if r > 0:
        st.end_block_eob([])


def _encode_ac_refine(st: _ProgAcWriter, q, ss: int, se: int, al: int) -> None:
    """One block of an Ah>0 progressive AC refinement scan (T.81
    G.1.2.3): newly-nonzero coefficients get run/size-1 codes + a sign
    bit; previously-nonzero ones contribute one buffered correction bit
    each, emitted after the symbol they ride behind."""
    absval = [abs(int(q[JPEG_ZIGZAG[k]])) >> al for k in range(ss, se + 1)]
    eob = ss - 1  # index of the LAST newly-nonzero coefficient
    for i, t in enumerate(absval):
        if t == 1:
            eob = ss + i
    r = 0
    brbuf: list[int] = []
    for k in range(ss, se + 1):
        t = absval[k - ss]
        if t == 0:
            r += 1
            continue
        # ZRLs that cannot fold into the EOB run (still codes to come)
        while r > 15 and k <= eob:
            st.emit_eobrun()
            st.emit_symbol(0xF0)
            r -= 16
            for bit in brbuf:
                st.wr.put(bit, 1)
            brbuf = []
        if t > 1:
            # nonzero history: just the next magnitude bit, buffered
            brbuf.append(t & 1)
            continue
        st.emit_eobrun()
        st.emit_symbol((r << 4) | 1)
        st.wr.put(1 if int(q[JPEG_ZIGZAG[k]]) >= 0 else 0, 1)
        for bit in brbuf:
            st.wr.put(bit, 1)
        brbuf = []
        r = 0
    if r > 0 or brbuf:
        st.end_block_eob(brbuf)


def encode_jpeg_progressive(
    img, quality: int = 85, subsample: bool = False
) -> bytes:
    """Encode a uint8 array (H x W grey or H x W x 3 RGB) as a REAL
    progressive JPEG (SOF2): same JFIF/YCbCr/quantization front end as
    :func:`encode_jpeg_baseline`, entropy-coded with the standard
    libjpeg progressive scan script — interleaved DC first scan at
    Al=1, spectral-selection AC scans, then successive-approximation
    refinement scans down to Al=0. The quantized coefficients are
    IDENTICAL to the baseline encoding at the same quality, so
    ``decode_jpeg(progressive) == decode_jpeg(baseline)`` exactly —
    the closed-form round-trip oracle for the progressive decoder."""
    import struct

    import numpy as np

    arr = np.asarray(img, dtype="u1")
    grey = arr.ndim == 2
    if not grey and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("expected grey (HxW) or RGB (HxWx3) uint8 array")
    h, w = arr.shape[:2]
    f = arr.astype("f8")
    if grey:
        planes = [f]
    else:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b,
        ]
    qts = [_jpeg_scaled_qt(JPEG_QT_LUMA, quality)]
    if not grey:
        qts.append(_jpeg_scaled_qt(JPEG_QT_CHROMA, quality))
    if subsample and not grey:
        samp = [(2, 2), (1, 1), (1, 1)]
        cb, cr = planes[1], planes[2]
        ch2, cw2 = -(-h // 2), -(-w // 2)
        cbp = np.pad(cb, ((0, 2 * ch2 - h), (0, 2 * cw2 - w)), mode="edge")
        crp = np.pad(cr, ((0, 2 * ch2 - h), (0, 2 * cw2 - w)), mode="edge")
        planes = [
            planes[0],
            cbp.reshape(ch2, 2, cw2, 2).mean(axis=(1, 3)),
            crp.reshape(ch2, 2, cw2, 2).mean(axis=(1, 3)),
        ]
    else:
        samp = [(1, 1)] * len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    C = _jpeg_dct_matrix()

    # quantize EVERY block up front (batched matmul DCT) — progressive
    # scans revisit blocks, so per-scan recompute would be quadratic
    qcomps = []  # per comp: (nby_pad, nbx_pad, 64) int64, natural order
    nat_blocks = []  # per comp: (nby, nbx) block dims WITHOUT MCU padding
    for ci, (p, (si, sv)) in enumerate(zip(planes, samp)):
        tw, th = mcus_x * 8 * si, mcus_y * 8 * sv
        pp = (
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
            - 128.0
        )
        nby, nbx = th // 8, tw // 8
        blocks = pp.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        coef = np.matmul(np.matmul(C, blocks), C.T)
        qt = qts[min(ci, len(qts) - 1)].reshape(8, 8).astype("f8")
        q = np.floor(coef / qt + 0.5).astype("i8").reshape(nby, nbx, 64)
        qcomps.append(q)
        cw = -(-w * si // hmax)
        chh = -(-h * sv // vmax)
        nat_blocks.append((-(-chh // 8), -(-cw // 8)))

    dc_tabs = [_huff_encode_table(*JPEG_HUFF_DC_LUMA)]
    if not grey:
        dc_tabs.append(_huff_encode_table(*JPEG_HUFF_DC_CHROMA))
    ac_prog = _huff_encode_table(*JPEG_HUFF_AC_PROG)

    script = _JPEG_PROG_SCRIPT_GREY if grey else _JPEG_PROG_SCRIPT_COLOR
    scans = []  # (comp_ids, Ss, Se, Ah, Al, entropy bytes)
    for comp_ids, ss, se, ah, al in script:
        wr = _JpegBitWriter()
        if ss == 0:  # DC scan (interleaved over comp_ids, MCU order)
            if ah == 0:
                preds = {ci: 0 for ci in comp_ids}
            if len(comp_ids) == 1:
                # non-interleaved single-component scan: natural order
                ci = comp_ids[0]
                nby, nbx = nat_blocks[ci]
                walk = [(ci, by, bx) for by in range(nby) for bx in range(nbx)]
            else:
                walk = [
                    (ci, my * samp[ci][1] + byi, mx * samp[ci][0] + bxi)
                    for my in range(mcus_y)
                    for mx in range(mcus_x)
                    for ci in comp_ids
                    for byi in range(samp[ci][1])
                    for bxi in range(samp[ci][0])
                ]
            for ci, by, bx in walk:
                dc = int(qcomps[ci][by, bx, 0])
                if ah == 0:  # first pass: arithmetic-shift point transform
                    v = dc >> al
                    diff = v - preds[ci]
                    preds[ci] = v
                    s = abs(diff).bit_length()
                    code, ln = dc_tabs[min(ci, len(dc_tabs) - 1)][s]
                    wr.put(code, ln)
                    if s:
                        wr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
                else:  # refinement: one raw bit per block
                    wr.put((dc >> al) & 1, 1)
        else:  # AC scan: always single component, natural block order
            ci = comp_ids[0]
            st = _ProgAcWriter(wr, ac_prog)
            nby, nbx = nat_blocks[ci]
            enc = _encode_ac_first if ah == 0 else _encode_ac_refine
            for by in range(nby):
                for bx in range(nbx):
                    enc(st, qcomps[ci][by, bx], ss, se, al)
            st.emit_eobrun()
        scans.append((comp_ids, ss, se, ah, al, wr.flush()))

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = b"\xff\xd8"
    out += seg(0xFFE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    for tid, qt in enumerate(qts):
        ztab = bytes(int(qt[JPEG_ZIGZAG[i]]) for i in range(64))
        out += seg(0xFFDB, bytes([tid]) + ztab)
    ncomp = 1 if grey else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hv = (samp[ci][0] << 4) | samp[ci][1]
        sof += bytes([ci + 1, hv, min(ci, len(qts) - 1)])
    out += seg(0xFFC2, sof)
    specs = [(0x00, JPEG_HUFF_DC_LUMA), (0x10, JPEG_HUFF_AC_PROG)]
    if not grey:
        specs.append((0x01, JPEG_HUFF_DC_CHROMA))
    for tc_th, (bits, vals) in specs:
        out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    for comp_ids, ss, se, ah, al, entropy in scans:
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            td = min(ci, 1)  # DC table 0 luma / 1 chroma
            ta = 0  # one shared progressive AC table
            sos += bytes([ci + 1, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xFFDA, sos) + entropy
    return out + b"\xff\xd9"


def _decode_ac_first(reader, coef, huff_ac, ss, se, al, eobrun):
    """One block of an Ah=0 progressive AC scan (T.81 G.2 / libjpeg
    decode_mcu_AC_first shape). Returns the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = reader.read_huff(huff_ac)
        r, s = sym >> 4, sym & 0xF
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC coefficient index out of range")
        v = reader.read(s)
        v = v - (1 << s) + 1 if v < (1 << (s - 1)) else v
        coef[JPEG_ZIGZAG[k]] = v << al
        k += 1
    return eobrun


def _decode_ac_refine(reader, coef, huff_ac, ss, se, al, eobrun):
    """One block of an Ah>0 progressive AC refinement scan (T.81 G.2 /
    libjpeg decode_mcu_AC_refine shape): place newly-nonzero
    coefficients, apply one correction bit to each already-nonzero one.
    Returns the updated EOB run."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(pos: int) -> None:
        if reader.read(1) and not (int(coef[pos]) & p1):
            coef[pos] += p1 if coef[pos] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            sym = reader.read_huff(huff_ac)
            r, s = sym >> 4, sym & 0xF
            newval = 0
            if s:
                if s != 1:
                    raise ValueError(
                        "refinement scan symbol with size > 1"
                    )
                newval = p1 if reader.read(1) else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read(r)
                break
            # advance over r still-zero coefs, correcting nonzero ones
            while k <= se:
                pos = JPEG_ZIGZAG[k]
                if coef[pos] != 0:
                    correct(pos)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("refinement ran past the band end")
                coef[JPEG_ZIGZAG[k]] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            pos = JPEG_ZIGZAG[k]
            if coef[pos] != 0:
                correct(pos)
            k += 1
        eobrun -= 1
    return eobrun


def decode_jpeg_progressive(payload: bytes):
    """REAL progressive JPEG decode (SOF2) — stdlib + numpy: multi-scan
    parse accumulating quantized coefficients per block across DC/AC
    first and refinement scans (spectral selection AND successive
    approximation, with EOB-run and correction-bit handling per T.81
    Annex G), then one dequantize + IDCT + upsample + YCbCr->RGB pass.
    Restart markers reset DC predictors and the EOB run. Returns an
    (H x W x channels) uint8 array like :func:`decode_jpeg_baseline`."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("no SOI marker: not a JPEG payload")
    qts: dict[int, object] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
    height = width = 0
    restart_interval = 0
    frame_seen = False
    coefs: list = []  # per comp: (nby_pad, nbx_pad, 64) int64
    nat_blocks: list[tuple[int, int]] = []
    samp: list[tuple[int, int]] = []
    mcus_x = mcus_y = hmax = vmax = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("desynchronized JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1  # spec-permitted fill byte
            continue
        if marker == 0xD9:
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        data = payload[pos + 4 : pos + 2 + length]
        if marker in (0xC0, 0xC1):
            raise ValueError(
                "sequential JPEG frame: use decode_jpeg_baseline"
                " (or the decode_jpeg dispatcher)"
            )
        if marker in (
            0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
        ):
            raise ValueError("non-DCT/arithmetic JPEG frame not supported")
        if marker == 0xC2:
            precision, height, width, ncomp = struct.unpack(">BHHB", data[:6])
            if precision != 8:
                raise ValueError("only 8-bit progressive JPEG supported")
            for i in range(ncomp):
                cid, hv, tq = data[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = -(-width // (8 * hmax))
            mcus_y = -(-height // (8 * vmax))
            for _, ch, cv, _tq in comps:
                samp.append((ch, cv))
                coefs.append(
                    np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype="i8")
                )
                cw = -(-width * ch // hmax)
                chh = -(-height * cv // vmax)
                nat_blocks.append((-(-chh // 8), -(-cw // 8)))
            frame_seen = True
        elif marker == 0xDB:
            p = 0
            while p < len(data):
                pq_tq = data[p]
                if pq_tq >> 4:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.zeros(64, dtype="i8")
                for i in range(64):
                    tbl[JPEG_ZIGZAG[i]] = data[p + 1 + i]
                qts[pq_tq & 0xF] = tbl
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(data):
                tc_th = data[p]
                bits = list(data[p + 1 : p + 17])
                n = sum(bits)
                vals = list(data[p + 17 : p + 17 + n])
                huff[(tc_th >> 4, tc_th & 0xF)] = _huff_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:
            if not frame_seen:
                raise ValueError("SOS before SOF2 frame header")
            ns = data[0]
            scan = []  # (comp index, td, ta)
            for i in range(ns):
                cs, tda = data[1 + 2 * i : 3 + 2 * i]
                ci = next(j for j, c in enumerate(comps) if c[0] == cs)
                scan.append((ci, tda >> 4, tda & 0xF))
            ss, se, ahal = data[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            reader = _JpegBitReader(payload, pos + 2 + length)
            pos = _decode_progressive_scan(
                reader, payload, coefs, comps, samp, nat_blocks,
                mcus_x, mcus_y, huff, scan, ss, se, ah, al,
                restart_interval,
            )
            continue
        pos += 2 + length
    if not frame_seen:
        raise ValueError("JPEG missing SOF2 frame header")

    C = _jpeg_dct_matrix()
    out_planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        qt = qts[tq]
        q = coefs[ci]  # (nby, nbx, 64) natural order
        deq = (q * qt[None, None, :]).astype("f8").reshape(
            q.shape[0], q.shape[1], 8, 8
        )
        pix = np.matmul(np.matmul(C.T, deq), C)
        plane = pix.transpose(0, 2, 1, 3).reshape(
            q.shape[0] * 8, q.shape[1] * 8
        )
        if ch != hmax or cv != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1
            )
        out_planes.append(plane[:height, :width] + 128.0)
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype("u1")[
            :, :, None
        ]
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype("u1")


def _decode_progressive_scan(
    reader, payload, coefs, comps, samp, nat_blocks,
    mcus_x, mcus_y, huff, scan, ss, se, ah, al, restart_interval,
):
    """Decode one progressive scan's entropy data and return the byte
    offset of the next marker segment. DC scans may be interleaved
    (MCU walk); AC scans are single-component over the component's
    NATURAL block grid (no MCU padding — T.81 A.2.2)."""
    preds = {ci: 0 for ci, _, _ in scan}
    eobrun = 0
    if ss == 0 and len(scan) > 1:
        units = [
            (ci, my * samp[ci][1] + byi, mx * samp[ci][0] + bxi, td)
            for my in range(mcus_y)
            for mx in range(mcus_x)
            for ci, td, _ta in scan
            for byi in range(samp[ci][1])
            for bxi in range(samp[ci][0])
        ]
        # restart boundaries count MCUs, not blocks
        blocks_per_ri = restart_interval * sum(
            samp[ci][0] * samp[ci][1] for ci, _, _ in scan
        )
    else:
        ci, td, ta = scan[0]
        nby, nbx = nat_blocks[ci]
        units = [
            (ci, by, bx, td)
            for by in range(nby)
            for bx in range(nbx)
        ]
        blocks_per_ri = restart_interval
    done = 0
    for ci, by, bx, td in units:
        if blocks_per_ri and done and done % blocks_per_ri == 0:
            reader.restart()
            preds = {c: 0 for c in preds}
            eobrun = 0
        coef = coefs[ci][by, bx]
        try:
            if ss == 0:
                dc = int(coef[0])
                if ah == 0:
                    s = reader.read_huff(huff[(0, td)])
                    if s:
                        v = reader.read(s)
                        v = v - (1 << s) + 1 if v < (1 << (s - 1)) else v
                    else:
                        v = 0
                    preds[ci] += v
                    coef[0] = preds[ci] << al
                else:
                    if reader.read(1):
                        coef[0] = dc | (1 << al)
            else:
                ta = scan[0][2]
                dec = _decode_ac_first if ah == 0 else _decode_ac_refine
                eobrun = dec(reader, coef, huff[(1, ta)], ss, se, al, eobrun)
        except _JpegRestart:
            # tolerated only exactly at a restart boundary
            raise ValueError("unexpected restart marker mid-block") from None
        done += 1
    # find the next marker after this scan's entropy bytes
    p = reader.pos
    n = len(payload)
    while p + 1 < n:
        if payload[p] == 0xFF and payload[p + 1] != 0x00:
            if 0xD0 <= payload[p + 1] <= 0xD7:
                p += 2  # trailing restart marker
                continue
            return p
        p += 1
    return n


def decode_jpeg(payload: bytes):
    """Decode an 8-bit DCT JPEG, dispatching on the stream's own SOFn:
    baseline/extended sequential (SOF0/SOF1) through
    :func:`decode_jpeg_baseline`, progressive (SOF2) through
    :func:`decode_jpeg_progressive`. Returns (H x W x channels) uint8."""
    meta = parse_jpeg_metadata(payload)
    if meta["progressive"]:
        return decode_jpeg_progressive(payload)
    return decode_jpeg_baseline(payload)


# ---------------------------------------------------------------------------
# REAL video path: MJPEG-in-MP4 frame decode
# ---------------------------------------------------------------------------
# The ISO-BMFF box walk (parse_mp4_metadata) composed with the in-repo
# JPEG codec gives one container format REAL pixel decode with no
# external libraries: a sample-table walk (stsd/stts/stsc/stsz/stco)
# locates each frame's JPEG bytes inside mdat, and decode_jpeg turns
# them into pixels. H.26x tracks still raise loudly — inter-frame
# codecs need ffmpeg-class machinery.


def encode_mp4_mjpeg(
    frames, fps: int = 1, quality: int = 85, pre_encoded=None
) -> bytes:
    """Encode a list of uint8 arrays (H x W grey or H x W x 3 RGB) as a
    REAL MJPEG-in-MP4: each frame a baseline JPEG sample in ``mdat``,
    with a full ``moov`` sample table (stsd 'jpeg' visual sample entry,
    stts/stsc/stsz/stco) so any MP4-aware reader can locate and decode
    the frames. The test-side inverse of
    :func:`decode_mp4_mjpeg_frames`. ``pre_encoded`` supplies
    already-encoded JPEG bytes per frame (same length as ``frames``) so
    generators that reuse frames across assets pay each encode once."""
    import struct

    import numpy as np

    if not frames:
        raise ValueError("need at least one frame")
    jpegs = (
        list(pre_encoded)
        if pre_encoded is not None
        else [encode_jpeg_baseline(f, quality=quality) for f in frames]
    )
    h, w = np.asarray(frames[0]).shape[:2]
    n = len(jpegs)
    timescale = 1000
    delta = timescale // fps

    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    def full(tag: bytes, payload: bytes, version: int = 0) -> bytes:
        return box(tag, struct.pack(">B3x", version) + payload)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mdat = box(b"mdat", b"".join(jpegs))
    first_sample_off = len(ftyp) + 8  # mdat body starts after its header

    # stsd 'jpeg' VisualSampleEntry (86 bytes: ISO 14496-12 §12.1.3)
    entry = (
        struct.pack(">I4s", 86, b"jpeg")
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    stsd = full(b"stsd", struct.pack(">I", 1) + entry)
    stts = full(b"stts", struct.pack(">III", 1, n, delta))
    stsc = full(b"stsc", struct.pack(">IIII", 1, 1, n, 1))
    stsz = full(
        b"stsz",
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(j)) for j in jpegs),
    )
    stco = full(b"stco", struct.pack(">II", 1, first_sample_off))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = box(b"vmhd", struct.pack(">B3BHHHH", 0, 0, 0, 1, 0, 0, 0, 0))
    # one self-contained 'url ' data reference (flags = 1)
    url_box = struct.pack(">I", 12) + b"url " + struct.pack(">B3B", 0, 0, 0, 1)
    dref = full(b"dref", struct.pack(">I", 1) + url_box)
    dinf = box(b"dinf", dref)
    minf = box(b"minf", vmhd + dinf + stbl)
    mdhd = full(
        b"mdhd",
        struct.pack(">IIII", 0, 0, timescale, n * delta)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = full(
        b"hdlr",
        struct.pack(">I4s", 0, b"vide") + b"\x00" * 12 + b"mjpeg\x00",
    )
    mdia = box(b"mdia", mdhd + hdlr + minf)
    tkhd = box(
        b"tkhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", n * delta)
        + b"\x00" * 52
        + struct.pack(">II", w << 16, h << 16),
    )
    trak = box(b"trak", tkhd + mdia)
    mvhd = box(
        b"mvhd",
        struct.pack(">B3x", 0)
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, n * delta)
        + b"\x00" * 80,
    )
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def parse_mp4_samples(payload: bytes) -> dict:
    """REAL MP4 sample-table walk for the first video track: returns
    ``{codec, timescale, offsets, sizes, times}`` where ``offsets`` /
    ``sizes`` locate each sample's bytes in the file and ``times`` are
    decode timestamps in media-timescale units. Implements the general
    stsc chunk mapping (first_chunk runs) and stts run-length deltas —
    the full locate-a-frame path of ISO 14496-12 with no codec work."""
    import struct

    for tag, body, stop in _mp4_walk(payload, 0, len(payload)):
        if tag != b"moov":
            continue
        for t2, b2, s2 in _mp4_walk(payload, body, stop):
            if t2 != b"trak":
                continue
            track = _mp4_video_track_samples(payload, b2, s2)
            if track is not None:
                return track
    raise ValueError("no video track with a sample table found")


def _mp4_video_track_samples(payload: bytes, start: int, end: int):
    import struct

    stbl_range = None
    timescale = None
    is_video = False
    for t3, b3, s3 in _mp4_walk(payload, start, end):
        if t3 != b"mdia":
            continue
        for t4, b4, s4 in _mp4_walk(payload, b3, s3):
            if t4 == b"mdhd":
                version = payload[b4]
                if version == 1:
                    (timescale,) = struct.unpack(
                        ">I", payload[b4 + 20 : b4 + 24]
                    )
                else:
                    (timescale,) = struct.unpack(
                        ">I", payload[b4 + 12 : b4 + 16]
                    )
            elif t4 == b"hdlr":
                is_video = payload[b4 + 8 : b4 + 12] == b"vide"
            elif t4 == b"minf":
                for t5, b5, s5 in _mp4_walk(payload, b4, s4):
                    if t5 == b"stbl":
                        stbl_range = (b5, s5)
    if not is_video or stbl_range is None:
        return None
    codec = None
    stts_raw = stsc_raw = stco = None
    sizes: list[int] = []
    for t, b, s in _mp4_walk(payload, *stbl_range):
        if t == b"stsd":
            (count,) = struct.unpack(">I", payload[b + 4 : b + 8])
            if count >= 1:
                codec = payload[b + 12 : b + 16].decode("latin-1").strip()
        elif t == b"stts":
            (ne,) = struct.unpack(">I", payload[b + 4 : b + 8])
            stts_raw = [
                struct.unpack(">II", payload[b + 8 + 8 * i : b + 16 + 8 * i])
                for i in range(ne)
            ]
        elif t == b"stsc":
            (ne,) = struct.unpack(">I", payload[b + 4 : b + 8])
            stsc_raw = [
                struct.unpack(
                    ">III", payload[b + 8 + 12 * i : b + 20 + 12 * i]
                )
                for i in range(ne)
            ]
        elif t == b"stsz":
            uniform, n = struct.unpack(">II", payload[b + 4 : b + 12])
            sizes = (
                [uniform] * n
                if uniform
                else [
                    struct.unpack(
                        ">I", payload[b + 12 + 4 * i : b + 16 + 4 * i]
                    )[0]
                    for i in range(n)
                ]
            )
        elif t in (b"stco", b"co64"):
            (ne,) = struct.unpack(">I", payload[b + 4 : b + 8])
            wd, fmt = (8, ">Q") if t == b"co64" else (4, ">I")
            stco = [
                struct.unpack(fmt, payload[b + 8 + wd * i : b + 8 + wd * (i + 1)])[0]
                for i in range(ne)
            ]
    if not (sizes and stco and stsc_raw and stts_raw):
        return None
    # expand stsc first_chunk runs -> samples per chunk, then walk chunks
    offsets: list[int] = []
    si = 0
    for ei, (first, spc, _desc) in enumerate(stsc_raw):
        last = (
            stsc_raw[ei + 1][0] - 1 if ei + 1 < len(stsc_raw) else len(stco)
        )
        for chunk in range(first, last + 1):
            off = stco[chunk - 1]
            for _ in range(spc):
                if si >= len(sizes):
                    break
                offsets.append(off)
                off += sizes[si]
                si += 1
    times: list[int] = []
    t = 0
    for count, delta in stts_raw:
        for _ in range(count):
            times.append(t)
            t += delta
    n = min(len(offsets), len(sizes), len(times))
    return {
        "codec": codec,
        "timescale": timescale or 1000,
        "offsets": offsets[:n],
        "sizes": sizes[:n],
        "times": times[:n],
    }


def decode_mp4_mjpeg_frames(payload: bytes):
    """REAL video pixel decode for MJPEG-in-MP4: walk the sample table,
    slice each sample's JPEG bytes out of ``mdat`` and decode through
    the in-repo JPEG codec. Yields ``(frame_idx, time_ms, pixels)``
    with pixels an (H x W x channels) uint8 array. Raises loudly for
    non-MJPEG tracks (H.26x needs ffmpeg-class machinery)."""
    info = parse_mp4_samples(payload)
    if info["codec"] not in ("jpeg", "mjpa", "mjpg", "MJPG"):
        raise NotImplementedError(
            f"real decode for codec {info['codec']!r} needs native codec"
            " libraries (ffmpeg); in-repo video decode covers MJPEG"
            " ('jpeg' sample entries) — for H.26x-class codecs plug a"
            " native decoder into register_video_decoder and use"
            " decode_video_frames / video_frame_stats"
        )
    ts = info["timescale"]
    for i, (off, sz, t) in enumerate(
        zip(info["offsets"], info["sizes"], info["times"])
    ):
        yield i, int(round(1000.0 * t / ts)), decode_jpeg(
            payload[off : off + sz]
        )


def _jpeg_frame_stats_cached(jpeg_bytes: bytes):
    """Decode one JPEG sample and summarize: (h, w, (mr, mg, mb), std,
    mn, mx). lru-cached by the exact sample bytes — MJPEG tracks (and
    the synthetic constant-frame corpora especially) repeat identical
    samples, so each distinct frame pays the pure-Python Huffman+IDCT
    once per worker; bounded cache, arbitrary corpora stay safe."""
    import numpy as np

    img = decode_jpeg(jpeg_bytes).astype("f8")
    rgb = np.repeat(img, 3, axis=2) if img.shape[2] == 1 else img[:, :, :3]
    flat = rgb.reshape(-1, 3)
    means = flat.mean(axis=0)
    return (
        img.shape[0],
        img.shape[1],
        (float(means[0]), float(means[1]), float(means[2])),
        float(flat.std()),
        float(flat.min()),
        float(flat.max()),
    )


import functools  # noqa: E402  (decode caches below)

_jpeg_frame_stats_cached = functools.lru_cache(maxsize=4096)(
    _jpeg_frame_stats_cached
)


def _jpeg_stats(jpeg_bytes: bytes):
    return _jpeg_frame_stats_cached(bytes(jpeg_bytes))


def _mjpeg_frame_features(payload: bytes, frame_ms: int) -> list[float]:
    """Feature vector for the sampled frame at ``frame_ms`` of an
    MJPEG-in-MP4 payload: decode ONLY the latest frame whose timestamp
    is <= frame_ms (one JPEG, not the whole track) and summarize it as
    a FEATURE_DIM vector of normalized pixel stats: [w/4096, h/4096,
    mean_r, mean_g, mean_b, luma, std, min, max, 0...] (channels
    /255)."""
    import numpy as np

    info = parse_mp4_samples(payload)
    if info["codec"] not in ("jpeg", "mjpa", "mjpg", "MJPG"):
        return decode_unavailable(payload, "video")
    ts = info["timescale"]
    pick = 0
    for i, t in enumerate(info["times"]):
        if 1000.0 * t / ts <= frame_ms:
            pick = i
    off, sz = info["offsets"][pick], info["sizes"][pick]
    h, w, means, std, mn, mx = _jpeg_stats(payload[off : off + sz])
    luma = 0.299 * means[0] + 0.587 * means[1] + 0.114 * means[2]
    feats = [
        w / 4096.0,
        h / 4096.0,
        means[0] / 255.0,
        means[1] / 255.0,
        means[2] / 255.0,
        luma / 255.0,
        std / 255.0,
        mn / 255.0,
        mx / 255.0,
    ]
    return (feats + [0.0] * FEATURE_DIM)[:FEATURE_DIM]


MJPEG_FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ms", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("luma_mean", T.DoubleType()),
    ]
)


def video_mjpeg_frame_stats(media: DataFrame) -> DataFrame:
    """Real per-frame pixel stats over MJPEG-in-MP4 payload columns: one
    output row per stored frame, decoded through the sample-table walk +
    JPEG codec inside an Arrow-batched ``mapInPandas``. The video twin
    of :func:`image_jpeg_stats`."""

    def batches(parts: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in parts:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for idx, ms, img in decode_mp4_mjpeg_frames(bytes(payload)):
                    f = img.astype("f8")
                    rgb = (
                        np.repeat(f, 3, axis=2)
                        if f.shape[2] == 1
                        else f[:, :, :3]
                    )
                    means = rgb.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        {
                            "asset_id": aid,
                            "frame_idx": idx,
                            "frame_ms": ms,
                            "width": img.shape[1],
                            "height": img.shape[0],
                            "mean_r": float(means[0]),
                            "mean_g": float(means[1]),
                            "mean_b": float(means[2]),
                            "luma_mean": float(
                                0.299 * means[0]
                                + 0.587 * means[1]
                                + 0.114 * means[2]
                            ),
                        }
                    )
            yield pd.DataFrame(rows)

    return _fan_out(media.select("asset_id", "payload")).mapInPandas(
        batches, MJPEG_FRAME_STATS_SCHEMA
    )


# ---------------------------------------------------------------------------
# Pluggable external video decoder seam (round 8, verdict item 7).
#
# POSTURE (the SURVEY §2.4-style declaration): H.26x/HEVC/AV1 PIXEL
# decode is permanently out of scope for the in-repo codecs — entropy
# decode + inter-frame motion compensation is ffmpeg-class machinery,
# and a from-scratch reimplementation would be slow, unauditable, and
# pointless next to battle-tested native decoders. What IS in scope,
# and real: every pre-decode screening field (container walk, avcC/SPS
# parse, sample census — y65/y69), MJPEG pixel decode, and THIS seam,
# through which a deployment plugs pyav/ffmpeg and every frame-level
# operator lights up for H.26x unchanged.
#
# Decoder contract: ``fn(payload: bytes, info: dict) -> iterable of
# (frame_idx: int, time_ms: int, pixels: HxWxC uint8 ndarray)`` where
# ``info`` is :func:`parse_mp4_samples` output (codec, timescale,
# offsets, sizes, times). The callable must be importable on executors
# (ship it with your package) — the standard Spark UDF dependency rule.
# ---------------------------------------------------------------------------

_EXTERNAL_VIDEO_DECODERS: dict[str, object] = {}


def register_video_decoder(codec: str, fn) -> None:
    """Register an external frame decoder for a sample-entry fourcc
    (e.g. ``'avc1'``, ``'hvc1'``). See the contract above; a pyav-backed
    implementation is ~10 lines over ``av.open(BytesIO(payload))``."""
    _EXTERNAL_VIDEO_DECODERS[codec] = fn


def unregister_video_decoder(codec: str) -> None:
    _EXTERNAL_VIDEO_DECODERS.pop(codec, None)


def decode_video_frames(payload: bytes, decoders: dict | None = None):
    """Codec-dispatched frame decode: MJPEG through the in-repo JPEG
    codec, anything else through a registered external decoder. Raises
    loudly — naming the seam — when no decoder covers the codec.
    ``decoders`` overrides the registry (operators snapshot it
    driver-side so executors don't consult their own empty copy)."""
    info = parse_mp4_samples(payload)
    codec = info["codec"]
    if codec in ("jpeg", "mjpa", "mjpg", "MJPG"):
        yield from decode_mp4_mjpeg_frames(payload)
        return
    table = _EXTERNAL_VIDEO_DECODERS if decoders is None else decoders
    dec = table.get(codec)
    if dec is None:
        raise NotImplementedError(
            f"no decoder for video codec {codec!r}: in-repo pixel decode"
            " covers MJPEG; H.26x-class codecs need a native decoder —"
            " plug one in with"
            f" register_video_decoder({codec!r}, fn) (contract: see"
            " multimodal.py 'Pluggable external video decoder seam')"
        )
    yield from dec(payload, info)


def video_frame_stats(media: DataFrame, decoders: dict | None = None) -> DataFrame:
    """Per-frame pixel stats for ANY decodable video payload: MJPEG via
    the in-repo codec, other codecs via the external-decoder seam. The
    registry is snapshotted on the DRIVER at plan-build time and closed
    over, so registration in the driver process is sufficient in local
    mode (on a cluster the decoder fn must be importable on executors).
    Schema/semantics identical to :func:`video_mjpeg_frame_stats`."""
    snapshot = dict(_EXTERNAL_VIDEO_DECODERS) if decoders is None else dict(decoders)

    def batches(parts: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in parts:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for idx, ms, img in decode_video_frames(
                    bytes(payload), decoders=snapshot
                ):
                    f = np.asarray(img).astype("f8")
                    rgb = (
                        np.repeat(f, 3, axis=2)
                        if f.shape[2] == 1
                        else f[:, :, :3]
                    )
                    means = rgb.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        {
                            "asset_id": aid,
                            "frame_idx": idx,
                            "frame_ms": ms,
                            "width": int(f.shape[1]),
                            "height": int(f.shape[0]),
                            "mean_r": float(means[0]),
                            "mean_g": float(means[1]),
                            "mean_b": float(means[2]),
                            "luma_mean": float(
                                0.299 * means[0]
                                + 0.587 * means[1]
                                + 0.114 * means[2]
                            ),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MJPEG_FRAME_STATS_SCHEMA]
            )

    return _fan_out(media.select("asset_id", "payload")).mapInPandas(
        batches, MJPEG_FRAME_STATS_SCHEMA
    )


def image_jpeg_stats(media: DataFrame) -> DataFrame:
    """Real image stats over JPEG payload columns — baseline AND
    progressive streams (dispatch by SOFn) — same screens as
    :func:`image_png_stats`: dimensions, channel means, Rec.601 luma.
    Greyscale scans broadcast their single channel."""

    def batches(parts: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in parts:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                img = decode_jpeg(bytes(payload)).astype("f8")
                rgb = (
                    np.repeat(img, 3, axis=2)
                    if img.shape[2] == 1
                    else img[:, :, :3]
                )
                means = rgb.reshape(-1, 3).mean(axis=0)
                rows.append(
                    {
                        "asset_id": aid,
                        "width": img.shape[1],
                        "height": img.shape[0],
                        "mean_r": float(means[0]),
                        "mean_g": float(means[1]),
                        "mean_b": float(means[2]),
                        "luma_mean": float(
                            0.299 * means[0]
                            + 0.587 * means[1]
                            + 0.114 * means[2]
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return _fan_out(media.select("asset_id", "payload")).mapInPandas(
        batches, IMAGE_STATS_SCHEMA
    )


# --- m05: audio VAD segmentation over the real WAV codec -------------------

VAD_SAMPLE_RATE = 1000
VAD_N_BLOCKS = 20
VAD_BLOCK_SAMPLES = 50


def synthetic_wav_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic 16-bit PCM WAV payload per document: 20
    blocks of 50 samples at 1 kHz; block ``b`` is SILENT when
    ``(doc_id*7 + b) % 3 == 0``, otherwise a square wave of amplitude
    ``2000 + 500*((doc_id + b) % 4)`` (sign alternating per sample). A
    stand-in for real speech bytes whose voiced/silent layout an SQL
    oracle can replicate arithmetically — while the Spark side still
    round-trips REAL WAV bytes through :func:`encode_wav_pcm16` /
    :func:`decode_wav_pcm`, so the codec and the framing logic are
    exercised end-to-end (the m04 synthetic-PPM pattern)."""

    def batches(parts: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        t = np.arange(VAD_N_BLOCKS * VAD_BLOCK_SAMPLES)
        b = t // VAD_BLOCK_SAMPLES
        sign = np.where(t % 2 == 0, 1, -1)
        for pdf in parts:
            rows = []
            for aid in pdf["doc_id"]:
                d = int(aid)
                amp = np.where(
                    (d * 7 + b) % 3 == 0, 0, 2000 + 500 * ((d + b) % 4)
                )
                rows.append(
                    {
                        "asset_id": d,
                        "payload": encode_wav_pcm16(
                            (sign * amp).astype("<i2"), VAD_SAMPLE_RATE
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )
    return _fan_out(docs.select("doc_id")).mapInPandas(batches, schema)


VAD_SEGMENTS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_voiced", T.IntegerType()),
        T.StructField("n_segments", T.IntegerType()),
        T.StructField("longest_voiced_frames", T.IntegerType()),
        T.StructField("voiced_ratio", T.DoubleType()),
    ]
)


def audio_vad_segments(
    media: DataFrame,
    frame_samples: int = VAD_BLOCK_SAMPLES,
    rms_threshold: float = 1000.0,
) -> DataFrame:
    """Energy-based voice-activity segmentation over WAV payloads — the
    speech-curation screen (drop silent/clipped assets, measure speech
    density): frame-wise RMS over ``frame_samples``-sample frames (only
    FULL frames; a trailing partial frame is dropped), frames above
    ``rms_threshold`` (int16 units) are voiced, and consecutive voiced
    frames form segments. Returns per asset: frame/voiced counts,
    segment count, longest voiced run, voiced ratio (exact-integer
    division rounded to 9 dp).

    Arrow-batched ``mapInPandas``; the only Python loop is over
    variable-length payload blobs, per-sample work is numpy. Multi-
    channel audio is averaged to mono before framing (the
    audio_wav_features convention)."""

    def batches(parts: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in parts:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                _, x = decode_wav_pcm(bytes(payload))
                mono = x.astype("f8").mean(axis=1)
                n_frames = len(mono) // frame_samples
                if n_frames == 0:
                    rows.append(
                        {
                            "asset_id": int(aid),
                            "n_frames": 0,
                            "n_voiced": 0,
                            "n_segments": 0,
                            "longest_voiced_frames": 0,
                            "voiced_ratio": None,
                        }
                    )
                    continue
                fr = mono[: n_frames * frame_samples].reshape(
                    n_frames, frame_samples
                )
                rms = np.sqrt((fr * fr).mean(axis=1))
                voiced = rms > rms_threshold
                # run-length over the voiced mask
                padded = np.concatenate(([False], voiced, [False]))
                starts = np.flatnonzero(~padded[:-1] & padded[1:])
                ends = np.flatnonzero(padded[:-1] & ~padded[1:])
                runs = ends - starts
                nv = int(voiced.sum())
                rows.append(
                    {
                        "asset_id": int(aid),
                        "n_frames": int(n_frames),
                        "n_voiced": nv,
                        "n_segments": int(len(runs)),
                        "longest_voiced_frames": int(runs.max())
                        if len(runs)
                        else 0,
                        "voiced_ratio": round(nv / n_frames, 9),
                    }
                )
            yield pd.DataFrame(rows)

    return _fan_out(media.select("asset_id", "payload")).mapInPandas(
        batches, VAD_SEGMENTS_SCHEMA
    )


# ---------------------------------------------------------------------------
# Real-decode media features (m01/m02/m03 gate path). Every payload built by
# synthetic_media_real_from_documents round-trips a REAL in-repo codec —
# PPM pixels, PCM WAV samples, MJPEG-in-MP4 frames through the baseline
# JPEG decoder — while the generating formulas stay closed-form so a SQL
# oracle can replicate the decoded stats arithmetically (the m04/y64
# pattern, reference intent: src/transform.py-level fidelity for media).
# MJPEG frames are CONSTANT grayscale: at quality >= 96 the luma DC quant
# step is 1, so the DCT round-trip is bit-exact (verified in tests), making
# real lossy-codec output oracle-predictable.
# ---------------------------------------------------------------------------

MJPEG_FRAME_W = 16
MJPEG_FRAME_H = 16
MJPEG_QUALITY = 97  # luma DC quant step 1 -> constant frames decode exactly


def _mjpeg_n_frames(doc_id: int) -> int:
    """Frame count of the synthetic MJPEG track for ``doc_id``: 1..4."""
    return 1 + doc_id % 4


def _mjpeg_frame_value(doc_id: int, frame_idx: int) -> int:
    """Constant gray value of synthetic frame ``frame_idx``: exact-integer
    formula an SQL oracle replicates (``(doc_id*13 + frame_idx*37) % 256``)."""
    return (doc_id * 13 + frame_idx * 37) % 256


def _pad_features(feats: list) -> list:
    return ([float(v) for v in feats] + [0.0] * FEATURE_DIM)[:FEATURE_DIM]


def _image_features_real(payload: bytes) -> list:
    """REAL image features from decoded PPM pixels: [w, h, channels,
    min/255 and max/255 per channel, channel-sum/255 per channel, 0-pad].
    All stats are exact-integer aggregates divided by the odd constant 255
    (odd denominator => a 6-dp half-way rounding boundary is unreachable,
    so the float32 CSV serialization matches any IEEE oracle engine)."""
    import numpy as np

    img = decode_ppm(payload).astype(np.int64)
    h, w, _ = img.shape
    mins = img.min(axis=(0, 1))
    maxs = img.max(axis=(0, 1))
    sums = img.sum(axis=(0, 1))
    return _pad_features(
        [w, h, 3.0]
        + [v / 255.0 for pair in zip(mins, maxs) for v in pair]
        + [s / 255.0 for s in sums]
    )


def _audio_features_real(payload: bytes) -> list:
    """REAL audio features from decoded PCM samples: [sample_rate,
    n_frames, n_channels, max/32767, min/32767, sum|x|/32767, n_zero,
    n_pos, n_neg, 0-pad]. 32767 is odd, same boundary-safety argument as
    :func:`_image_features_real`."""
    import numpy as np

    sr, x = decode_wav_pcm(payload)
    flat = x.astype(np.int64).reshape(-1)
    return _pad_features(
        [
            sr,
            x.shape[0],
            x.shape[1],
            int(flat.max()) / 32767.0,
            int(flat.min()) / 32767.0,
            int(np.abs(flat).sum()) / 32767.0,
            int((flat == 0).sum()),
            int((flat > 0).sum()),
            int((flat < 0).sum()),
        ]
    )


def _video_features_real(payload: bytes) -> list:
    """REAL video features: walk the MP4 sample table, decode EVERY frame
    through the in-repo JPEG codec, summarize as [n_frames, w, h,
    duration_ms, first_frame_mean/255, last_frame_mean/255,
    sum_of_frame_means/255, 0-pad]. For the synthetic constant-gray MJPEG
    tracks each frame mean is the exact encoded value (DC quant step 1)."""
    meta = parse_mp4_metadata(payload)
    info = parse_mp4_samples(payload)
    if info["codec"] not in ("jpeg", "mjpa", "mjpg", "MJPG"):
        return decode_unavailable(payload, "video")
    means = []
    w = h = 0
    for off, sz in zip(info["offsets"], info["sizes"]):
        h, w, (mr, mg, mb), _std, _mn, _mx = _jpeg_stats(
            payload[off : off + sz]
        )
        # grayscale mean == channel mean; RGB uses the channel average
        means.append((mr + mg + mb) / 3.0)
    return _pad_features(
        [
            len(means),
            w,
            h,
            meta["duration_ms"],
            means[0] / 255.0,
            means[-1] / 255.0,
            sum(means) / 255.0,
        ]
    )


def _decode_media_real(payload: bytes, media_type: str) -> list:
    """Dispatch a payload to the matching REAL codec by container magic;
    unknown containers raise loudly (no silent faking on the real path)."""
    p = bytes(payload)
    if p[:2] == b"P6":
        return _image_features_real(p)
    if p[:4] == b"RIFF":
        return _audio_features_real(p)
    if len(p) >= 12 and p[4:8] == b"ftyp":
        return _video_features_real(p)
    return decode_unavailable(p, media_type)


def synthetic_media_real_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a mixed REAL-container media table from ``documents``:
    doc_id % 3 == 0 -> the 36x32 P6 PPM of :func:`synthetic_ppm_from_documents`;
    == 1 -> the 20-block PCM WAV of :func:`synthetic_wav_from_documents`;
    == 2 -> an MJPEG-in-MP4 track of 1..4 constant-gray 16x16 frames at
    1 fps, quality 97 (value formula :func:`_mjpeg_frame_value`). Every
    payload is genuine container bytes a standard tool could read, and
    every generating formula is closed-form for the SQL oracle."""

    def batches(parts: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        base = _ppm_base_grid()
        t = np.arange(VAD_N_BLOCKS * VAD_BLOCK_SAMPLES)
        b = t // VAD_BLOCK_SAMPLES
        sign = np.where(t % 2 == 0, 1, -1)
        audio_ms = VAD_N_BLOCKS * VAD_BLOCK_SAMPLES * 1000 // VAD_SAMPLE_RATE
        # only 256 distinct constant-gray frames exist: encode each at
        # most once per worker instead of ~2.5x per video asset
        jpeg_by_value: dict[int, bytes] = {}
        frame_by_value: dict[int, "np.ndarray"] = {}

        def const_frame(v: int):
            if v not in frame_by_value:
                frame_by_value[v] = np.full(
                    (MJPEG_FRAME_H, MJPEG_FRAME_W), v, dtype="u1"
                )
                jpeg_by_value[v] = encode_jpeg_baseline(
                    frame_by_value[v], quality=MJPEG_QUALITY
                )
            return frame_by_value[v], jpeg_by_value[v]

        for pdf in parts:
            rows = []
            for aid in pdf["doc_id"]:
                d = int(aid)
                if d % 3 == 0:
                    payload = encode_ppm((d * 7 + base) % 256)
                    mt, meta = "image", {
                        "width": DHASH_IMG_W,
                        "height": DHASH_IMG_H,
                        "duration_ms": None,
                        "codec": "ppm",
                    }
                elif d % 3 == 1:
                    amp = np.where(
                        (d * 7 + b) % 3 == 0, 0, 2000 + 500 * ((d + b) % 4)
                    )
                    payload = encode_wav_pcm16(
                        (sign * amp).astype("<i2"), VAD_SAMPLE_RATE
                    )
                    mt, meta = "audio", {
                        "width": None,
                        "height": None,
                        "duration_ms": audio_ms,
                        "codec": "pcm_s16le",
                    }
                else:
                    nf = _mjpeg_n_frames(d)
                    pairs = [
                        const_frame(_mjpeg_frame_value(d, i))
                        for i in range(nf)
                    ]
                    payload = encode_mp4_mjpeg(
                        [p[0] for p in pairs],
                        fps=1,
                        quality=MJPEG_QUALITY,
                        pre_encoded=[p[1] for p in pairs],
                    )
                    mt, meta = "video", {
                        "width": MJPEG_FRAME_W,
                        "height": MJPEG_FRAME_H,
                        "duration_ms": nf * 1000,
                        "codec": "jpeg",
                    }
                rows.append(
                    {
                        "asset_id": d,
                        "media_type": mt,
                        "payload": payload,
                        "meta": meta,
                    }
                )
            yield pd.DataFrame(rows)

    return _fan_out(docs.select("doc_id")).mapInPandas(batches, MEDIA_SCHEMA)


IMAGE_PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("px_min", T.IntegerType()),
        T.StructField("px_max", T.IntegerType()),
    ]
)


def image_pixel_stats(media: DataFrame) -> DataFrame:
    """Exact integer pixel stats from a REAL PPM decode — the verification
    stage after a pixel transform (m03 pairs it with the real resample so
    the oracle checks every resized pixel through sum/min/max). One
    Arrow-batched map stage, no shuffle."""

    def batches(parts: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in parts:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                p = bytes(payload)
                img = decode_ppm(p).astype(np.int64)
                rows.append(
                    {
                        "asset_id": int(aid),
                        "width": img.shape[1],
                        "height": img.shape[0],
                        "n_bytes": len(p),
                        "px_sum": int(img.sum()),
                        "px_min": int(img.min()),
                        "px_max": int(img.max()),
                    }
                )
            yield pd.DataFrame(rows)

    return _fan_out(media.select("asset_id", "payload")).mapInPandas(
        batches, IMAGE_PIXEL_STATS_SCHEMA
    )


# ---------------------------------------------------------------------------
# H.264 container metadata (NOT pixels). Inter-frame pixel decode stays a
# loud NotImplementedError (ffmpeg-class machinery), but a curation
# pipeline can still SCREEN H.264 assets — dimensions, profile/level,
# frame count, duration — because all of that lives in the container:
# the avcC box (ISO 14496-15 AVCDecoderConfigurationRecord) carries the
# SPS, and the SPS (ITU-T H.264 §7.3.2.1.1) is plain Exp-Golomb bit
# parsing, no codec work. Closed-form tested on hand-built SPS bitstreams.
# ---------------------------------------------------------------------------


def _strip_emulation_prevention(data: bytes) -> bytes:
    """Remove H.264 emulation-prevention bytes: 00 00 03 -> 00 00."""
    out = bytearray()
    zeros = 0
    for b in data:
        if zeros >= 2 and b == 3:
            zeros = 0
            continue  # drop the EP byte
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


class _BitReader:
    """MSB-first bit reader with Exp-Golomb (ue/se) — the only machinery
    SPS parsing needs."""

    def __init__(self, data: bytes):
        self._d = data
        self._pos = 0

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self._d[self._pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self._pos & 7))) & 1)
            self._pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.bits(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("malformed Exp-Golomb code")
        return (1 << zeros) - 1 + (self.bits(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 == 1 else -(k // 2)


def _skip_scaling_list(r: _BitReader, size: int) -> None:
    last, nxt = 8, 8
    for _ in range(size):
        if nxt != 0:
            nxt = (last + r.se() + 256) % 256
        last = nxt if nxt != 0 else last


_HIGH_PROFILES = frozenset(
    (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
)


def parse_h264_sps(nal: bytes) -> dict:
    """Parse an H.264 sequence parameter set NAL unit (header byte
    included, emulation-prevention bytes intact — the exact bytes the
    avcC box stores) down to the screening fields: profile_idc,
    level_idc, chroma_format_idc, coded + cropped dimensions,
    frame_mbs_only_flag. Follows §7.3.2.1.1 field-for-field up to the
    cropping window; VUI is not needed and not read."""
    data = bytes(nal)
    if not data or (data[0] & 0x1F) != 7:
        raise ValueError("not an SPS NAL unit (nal_unit_type != 7)")
    r = _BitReader(_strip_emulation_prevention(data[1:]))
    profile_idc = r.bits(8)
    r.bits(8)  # constraint flags + reserved
    level_idc = r.bits(8)
    r.ue()  # seq_parameter_set_id
    chroma_format_idc = 1
    separate_colour = 0
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            separate_colour = r.bits(1)
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.bits(1)  # qpprime_y_zero_transform_bypass_flag
        if r.bits(1):  # seq_scaling_matrix_present_flag
            n_lists = 8 if chroma_format_idc != 3 else 12
            for i in range(n_lists):
                if r.bits(1):
                    _skip_scaling_list(r, 16 if i < 6 else 64)
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()
    elif poc_type == 1:
        r.bits(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.bits(1)  # gaps_in_frame_num_value_allowed_flag
    pw = r.ue()
    ph = r.ue()
    fmof = r.bits(1)
    if not fmof:
        r.bits(1)  # mb_adaptive_frame_field_flag
    r.bits(1)  # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if r.bits(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    # CropUnit per §7.4.2.1.1: ChromaArrayType 0 (mono / separate
    # planes) crops in luma samples; 4:2:0 halves both; 4:2:2 halves x
    chroma_array = 0 if separate_colour else chroma_format_idc
    sub_w = {0: 1, 1: 2, 2: 2, 3: 1}[chroma_array]
    sub_h = {0: 1, 1: 2, 2: 1, 3: 1}[chroma_array]
    crop_x = 1 if chroma_array == 0 else sub_w
    crop_y = (1 if chroma_array == 0 else sub_h) * (2 - fmof)
    coded_w = (pw + 1) * 16
    coded_h = (2 - fmof) * (ph + 1) * 16
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "chroma_format_idc": chroma_format_idc,
        "coded_width": coded_w,
        "coded_height": coded_h,
        "width": coded_w - crop_x * (crop_l + crop_r),
        "height": coded_h - crop_y * (crop_t + crop_b),
        "frame_mbs_only_flag": fmof,
    }


def parse_avcc(avcc: bytes) -> dict:
    """Parse an AVCDecoderConfigurationRecord (the ``avcC`` box body,
    ISO 14496-15 §5.3.3.1): version/profile/level, NAL length size, and
    the embedded SPS/PPS sets; dimensions come from the first SPS."""
    import struct

    if len(avcc) < 7 or avcc[0] != 1:
        raise ValueError("not an AVCDecoderConfigurationRecord")
    out = {
        "configuration_version": avcc[0],
        "avc_profile_indication": avcc[1],
        "profile_compatibility": avcc[2],
        "avc_level_indication": avcc[3],
        "nal_length_size": (avcc[4] & 0x3) + 1,
    }
    pos = 5
    n_sps = avcc[pos] & 0x1F
    pos += 1
    sps_list = []
    for _ in range(n_sps):
        (ln,) = struct.unpack(">H", avcc[pos : pos + 2])
        pos += 2
        sps_list.append(avcc[pos : pos + ln])
        pos += ln
    n_pps = avcc[pos]
    pos += 1
    pps_list = []
    for _ in range(n_pps):
        (ln,) = struct.unpack(">H", avcc[pos : pos + 2])
        pos += 2
        pps_list.append(avcc[pos : pos + ln])
        pos += ln
    out["sps"] = sps_list
    out["pps"] = pps_list
    if sps_list:
        out.update(parse_h264_sps(sps_list[0]))
    return out


def parse_mp4_avc_metadata(payload: bytes) -> dict:
    """H.264 SCREENING metadata from an ISO-BMFF file: walk to the avc1
    sample entry's ``avcC`` extension box, parse the SPS for true
    (cropped) dimensions and profile/level, and combine with the sample
    table for frame count / duration. Pixel decode of the samples stays
    :func:`decode_unavailable` — this is the m01-tier metadata a
    curation pipeline needs to size/route H.264 assets without decoding
    them."""
    import struct

    info = parse_mp4_samples(payload)
    if info["codec"] not in ("avc1", "avc2", "avc3", "avc4"):
        raise ValueError(
            f"not an H.264 track (sample entry {info['codec']!r})"
        )
    avcc_body = None
    for tag, body, stop in _mp4_walk(payload, 0, len(payload)):
        if tag != b"moov":
            continue
        stack = [(body, stop)]
        while stack:
            b0, s0 = stack.pop()
            for t2, b2, s2 in _mp4_walk(payload, b0, s0):
                if t2 in (b"trak", b"mdia", b"minf", b"stbl"):
                    stack.append((b2, s2))
                elif t2 == b"stsd":
                    (count,) = struct.unpack(">I", payload[b2 + 4 : b2 + 8])
                    entry_start = b2 + 8
                    (esz,) = struct.unpack(
                        ">I", payload[entry_start : entry_start + 4]
                    )
                    fmt = payload[entry_start + 4 : entry_start + 8]
                    if fmt not in (b"avc1", b"avc2", b"avc3", b"avc4"):
                        continue
                    # extension boxes follow the 78-byte VisualSampleEntry
                    # body (86 bytes including size+format)
                    for t3, b3, s3 in _mp4_walk(
                        payload, entry_start + 86, entry_start + esz
                    ):
                        if t3 == b"avcC":
                            avcc_body = payload[b3:s3]
    if avcc_body is None:
        raise ValueError("avc1 sample entry carries no avcC box")
    out = parse_avcc(avcc_body)
    out["n_frames"] = len(info["sizes"])
    out["duration_ms"] = parse_mp4_metadata(payload)["duration_ms"]
    out["codec"] = info["codec"]
    return out


def encode_mp4_avc_skeleton(
    sps: bytes,
    pps: bytes,
    n_frames: int,
    fps: int = 25,
    sample_size: int = 256,
) -> bytes:
    """Build a REAL ISO-BMFF skeleton with an ``avc1`` sample entry
    wrapping the given SPS/PPS in an avcC box and an n_frames sample
    table over placeholder mdat bytes — the test twin of
    :func:`parse_mp4_avc_metadata` (sample PAYLOADS are not valid
    H.264 slices; this is the metadata layer only, pixels stay behind
    the loud stub)."""
    import struct

    meta = parse_h264_sps(sps)
    w, h = meta["width"], meta["height"]
    timescale = 1000
    delta = timescale // fps

    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    def full(tag: bytes, payload: bytes) -> bytes:
        return box(tag, b"\x00\x00\x00\x00" + payload)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isomavc1")
    mdat = box(b"mdat", b"\x00" * (sample_size * n_frames))
    first_off = len(ftyp) + 8
    avcc = (
        bytes([1, meta["profile_idc"], 0, meta["level_idc"], 0xFF, 0xE1])
        + struct.pack(">H", len(sps))
        + sps
        + bytes([1])
        + struct.pack(">H", len(pps))
        + pps
    )
    entry = (
        struct.pack(">I4s", 86 + 8 + len(avcc), b"avc1")
        + b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + b"\x00" * 4
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
        + box(b"avcC", avcc)
    )
    stsd = full(b"stsd", struct.pack(">I", 1) + entry)
    stts = full(b"stts", struct.pack(">III", 1, n_frames, delta))
    stsc = full(b"stsc", struct.pack(">IIII", 1, 1, n_frames, 1))
    stsz = full(b"stsz", struct.pack(">II", sample_size, n_frames))
    stco = full(b"stco", struct.pack(">II", 1, first_off))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = box(b"vmhd", struct.pack(">B3BHHHH", 0, 0, 0, 1, 0, 0, 0, 0))
    url_box = struct.pack(">I", 12) + b"url " + struct.pack(">B3B", 0, 0, 0, 1)
    dref = full(b"dref", struct.pack(">I", 1) + url_box)
    dinf = box(b"dinf", dref)
    minf = box(b"minf", vmhd + dinf + stbl)
    mdhd = full(
        b"mdhd",
        struct.pack(">IIII", 0, 0, timescale, n_frames * delta)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = full(
        b"hdlr", struct.pack(">I4s", 0, b"vide") + b"\x00" * 12 + b"avc\x00"
    )
    mdia = box(b"mdia", mdhd + hdlr + minf)
    tkhd = box(
        b"tkhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", n_frames * delta)
        + b"\x00" * 52
        + struct.pack(">II", w << 16, h << 16),
    )
    trak = box(b"trak", tkhd + mdia)
    mvhd = box(
        b"mvhd",
        struct.pack(">B3x", 0)
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, n_frames * delta)
        + b"\x00" * 80,
    )
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


H264_SCREEN_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("codec", T.StringType()),
        T.StructField("profile_idc", T.IntegerType()),
        T.StructField("level_idc", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)


def video_h264_screening(media: DataFrame) -> DataFrame:
    """Screening metadata for H.264 assets (dimensions from the SPS,
    profile/level, frame count, duration) — one Arrow-batched map
    stage, no pixel decode. Non-AVC payloads raise loudly (route MJPEG
    through the real decoder, others through the stub policy)."""

    def batches(parts: Iterator) -> Iterator:
        import pandas as pd

        for pdf in parts:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                m = parse_mp4_avc_metadata(bytes(payload))
                rows.append(
                    {
                        "asset_id": int(aid),
                        "codec": m["codec"],
                        "profile_idc": m["profile_idc"],
                        "level_idc": m["level_idc"],
                        "width": m["width"],
                        "height": m["height"],
                        "n_frames": m["n_frames"],
                        "duration_ms": m["duration_ms"],
                    }
                )
            yield pd.DataFrame(rows)

    return _fan_out(media.select("asset_id", "payload")).mapInPandas(
        batches, H264_SCREEN_SCHEMA
    )


def encode_h264_sps(
    pic_width_mbs_minus1: int,
    pic_height_map_units_minus1: int,
    frame_crop: tuple[int, int, int, int] | None = None,
    profile_idc: int = 66,
    level_idc: int = 31,
) -> bytes:
    """Build a REAL baseline-profile H.264 SPS NAL unit (§7.3.2.1.1
    bit-for-bit: Exp-Golomb fields, RBSP stop bit, emulation-prevention
    insertion) — the generator twin of :func:`parse_h264_sps`, used to
    synthesize screening corpora whose dimensions an SQL oracle can
    recompute closed-form."""
    bits: list[int] = []

    def u(n: int, v: int) -> None:
        for i in range(n - 1, -1, -1):
            bits.append((v >> i) & 1)

    def ue(v: int) -> None:
        code = v + 1
        n = code.bit_length()
        u(n - 1, 0)
        u(n, code)

    u(8, profile_idc)
    u(8, 0)
    u(8, level_idc)
    ue(0)  # seq_parameter_set_id
    ue(4)  # log2_max_frame_num_minus4
    ue(0)  # pic_order_cnt_type 0
    ue(4)  # log2_max_pic_order_cnt_lsb_minus4
    ue(1)  # max_num_ref_frames
    u(1, 0)  # gaps_in_frame_num_value_allowed_flag
    ue(pic_width_mbs_minus1)
    ue(pic_height_map_units_minus1)
    u(1, 1)  # frame_mbs_only_flag
    u(1, 1)  # direct_8x8_inference_flag
    if frame_crop and any(frame_crop):
        u(1, 1)
        for c in frame_crop:
            ue(c)
    else:
        u(1, 0)
    u(1, 0)  # vui_parameters_present_flag
    bits.append(1)  # rbsp_stop_one_bit
    while len(bits) % 8:
        bits.append(0)
    raw = bytearray(
        int("".join(map(str, bits[i : i + 8])), 2)
        for i in range(0, len(bits), 8)
    )
    out = bytearray([0x67])  # nal_ref_idc=3, nal_unit_type=7 (SPS)
    zeros = 0
    for b in raw:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def split_annexb_nals(payload: bytes) -> list[bytes]:
    """Split an H.264 Annex-B elementary stream (ITU-T H.264 Annex B)
    into NAL units: scan for 3-byte start codes ``00 00 01`` (a 4-byte
    ``00 00 00 01`` is a zero_byte + 3-byte code, handled by the same
    scan), return each NAL's bytes (header included, start codes and
    inter-NAL trailing_zero_8bits excluded). Raw crawl video arrives in
    exactly this framing (.h264/.264 dumps, MPEG-TS payloads) — the
    container-less twin of the avcC-in-MP4 path."""
    data = bytes(payload)
    starts = []
    i = 0
    while True:
        j = data.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        starts.append(j + 3)
        i = j + 3
    if not starts:
        raise ValueError("no Annex-B start code found")
    nals = []
    for k, s in enumerate(starts):
        end = (starts[k + 1] - 3) if k + 1 < len(starts) else len(data)
        nal = data[s:end].rstrip(b"\x00")  # trailing_zero_8bits
        if nal:
            nals.append(nal)
    return nals


def parse_annexb_metadata(payload: bytes) -> dict:
    """H.264 SCREENING metadata from a raw Annex-B elementary stream:
    NAL start-code scan, SPS parse (profile/level/true dimensions via
    :func:`parse_h264_sps`), PPS count, IDR/non-IDR slice census, and a
    REAL frame count — slices whose first Exp-Golomb field
    (``first_mb_in_slice``, §7.3.3) is 0 start a new picture, so
    multi-slice frames count once. Pixel decode stays
    :func:`decode_unavailable`; these are the fields a crawl-video
    triage needs before deciding to transcode."""
    nals = split_annexb_nals(payload)
    out: dict = {
        "n_nals": len(nals),
        "n_sps": 0,
        "n_pps": 0,
        "n_idr_frames": 0,
        "n_frames": 0,
        "n_slice_nals": 0,
    }
    sps_meta = None
    for nal in nals:
        ntype = nal[0] & 0x1F
        if ntype == 7:
            out["n_sps"] += 1
            if sps_meta is None:
                sps_meta = parse_h264_sps(nal)
        elif ntype == 8:
            out["n_pps"] += 1
        elif ntype in (1, 5):
            out["n_slice_nals"] += 1
            r = _BitReader(_strip_emulation_prevention(nal[1:]))
            first_mb = r.ue()
            if first_mb == 0:
                out["n_frames"] += 1
                if ntype == 5:
                    out["n_idr_frames"] += 1
    if sps_meta is None:
        raise ValueError("Annex-B stream carries no SPS NAL")
    out.update(sps_meta)
    return out


def encode_annexb_stream(
    sps: bytes,
    pps: bytes,
    frames: list[tuple[bool, int]],
) -> bytes:
    """Generator twin of :func:`parse_annexb_metadata`: a real Annex-B
    stream — 4-byte start code before SPS/PPS (the conventional AU
    prefix), 3-byte before slices. ``frames`` is a list of
    ``(is_idr, n_slices)``; each frame's first slice encodes
    ``first_mb_in_slice = 0`` and later slices ``ue(mb_offset > 0)``,
    so the parser's picture counting is exercised for real."""

    def ue_bits(v: int) -> list[int]:
        code = v + 1
        n = code.bit_length()
        return [0] * (n - 1) + [
            (code >> i) & 1 for i in range(n - 1, -1, -1)
        ]

    def slice_nal(idr: bool, first_mb: int) -> bytes:
        bits = ue_bits(first_mb) + [1]  # first field + rbsp stop bit
        while len(bits) % 8:
            bits.append(0)
        body = bytes(
            int("".join(map(str, bits[i : i + 8])), 2)
            for i in range(0, len(bits), 8)
        )
        return bytes([0x65 if idr else 0x41]) + body + b"\xaa\x55"

    out = bytearray()
    out += b"\x00\x00\x00\x01" + sps
    out += b"\x00\x00\x00\x01" + pps
    for idr, n_slices in frames:
        for s in range(n_slices):
            out += b"\x00\x00\x01" + slice_nal(idr, s * 99)
    return bytes(out)


def synthetic_annexb_from_documents(docs: DataFrame) -> DataFrame:
    """Formula-derived Annex-B screening corpus (the y65 MP4 corpus's
    container-less twin): same SPS geometry — macroblock width
    ``20 + d%8``, map-unit height ``12 + d%5``, bottom crop ``d%3`` —
    with a GOP of ``1 + d%3`` IDR frames and ``d%4`` non-IDR frames,
    each frame split into ``1 + d%2`` slices, so every screening field
    is closed-form for the oracle while the Spark side scans real start
    codes and parses real slice headers."""

    def batches(parts: Iterator) -> Iterator:
        import pandas as pd

        pps = bytes([0x68, 0xCE, 0x38, 0x80])
        for pdf in parts:
            rows = []
            for aid in pdf["doc_id"]:
                d = int(aid)
                sps = encode_h264_sps(
                    19 + d % 8, 11 + d % 5, (0, 0, 0, d % 3)
                )
                n_slices = 1 + d % 2
                frames = [(True, n_slices)] * (1 + d % 3) + [
                    (False, n_slices)
                ] * (d % 4)
                rows.append(
                    {
                        "asset_id": d,
                        "payload": encode_annexb_stream(sps, pps, frames),
                    }
                )
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )
    return _fan_out(docs.select("doc_id")).mapInPandas(batches, schema)


H264_ANNEXB_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("profile_idc", T.IntegerType()),
        T.StructField("level_idc", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_nals", T.IntegerType()),
        T.StructField("n_sps", T.IntegerType()),
        T.StructField("n_pps", T.IntegerType()),
        T.StructField("n_idr_frames", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_slice_nals", T.IntegerType()),
    ]
)


def video_h264_annexb_screening(media: DataFrame) -> DataFrame:
    """Screening metadata over raw Annex-B payloads (y65's elementary-
    stream extension): one Arrow-batched map stage, no pixel decode."""

    def batches(parts: Iterator) -> Iterator:
        import pandas as pd

        for pdf in parts:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                m = parse_annexb_metadata(bytes(payload))
                rows.append(
                    {
                        "asset_id": int(aid),
                        "profile_idc": m["profile_idc"],
                        "level_idc": m["level_idc"],
                        "width": m["width"],
                        "height": m["height"],
                        "n_nals": m["n_nals"],
                        "n_sps": m["n_sps"],
                        "n_pps": m["n_pps"],
                        "n_idr_frames": m["n_idr_frames"],
                        "n_frames": m["n_frames"],
                        "n_slice_nals": m["n_slice_nals"],
                    }
                )
            yield pd.DataFrame(rows)

    return _fan_out(media.select("asset_id", "payload")).mapInPandas(
        batches, H264_ANNEXB_SCHEMA
    )


def synthetic_h264_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic H.264-in-MP4 SCREENING corpus from the
    documents table: per doc, a real ISO-BMFF file whose avc1/avcC/SPS
    carry formula-derived geometry — macroblock width ``20 + d%8``,
    map-unit height ``12 + d%5``, bottom crop ``d%3`` (4:2:0 CropUnitY
    = 2), ``1 + d%6`` frames at 25 fps — so the whole screening output
    is closed-form for the oracle while the Spark side walks real boxes
    and parses real SPS bits."""

    def batches(parts: Iterator) -> Iterator:
        import pandas as pd

        pps = bytes([0x68, 0xCE, 0x38, 0x80])
        for pdf in parts:
            rows = []
            for aid in pdf["doc_id"]:
                d = int(aid)
                sps = encode_h264_sps(
                    19 + d % 8, 11 + d % 5, (0, 0, 0, d % 3)
                )
                rows.append(
                    {
                        "asset_id": d,
                        "payload": encode_mp4_avc_skeleton(
                            sps, pps, n_frames=1 + d % 6, fps=25,
                            sample_size=64,
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )
    return _fan_out(docs.select("doc_id")).mapInPandas(batches, schema)

"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, bucket partitioning,
mapInPandas batch shape, Arrow binary transfer. Decoding:

- **images**: a REAL pure-stdlib/numpy codec for uncompressed 24-bit BMP
  (`encode_bmp`/`decode_bmp`) — feature extraction and nearest-neighbor
  resize run un-stubbed end-to-end on real bytes, with an exact closed-form
  DuckDB oracle (header arithmetic) in the registry.
- **audio/video**: still STUBBED (no codec libs ship in this container):
  `decode_image` raises NotImplementedError for non-BMP formats unless PIL
  is importable, and tests run the deterministic fake (`fake_decode_meta`)
  which derives plausible (width, height, n_frames) from the payload's md5.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real decoder only if an imaging lib exists (not in this container)
    import PIL.Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image / audio / video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("content_hash", T.StringType(), True),
    ]
)


def fake_decode_meta(payload: bytes | None) -> tuple[int | None, int | None, int | None]:
    """Deterministic stand-in for a media decoder (width, height, n_frames)."""
    if payload is None:
        return None, None, None
    h = hashlib.md5(bytes(payload)).digest()
    return 16 + h[0] % 2048, 16 + h[1] % 2048, 1 + h[2] % 120


def decode_image(payload: bytes) -> "PIL.Image.Image":
    """PIL decode for arbitrary formats — stub until an imaging lib ships
    (BMP has its own real pure-python codec below)."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this environment"
        )
    import io

    import PIL.Image

    return PIL.Image.open(io.BytesIO(payload))


# ------------------------------------------------------------- BMP codec
# Real, dependency-free codec for the classic uncompressed 24-bit BMP
# (BITMAPFILEHEADER + BITMAPINFOHEADER/BI_RGB, bottom-up rows, 4-byte row
# padding) — the format's public spec; no library needed.

_BMP_HEADER = 54  # 14-byte file header + 40-byte info header


def bmp_row_stride(width: int) -> int:
    return (3 * width + 3) // 4 * 4


def encode_bmp(pixels) -> bytes:
    """numpy uint8 array (H, W, 3) in RGB -> BMP bytes."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    stride = bmp_row_stride(w)
    size = _BMP_HEADER + stride * h
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, _BMP_HEADER)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = px[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up, BGR
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes):
    """BMP bytes -> (width, height, numpy uint8 (H, W, 3) RGB). Raises
    ValueError on anything but uncompressed 24-bit BI_RGB."""
    import struct

    import numpy as np

    b = bytes(payload)
    if len(b) < _BMP_HEADER or b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0 or h <= 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    stride = bmp_row_stride(w)
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=offset).reshape(h, stride)
    px = rows[:, : 3 * w].reshape(h, w, 3)[::-1, :, ::-1]  # top-down, RGB
    return w, h, px.copy()


def extract_media_features(df: DataFrame, use_fake_decoder: bool = True) -> DataFrame:
    """mapInPandas feature extraction: one Python call per Arrow batch, binary
    column transferred zero-copy. Partition-parallel; no shuffle."""

    def meta_of(kind: str, b) -> tuple:
        if b is None:
            return (None, None, None)
        if not use_fake_decoder and kind == "image":
            # REAL decode: pure-stdlib BMP header/pixel parse, 1 frame
            w, h, _px = decode_bmp(b)
            return (w, h, 1)
        return fake_decode_meta(b)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pd.Series(
                [meta_of(k, b) for k, b in zip(pdf["kind"], pdf["payload"])],
                index=pdf.index,
                dtype=object,
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else None),
                    "width": decoded.map(lambda t: t[0]),
                    "height": decoded.map(lambda t: t[1]),
                    "n_frames": decoded.map(lambda t: t[2]),
                    "content_hash": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None
                    ),
                }
            )

    return df.mapInPandas(op, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content_hash", T.StringType(), True),
    ]
)


def resize_images(df: DataFrame, width: int, height: int, use_fake_decoder: bool = True) -> DataFrame:
    """Resize (mapInPandas, 1→1): output schema carries the new payload +
    dims. The REAL path (use_fake_decoder=False) decodes BMP, resamples
    nearest-neighbor in numpy, and re-encodes BMP — fully un-stubbed for
    images. The fake path emits a deterministic digest-derived payload for
    non-decodable media kinds."""

    def _real_resize(b):
        if b is None:
            return None
        import numpy as np

        w0, h0, px = decode_bmp(b)
        yi = np.arange(height) * h0 // height
        xi = np.arange(width) * w0 // width
        return encode_bmp(px[yi][:, xi])

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_fake_decoder:
                out_payload = pdf["payload"].map(
                    lambda b: None
                    if b is None
                    else (hashlib.md5(bytes(b) + f"{width}x{height}".encode()).digest() * (
                        max(1, (width * height) // 256)
                    ))[: max(16, (width * height) // 64)]
                )
            else:
                out_payload = pdf["payload"].map(_real_resize)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "payload": out_payload,
                    "width": width,
                    "height": height,
                    "content_hash": out_payload.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None
                    ),
                }
            )

    return df.mapInPandas(op, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("frame_hash", T.StringType(), True),
    ]
)


def sample_frames(df: DataFrame, every_nth: int = 10, use_fake_decoder: bool = True) -> DataFrame:
    """Frame sampling (mapInPandas, 1→N): each video row explodes into its
    sampled frames — the multimodal analog of the zip/debatch explode shape
    (SURVEY.md §2.8 M2/M3). Frame count comes from the (stubbed) decoder;
    fake frames are digest-derived and deterministic."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "frame_index": [], "frame": [], "frame_hash": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                if not use_fake_decoder:
                    raise NotImplementedError(
                        "real frame decode requires a video library not present in this environment"
                    )
                _w, _h, n_frames = fake_decode_meta(payload)
                for idx in range(0, n_frames, every_nth):
                    frame = hashlib.md5(bytes(payload) + idx.to_bytes(4, "big")).digest()
                    out["asset_id"].append(aid)
                    out["frame_index"].append(idx)
                    out["frame"].append(frame)
                    out["frame_hash"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return df.filter(F.col("kind") == "video").mapInPandas(op, FRAME_SCHEMA)


def generate_bmp_media(df: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """REAL 24-bit BMP payloads with closed-form dims (width = 4 + id % 32,
    height = 4 + id % 16) and deterministic gradient pixels. Because the BMP
    layout is pure arithmetic (54-byte header + 4-byte-padded rows), the
    encode -> decode roundtrip has an exact SQL oracle:
    n_bytes = 54 + ((3*w + 3) // 4) * 4 * h."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows: dict = {"asset_id": [], "kind": [], "payload": [], "meta": []}
            for i in pdf[id_col].astype("int64"):
                i = int(i)
                w, h = 4 + i % 32, 4 + i % 16
                yy, xx = np.mgrid[0:h, 0:w]
                base = ((xx * 7 + yy * 13 + i) % 256).astype(np.uint8)
                px = np.stack([base, (base + 85) % 256, (base + 170) % 256], axis=-1)
                rows["asset_id"].append(i)
                rows["kind"].append("image")
                rows["payload"].append(encode_bmp(px))
                rows["meta"].append(None)
            yield pd.DataFrame(rows)

    return df.mapInPandas(op, MEDIA_SCHEMA)


def generate_media(spark, n: int = 200) -> DataFrame:
    """Deterministic synthetic media table (binary payload = seeded bytes)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    df = spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.element_at(kinds, (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(3)) + 1).cast("int")).alias("kind"),
        F.unhex(F.repeat(F.substring(F.md5(F.col("id").cast("string")), 1, 16), 8)).alias("payload"),
        F.create_map(F.lit("source"), F.concat(F.lit("cam-"), F.pmod(F.col("id"), F.lit(7)).cast("string"))).alias("meta"),
    )
    return df


# ------------------------------------------------------------- WAV codec
# Real, dependency-free codec for canonical RIFF/WAVE PCM (16-bit little-
# endian, the format's public spec: 44-byte header = RIFF chunk + fmt chunk
# + data chunk header). Un-stubs the AUDIO modality the same way the BMP
# codec un-stubbed images: encode -> Spark binary column -> mapInPandas
# decode of the actual bytes, with an exact closed-form oracle.

_WAV_HEADER = 44


def encode_wav(samples, sample_rate: int, n_channels: int = 1) -> bytes:
    """int16 numpy array (n_samples * n_channels interleaved) -> WAV bytes."""
    import struct

    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(pcm), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sample_rate, byte_rate, block_align, 16
        )
        + struct.pack("<4sI", b"data", len(pcm))
        + pcm
    )


def decode_wav(payload: bytes):
    """WAV bytes -> (sample_rate, n_channels, int16 numpy array). Raises
    ValueError on anything but canonical 16-bit PCM."""
    import struct

    import numpy as np

    b = bytes(payload)
    if len(b) < _WAV_HEADER or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    fmt_tag, n_channels, sample_rate = struct.unpack_from("<HHI", b, 20)
    bits = struct.unpack_from("<H", b, 34)[0]
    if fmt_tag != 1 or bits != 16 or b[36:40] != b"data":
        raise ValueError(f"unsupported WAV variant (fmt={fmt_tag}, bits={bits})")
    n_bytes = struct.unpack_from("<I", b, 40)[0]
    pcm = np.frombuffer(b, dtype="<i2", count=n_bytes // 2, offset=_WAV_HEADER)
    return sample_rate, n_channels, pcm.copy()


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("peak", T.IntegerType(), True),
    ]
)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """mapInPandas audio feature extraction over REAL decoded PCM — partition-
    parallel, no shuffle, one Python call per Arrow batch. ``peak`` is
    max(sample) over the decoded data chunk, so the gate proves the engine
    parsed actual sample bytes, not just the header."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in AUDIO_FEATURE_SCHEMA.fields}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    row = (int(aid), None, None, None, None, None, None)
                else:
                    rate, ch, pcm = decode_wav(payload)
                    frames = len(pcm) // ch
                    row = (
                        int(aid),
                        len(bytes(payload)),
                        rate,
                        ch,
                        frames,
                        frames * 1000 // rate,
                        int(pcm.max()) if len(pcm) else None,
                    )
                for k, v in zip(out, row):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(op, AUDIO_FEATURE_SCHEMA)


def generate_wav_media(df: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """REAL 16-bit PCM WAV payloads with closed-form structure:
      sample_rate = 8000 * (1 + id % 2); n_channels = 1 + id % 2;
      frames = 800 + id % 1600; samples[j] = ((j % 256) - 128) * (1 + id % 32)
    so n_bytes = 44 + 2 * n_channels * frames and (frames >= 256) the peak is
    exactly 127 * (1 + id % 32) — pure arithmetic a SQL oracle can state."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows: dict = {"asset_id": [], "kind": [], "payload": [], "meta": []}
            for i in pdf[id_col].astype("int64"):
                i = int(i)
                rate = 8000 * (1 + i % 2)
                ch = 1 + i % 2
                frames = 800 + i % 1600
                amp = 1 + i % 32
                j = np.arange(frames * ch, dtype=np.int64)
                samples = ((j % 256) - 128) * amp
                rows["asset_id"].append(i)
                rows["kind"].append("audio")
                rows["payload"].append(encode_wav(samples.astype("<i2"), rate, ch))
                rows["meta"].append(None)
            yield pd.DataFrame(rows)

    return df.mapInPandas(op, MEDIA_SCHEMA)

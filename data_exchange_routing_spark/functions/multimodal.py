"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, bucket partitioning,
mapInPandas batch shape, Arrow binary transfer. Decoding is REAL pure-stdlib
/numpy codecs behind magic-byte dispatch (`sniff_decode_meta`), each gated
by a closed-form DuckDB oracle in the registry:

- **BMP** (`encode_bmp`/`decode_bmp`): uncompressed 24-bit; feature extract
  and nearest-neighbor resize run un-stubbed on real bytes.
- **PNG** (`encode_png`/`decode_png`): zlib DEFLATE, all 5 scanline filters,
  CRC-validated; truncation / corrupt-DEFLATE raise ValueError.
- **GIF** (`decode_gif_frames`): real LZW decode, multi-frame sampling.
- **WAV** (`decode_wav`): PCM header + sample decode (audio path).
- **JPEG** is the one remaining fence: baseline JFIF decode (Huffman +
  dequant + IDCT + YCbCr) is not implemented; `sniff_decode_meta` raises a
  loud NotImplementedError for JPEG magic rather than guessing. Unknown
  magics likewise fail loudly — never silently fake.

`fake_decode_meta` remains ONLY as an explicitly-labeled deterministic
stand-in for formats behind the fence (used by plumbing-shape tests, never
by the oracle-gated registry queries).
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


def sniff_decode_meta(payload: bytes) -> tuple[int | None, int | None, int | None]:
    """Magic-byte dispatch to the REAL in-repo codecs (round-3 punch list:
    the generic path no longer needs a trusted ``kind`` column):

    - ``BM``            -> 24-bit BMP: (width, height, 1)
    - ``\\x89PNG``       -> 8-bit RGB/RGBA PNG: (width, height, 1)
    - ``RIFF..WAVE``    -> 16-bit PCM WAV: (None, None, n sample frames —
      "frame" in the audio sense: one sample across channels)
    - ``GIF87a/GIF89a`` -> animated GIF: (width, height, n frames)

    Truly-unknown formats raise NotImplementedError — the documented fence:
    no codec libs ship in this container, and silently faking metadata for
    real unknown bytes would poison downstream filters."""
    b = bytes(payload)
    if b[:2] == b"BM":
        w, h, _px = decode_bmp(b)
        return (w, h, 1)
    if b[:8] == _PNG_SIG:
        w, h, _px, _ch = decode_png(b)
        return (w, h, 1)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        _rate, ch, pcm = decode_wav(b)
        return (None, None, len(pcm) // ch)
    if b[:6] in (b"GIF89a", b"GIF87a"):
        w, h, frames = decode_gif(b)
        return (w, h, len(frames))
    raise NotImplementedError(
        f"no codec for payload magic {b[:8]!r} (BMP/WAV/GIF ship in-repo; "
        "other formats need an external media library)"
    )


def extract_media_features(df: DataFrame, use_fake_decoder: bool = True) -> DataFrame:
    """mapInPandas feature extraction: one Python call per Arrow batch, binary
    column transferred zero-copy. Partition-parallel; no shuffle. With
    ``use_fake_decoder=False`` payloads are dispatched BY CONTENT to the
    real BMP/WAV/GIF codecs (sniff_decode_meta); the fake decoder remains
    only for stub demos over arbitrary bytes."""

    def meta_of(kind: str, b) -> tuple:
        if b is None:
            return (None, None, None)
        if not use_fake_decoder:
            return sniff_decode_meta(b)
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
    dims. The REAL path (use_fake_decoder=False) decodes BMP or PNG (magic
    dispatch), resamples nearest-neighbor in numpy, and re-encodes in the
    SAME container — fully un-stubbed for images. The fake path emits a
    deterministic digest-derived payload for non-decodable media kinds."""

    def _real_resize(b):
        if b is None:
            return None
        import numpy as np

        b = bytes(b)
        if b[:8] == _PNG_SIG:
            w0, h0, px, _ch = decode_png(b)
            yi = np.arange(height) * h0 // height
            xi = np.arange(width) * w0 // width
            return encode_png(px[yi][:, xi])
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


# ------------------------------------------------------------- GIF codec
# Real, dependency-free codec for GIF89a (public spec: logical screen
# descriptor + global color table + per-frame image blocks, variable-width
# LSB-first LZW in 255-byte sub-blocks). Un-stubs the VIDEO modality: an
# animated GIF is a genuine multi-frame container, so frame sampling decodes
# actual compressed frames instead of digest fakes.

_GIF_MAX_CODE = 1 << 12


def _lzw_encode_codes(indices: bytes, min_code_size: int) -> list[int]:
    """Classic LZW over the index stream -> list of codes (with clear/end)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    codes = [clear]
    w = b""
    for b in indices:
        wb = w + bytes([b])
        if wb in table:
            w = wb
            continue
        codes.append(table[w])
        if next_code < _GIF_MAX_CODE:
            table[wb] = next_code
            next_code += 1
        else:
            codes.append(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
        w = bytes([b])
    if w:
        codes.append(table[w])
    codes.append(end)
    return codes


def _lzw_pack(codes: list[int], min_code_size: int) -> bytes:
    """Pack codes LSB-first, replaying the DECODER's width schedule so the
    two sides stay in sync by construction."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    width = min_code_size + 1
    next_code = end + 1
    fresh = True
    buf = nbits = 0
    out = bytearray()
    for c in codes:
        buf |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8
        if c == clear:
            width, next_code, fresh = min_code_size + 1, end + 1, True
        elif c != end:
            if fresh:
                fresh = False
            else:
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Variable-width LZW decode (full spec: KwKwK case, width growth to 12
    bits, clear-code table resets)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    width = min_code_size + 1
    next_code = end + 1
    table: dict[int, bytes] = {i: bytes([i]) for i in range(clear)}
    out = bytearray()
    prev: bytes | None = None
    buf = nbits = pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            buf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits -= width
        if code == clear:
            width, next_code, prev = min_code_size + 1, end + 1, None
            table = {i: bytes([i]) for i in range(clear)}
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]
            else:
                raise ValueError(f"corrupt LZW code {code}")
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        out += entry
        prev = entry


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


GRAYSCALE_PALETTE = bytes(v for i in range(256) for v in (i, i, i))


def encode_gif(frames, palette: bytes = GRAYSCALE_PALETTE, delay_cs: int = 10) -> bytes:
    """List of numpy uint8 (H, W) palette-index frames -> animated GIF89a."""
    import struct

    import numpy as np

    first = np.asarray(frames[0], dtype=np.uint8)
    h, w = first.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 colors
    out += palette
    for fr in frames:
        fr = np.asarray(fr, dtype=np.uint8)
        out += b"\x21\xf9" + struct.pack("<BBHB", 4, 0, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(8)  # LZW min code size
        out += _sub_blocks(_lzw_pack(_lzw_encode_codes(fr.tobytes(), 8), 8))
    out += b"\x3b"
    return bytes(out)


def decode_gif(payload: bytes):
    """GIF bytes -> (width, height, [numpy uint8 (H, W, 3) RGB frames]).
    Supports the GIF89a subset we target: global color table, full-canvas
    non-interlaced frames."""
    import struct

    import numpy as np

    b = bytes(payload)
    if b[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF payload")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    if not packed & 0x80:
        raise ValueError("global color table required")
    gct_n = 2 << (packed & 0x07)
    palette = np.frombuffer(b, dtype=np.uint8, count=3 * gct_n, offset=pos).reshape(gct_n, 3)
    pos += 3 * gct_n
    frames = []
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while b[pos]:
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            x0, y0, fw, fh, ipacked = struct.unpack_from("<HHHHB", b, pos)
            pos += 9
            if ipacked & 0x80:
                pos += 3 * (2 << (ipacked & 0x07))  # skip local color table
            if ipacked & 0x40:
                raise ValueError("interlaced GIF not supported")
            if (x0, y0, fw, fh) != (0, 0, w, h):
                raise ValueError("partial-canvas frames not supported")
            min_code = b[pos]
            pos += 1
            lzw = bytearray()
            while b[pos]:
                n = b[pos]
                lzw += b[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = np.frombuffer(_lzw_decode(bytes(lzw), min_code), dtype=np.uint8)
            if len(idx) != w * h:
                raise ValueError("frame size mismatch")
            frames.append(palette[idx.reshape(h, w)])
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    return w, h, frames


def generate_gif_media(df: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """REAL animated GIF payloads with closed-form structure:
      width = 4 + id % 16; height = 4 + id % 8; n_frames = 1 + id % 8;
      pixels[f, y, x] = (x*3 + y*5 + f*7 + id) % 256 (grayscale palette)
    so frame counts/dims — and via the palette the decoded RGB — are pure
    arithmetic a SQL oracle (or exact-twin test) can state."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows: dict = {"asset_id": [], "kind": [], "payload": [], "meta": []}
            for i in pdf[id_col].astype("int64"):
                i = int(i)
                w, h, n = 4 + i % 16, 4 + i % 8, 1 + i % 8
                yy, xx = np.mgrid[0:h, 0:w]
                frames = [((xx * 3 + yy * 5 + f * 7 + i) % 256).astype(np.uint8) for f in range(n)]
                rows["asset_id"].append(i)
                rows["kind"].append("video")
                rows["payload"].append(encode_gif(frames))
                rows["meta"].append(None)
            yield pd.DataFrame(rows)

    return df.mapInPandas(op, MEDIA_SCHEMA)


def sample_gif_frames(df: DataFrame, every_nth: int = 2) -> DataFrame:
    """REAL frame sampling (mapInPandas, 1→N): decode the animated GIF,
    keep every Nth frame, re-encode each sampled frame as BMP (reusing the
    image codec) — the un-stubbed twin of sample_frames."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "frame_index": [], "frame": [], "frame_hash": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                _w, _h, frames = decode_gif(payload)
                for idx in range(0, len(frames), every_nth):
                    bmp = encode_bmp(frames[idx])
                    out["asset_id"].append(aid)
                    out["frame_index"].append(idx)
                    out["frame"].append(bmp)
                    out["frame_hash"].append(hashlib.md5(bmp).hexdigest())
            yield pd.DataFrame(out)

    return df.filter(F.col("kind") == "video").mapInPandas(op, FRAME_SCHEMA)


GIF_FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("px00", T.IntegerType(), False),
    ]
)


def gif_frame_stats(frames_df: DataFrame) -> DataFrame:
    """Decode each sampled BMP frame (FRAME_SCHEMA rows from
    sample_gif_frames) and emit closed-form-checkable stats. `px00` is the
    R channel of the decoded top-left pixel, so the gate proves the full
    GIF-LZW-decode -> frame-sample -> BMP-encode -> BMP-decode chain, not
    just container arithmetic."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in GIF_FRAME_STATS_SCHEMA.fields}
            for aid, idx, frame in zip(pdf["asset_id"], pdf["frame_index"], pdf["frame"]):
                w, h, px = decode_bmp(frame)
                out["asset_id"].append(int(aid))
                out["frame_index"].append(int(idx))
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(frame))
                out["px00"].append(int(px[0, 0, 0]))
            yield pd.DataFrame(out)

    return frames_df.mapInPandas(op, GIF_FRAME_STATS_SCHEMA)


# ------------------------------------------------------------- PNG codec
# Real, dependency-free codec for the one compressed still-image format the
# stdlib can fully express: PNG is DEFLATE-based (zlib) + per-scanline
# byte filters (spec: RFC 2083). Supports 8-bit truecolor (RGB, color type
# 2) and truecolor+alpha (RGBA, type 6), non-interlaced, all five scanline
# filters, multi-IDAT streams, CRC-validated chunks. The encoder can write
# MIXED per-row filters (row % 5) at zlib level 0 (stored blocks), which
# makes the file size closed-form for the SQL oracle while forcing the
# decoder to exercise every unfilter type on real bytes.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(pixels, filter_mode: str = "mixed", level: int = 0) -> bytes:
    """numpy uint8 (H, W, 3|4) -> PNG bytes. ``filter_mode``: "none" writes
    filter 0 everywhere; "mixed" writes filter ``y % 5`` so a decode gate
    proves all five unfilters. ``level=0`` (stored DEFLATE) keeps the byte
    size closed-form: 68 + H*(1 + bpp*W) for payloads under one block."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    if ch not in (3, 4):
        raise ValueError(f"PNG encoder supports RGB/RGBA, got {ch} channels")
    color_type = 2 if ch == 3 else 6
    bpp = ch
    raw = bytearray()
    prev = bytes(bpp * w)
    for y in range(h):
        row = px[y].tobytes()
        ft = 0 if filter_mode == "none" else y % 5
        raw.append(ft)
        if ft == 0:
            raw += row
        elif ft == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(len(row))
            )
        elif ft == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        elif ft == 3:  # Average
            raw += bytes(
                (row[i] - (((row[i - bpp] if i >= bpp else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(len(row))
            )
        else:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(len(row))
            )
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), level))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """PNG bytes -> (width, height, numpy uint8 (H, W, C), channels).
    Full chunk walk with CRC validation, multi-IDAT concatenation, zlib
    inflate, and all five scanline unfilters. Raises ValueError on
    non-PNG bytes, CRC mismatch, or unsupported variants (bit depth != 8,
    palette/gray color types, interlacing)."""
    import struct
    import zlib

    import numpy as np

    b = bytes(payload)
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        if pos + 12 + length > len(b):
            raise ValueError(
                f"truncated PNG: chunk at {pos} declares {length} bytes past EOF"
            )
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", b, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG without IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (2, 6) or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color_type}, "
            f"interlace={interlace}); this decoder covers 8-bit RGB/RGBA"
        )
    bpp = 3 if color_type == 2 else 4
    if not idat:
        raise ValueError("truncated PNG: no IDAT data before EOF")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG DEFLATE stream: {e}") from None
    stride = 1 + bpp * w
    if len(raw) != stride * h:
        raise ValueError(f"PNG data length {len(raw)} != expected {stride * h}")
    out = np.zeros((h, bpp * w), dtype=np.uint8)
    prev = bytes(bpp * w)
    for y in range(h):
        ft = raw[y * stride]
        line = bytearray(raw[y * stride + 1 : (y + 1) * stride])
        if ft == 1:  # Sub
            for i in range(bpp, len(line)):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(len(line)):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(len(line)):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(len(line)):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = bytes(line)
    return w, h, out.reshape(h, w, bpp).copy(), bpp


def generate_png_media(df: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """REAL PNG payloads: dims w = 4 + id % 32, h = 4 + id % 16, pixel
    (y, x, c) = (7x + 13y + id + 85c) % 256, mixed per-row filters, stored
    DEFLATE — every byte of the file and every decoded pixel is pure
    arithmetic, so the encode -> decode gate has an exact SQL oracle:
    n_bytes = 68 + h*(1 + 3*w), px_sum = SUM over the closed-form pixels."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows: dict = {"asset_id": [], "kind": [], "payload": [], "meta": []}
            for i in pdf[id_col].astype("int64"):
                i = int(i)
                w, h = 4 + i % 32, 4 + i % 16
                yy, xx = np.mgrid[0:h, 0:w]
                px = np.stack(
                    [(7 * xx + 13 * yy + i + 85 * c) % 256 for c in range(3)],
                    axis=-1,
                ).astype(np.uint8)
                rows["asset_id"].append(i)
                rows["kind"].append("image")
                rows["payload"].append(encode_png(px))
                rows["meta"].append(None)
            yield pd.DataFrame(rows)

    return df.mapInPandas(op, MEDIA_SCHEMA)


PNG_FEATURE_SCHEMA = (
    "asset_id long, n_bytes long, width int, height int, channels int, px_sum long"
)


def extract_png_features(df: DataFrame) -> DataFrame:
    """mapInPandas decode of real PNG bytes: dims from IHDR, px_sum from the
    UNFILTERED pixel data — a wrong Sub/Up/Average/Paeth implementation
    cannot pass, because the generator writes filter y % 5."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict = {
                "asset_id": [], "n_bytes": [], "width": [], "height": [],
                "channels": [], "px_sum": [],
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload)
                w, h, px, ch = decode_png(b)
                out["asset_id"].append(int(aid))
                out["n_bytes"].append(len(b))
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["px_sum"].append(int(px.astype("int64").sum()))
            yield pd.DataFrame(out)

    return df.mapInPandas(op, PNG_FEATURE_SCHEMA)

"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, bucket partitioning,
mapInPandas batch shape, Arrow binary transfer. The actual media decode is
STUBBED: the container ships no image/audio libs, so `decode_image` raises
NotImplementedError unless PIL is importable, and tests run the deterministic
fake (`fake_decode_meta`) which derives plausible (width, height, n_frames)
from the payload's md5 — stable, environment-independent.
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
    """Real decode path — clearly-marked stub until an imaging lib ships."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this environment"
        )
    import io

    import PIL.Image

    return PIL.Image.open(io.BytesIO(payload))


def extract_media_features(df: DataFrame, use_fake_decoder: bool = True) -> DataFrame:
    """mapInPandas feature extraction: one Python call per Arrow batch, binary
    column transferred zero-copy. Partition-parallel; no shuffle."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(
                fake_decode_meta
                if use_fake_decoder
                else lambda b: decode_image(b).size + (1,)
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
    """Resize plumbing (mapInPandas, 1→1): output schema carries the new
    payload + dims. Fake path emits a deterministic digest-derived payload of
    len ∝ width*height; the real path (PIL thumbnail + re-encode) sits behind
    the same signature and raises NotImplementedError without an imaging lib."""

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
                raise NotImplementedError(
                    "real resize requires an imaging library not present in this environment"
                )
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

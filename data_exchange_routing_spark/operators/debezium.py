"""Debezium/Kafka-Connect CDC envelope codec (wire-format interop edge).

The de-facto wire format for binlog/WAL CDC is the Debezium change-event
envelope: ``{"payload": {"before": ..., "after": ..., "op": "c|r|u|d",
"ts_ms": ..., "source": {"lsn": ...}}}`` (public format, debezium.io docs).
The reference consumes provider-framed change notifications and normalizes
them into its own envelope before routing (fns-routing/.../Common.kt:211-214
gson parse; dtos/AzureBlobCreateEventMesage.kt:3 tolerant fields); this
module is the same edge for the CDC world everyone actually deploys against:

- ``parse_debezium``  — envelope JSON -> the engine's change-event shape
  (``lsn``, ``op`` I/U/D, image columns), ready for ``pipeline.apply_epoch``.
- ``to_debezium_json`` — the inverse (change rows -> envelope strings), the
  relay/export half; also the test harness's way to synthesize real wire
  payloads without a connector.

Wire-type mapping (Debezium JSON converter defaults, schemas disabled):

- ``binary``    <-> base64 string  (``binary.handling.mode=base64``)
- ``timestamp`` <-> int64 epoch MICROseconds (``io.debezium.time.MicroTimestamp``,
  the default ``time.precision.mode=adaptive_time_microseconds``)
- everything else rides JSON-native (maps as objects, strings/numbers as-is).

Semantics pinned by tests (tests/test_debezium.py):

- op ``c`` (create) and ``r`` (snapshot read) -> I; ``u`` -> U; ``d`` -> D.
- The row image is ``before`` for deletes, ``after`` otherwise — a ``u``
  event's ``before`` (present under REPLICA IDENTITY FULL) is ignored.
- Unknown ops and malformed JSON yield ``op`` NULL: rows flow to the
  pipeline's F5 op-guard and dead-letter instead of aborting the batch
  (F12 — row-level rejection, never batch abort).

Everything is built-in column expressions — JVM-side, whole-stage-codegen'd,
no Python in the hot path; ``from_json`` ignores unknown envelope fields
(tolerant parse, same contract as ``parse_envelope``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_OP_ENCODE = {"I": "c", "U": "u", "D": "d"}


def debezium_wire_schema(image: T.StructType) -> T.StructType:
    """The envelope schema ``from_json`` parses: ``image`` with binary
    fields widened to (base64) strings and timestamps to int64 micros."""

    def wire_type(dt: T.DataType) -> T.DataType:
        if isinstance(dt, T.BinaryType):
            return T.StringType()
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            return T.LongType()
        return dt

    img = T.StructType(
        [T.StructField(f.name, wire_type(f.dataType), True) for f in image.fields]
    )
    payload = T.StructType(
        [
            T.StructField("before", img, True),
            T.StructField("after", img, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField(
                "source", T.StructType([T.StructField("lsn", T.LongType(), True)]), True
            ),
        ]
    )
    return T.StructType([T.StructField("payload", payload, True)])


def _decode_image_field(img: Column, field: T.StructField) -> Column:
    c = img.getField(field.name)
    if isinstance(field.dataType, T.BinaryType):
        return F.unbase64(c)
    if isinstance(field.dataType, T.TimestampType):
        return F.timestamp_micros(c)
    if isinstance(field.dataType, T.TimestampNTZType):
        # micros are interpreted in the engine's pinned UTC session zone, so
        # NTZ <-> micros round-trips exactly (session.py sets UTC)
        return F.timestamp_micros(c).cast(T.TimestampNTZType())
    return c


def parse_debezium(
    df: DataFrame, image: T.StructType, json_col: str = "value"
) -> DataFrame:
    """Debezium envelope strings -> change rows ``(lsn, op, *image columns)``.

    ``image`` is the logical row-image schema (engine types: binary/timestamp,
    not wire types). Columns other than ``json_col`` pass through, so Kafka
    metadata (partition/offset) can ride along for provenance.
    """
    env = debezium_wire_schema(image)
    passthrough = [c for c in df.columns if c != json_col]
    # materialize the parsed payload ONCE: building every output column off
    # an independent from_json expression tree leaves N JsonToStructs in one
    # Project (JsonToStructs is CodegenFallback, so codegen subexpression
    # elimination never dedups them — measured 13 parses/row for a 6-field
    # image); a named intermediate column keeps it at exactly 1 (plan-gated
    # in tests/test_debezium.py)
    step = df.select(
        *passthrough, F.from_json(F.col(json_col), env).getField("payload").alias("_p")
    )
    op_raw = F.col("_p").getField("op")
    op = (
        F.when(op_raw.isin("c", "r"), F.lit("I"))
        .when(op_raw == "u", F.lit("U"))
        .when(op_raw == "d", F.lit("D"))
        .otherwise(F.lit(None).cast("string"))
    )
    step = step.select(
        *passthrough,
        F.col("_p").getField("source").getField("lsn").alias("lsn"),
        op.alias("op"),
        F.when(op_raw == "d", F.col("_p").getField("before"))
        .otherwise(F.col("_p").getField("after"))
        .alias("_img"),
    )
    img = F.col("_img")
    return step.select(
        *passthrough,
        "lsn",
        "op",
        *[_decode_image_field(img, f).alias(f.name) for f in image.fields],
    )


def _encode_image_field(field: T.StructField) -> Column:
    c = F.col(field.name)
    if isinstance(field.dataType, T.BinaryType):
        return F.base64(c).alias(field.name)
    if isinstance(field.dataType, T.TimestampType):
        return F.unix_micros(c).alias(field.name)
    if isinstance(field.dataType, T.TimestampNTZType):
        return F.unix_micros(c.cast(T.TimestampType())).alias(field.name)
    return c.alias(field.name)


def to_debezium_json(
    df: DataFrame,
    image: T.StructType,
    op_col: str = "op",
    lsn_col: str = "lsn",
    out_col: str = "value",
) -> DataFrame:
    """Change rows -> Debezium envelope JSON strings (the relay/export half).

    I/U rows carry the image in ``after`` (``before`` null — REPLICA IDENTITY
    DEFAULT, the Debezium default); D rows carry it in ``before`` (``after``
    null). ``ts_ms`` is the image timestamp in epoch millis when the image
    has a ``warc_ts``/``ts`` field, else null. Columns other than the image
    and ``op``/``lsn`` pass through unchanged.
    """
    img = F.struct(*[_encode_image_field(f) for f in image.fields])
    null_img = F.lit(None).cast(debezium_wire_schema(image)["payload"].dataType["before"].dataType)
    is_d = F.col(op_col) == "D"
    op_wire = F.coalesce(
        *[F.when(F.col(op_col) == k, F.lit(v)) for k, v in _OP_ENCODE.items()]
    )
    ts_field = next((f.name for f in image.fields if f.name in ("warc_ts", "ts")), None)
    ts_ms = (
        F.unix_millis(F.col(ts_field).cast(T.TimestampType()))
        if ts_field
        else F.lit(None).cast("long")
    )
    payload = F.struct(
        F.when(is_d, img).otherwise(null_img).alias("before"),
        F.when(is_d, null_img).otherwise(img).alias("after"),
        op_wire.alias("op"),
        ts_ms.alias("ts_ms"),
        F.struct(F.col(lsn_col).cast("long").alias("lsn")).alias("source"),
    )
    keep = {f.name for f in image.fields} | {op_col, lsn_col}
    passthrough = [c for c in df.columns if c not in keep]
    return df.select(
        *passthrough, F.to_json(F.struct(payload.alias("payload"))).alias(out_col)
    )

"""Fixed StructTypes for the engine's tables (SURVEY.md §1, FIXTURES.md).

Reference basis (file:line cited per schema):
- change event envelope: fns-routing/.../Common.kt:63-69 (EventSchema), richer spike
  variant spikes/hl7-orchestration/.../HL7Message.kt:5-27 (carries sequencer/eventTime
  -> our lsn/warc_ts).
- metadata map with lowercase keys: RouteIngestedFile.kt:116.
- route config: Common.kt:70-101 + cosmosdb/route-config-schema.json:6-58.
- processing-status report: PSReportEnvelope.kt:7-58 -> lineage_metrics.
- dead-letter copy: RouteIngestedFile.kt:308-329.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- web_pages
# Primary target table (BASELINE.json input_hint).
WEB_PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# ------------------------------------------------------------ change_events
# The CDC log row. `lsn` is the reference's `sequencer` (HL7Message.kt:25);
# `meta` is the open-world string->string metadata map (RouteIngestedFile.kt:116).
CHANGE_EVENTS = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),  # I / U / D
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("epoch_hint", T.IntegerType(), True),
    ]
)

# ------------------------------------------------------------- route_config
# Small dimension, broadcast at join time (Common.kt:70-101; J1 in SURVEY §2.5).
ROUTE_CONFIG = T.StructType(
    [
        T.StructField("route_key", T.StringType(), False),  # content_type analog
        T.StructField("destination_table", T.StringType(), False),
        T.StructField("destination_partition", T.StringType(), True),
        T.StructField("extra_meta", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("is_valid", T.BooleanType(), False),
    ]
)

# -------------------------------------------------------------- dead_letter
# Error rows carry the exact, assertable message (reference asserts exact error
# strings: Unit_FnDecompressor.kt:88-135).
DEAD_LETTER = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("lsn", T.LongType(), True),
        T.StructField("error", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),  # parse / validate / route
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# ---------------------------------------------------------- lineage_metrics
# One row per (epoch, destination) commit, PSReportEnvelope analog.
LINEAGE_METRICS = T.StructType(
    [
        T.StructField("epoch_id", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("destination_table", T.StringType(), False),
        T.StructField("rows_applied", T.LongType(), False),
        T.StructField("bytes", T.LongType(), True),
        T.StructField("watermark", T.TimestampType(), True),
        T.StructField("status", T.StringType(), False),  # SUCCESS / FAILURE
        T.StructField(
            "issues",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("level", T.StringType(), True),
                        T.StructField("message", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("start_ts", T.TimestampType(), True),
        T.StructField("end_ts", T.TimestampType(), True),
    ]
)

# Exact error strings (stage analog of Unit_FnDecompressor's asserted messages).
ERR_EMPTY_META = "metadata map is empty"
ERR_MISSING_STREAM_ID = "missing required metadata key: data_stream_id"
ERR_MISSING_STREAM_ROUTE = "missing required metadata key: data_stream_route"
ERR_NO_ROUTE = "no route configuration found for key"
ERR_INVALID_ROUTE = "route configuration is invalid"
ERR_BAD_OP = "unknown change-event op"

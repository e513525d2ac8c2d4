"""Deterministic synthetic CDC change-event generator (FIXTURES.md §2, §7).

Fully distributed: every field is a pure function of the row id via xxhash64,
so generation runs as a narrow `spark.range(n)` pipeline with no driver-side
loops and no Python UDFs — the same code generates 10^4 events for pytest and
would generate 10^10 on a cluster, embarrassingly parallel.

Reference semantics reproduced:
- at-least-once duplicate delivery (~1.5% exact duplicate events, same lsn) —
  reference consumes storage queues at-least-once (RouteIngestedFile.kt:100-103,
  CHANGELOG 0.0.41 dedup motivation);
- out-of-order arrival (storage order != lsn order);
- Zipf-skewed url keys (a few hot urls take a few % of all events) to
  exercise the salted dedup path;
- a fraction of rows missing required metadata keys -> dead-letter path
  (RouteIngestedFile.kt:117-145);
- a fraction of html payloads carrying non-UTF8 bytes to pin the decode policy;
- a late tranche introducing a new `charset` metadata key -> additive schema
  evolution (RouteIngestedFile.kt:196-209 open-world metadata).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
BASE_TS = "2024-01-01 00:00:00"
LANGS = ["en", "es", "fr", "de", "zz"]
CONTENT_TYPES = ["text/html", "application/pdf", "text/plain", "application/json"]
UNROUTED_CONTENT_TYPE = "application/octet-stream"  # no route -> dead-letter
INVALID_ROUTE_CONTENT_TYPE = "application/xml"  # route exists but is_valid=false
EVOLUTION_EPOCH = 3  # epochs >= this carry the new `charset` meta key


def _h(col, salt: int):
    """Deterministic 64-bit hash stream #salt of a column (JVM-side)."""
    return F.xxhash64(col, F.lit(SEED), F.lit(salt))


def _u(col, salt: int):
    """Uniform [0,1) derived from the hash (bucket to 1e9 for precision)."""
    return (F.pmod(_h(col, salt), F.lit(1_000_000_000)).cast("double")) / 1e9


def generate_change_events(
    spark: SparkSession,
    n_events: int,
    n_urls: int,
    n_epochs: int = 8,
    dup_frac: float = 0.015,
    delete_frac: float = 0.03,
    bad_meta_frac: float = 0.02,
    empty_meta_frac: float = 0.005,
    non_utf8_frac: float = 0.02,
    unrouted_frac: float = 0.02,
    filler_repeat: int = 20,
) -> DataFrame:
    """Return a change-event DataFrame of ~n_events * (1 + dup_frac) rows."""
    ids = spark.range(0, n_events).withColumnRenamed("id", "lsn")

    # Zipf-ish key skew via log-uniform inverse CDF: P(url_id = r) ~ 1/r.
    u_key = _u(F.col("lsn"), 1)
    url_id = F.least(
        F.floor(F.exp(u_key * F.lit(math.log(max(n_urls, 2))))).cast("long"),
        F.lit(n_urls - 1),
    )
    # extra heat on the first 5 urls: 3% of all events collapse onto them
    url_id = F.when(_u(F.col("lsn"), 2) < 0.03, F.pmod(_h(F.col("lsn"), 3), F.lit(5))).otherwise(url_id)

    df = ids.withColumn("url_id", url_id)
    df = df.withColumn(
        "url",
        F.concat(
            F.lit("https://site-"),
            F.pmod(F.col("url_id"), F.lit(97)).cast("string"),
            F.lit(".example/p/"),
            F.col("url_id").cast("string"),
        ),
    )
    # event time: advances with lsn, +-5s jitter => ties and local inversions
    df = df.withColumn(
        "warc_ts",
        F.timestamp_seconds(
            F.unix_timestamp(F.lit(BASE_TS).cast("timestamp"))
            + F.col("lsn")
            + (F.pmod(_h(F.col("lsn"), 4), F.lit(11)) - 5)
        ),
    )
    df = df.withColumn("epoch_hint", F.floor(F.col("lsn") * n_epochs / F.lit(n_events)).cast("int"))

    # op: delete_frac deletes; else first-occurrence-per-url = I, later = U.
    # (row_number window only runs at datagen time, not in the engine hot path)
    from pyspark.sql import Window as W

    rn = F.row_number().over(W.partitionBy("url_id").orderBy("lsn"))
    df = df.withColumn(
        "op",
        F.when(_u(F.col("lsn"), 5) < delete_frac, F.lit("D"))
        .when(rn == 1, F.lit("I"))
        .otherwise(F.lit("U")),
    )

    df = df.withColumn("lang", F.element_at(F.array(*[F.lit(x) for x in LANGS]), (F.pmod(_h(F.col("lsn"), 6), F.lit(len(LANGS))) + 1).cast("int")))
    df = df.withColumn(
        "content_type",
        F.when(
            _u(F.col("lsn"), 7) < unrouted_frac / 2, F.lit(UNROUTED_CONTENT_TYPE)
        ).when(
            _u(F.col("lsn"), 7) < unrouted_frac, F.lit(INVALID_ROUTE_CONTENT_TYPE)
        ).otherwise(
            F.element_at(
                F.array(*[F.lit(x) for x in CONTENT_TYPES]),
                (F.pmod(_h(F.col("lsn"), 8), F.lit(len(CONTENT_TYPES))) + 1).cast("int"),
            )
        ),
    )

    # html payload: seeded template + per-event filler; null for deletes;
    # a fraction gets trailing non-UTF8 bytes (decode policy must be pinned).
    body = F.concat(
        F.lit("<html><head><title>Page "),
        F.col("url_id").cast("string"),
        F.lit("</title><script>var x=1;</script></head><body><h1>Site "),
        F.pmod(F.col("url_id"), F.lit(97)).cast("string"),
        F.lit("</h1><p>revision "),
        F.col("lsn").cast("string"),
        F.lit(" &amp; content "),
        F.hex(_h(F.col("lsn"), 9)),
        F.lit(" of page.</p><p>"),
        # filler_repeat tunes payload size: ~20 -> ~2 KB pages (unit tests),
        # ~1500 -> ~12 KB pages (Common-Crawl-like, used by the bench so
        # per-event compute dominates fixed stage overheads)
        F.repeat(F.concat(F.lit("word"), F.pmod(_h(F.col("lsn"), 10), F.lit(1000)).cast("string"), F.lit(" ")), filler_repeat),
        F.lit("</p></body></html>"),
    )
    html = F.encode(body, "UTF-8")
    html = F.when(_u(F.col("lsn"), 11) < non_utf8_frac, F.concat(html, F.unhex(F.lit("FF00FE")))).otherwise(html)
    df = df.withColumn("html", F.when(F.col("op") == "D", F.lit(None).cast("binary")).otherwise(html))
    df = df.withColumn("lang", F.when(F.col("op") == "D", F.lit(None).cast("string")).otherwise(F.col("lang")))

    # open-world metadata map; required keys sometimes missing; sometimes empty;
    # late epochs introduce `charset` (schema-evolution fixture, FIXTURES.md §6)
    stream_id = F.concat(F.lit("stream-"), F.pmod(_h(F.col("lsn"), 12), F.lit(4)).cast("string"))
    route = F.concat(F.lit("route-"), F.pmod(_h(F.col("lsn"), 13), F.lit(3)).cast("string"))
    base_meta = F.create_map(
        F.lit("data_stream_id"), stream_id,
        F.lit("data_stream_route"), route,
        F.lit("Reporting_Jurisdiction"), F.concat(F.lit("J"), F.pmod(_h(F.col("lsn"), 14), F.lit(60)).cast("string")),
    )
    charset_meta = F.map_concat(
        base_meta,
        F.create_map(F.lit("charset"), F.when(_u(F.col("lsn"), 15) < 0.5, F.lit("utf-8")).otherwise(F.lit("latin-1"))),
    )
    meta = F.when(F.col("epoch_hint") >= EVOLUTION_EPOCH, charset_meta).otherwise(base_meta)
    missing_key_meta = F.map_filter(meta, lambda k, _: k != F.lit("data_stream_id"))
    u_meta = _u(F.col("lsn"), 16)
    meta = (
        F.when(u_meta < empty_meta_frac, F.create_map().cast("map<string,string>"))
        .when(u_meta < empty_meta_frac + bad_meta_frac, missing_key_meta)
        .otherwise(meta)
    )
    df = df.withColumn("meta", meta)

    base = df.select("lsn", "op", "url", "warc_ts", "html", "lang", "content_type", "meta", "epoch_hint")

    # exact duplicate delivery: re-emit a deterministic sample verbatim
    dups = base.filter(_u(F.col("lsn"), 17) < dup_frac)
    return base.unionAll(dups)


def write_change_events(
    spark: SparkSession,
    out_dir: str,
    n_events: int,
    n_urls: int,
    n_epochs: int = 8,
    **kw,
) -> None:
    """Materialize the event log partitioned by epoch (binlog-segment analog).

    Rows are written in hash order within each epoch partition — storage order
    deliberately differs from lsn order (out-of-order delivery).
    """
    df = generate_change_events(spark, n_events, n_urls, n_epochs, **kw)
    # 32 files per epoch segment, rows hash-scattered across them: storage
    # order != lsn order (out-of-order delivery) AND every segment is
    # splittable/parallel-readable (a single fat file would serialize the
    # whole narrow phase behind one scan task).
    files_per_epoch = 32
    (
        df.withColumn("_shard", F.pmod(_h(F.col("lsn"), 18), F.lit(files_per_epoch)))
        .repartition(n_epochs * files_per_epoch, F.col("epoch_hint"), F.col("_shard"))
        .sortWithinPartitions("_shard", "url")
        .drop("_shard")
        .write.mode("overwrite")
        .partitionBy("epoch_hint")
        .parquet(out_dir)
    )


# --------------------------------------------------------------------------
# Oracle-portable change-event derivation (driver-checkable CDC replay).
#
# generate_change_events above is the full-fidelity fixture (xxhash64
# randomness, non-UTF8 bytes, verbatim dup sampling) — its replay gate is the
# pure-pandas oracle in tests/test_replay_e2e.py. xxhash64 does not exist in
# DuckDB, so that path can never be driver-oracle-checked.
#
# derive_change_events_from_events instead derives a change stream from the
# shared `events` parquet table using ONLY expressions with exact DuckDB
# twins (integer modulus, string concat of bigints, fixed templates). Both
# engines therefore reconstruct byte-identical event logs independently, and
# the driver can hash-compare the engine's REPLAYED final table state —
# dedup, validation split, routing multicast, tombstones, text extraction
# and additive schema evolution all under the hard oracle gate.
# --------------------------------------------------------------------------

# content_type -> destination table, in lsn%4 derivation order
PORTABLE_ROUTES = [
    ("text/html", "web_pages"),
    ("application/pdf", "web_pages_pdf"),
    ("text/plain", "web_pages_plain"),
    ("application/json", "web_pages_json"),
]


def derive_change_events_from_events(ev: DataFrame) -> DataFrame:
    """events(event_id, ts, user_id, event_type) -> CDC change-event stream.

    Every derivation rule is mirrored verbatim in the DuckDB oracle of the
    `cdc_replay_from_events` registry query (plans/queries.py) — keep the two
    in lockstep:
      lsn        = event_id                      (unique log sequence)
      url        = keyed by user_id              (LWW key; ~N events/url)
      op         = D if lsn%37=0, I if lsn%11=0, else U
      dup        = rows with lsn%53=0 re-delivered verbatim (at-least-once)
      dead       = lsn%43=0 empty meta; lsn%41=0 missing data_stream_id
      unrouted   = lsn%29=0 octet-stream (no route), =1 xml (invalid route)
      charset    = present for epochs>=2 (additive schema evolution)
      html       = fixed ASCII template (comment+script+entity) so the
                   extracted text is a closed-form string both engines know
    """
    lsn = F.col("event_id")
    uid = F.col("user_id")
    op = (
        F.when(lsn % 37 == 0, F.lit("D"))
        .when(lsn % 11 == 0, F.lit("I"))
        .otherwise(F.lit("U"))
    )
    content_type = (
        F.when(lsn % 29 == 0, F.lit(UNROUTED_CONTENT_TYPE))
        .when(lsn % 29 == 1, F.lit(INVALID_ROUTE_CONTENT_TYPE))
        .otherwise(
            F.element_at(
                F.array(*[F.lit(ct) for ct, _ in PORTABLE_ROUTES]),
                (lsn % 4 + 1).cast("int"),
            )
        )
    )
    url = F.concat(
        F.lit("https://site-"),
        (uid % 97).cast("string"),
        F.lit(".example/p/"),
        uid.cast("string"),
    )
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]), (lsn % 5 + 1).cast("int")
    )
    body = F.concat(
        F.lit("<html><!-- cdc fixture --><head><title>T</title>"
              "<script>var x=1;</script></head><body><h1>P "),
        uid.cast("string"),
        F.lit("</h1><p>rev "),
        lsn.cast("string"),
        F.lit(" &amp; type "),
        F.col("event_type"),
        F.lit("</p></body></html>"),
    )
    html = F.when(op == F.lit("D"), F.lit(None).cast("binary")).otherwise(
        F.encode(body, "UTF-8")
    )
    base_meta = F.create_map(
        F.lit("data_stream_id"),
        F.concat(F.lit("stream-"), (uid % 4).cast("string")),
        F.lit("data_stream_route"),
        F.concat(F.lit("route-"), (uid % 3).cast("string")),
    )
    charset_meta = F.map_concat(
        base_meta,
        F.create_map(
            F.lit("charset"),
            F.when(uid % 2 == 0, F.lit("utf-8")).otherwise(F.lit("latin-1")),
        ),
    )
    missing_id_meta = F.create_map(
        F.lit("data_stream_route"),
        F.concat(F.lit("route-"), (uid % 3).cast("string")),
    )
    meta = (
        F.when(lsn % 43 == 0, F.create_map().cast("map<string,string>"))
        .when(lsn % 41 == 0, missing_id_meta)
        .otherwise(F.when(lsn % 4 >= 2, charset_meta).otherwise(base_meta))
    )
    base = ev.filter(F.col("ts").isNotNull()).select(
        lsn.alias("lsn"),
        op.alias("op"),
        url.alias("url"),
        F.col("ts").alias("warc_ts"),
        html.alias("html"),
        lang.alias("lang"),
        content_type.alias("content_type"),
        meta.alias("meta"),
        (lsn % 4).cast("int").alias("epoch_hint"),
    )
    dups = base.filter(F.col("lsn") % 53 == 0)
    return base.unionAll(dups)


def derive_patch_events_from_events(ev: DataFrame) -> DataFrame:
    """events(event_id, ts, user_id, value) -> SPARSE-update CDC stream.

    The partial-column-image twin of ``derive_change_events_from_events``:
    'U' rows carry only the columns that changed (NULL = unchanged), the
    shape a MySQL ``binlog_row_image=MINIMAL`` / Debezium-filtered tail
    produces. Every rule is mirrored verbatim in the DuckDB oracle of the
    `cdc_patch_resolve` registry query (plans/queries.py) — keep in
    lockstep:
      lsn   = event_id                          (unique log sequence)
      url   = keyed by user_id                  (same key space as CDC)
      op    = D if lsn%37=0, I if lsn%11=0, else U
      title = always on I ('T'||lsn); on U only when lsn%3=0
      lang  = always on I (LANGS[lsn%5]); on U only when lsn%7=0
      score = always on I (value);        on U only when lsn%2=0
      dup   = rows with lsn%53=0 re-delivered verbatim (at-least-once)
    """
    lsn = F.col("event_id")
    uid = F.col("user_id")
    op = (
        F.when(lsn % 37 == 0, F.lit("D"))
        .when(lsn % 11 == 0, F.lit("I"))
        .otherwise(F.lit("U"))
    )
    url = F.concat(
        F.lit("https://site-"),
        (uid % 97).cast("string"),
        F.lit(".example/p/"),
        uid.cast("string"),
    )
    title_val = F.concat(F.lit("T"), lsn.cast("string"))
    lang_val = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]), (lsn % 5 + 1).cast("int")
    )
    score_val = F.coalesce(F.col("value"), F.lit(0.0))
    is_i, is_u = op == F.lit("I"), op == F.lit("U")
    base = ev.filter(F.col("ts").isNotNull()).select(
        lsn.alias("lsn"),
        op.alias("op"),
        url.alias("url"),
        F.col("ts").alias("warc_ts"),
        F.when(is_i | (is_u & (lsn % 3 == 0)), title_val).alias("title"),
        F.when(is_i | (is_u & (lsn % 7 == 0)), lang_val).alias("lang"),
        F.when(is_i | (is_u & (lsn % 2 == 0)), score_val).alias("score"),
    )
    dups = base.filter(F.col("lsn") % 53 == 0)
    return base.unionAll(dups)

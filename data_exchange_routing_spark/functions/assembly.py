"""Training-batch assembly operators: deterministic global shuffle order and
concatenated-stream sequence packing.

The last mile of a web-scale training-data pipeline: after dedup/curation the
corpus must be (a) shuffled into a reproducible global order and (b) packed
into fixed-length token sequences (GPT-style: concatenate documents in order,
crop the stream into max_tokens windows). Both need a GLOBAL total order and a
GLOBAL prefix sum — the naive Spark spelling, a window with ``orderBy`` and no
``partitionBy``, collapses to a single partition and dies at scale.

Scale design — deterministic two-pass prefix sum:
  1. Every row gets a data-independent range bucket from its md5 hash fraction
     (``bucket = floor(frac * n_buckets)``) — hash order IS the shuffle order,
     so bucketing by hash prefix is range partitioning with *constant* bounds:
     no sampling pass, no skew (md5 is uniform), identical on any cluster size.
  2. ONE shuffle on bucket; per-bucket window computes within-bucket rank and
     running token sum in parallel.
  3. Per-bucket totals (n_buckets tiny rows) get an exclusive prefix via a
     driver-size window, broadcast-joined back — global = offset + within.

Total order is (bucket, frac, id) == (frac, id) since bucket is monotone in
frac — so results are bit-identical to a single-partition sort at any
parallelism, which is exactly what the DuckDB oracles check.

Determinism contract matches functions/sampling.py: order derives from md5 of
row identity, never rand() — same corpus order under retries, replays, and 1
vs 1000 executors (reference keys idempotency off content identity the same
way, RouteIngestedFile.kt:543-545).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_exchange_routing_spark.functions.sampling import _hash_frac

DEFAULT_BUCKETS = 256


def _with_order(
    df: DataFrame, id_col: str, salt: str, n_buckets: int
) -> tuple[DataFrame, Window]:
    """Attach the deterministic shuffle key (_frac) and its range bucket;
    return the per-bucket window ordered by the global total order."""
    frac = _hash_frac(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    out = df.withColumn("_frac", frac).withColumn(
        "_bucket",
        F.least(F.floor(F.col("_frac") * n_buckets), F.lit(n_buckets - 1)).cast("int"),
    )
    w = Window.partitionBy("_bucket").orderBy(F.col("_frac").asc(), F.col(id_col).asc())
    return out, w


def _bucket_offsets(bucketed: DataFrame, sum_col: str | None) -> DataFrame:
    """Exclusive prefix totals per bucket. The aggregate is n_buckets rows —
    driver-sized — so the unpartitioned window here is control-plane work,
    never corpus work; the result broadcasts back."""
    aggs = [F.count(F.lit(1)).alias("_bkt_rows")]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).alias("_bkt_sum"))
    totals = bucketed.groupBy("_bucket").agg(*aggs)
    wo = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    off = totals.select(
        "_bucket",
        F.coalesce(F.sum("_bkt_rows").over(wo), F.lit(0)).alias("_row_offset"),
        *(
            [F.coalesce(F.sum("_bkt_sum").over(wo), F.lit(0)).alias("_sum_offset")]
            if sum_col is not None
            else []
        ),
    )
    return F.broadcast(off)


def global_index(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuffle",
    n_buckets: int = DEFAULT_BUCKETS,
    out_col: str = "global_rank",
) -> DataFrame:
    """Deterministic global shuffle: a contiguous 0-based rank over the whole
    corpus in md5-hash order. Reproducible epoch shuffles for training
    dataloaders — change ``salt`` per epoch, get a new but replayable
    permutation. One corpus shuffle (by hash bucket) + a broadcast of
    n_buckets offsets; no single-partition sort anywhere.
    """
    bucketed, w = _with_order(df, id_col, salt, n_buckets)
    ranked = bucketed.withColumn("_rn", F.row_number().over(w))
    off = _bucket_offsets(bucketed, sum_col=None)
    return (
        ranked.join(off, "_bucket")
        .withColumn(out_col, (F.col("_row_offset") + F.col("_rn") - 1).cast("bigint"))
        .drop("_frac", "_bucket", "_rn", "_row_offset")
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    len_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "shuffle",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Concatenated-stream sequence packing: documents are laid out in the
    deterministic hash-shuffle order and the token stream is cropped into
    fixed ``max_tokens`` windows (the standard LLM-pretraining packing — docs
    may straddle a crop boundary; the loader splits them).

    Adds per doc: ``start_offset`` (global token offset of the doc's first
    token), ``seq_id`` (crop containing that first token), ``seq_pos``
    (offset within that crop), ``end_seq_id`` (crop containing the last
    token), ``straddles`` (true when the doc spans a crop boundary).
    Empty docs (len 0) take zero stream space; their seq fields mark the
    insertion point. Same two-pass prefix-sum shape as global_index — one
    corpus shuffle, broadcast offsets.
    """
    bucketed, w = _with_order(df, id_col, salt, n_buckets)
    cum = bucketed.withColumn(
        "_cum_excl",
        F.coalesce(
            F.sum(len_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    off = _bucket_offsets(bucketed, sum_col=len_col)
    start = (F.col("_sum_offset") + F.col("_cum_excl")).cast("bigint")
    last = start + F.greatest(F.col(len_col).cast("bigint") - 1, F.lit(0))
    return (
        cum.join(off, "_bucket")
        .withColumn("start_offset", start)
        .withColumn("seq_id", (F.col("start_offset") / max_tokens).cast("bigint"))
        .withColumn("seq_pos", (F.col("start_offset") % max_tokens).cast("bigint"))
        .withColumn("end_seq_id", (last / max_tokens).cast("bigint"))
        .withColumn("straddles", F.col("end_seq_id") > F.col("seq_id"))
        .drop("_frac", "_bucket", "_cum_excl", "_row_offset", "_sum_offset")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Sliding token-window chunking: each document becomes
    ceil(max(n - overlap, 1) / (chunk_tokens - overlap)) chunks of up to
    ``chunk_tokens`` normalized word tokens, consecutive chunks sharing
    ``overlap`` tokens — the standard context-window preprocessing step
    before packing/embedding. Output: (doc_id, chunk_id, chunk_text,
    n_tokens); empty-after-normalization docs yield no chunks.

    One narrow projection + posexplode — no shuffle, no UDF; at 100 TB the
    op runs at scan speed and composes with pack_sequences/global_index
    downstream."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    from data_exchange_routing_spark.functions.textstats import normalize_text

    step = chunk_tokens - overlap
    t = (
        df.select(F.col(id_col).alias("doc_id"), normalize_text(F.col(text_col)).alias("_nm"))
        .filter(F.col("_nm") != "")
        .select("doc_id", F.split(F.col("_nm"), " ").alias("_toks"))
        .withColumn("_n", F.size("_toks"))
    )
    # last start = 1 + (n_chunks-1)*step with n_chunks per the docstring
    # formula: a naive sequence(1, n, step) would emit a degenerate tail
    # chunk wholly contained in the previous one whenever the tail length
    # <= overlap (duplicate text downstream)
    n_chunks = F.lit(1) + F.greatest(
        F.lit(0), F.ceil((F.col("_n") - F.lit(chunk_tokens)) / F.lit(step))
    )
    starts = F.sequence(F.lit(1).cast("long"), F.lit(1) + (n_chunks - 1) * step, F.lit(step).cast("long"))
    return t.select(
        "doc_id", "_toks", "_n", F.posexplode(starts).alias("_i", "_start")
    ).select(
        "doc_id",
        F.col("_i").cast("long").alias("chunk_id"),
        F.concat_ws(" ", F.slice(F.col("_toks"), F.col("_start"), chunk_tokens)).alias("chunk_text"),
        F.least(F.lit(chunk_tokens), F.col("_n") - F.col("_start") + 1).cast("long").alias("n_tokens"),
    )


def negative_pairs(
    df: DataFrame,
    n_total: int,
    k: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic uniform negative sampling for contrastive training:
    each anchor gets k distinct partners at md5-derived offsets
    1 + md5("<id>:<j>") % (n_total-1) around the contiguous id ring —
    never itself, reproducible across re-runs and cluster sizes (no rand()).

    Precondition: ``id_col`` contiguous in [0, n_total) — compose with
    ``global_index`` first for arbitrary id spaces.

    Scale shape: partner ids are a map-side posexplode projection; the only
    exchange is the partner equi-join back to the corpus (bucketable /
    AQE-planned). Output: (anchor_id, neg_id, pair_rank).
    """
    from data_exchange_routing_spark.functions.textstats import md5_int32

    offs = F.array(
        *[
            (
                F.lit(1)
                + md5_int32(F.concat(F.col(id_col).cast("string"), F.lit(f":{j}")))
                % (n_total - 1)
            )
            for j in range(k)
        ]
    )
    pairs = df.select(
        F.col(id_col).alias("anchor_id"),
        F.posexplode(offs).alias("pair_rank", "_off"),
    ).select(
        "anchor_id",
        ((F.col("anchor_id") + F.col("_off")) % n_total).alias("neg_id"),
        (F.col("pair_rank") + 1).cast("int").alias("pair_rank"),
    )
    # join back to the corpus so callers get real partner rows, and the
    # pairing survives even if some ids were filtered upstream
    return pairs.join(
        df.select(F.col(id_col).alias("neg_id")), "neg_id", "left_semi"
    ).select("anchor_id", "neg_id", "pair_rank")


def export_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shuffle",
) -> dict:
    """Final-mile training-data export: the corpus in a deterministic
    epoch-shuffle order, written as ``n_shards`` balanced parquet shards
    plus a driver-side manifest (rows/bytes per shard from parquet footers,
    no extra scan).

    Shard assignment is ``global_rank % n_shards`` — round-robin over the
    deterministic permutation, so shard sizes differ by at most one row and
    every shard is itself an unbiased sample in replayable order (change
    ``salt`` per epoch for a fresh permutation). ONE corpus shuffle (the
    rank's bucket exchange) + one write; shard files are
    ``shard=<k>/part-*.parquet`` with rows ordered by rank WITHIN each
    shard, so a dataloader reading shard k sequentially sees the global
    order's k-th residue class.
    """
    import glob
    import json as _json
    import os

    import pyarrow.parquet as _pq

    ranked = global_index(df, id_col=id_col, salt=salt)
    shard = (F.col("global_rank") % n_shards).cast("int").alias("shard")
    out = (
        ranked.withColumn("shard", shard)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "global_rank")
    )
    out.write.mode("error").partitionBy("shard").parquet(out_dir)
    manifest = {}
    for k in range(n_shards):
        files = sorted(glob.glob(os.path.join(out_dir, f"shard={k}", "*.parquet")))
        rows = sum(_pq.read_metadata(p).num_rows for p in files)
        manifest[k] = {
            "files": [os.path.relpath(p, out_dir) for p in files],
            "rows": rows,
            "bytes": sum(os.path.getsize(p) for p in files),
        }
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        _json.dump({"n_shards": n_shards, "salt": salt, "shards": manifest}, f)
    return manifest

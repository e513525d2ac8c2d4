"""Shuffle-bytes A/B: bucket_join (storage-partitioned join) vs the
equivalent DataFrame shuffle join on the same co-bucketed lake tables.

Bytes moved are a property of the physical plan, not the host window (same
argument as scripts/shuffle_audit.py). Reference result (2M x 1M rows,
local[8], tmpfs): shuffle join moves ~44 MB of exchange; bucket_join moves
exactly 0 and ran 1.45x faster even with no network in the loop — on a real
cluster the saving is the entire O(|L|+|R|) network exchange.

Usage: python scripts/spj_shuffle_ab.py /dev/shm/spjab [n_rows]
"""
import json
import sys
import time
import urllib.request

from pyspark.sql import functions as F, types as T

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from data_exchange_routing_spark.session import get_spark
from data_exchange_routing_spark.lake.table import LakeTable
from data_exchange_routing_spark.lake.spj import bucket_join

root = sys.argv[1]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
spark = get_spark("spj-bytes", cores=8, extra_conf={"spark.ui.enabled": "true"})


def stage_totals():
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages"))
    return sum(st.get("shuffleWriteBytes", 0) for st in stages)


ls = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("n", T.LongType()),
    T.StructField("pad", T.StringType()),
])
left = LakeTable.create(spark, root + "/l", ls, key="url", n_buckets=32)
left.merge_cdc(
    spark.range(n).select(
        F.concat(F.lit("https://h"), F.col("id") % 99991, F.lit("/p/"), F.col("id")).alias("url"),
        F.to_timestamp(F.lit("2024-01-01")).alias("warc_ts"),
        F.col("id").alias("n"),
        F.repeat(F.lit("x"), 64).alias("pad"),
    ).withColumn("_lsn", F.lit(1)).withColumn("_deleted", F.lit(False)),
    epoch_id=0,
)
rs = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("score", T.DoubleType()),
])
right = LakeTable.create(spark, root + "/r", rs, key="url", n_buckets=32)
right.merge_cdc(
    spark.range(0, n, 2).select(
        F.concat(F.lit("https://h"), F.col("id") % 99991, F.lit("/p/"), F.col("id")).alias("url"),
        F.to_timestamp(F.lit("2024-01-01")).alias("warc_ts"),
        (F.col("id") * 0.5).alias("score"),
    ).withColumn("_lsn", F.lit(1)).withColumn("_deleted", F.lit(False)),
    epoch_id=0,
)

for tag, fn in (
    ("shuffle_join", lambda: left.read().join(
        right.read().withColumnRenamed("warc_ts", "wtr"), "url"
    ).select("url", "n", "score")),
    ("bucket_join", lambda: bucket_join(left, right, columns=["n", "score"])),
):
    s0 = stage_totals()
    t0 = time.time()
    df = fn()
    cnt = df.count()
    dt = time.time() - t0
    mb = (stage_totals() - s0) / 1e6
    print(f"{tag}: shuffle {mb:.2f} MB, rows {cnt}, {dt:.2f}s")

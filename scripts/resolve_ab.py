"""Same-window A/B: broadcast resolve vs full-window resolve on a compacted
table with a tiny delta. Run via PYTHONPATH=/root/repo."""
import shutil, tempfile, time
from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.lake.table import DELETED_COL, LSN_COL, LakeTable
from data_exchange_routing_spark.schemas import WEB_PAGES
from data_exchange_routing_spark.session import get_spark

spark = get_spark("resolve-ab", cores=8, extra_conf={"spark.ui.enabled": "true"})
import json, urllib.request
def shuffle_bytes():
    app = spark.sparkContext.applicationId
    ui = spark.sparkContext.uiWebUrl
    data = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages"))
    return sum(st.get("shuffleWriteBytes", 0) for st in data)
d = tempfile.mkdtemp(prefix="resolve_ab_", dir="/dev/shm")
t = LakeTable.create(spark, d + "/t", WEB_PAGES, key="url", n_buckets=8)

# ~600k-row base from sf0.1 documents (text payloads ~KBs)
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
docs = docs.select("doc_id", "text", "lang", F.explode(F.sequence(F.lit(0), F.lit(99))).alias("rep"))
docs = docs.withColumn("doc_id", F.col("doc_id") * 100 + F.col("rep"))
base = docs.select(
    F.concat(F.lit("https://x.org/"), F.col("doc_id")).alias("url"),
    F.lit(datetime(2024, 1, 1)).alias("warc_ts"),
    F.encode(F.col("text"), "UTF-8").alias("html"),
    F.col("text"),
    F.col("lang"),
    F.col("doc_id").alias(LSN_COL),
    F.lit(False).alias(DELETED_COL),
)
t.merge_cdc(base, epoch_id=0)
t.compact()
rows = [(f"https://x.org/{i}", datetime(2030, 1, 1), b"<x>", "upd", "en", 10**9 + i, False) for i in range(50)]
schema = T.StructType(WEB_PAGES.fields + [T.StructField(LSN_COL, T.LongType()), T.StructField(DELETED_COL, T.BooleanType())])
t.merge_cdc(spark.createDataFrame(rows, schema), epoch_id=1)

def timed(label):
    runs = []
    b0 = shuffle_bytes()
    for _ in range(2):
        t0 = time.time()
        n = t.read().agg(F.count(F.lit(1)), F.sum(F.length("text"))).collect()[0][0]
        runs.append(time.time() - t0)
    db = (shuffle_bytes() - b0) / 2
    print(label, "rows:", n, "secs:", [round(x, 2) for x in sorted(runs)], "shuffleMB/run:", round(db/1e6, 2))
    return min(runs)

fasts, slows = [], []
default_max = LakeTable.RESOLVE_BROADCAST_MAX_DELTA_ROWS
for i in range(3):
    LakeTable.RESOLVE_BROADCAST_MAX_DELTA_ROWS = default_max
    fasts.append(timed(f"broadcast-resolve {i}"))
    LakeTable.RESOLVE_BROADCAST_MAX_DELTA_ROWS = -1
    slows.append(timed(f"full-window      {i}"))
print("BEST fast:", round(min(fasts), 2), "BEST slow:", round(min(slows), 2),
      "RATIO slow/fast:", round(min(slows) / min(fasts), 2))
shutil.rmtree(d, ignore_errors=True)

"""Inverted-index construction — the posting-list build behind any
corpus-scale keyword search / retrieval stage (BM25, boolean search,
contamination lookup tables).

The reference routes documents but never indexes them; this is part of the
engine's training-data-pipeline surface (SURVEY.md §6): a curated corpus is
typically shipped with a term index for retrieval-augmented filtering and
eval-set leakage scans.

Shape at 100 TB:
- (doc, token) term frequencies pre-aggregate MAP-SIDE before the first
  exchange (the explode never crosses the wire raw).
- per-token stats (document frequency, total tf) are a second
  map-side-combinable agg.
- the classic index-build skew hazard is stopword tokens whose posting
  lists span the whole corpus. A ``max_df_frac`` stop-list prunes those
  tokens BEFORE the per-token ranking window runs (df > frac·N never makes
  a useful search term), bounding every window partition; the corpus size N
  is one broadcast scalar.
- posting lists are emitted top-``k`` per token by (tf DESC, doc_id ASC) —
  deterministic, and bounded output per token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from data_exchange_routing_spark.functions.textstats import normalize_text

__all__ = ["inverted_index"]


def inverted_index(
    df: DataFrame,
    k: int = 3,
    max_df_frac: float = 0.5,
    min_df: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(token, df, total_tf, doc_id, tf, rk): per surviving token, its
    document frequency, corpus-wide term frequency, and the top-``k``
    postings ranked by within-doc tf (ties on ascending doc id)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    stats = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    kept = (
        stats.crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df") >= F.lit(min_df))
            & (F.col("df") <= F.lit(max_df_frac) * F.col("_n"))
        )
        .drop("_n")
    )
    w = Window.partitionBy("token").orderBy(F.col("tf").desc(), F.col("doc_id").asc())
    postings = (
        tf.join(kept.select("token"), "token")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )
    return postings.join(kept, "token").select(
        "token",
        "df",
        "total_tf",
        "doc_id",
        "tf",
        F.col("rk").cast("int").alias("rk"),
    )

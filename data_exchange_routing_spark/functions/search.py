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

__all__ = ["inverted_index", "bm25_topk"]


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


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 retrieval (Robertson & Walker 1994): top-``k`` documents
    for a bag-of-words ``query``, idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
    tf saturation k1 and length normalization b over the corpus-average
    document length. Ties break on ascending doc id. Returns
    (doc_id, score, rk).

    Shape at 100 TB: the query-term set is a Python-side constant folded
    into ONE isin() filter on the token explode — only matching (doc,
    term) pairs ever reach an exchange. Document lengths ride the same
    map-side pass; N/avgdl is one broadcast scalar row; per-term df is a
    |query|-row broadcast. The final top-k is TakeOrderedAndProject —
    never a global sort.
    """
    import re

    terms = sorted(
        {t for t in re.sub(r"[^a-z0-9 ]", " ", query.lower()).split() if t}
    )
    if not terms:
        raise ValueError("query has no indexable terms")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("token"),
    ).filter(F.col("token") != "")
    # per-doc length of ALL tokens (needed for normalization even when the
    # doc matches only one query term) — same explode, one map-side agg
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        toks.filter(F.col("token").isin(terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = df.agg(
        F.count(F.lit(1)).alias("n_docs")
    ).crossJoin(dl.agg(F.avg("dl").alias("avgdl")))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (F.lit(k1) + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 6).alias("score"))
    )
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rk", F.row_number().over(w).cast("int"))

"""Corpus curation operators: deterministic splits, stratified sampling,
repetition quality stats, and cross-document boilerplate detection.

These are the selection/quality half of a web-scale training-data pipeline
(the dedup half lives in functions/dedup_text.py): C4/Gopher/RefinedWeb-style
corpora are hash-split into train/validation, capped per language, filtered
on within-document repetition, and scrubbed of boilerplate n-grams that
appear across many pages. All four are pure DataFrame compositions — hash
and window work stays JVM-side; nothing leaves whole-stage codegen except
the documented higher-order-function projections.

Determinism contract: every sampling decision derives from md5 of stable row
identity (never rand()), so re-runs, retries, and different cluster sizes
produce the identical corpus — the same reason the reference keys idempotent
uploads off content identity (RouteIngestedFile.kt:543-545).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_exchange_routing_spark.functions.textstats import md5_int32, normalize_text, word_tokens

# fraction resolution: first 8 hex chars of md5 -> uniform in [0, 1)
_HASH_SPACE = float(1 << 32)


def _hash_frac(col) -> "F.Column":
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(_HASH_SPACE)


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by hashed identity.

    Unlike randomSplit, membership is a pure function of (id, salt): stable
    under retries, resumable replays, and any partitioning — a given doc_id
    lands in the same split on 1 executor or 1000. Weights are normalized;
    assignment picks the first cumulative bucket containing the hash
    fraction. Adds a ``split`` column; no shuffle at all.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    frac = _hash_frac(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    expr = None
    cum = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += w / total
        cond = frac < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(items[0][0]) if expr is None else expr.otherwise(F.lit(items[-1][0]))
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    quota: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-group cap: keep the ``quota`` docs with the smallest
    hash rank inside each group — the language-rebalancing primitive of
    multilingual corpus builds (hot languages down-sampled to a cap, rare
    languages kept whole).

    One shuffle on group_col. Per-group state is a heap of ``quota`` ranks,
    not the group's rows: Spark plans row_number over a group-sorted window,
    and with quota << group size the post-filter drops rows immediately.
    Group skew (one giant language) is bounded by the window sort, which
    spills; for quota in the millions switch to an approximate threshold on
    the hash fraction instead (quantile cut), which needs no window.
    """
    rank_key = _hash_frac(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    w = Window.partitionBy(group_col).orderBy(rank_key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= quota)
        .drop("_rk")
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Within-document repetition quality signals (the Gopher/RefinedWeb
    repetition rules): duplicate-word fraction and the fraction of all word
    n-grams taken by the single most frequent n-gram.

    Shape: tokens and n-grams are built per row with higher-order functions
    (no explode of the corpus), then ONE map-side-combined aggregation keyed
    (doc_id, gram) and a second tiny one keyed doc_id — both partial-agg
    friendly, so a hot document pre-reduces before the shuffle.
    """
    toked = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_toks"),
    )
    tk = F.col("_toks")
    # guard: sequence(1, 0) is DESCENDING [1, 0] in Spark, so a doc shorter
    # than n tokens must short-circuit to an empty gram array
    grams = F.when(F.size(tk) >= n, F.transform(
        F.sequence(F.lit(1), F.size(tk) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(tk, i, n)),
    )).otherwise(F.array().cast("array<string>"))
    base = toked.select(
        "doc_id",
        F.size(tk).alias("n_tokens"),
        F.size(F.array_distinct(tk)).alias("n_distinct_tokens"),
        F.explode(grams).alias("gram"),
    )
    per_gram = base.groupBy("doc_id", "n_tokens", "n_distinct_tokens", "gram").agg(
        F.count(F.lit(1)).alias("gram_n")
    )
    return per_gram.groupBy("doc_id", "n_tokens", "n_distinct_tokens").agg(
        F.sum("gram_n").alias("n_grams"),
        F.max("gram_n").alias("top_gram_n"),
    ).select(
        "doc_id",
        "n_tokens",
        F.round(
            1.0 - F.col("n_distinct_tokens") / F.col("n_tokens"), 4
        ).alias("dup_word_frac"),
        "n_grams",
        F.round(F.col("top_gram_n") / F.col("n_grams"), 4).alias("top_gram_frac"),
    )


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: for each corpus document, the number of
    distinct word ``n``-grams it shares with ANY benchmark document — the
    train/test-overlap scrub every LLM data pipeline runs before training
    (GPT-3 App. C / PaLM-style 13-gram rule; ``n`` is caller-tunable and the
    small-SF oracle pins n=5).

    Shape at 100 TB: the benchmark side is tiny relative to the corpus
    (eval suites are MBs), so its distinct shingle set is broadcast — the
    corpus never shuffles before the join; each corpus partition streams its
    shingles past the in-memory benchmark set and only the (doc_id, shingle)
    HITS reach the one count-distinct aggregation (distinct applied after
    the filter, so a repeated gram can't double-count but non-hits never
    shuffle at all).
    """
    from data_exchange_routing_spark.functions.dedup_text import shingles

    corpus_sh = shingles(corpus, id_col=id_col, text_col=text_col, n=n, distinct=False)
    bench_sh = (
        shingles(benchmark, id_col=id_col, text_col=text_col, n=n, distinct=False)
        .select("shingle")
        .distinct()
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("n_contaminated_grams"))
    )


def boilerplate_ngrams(
    df: DataFrame,
    min_docs: int = 3,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document boilerplate detection: word n-grams appearing in at
    least ``min_docs`` distinct documents (headers, footers, templates — the
    spans C4-style pipelines scrub). Set-semantics shingles per doc, then one
    map-side-combined count per shingle; output is tiny (only shared spans
    survive), so the shuffle carries counts, not the corpus.
    """
    from data_exchange_routing_spark.functions.dedup_text import shingles

    sh = shingles(df, id_col=id_col, text_col=text_col, n=n, distinct=True)
    return (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .filter(F.col("n_docs") >= min_docs)
    )


def mixing_weights(
    df: DataFrame,
    targets: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain-mixture reweighting (the Pile/DoReMi-style recipe): given
    target corpus proportions per domain, attach to every document its
    domain's up/down-sampling weight so a loader can hit the target mix.

    Per domain: ``corpus_share`` (observed), ``target_share`` (requested,
    renormalized over the domains present; absent domains get 0),
    ``weight`` = target_share / corpus_share, ``sample_prob`` = weight /
    max(weight) (kept <= 1: the most-upweighted domain is sampled at 1.0 and
    every other domain Bernoulli-thins relative to it), and ``n_repeats`` =
    ceil(weight) (epoch-repetition hint for upsampling loaders).

    Shape at 100 TB: ONE map-side-combined count keyed by domain (the only
    corpus-wide action), window math on the driver-sized domain table, then
    a broadcast join back — documents never shuffle.
    """
    from pyspark.sql import Window

    tot = sum(targets.values())
    norm = {k: v / tot for k, v in targets.items()}
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(k, float(v)) for k, v in norm.items()], f"{domain_col} string, _target double"
    )
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_n"))
    # domain table is driver-sized (#domains rows): unpartitioned windows
    # here are control-plane work, never corpus work
    w = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dom = (
        counts.join(tgt, domain_col, "left")
        .withColumn("_target", F.coalesce(F.col("_target"), F.lit(0.0)))
        .withColumn("corpus_share", F.col("_n") / F.sum("_n").over(w))
        .withColumn("weight", F.col("_target") / F.col("corpus_share"))
        .withColumn("sample_prob", F.col("weight") / F.max("weight").over(w))
        .select(
            domain_col,
            F.round("corpus_share", 6).alias("corpus_share"),
            F.round(F.col("_target"), 6).alias("target_share"),
            F.round("weight", 6).alias("weight"),
            F.round("sample_prob", 6).alias("sample_prob"),
            F.ceil("weight").cast("bigint").alias("n_repeats"),
        )
    )
    return df.select(F.col(id_col).alias("doc_id"), domain_col).join(
        F.broadcast(dom), domain_col
    )


def dsir_log_weights(
    df: DataFrame,
    target: DataFrame,
    m: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, public arXiv:2302.03169,
    "Data Selection for Language Models via Importance Resampling"): score
    every raw document by how target-like its hashed-unigram profile is.

    Features: normalized word tokens hashed into ``m`` buckets (md5, never
    rand()). Two Laplace-smoothed multinomials are fit over the buckets —
    p from the docs whose ids appear in ``target``, q from the whole corpus —
    and each doc scores  log w = sum_b n_b * (log p_b - log q_b).

    Scale shape: ONE map-side-combinable aggregation over the token explode
    fits BOTH distributions (per-bucket count + target-flagged count share a
    shuffle); the m-row log-ratio table is broadcast into the per-doc scoring
    join, and the per-doc (id, bucket) aggregation is the only other shuffle.
    The target set is small by construction (DSIR uses a held-out quality
    corpus), so its membership tag is a broadcast semi-join — the 10^10-row
    raw corpus is never shuffled except by the two hash aggregations.

    Returns (id_col, log_w) with log_w rounded to 4 decimals (keeps the
    cross-engine float contract: per-ulp ln() differences live far below).
    """
    toks = (
        df.select(F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .withColumn("bucket", md5_int32(F.col("w")) % m)
        .drop("w")
    )
    tagged = toks.join(
        F.broadcast(target.select(F.col(id_col)).distinct().withColumn("_t", F.lit(1))),
        id_col,
        "left",
    )
    dist = tagged.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("qc"),
        F.count("_t").alias("pc"),
    )
    # all m buckets participate in the smoothed distributions, including
    # never-hit ones (they still carry alpha mass in the denominators)
    full = (
        df.sparkSession.range(m)
        .select(F.col("id").alias("bucket"))
        .join(dist, "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("qc"), F.lit(0)).alias("qc"),
            F.coalesce(F.col("pc"), F.lit(0)).alias("pc"),
        )
    )
    totals = full.agg(F.sum("qc").alias("qt"), F.sum("pc").alias("pt"))
    lr = full.crossJoin(totals).select(
        "bucket",
        (
            F.log((F.col("pc") + alpha) / (F.col("pt") + alpha * m))
            - F.log((F.col("qc") + alpha) / (F.col("qt") + alpha * m))
        ).alias("lr"),
    )
    doc_b = toks.groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("n"))
    return (
        doc_b.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(F.round(F.sum(F.col("n") * F.col("lr")), 4).alias("log_w"))
    )


def dsir_select_topk(
    df: DataFrame,
    target: DataFrame,
    k: int = 100,
    m: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic DSIR selection: the k most target-like docs (the paper
    resamples with Gumbel noise; a pinned-seed rank is the reproducible
    variant — same spirit, exactly replayable). Ties break on id."""
    w = dsir_log_weights(df, target, m=m, id_col=id_col, text_col=text_col)
    return w.orderBy(F.desc("log_w"), F.asc(id_col)).limit(k)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis 2006, public): each row draws u in (0,1) and ranks by
    u^(1/weight); the top-k ranks ARE a weight-proportional sample. The
    draw is md5(id)-derived — not rand() — so the sample is identical
    across re-runs, retries, and cluster sizes (the property a resumable
    CDC pipeline needs). Ranking uses the equivalent ln(u)/weight form
    (monotone transform; avoids pow() precision skew), rounded to 6dp with
    an id tie-break so the top-k cut is cross-engine deterministic.

    Precondition: weights strictly positive (zero/negative weights make
    ln(u)/w meaningless — same requirement as the paper).

    Scale shape: one map-side projection + a top-k (TakeOrderedAndProject —
    per-partition heaps, no global sort)."""
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("double")
        + F.lit(1.0)
    ) / F.lit(_HASH_SPACE + 1.0)
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 6)
    return (
        df.select(F.col(id_col), F.col(weight_col), key.alias("sample_key"))
        .orderBy(F.desc("sample_key"), F.asc(id_col))
        .limit(k)
    )


def weighted_sample_per_group(
    df: DataFrame,
    weight_col: str,
    k: int,
    by: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group Efraimidis-Spirakis sampling: the top-k weight-proportional
    rows WITHIN each group — the balanced-dataset construction primitive
    (k quality-weighted docs per language/domain). Same deterministic
    md5-derived draw and 6dp+id tie-break as ``weighted_sample``; the group
    cut is one window (partition = group) instead of a global top-k, so the
    shuffle is keyed by group and each partition heap-sorts only its group's
    rows. Weights must be strictly positive."""
    from pyspark.sql import Window as W

    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("double")
        + F.lit(1.0)
    ) / F.lit(_HASH_SPACE + 1.0)
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 6)
    w = W.partitionBy(*by).orderBy(F.desc("sample_key"), F.asc(id_col))
    return (
        df.select(*by, F.col(id_col), F.col(weight_col), key.alias("sample_key"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(*by, id_col, weight_col, "sample_key", F.col("rk").cast("int").alias("rk"))
    )


def per_domain_cap(
    df,
    blocklist,
    quota: int = 5,
    host_col: str = "host",
    key_col: str = "url",
    order_col: str = "last_ts",
):
    """Crawl-politeness / anti-SEO-farm corpus curation (the RefinedWeb /
    C4 per-domain cap + UT1-style blocklist stage): drop every row whose
    host appears in ``blocklist``, then keep at most ``quota`` keys per
    surviving host, ranked by ``order_col`` DESC (freshest first), ties on
    ascending ``key_col``.

    Shape at 100 TB: the blocklist is a broadcast ANTI join (dimension-size
    by construction — curated blocklists are thousands of hosts, never
    corpus-scale); the quota is one window per host. Mega-hosts are the
    skew hazard, but the cap itself bounds the useful output per partition
    and AQE splits oversized ones. Returns (host, key, order, rk).
    """
    from pyspark.sql import Window

    kept = df.join(
        F.broadcast(blocklist.select(F.col(host_col).alias("_bad_host"))),
        F.col(host_col) == F.col("_bad_host"),
        "left_anti",
    )
    w = Window.partitionBy(host_col).orderBy(
        F.col(order_col).desc(), F.col(key_col).asc()
    )
    return (
        kept.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= quota)
        .select(host_col, key_col, order_col, F.col("rk").cast("int").alias("rk"))
    )

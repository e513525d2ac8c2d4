"""Text analysis for large-scale training-data pipelines: language-ID,
quality scoring, token counting, document fingerprinting.

Everything here is a *Column builder* over built-in pyspark.sql.functions —
JVM-side, whole-stage-codegen'd, zero Python in the hot path — and each
builder has an exact ANSI-SQL twin used as the DuckDB oracle (plans/queries.py),
so correctness is cross-checked value-by-value.

Hashing contract shared with the oracle: md5 hex (both engines agree), with
`md5_int32` = first 8 hex digits as an unsigned 32-bit integer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "se"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une"],
    "de": ["der", "die", "und", "das", "ist", "von", "den", "ein"],
}
EN_STOPWORDS = STOPWORDS["en"]


def md5_int32(col: Column) -> Column:
    """First 32 bits of md5 as an unsigned int (DuckDB:
    ('0x'||substr(md5(x),1,8))::bigint)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def normalize_text(col: Column) -> Column:
    """Pinned normalization: lowercase, non-alphanumeric -> space, collapse."""
    c = F.lower(col)
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def word_tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(normalize_text(col), " ")


def whitespace_token_count(col: Column) -> Column:
    return F.size(F.split(F.trim(col), "\\s+"))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-approximate token count: alphanumeric runs + each punctuation mark
    counts once (regexp-only; a real tokenizer would be a pandas UDF)."""
    runs = F.size(F.split(F.trim(col), "[^A-Za-z0-9]+")) - F.when(
        F.trim(col).rlike("^[^A-Za-z0-9]"), 0
    ).otherwise(0)
    punct = F.length(F.regexp_replace(col, "[A-Za-z0-9\\s]", ""))
    return runs + punct


def char_len(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    """Punctuation chars / total chars (0 when empty)."""
    p = F.length(F.regexp_replace(col, "[A-Za-z0-9\\s]", ""))
    return F.when(F.length(col) > 0, p.cast("double") / F.length(col)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    """Distinct stopwords hit / number of tokens."""
    toks = word_tokens(col)
    hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def mean_word_len(col: Column) -> Column:
    toks = word_tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length sweet spot, low punctuation,
    plausible mean word length. Deterministic; weights pinned."""
    n = F.length(col)
    len_score = F.when(n >= 200, F.lit(1.0)).otherwise(n.cast("double") / 200.0)
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 5.0)
    mwl = mean_word_len(col)
    word_score = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(len_score * 0.4 + punct_score * 0.3 + word_score * 0.3, 4)


def lang_id(col: Column) -> Column:
    """Stopword-hit argmax over {en,es,fr,de}; 'zz' when no hits. Deterministic
    tie-break in fixed language order (SURVEY §2.10 scalar-function slot)."""
    toks = word_tokens(col)
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws])))
        for lang, ws in STOPWORDS.items()
    }
    s = scores
    return (
        F.when((s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["de"]) & (s["en"] > 0), F.lit("en"))
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["de"]) & (s["es"] > 0), F.lit("es"))
        .when((s["fr"] >= s["de"]) & (s["fr"] > 0), F.lit("fr"))
        .when(s["de"] > 0, F.lit("de"))
        .otherwise(F.lit("zz"))
    )


GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL = 3.0
GOPHER_MAX_MWL = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
# Gopher's canonical floor is 2 distinct required stopwords; the default here
# is 1 because the synthetic corpus tops out at 1 (the floor is a parameter of
# passes_gopher, so production callers pass 2).
GOPHER_MIN_STOP_HITS = 1


def _count_occurrences(col: Column, needle: str) -> Column:
    """Occurrences of a literal substring (no regex), via replace-length."""
    return (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / len(needle)


def n_words(col: Column) -> Column:
    """Word count of the normalized text (same tokenization as word_tokens)."""
    return F.size(word_tokens(col))


def symbol_word_ratio(col: Column) -> Column:
    """Gopher rule: ('#' count + '...' count) / word count (0 when no words)."""
    sym = _count_occurrences(col, "#") + _count_occurrences(col, "...")
    nw = n_words(col)
    return F.when(nw > 0, F.round(sym.cast("double") / nw, 4)).otherwise(F.lit(0.0))


def bullet_line_frac(col: Column) -> Column:
    """Fraction of lines whose trimmed form starts with a bullet marker."""
    lines = F.split(col, "\n")
    hits = F.size(F.filter(lines, lambda x: F.trim(x).rlike("^[-*•]")))
    return F.round(hits.cast("double") / F.size(lines), 4)


def ellipsis_line_frac(col: Column) -> Column:
    """Fraction of lines whose trimmed form ends with an ellipsis."""
    lines = F.split(col, "\n")
    hits = F.size(F.filter(lines, lambda x: F.trim(x).rlike("(\\.\\.\\.|…)$")))
    return F.round(hits.cast("double") / F.size(lines), 4)


def alpha_word_frac(col: Column) -> Column:
    """Fraction of words containing at least one alphabetic character."""
    toks = word_tokens(col)
    hits = F.size(F.filter(toks, lambda w: w.rlike("[a-z]")))
    return F.when(F.size(toks) > 0, F.round(hits.cast("double") / F.size(toks), 4)).otherwise(
        F.lit(0.0)
    )


def stopword_hits(col: Column, lang: str = "en") -> Column:
    """Distinct required stopwords present (Gopher uses >= 2 of a small list)."""
    return F.size(
        F.array_intersect(word_tokens(col), F.array(*[F.lit(w) for w in STOPWORDS[lang]]))
    )


def passes_gopher(col: Column, min_words: int = GOPHER_MIN_WORDS, min_stop_hits: int = GOPHER_MIN_STOP_HITS) -> Column:
    """The Gopher quality-rule conjunction (Rae et al. 2021, public paper):
    word-count bounds, mean-word-length bounds, symbol-to-word ratio,
    bullet/ellipsis line fractions, alphabetic-word fraction, stopword floor.
    Pure JVM expressions — one codegen'd pass, no UDF."""
    nw = n_words(col)
    mwl = mean_word_len(col)
    return (
        (nw >= min_words)
        & (nw <= GOPHER_MAX_WORDS)
        & (mwl >= GOPHER_MIN_MWL)
        & (mwl <= GOPHER_MAX_MWL)
        & (symbol_word_ratio(col) <= GOPHER_MAX_SYMBOL_RATIO)
        & (bullet_line_frac(col) <= GOPHER_MAX_BULLET_FRAC)
        & (ellipsis_line_frac(col) <= GOPHER_MAX_ELLIPSIS_FRAC)
        & (alpha_word_frac(col) >= GOPHER_MIN_ALPHA_FRAC)
        & (stopword_hits(col) >= min_stop_hits)
    )


def doc_fingerprint(col: Column) -> Column:
    """16-hex-digit content fingerprint of the normalized text (md5-based;
    the rolling-hash variant lives in the pandas-UDF module)."""
    return F.substring(F.md5(normalize_text(col)), 1, 16)


def lm_perplexity(df, id_col: str = "doc_id", text_col: str = "text"):
    """CCNet-style LM quality scoring (Wenzek et al. 2020, public paper): a
    Laplace-smoothed bigram language model trained on the corpus itself
    scores every document by mean token log-probability; high perplexity
    flags boilerplate/gibberish for the quality buckets CCNet shards by.

    P(cur | prev) = (c(prev,cur) + 1) / (c(prev) + V), with c(.) corpus
    occurrence counts and V the unigram vocabulary size.

    Returns (doc_id, n_bigrams, avg_logp, ppl) — ppl = exp(-avg_logp).

    Shape at 100 TB: per-doc bigram multiplicities pre-aggregate BEFORE the
    model joins (map-side combinable, shrinks join input to distinct
    (doc,prev,cur)); bigram/unigram count joins are shuffle joins AQE
    skew-splits on stopword-hot keys; V broadcasts as a 1-row dimension.
    Two gram-shuffle passes total — the same exchange shape the span-dedup
    and MinHash paths already amortize.
    """
    from pyspark.sql import DataFrame as _DF  # noqa: F401

    toked = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_toks"),
    )
    tk = F.col("_toks")
    toks = toked.select(
        "doc_id", F.explode(tk).alias("token")
    ).filter(F.col("token") != "")
    uni = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c_uni"))
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    pairs = F.when(
        (F.size(tk) >= 2) & (F.element_at(tk, 1) != ""),
        F.transform(
            F.sequence(F.lit(0), F.size(tk) - 2),
            lambda i: F.struct(
                F.get(tk, i).alias("prev"), F.get(tk, i + 1).alias("cur")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    occ = (
        toked.select("doc_id", F.explode(pairs).alias("b"))
        .select("doc_id", "b.prev", "b.cur")
        .groupBy("doc_id", "prev", "cur")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bic = occ.groupBy("prev", "cur").agg(F.sum("cnt").alias("c_bi"))
    scored = (
        occ.join(bic, ["prev", "cur"])
        .join(uni.withColumnRenamed("token", "prev"), "prev")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "logp",
            F.log((F.col("c_bi") + F.lit(1.0)) / (F.col("c_uni") + F.col("v"))),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_bigrams"),
        (F.sum(F.col("cnt") * F.col("logp")) / F.sum("cnt")).alias("avg_logp"),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.round(F.coalesce(F.col("avg_logp"), F.lit(0.0)), 6).alias("avg_logp"),
            F.round(F.exp(-F.coalesce(F.col("avg_logp"), F.lit(0.0))), 3).alias("ppl"),
        )
    )


def nb_classify(
    df,
    label_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    split_salt: str = ":nb",
):
    """Trainable document classifier: multinomial Naive Bayes over token
    counts with Laplace smoothing — the linear-classifier stage of a
    CCNet/fastText-style curation pipeline (Wenzek et al. 2020 pair a corpus
    LM with a supervised quality classifier; Joulin et al. 2017 fastText is
    the usual choice), expressed entirely as count aggregations so training
    and scoring are exact, deterministic DataFrame ops.

    Split is deterministic by HASHED identity (first md5 hex digit of
    doc_id + salt < '4' -> the 25% test fold; never a modulus, which can
    alias with label assignment, and never rand()): hash membership is
    identical under retries, replays, and any cluster size. For each class c:
    log P(c | doc) ∝ ln(n_docs_c / n_docs) + Σ_tok m_tok · ln((c(tok,c)+1) /
    (tot_c + V)), with V the training vocabulary size. Out-of-vocabulary
    test tokens are dropped (they carry no class signal under this
    smoothing); a test doc with no in-vocab tokens falls back to the prior
    argmax. Ties break on ascending class label in both engines.

    Returns (doc_id, actual, pred, score) for the held-out docs; score is
    the winning class's log-posterior rounded to 4 decimals (sum-order
    float noise lives far below that).

    Shape at 100 TB: (token,class) counts and per-doc test multiplicities
    both pre-aggregate map-side before their single exchange; priors /
    class totals / V are tiny broadcast dimensions; the likelihood table is
    V x C rows joined to test tokens on token (AQE skew-splits stopword-hot
    tokens); the per-(doc,class) score sum is one more map-side-combinable
    agg, and argmax is a C-row-per-doc window. No Python anywhere.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).alias("label"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_toks"),
    )
    is_test = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(split_salt))), 1, 1
    ).isin("0", "1", "2", "3")
    toks = base.select(
        "doc_id", "label", F.explode("_toks").alias("token"), is_test.alias("is_test")
    ).filter(F.col("token") != "")

    # --- train: priors (doc counts include token-less docs), token counts
    train_docs = base.filter(~is_test)
    priors = train_docs.groupBy("label").agg(F.count(F.lit(1)).alias("n_docs"))
    n_total = train_docs.agg(F.count(F.lit(1)).alias("n_all"))
    priors = priors.crossJoin(F.broadcast(n_total)).select(
        "label", F.log(F.col("n_docs") / F.col("n_all")).alias("prior_logp")
    )
    cnt = (
        toks.filter(~F.col("is_test"))
        .groupBy("label", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cnt.groupBy("label").agg(F.sum("c").alias("tot"))
    vocab = cnt.select("token").distinct()
    vsize = vocab.agg(F.count(F.lit(1)).alias("v"))
    likelihood = (
        vocab.crossJoin(F.broadcast(tot))
        .join(cnt, ["label", "token"], "left")
        .crossJoin(F.broadcast(vsize))
        .select(
            "token",
            "label",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
                / (F.col("tot") + F.col("v"))
            ).alias("tok_logp"),
        )
    )

    # --- score held-out docs
    test_m = (
        toks.filter(F.col("is_test"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    scores = (
        test_m.join(likelihood, "token")
        .groupBy("doc_id", "label")
        .agg(F.sum(F.col("m") * F.col("tok_logp")).alias("tok_sum"))
        .join(F.broadcast(priors), "label")
        .select("doc_id", "label", (F.col("prior_logp") + F.col("tok_sum")).alias("score"))
    )
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("label").asc())
    )
    pred = scores.withColumn("_rn", rn).filter(F.col("_rn") == 1).select(
        "doc_id", F.col("label").alias("pred"), "score"
    )
    # prior-only fallback for docs with zero in-vocab tokens
    prior_row = priors.orderBy(F.col("prior_logp").desc(), F.col("label").asc()).limit(1)
    fb = prior_row.select(
        F.col("label").alias("_fb_pred"), F.col("prior_logp").alias("_fb_score")
    )
    return (
        base.filter(is_test)
        .select("doc_id", F.col("label").alias("actual"))
        .join(pred, "doc_id", "left")
        .crossJoin(F.broadcast(fb))
        .select(
            "doc_id",
            "actual",
            F.coalesce("pred", "_fb_pred").alias("pred"),
            F.round(F.coalesce("score", "_fb_score"), 4).alias("score"),
        )
    )


def ccnet_shards(df, id_col: str = "doc_id", text_col: str = "text"):
    """CCNet's final sharding step (Wenzek et al. 2020 §4.4): documents are
    split into head / middle / tail quality shards by LM perplexity, with
    the head (lowest ppl) the highest-quality training slice.

    Cutoffs are VALUE thresholds (the exact interpolated tercile points of
    the corpus ppl distribution), not per-doc global ranks: CCNet itself
    computes fixed cutoffs once and buckets by comparison, which is also the
    only shape that scales — a rank-based ntile needs a global sort, while
    value thresholds are one 2-value aggregate broadcast to a map-side
    comparison. Boundary docs (ppl == cutoff, on the 3-decimal ppl grid)
    fall into the lower shard in both engines via ``<=``.

    Returns (doc_id, ppl, shard).
    """
    scored = lm_perplexity(df, id_col=id_col, text_col=text_col)
    cuts = scored.agg(
        F.round(F.expr("percentile(ppl, 1.0/3)"), 6).alias("t1"),
        F.round(F.expr("percentile(ppl, 2.0/3)"), 6).alias("t2"),
    )
    return scored.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "ppl",
        F.when(F.col("ppl") <= F.col("t1"), F.lit("head"))
        .when(F.col("ppl") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("shard"),
    )


def token_entropy(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document Shannon entropy of the token distribution (nats) — a
    standard gibberish/boilerplate signal: near-zero entropy means one token
    repeated (boilerplate), unusually high means noise. Used alongside the
    Gopher ratios and LM perplexity in quality filtering.

    Returns (doc_id, n_tokens, entropy) with entropy = -Σ p ln p over the
    doc's token frequencies, rounded to 6.

    Shape at 100 TB: one map-side-combinable (doc, token) count, one (doc)
    re-agg — both shuffles carry counts, never text. No model joins."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("token"),
    ).filter(F.col("token") != "")
    cnt = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    per = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.log(F.col("c"))).alias("clogc"),
    )
    # -Σ (c/n) ln (c/n) = ln n - (Σ c ln c) / n
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.round(
                F.coalesce(F.log("n") - F.col("clogc") / F.col("n"), F.lit(0.0)), 6
            ).alias("entropy"),
        )
    )


def tfidf_topk(df, k: int = 3, id_col: str = "doc_id", text_col: str = "text"):
    """Top-k characteristic terms per document by TF-IDF (keyword
    extraction / topic signal for corpus curation dashboards).

    tfidf = tf · ln(N / df) with raw within-doc term frequency tf, corpus
    document count N, and document frequency df. Ties break on ascending
    token. Returns (doc_id, rnk, token, tfidf).

    Shape at 100 TB: (doc, token) counts pre-aggregate map-side; df is one
    token-keyed agg joined back token-to-token (AQE skew-splits stopword-hot
    tokens — though stopwords have idf≈0 and never surface); N broadcasts;
    the top-k window partitions by doc (bounded by per-doc vocab)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_raw").desc(), F.col("token").asc()
    )
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf_raw", F.col("tf") * F.log(F.col("n") / F.col("df")))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "doc_id",
            F.col("rnk").cast("int").alias("rnk"),
            "token",
            F.round("tfidf_raw", 6).alias("tfidf"),
        )
    )


def pmi_collocations(df, min_count: int = 50, k: int = 20, text_col: str = "text"):
    """Collocation / phrase mining by pointwise mutual information —
    PMI(l,r) = ln( (c(l,r)/B) / ((c(l)/U)·(c(r)/U)) ) over corpus bigram and
    unigram counts (B, U the respective totals). High-PMI pairs are
    multiword expressions worth fusing before tokenizer training.

    Top-k by PMI (min corpus support ``min_count`` keeps the estimator
    stable), ties on ascending (lhs, rhs). Returns (lhs, rhs, n_pair, pmi).

    Shape at 100 TB: both count tables pre-aggregate map-side; totals are
    1-row broadcasts; the unigram joins are token-keyed (AQE skew-splits
    stopword-hot tokens); top-k is one global TakeOrdered of the few pairs
    clearing min_count, never a full sort."""
    toked = df.select(
        F.split(normalize_text(F.col(text_col)), " ").alias("_toks")
    )
    tk = F.col("_toks")
    toks = toked.select(F.explode(tk).alias("token")).filter(F.col("token") != "")
    uni = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c_uni"))
    u_tot = uni.agg(F.sum("c_uni").alias("u"))
    pairs = F.when(
        (F.size(tk) >= 2) & (F.element_at(tk, 1) != ""),
        F.transform(
            F.sequence(F.lit(0), F.size(tk) - 2),
            lambda i: F.struct(
                F.get(tk, i).alias("lhs"), F.get(tk, i + 1).alias("rhs")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<lhs:string,rhs:string>>"))
    bi = (
        toked.select(F.explode(pairs).alias("b"))
        .groupBy("b.lhs", "b.rhs")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    b_tot = (
        toked.select(
            F.greatest(F.size(tk) - 1, F.lit(0)).alias("nb"),
            (F.element_at(tk, 1) != "").alias("ok"),
        )
        .filter(F.col("ok"))
        .agg(F.sum("nb").alias("b"))
    )
    # bi (post-min_count) is the small side; the vocab table is NOT
    # broadcastable at corpus scale — AQE picks the broadcast direction from
    # runtime stats, so no hint pins the big side into memory
    return (
        bi.join(uni.withColumnRenamed("token", "lhs").withColumnRenamed("c_uni", "c_l"), "lhs")
        .join(uni.withColumnRenamed("token", "rhs").withColumnRenamed("c_uni", "c_r"), "rhs")
        .crossJoin(F.broadcast(u_tot))
        .crossJoin(F.broadcast(b_tot))
        .withColumn(
            "pmi_raw",
            F.log(
                (F.col("n_pair") / F.col("b"))
                / ((F.col("c_l") / F.col("u")) * (F.col("c_r") / F.col("u")))
            ),
        )
        .orderBy(F.col("pmi_raw").desc(), "lhs", "rhs")
        .limit(k)
        .select("lhs", "rhs", "n_pair", F.round("pmi_raw", 6).alias("pmi"))
    )

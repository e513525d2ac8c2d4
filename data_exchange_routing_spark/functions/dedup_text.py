"""Document deduplication for training-data pipelines: exact, n-gram Jaccard,
MinHash+LSH, SimHash.

All four are pure DataFrame compositions (no UDFs): hashing is md5-based so
every step has an exact DuckDB-SQL twin for the correctness oracle.

Scale notes:
- exact: groupBy(md5(text)) — map-side combined hash agg, one shuffle of
  (hash, id) pairs only, never the text.
- Jaccard pairs: shingle-explode + self-equi-join on shingle. O(sum shingles)
  shuffle; hot shingles are the skew risk — the LSH path replaces this at
  scale, and AQE skew-join splitting covers the rest.
- MinHash+LSH: signatures via groupBy(doc).agg(min(...)) per hash function
  (map-side combined), banding join touches only same-band candidates —
  the classical sub-quadratic near-dup path (MMDS ch.3, public knowledge).
- SimHash: token-explode + 32 conditional sums per doc, then hamming-style
  bucket compare; one shuffle by doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_exchange_routing_spark.functions.textstats import md5_int32, normalize_text

SHINGLE_N = 3
MINHASH_K = 8
LSH_BANDS = 4  # rows per band = MINHASH_K / LSH_BANDS = 2


def with_text_hash(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("text_hash", F.md5(F.col(text_col)))


def exact_dedup_survivors(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the minimum id per exact text hash (deterministic keep-first)."""
    return (
        with_text_hash(df, text_col)
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SHINGLE_N,
    distinct: bool = True,
) -> DataFrame:
    """Word n-gram shingles per document. ``distinct=True`` (set semantics,
    one extra shuffle) is required for Jaccard counting; min-hash callers pass
    ``distinct=False`` because min() is duplicate-insensitive — skipping a
    full shuffle of every shingle string.

    The token array is materialized in its own projection BEFORE the
    higher-order lambda: transform/slice run interpreted (no whole-stage
    codegen for lambda functions), and referencing the raw
    split(regexp(...)) expression inside the lambda re-evaluates it per
    element — O(tokens^2) regex work per doc, measured 14x slower at sf0.1."""
    toked = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_toks"),
    )
    tk = F.col("_toks")
    # guard: sequence(1, 0) is DESCENDING [1, 0] in Spark — a doc shorter
    # than n tokens would otherwise emit slices at indices 1 and 0 (the
    # latter an invalid-start error) instead of no shingles
    sh = F.when(F.size(tk) >= n, F.transform(
        F.sequence(F.lit(1), F.size(tk) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(tk, i, n)),
    )).otherwise(F.array().cast("array<string>"))
    out = toked.select("doc_id", F.explode(sh).alias("shingle"))
    return out.distinct() if distinct else out


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SHINGLE_N,
) -> DataFrame:
    """All pairs (a < b) with n-gram Jaccard >= threshold (exact, quadratic in
    co-shingled docs; use minhash_lsh_candidates at scale).

    Per-doc set sizes ride along as a window count over the SAME shingle
    relation, so the plan scans/shingles ``documents`` exactly twice (the
    unavoidable self-join sides) — not four times as separate size
    aggregations re-joined would."""
    from pyspark.sql import Window as W

    sh = shingles(df, id_col, text_col, n).withColumn(
        "n_sh", F.count(F.lit(1)).over(W.partitionBy("doc_id"))
    )
    a, b = sh.alias("a"), sh.alias("b")
    out = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
        .withColumn(
            "jaccard",
            F.round(F.col("n_common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


# MinHash affine family: hash_j(s) = (a_j * (base(s) mod p) + b_j) mod p with
# p = 2^31 - 1 and ONE md5-derived 32-bit base hash per shingle — the classic
# 2-universal construction (MMDS ch.3). p is small enough that a_j * h stays
# under 2^62 (exact in 64-bit integers in Spark AND DuckDB — the oracle is
# plain BIGINT arithmetic) while large random a_j make the product wrap many
# times, decorrelating the k permutations. (Round 1 ran k full md5 calls per
# shingle; one base hash + k derivations measured 2-5x faster at sf0.1.
# CAUTION: a_j must span [1, p) — small sequential a_j with no wraparound
# make every permutation share its argmin, collapsing the signature.)
MH_MOD = (1 << 31) - 1


def mh_params(k: int) -> list[tuple[int, int]]:
    import hashlib as _hl

    def _c(tag: str, j: int, lo: int) -> int:
        return int(_hl.md5(f"mh-{tag}-{j}".encode()).hexdigest()[:12], 16) % (MH_MOD - lo) + lo

    return [(_c("a", j, 1), _c("b", j, 0)) for j in range(k)]


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = MINHASH_K
) -> DataFrame:
    """k min-hashes per doc from the affine family above.

    Physical shape: ONE hash aggregation — k ``min`` aggregates over the raw
    (non-distinct) shingle stream, partially combined map-side, so the shuffle
    carries (doc_id, k longs) per doc rather than every exploded
    (shingle x j) row, and each shingle is md5-hashed ONCE. The long
    (doc_id, j, minhash) form is re-derived with a post-agg explode, which is
    narrow (docs x k rows, no shuffle)."""
    from data_exchange_routing_spark.functions.textstats import md5_int32

    sh = shingles(df, id_col, text_col, distinct=False)
    h = md5_int32(F.col("shingle")) % F.lit(MH_MOD)
    aggs = [
        F.min((F.lit(a) * h + F.lit(b)) % F.lit(MH_MOD)).alias(f"m{j}")
        for j, (a, b) in enumerate(mh_params(k))
    ]
    wide = sh.groupBy("doc_id").agg(*aggs)
    pairs = F.array(
        *[F.struct(F.lit(j).alias("j"), F.col(f"m{j}").alias("minhash")) for j in range(k)]
    )
    return wide.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.j").alias("j"), F.col("p.minhash").alias("minhash")
    )


def lsh_band_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """The LSH index relation (doc_id, band, band_hash): band hash = md5 of
    the band's sorted (j, minhash) rows. Shared by the one-shot candidate
    join below and the persistent incremental index (dedup_index.py)."""
    rows_per_band = k // bands
    sig = minhash_signatures(df, id_col, text_col, k)
    return (
        sig.withColumn("band", (F.col("j") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws("|", F.array_sort(F.collect_list(F.concat_ws(":", F.col("j"), F.col("minhash")))))).alias("band_hash"))
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing >= 1 LSH band (band hash = md5 of
    its rows' minhashes). Sub-quadratic: the pair join runs per (band, hash)
    bucket only."""
    banded = lsh_band_rows(df, id_col, text_col, k, bands)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
    bands: int = 4,
) -> DataFrame:
    """All pairs (a < b) with SimHash hamming distance <= max_hamming.

    EXACT and sub-quadratic: with ``bands`` > max_hamming, any pair within
    the distance bound must agree exactly on >= 1 band (pigeonhole), so the
    candidate join runs per (band, band_bits) bucket — never all-pairs — and
    the exact hamming filter then prunes false candidates. The classical
    SimHash dedup join (Manku et al., WWW'07, public algorithm).

    Default fingerprint width is 60 bits (32-bit simhashes have too little
    entropy on a same-vocabulary corpus and band buckets degenerate toward
    all-pairs — the reason production SimHash uses 64-bit fingerprints).
    The fingerprint is carried as ONE long: band keys are shift/mask
    extractions and the per-candidate hamming distance is a single
    bit_count(xor(a, b)) — a 60-term per-character comparison was measured
    falling out of whole-stage codegen and costing 100x on the join."""
    assert bands > max_hamming, "pigeonhole exactness needs bands > max_hamming"
    width = bits // bands
    sh = simhash(df, id_col, text_col, bits).withColumn(
        "sh_num", F.conv(F.col("simhash"), 2, 10).cast("long")
    )
    banded = sh.select(
        "doc_id",
        "sh_num",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("band"),
                    F.shiftright(F.col("sh_num"), j * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("band_bits"),
                )
                for j in range(bands)
            ])
        ).alias("bb"),
    ).select("doc_id", "sh_num", F.col("bb.band").alias("band"), F.col("bb.band_bits").alias("band_bits"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sh_num").bitwiseXOR(F.col("b.sh_num"))).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32) -> DataFrame:
    """SimHash over word tokens as a bit string: bit_j = 1 iff
    sum over distinct tokens of (2*((md5_int(token)>>j)&1)-1) > 0.
    Token hash width follows ``bits``: up to 60 bits from the md5 prefix
    (15 hex chars keeps the value inside a signed 64-bit long in both
    engines)."""
    assert bits <= 60, "token hash draws at most 60 bits from the md5 prefix"
    tok_hash = (
        md5_int32(F.col("tok"))
        if bits <= 32
        else F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    )
    toks = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
        .withColumn("h", tok_hash)
    )
    aggs = [
        F.sum(((F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))) * 2 - 1)).alias(f"s{j}")
        for j in range(bits)
    ]
    sums = toks.groupBy("doc_id").agg(*aggs)
    bit_chars = [F.when(F.col(f"s{j}") > 0, F.lit("1")).otherwise(F.lit("0")) for j in range(bits - 1, -1, -1)]
    return sums.select("doc_id", F.concat(*bit_chars).alias("simhash"))


def dedup_lines(
    df: DataFrame,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    out_col: str = "text_deduped",
) -> DataFrame:
    """Line-level exact dedup (RefinedWeb/CCNet-style boilerplate removal):
    drop every line that appears verbatim in >= ``min_docs`` DISTINCT
    documents (nav bars, cookie banners, footers), re-assembling each doc's
    remaining lines in their original order. ``sep`` is the line separator —
    '\\n' for real web text; the oracle demo uses ' ' (token granularity)
    because the synthetic corpus is single-line.

    Shape at 100 TB: lines never carry the full doc — the explode emits
    (id, pos, line); doc-frequency is a two-step agg on the line VALUE
    (per-doc distinct map-side, then count) so a line repeated within one doc
    counts once; the frequent set (count >= min_docs) is by construction the
    boilerplate TAIL — tiny relative to the corpus — and is broadcast to a
    left-anti join, so surviving lines shuffle exactly once (by id, for the
    ordered re-concat). Docs losing every line survive as empty strings
    (left join from the original ids, never an inner-join drop).
    """
    import re as _re

    # F.split takes a REGEX; sep is a literal separator (matching the
    # literal concat_ws on re-assembly and DuckDB's string_split oracle)
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), _re.escape(sep), -1)
        ).alias("pos", "line"),
    )
    frequent = (
        lines.select("doc_id", "line")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("line")
    )
    kept = lines.join(F.broadcast(frequent), "line", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            sep, F.transform(F.array_sort(F.collect_list(F.struct("pos", "line"))), lambda s: s["line"])
        ).alias(out_col)
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(rebuilt, "doc_id", "left")
        .select("doc_id", F.coalesce(F.col(out_col), F.lit("")).alias(out_col))
    )


def dedup_spans(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring span dedup at word n-gram granularity (the span-level
    companion to document-level ``exact_dedup_survivors`` and line-level
    ``dedup_lines``; semantics per Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better" — duplicated substrings are removed
    from every occurrence EXCEPT one kept copy).

    A word n-gram of the normalized text that occurs more than once across
    the corpus (including repeats inside one document) is duplicated. Its
    canonical occurrence — minimum (doc_id, start), a deterministic stand-in
    for the paper's random keep — survives; every other occurrence marks its
    n covered token positions for removal. Surviving tokens re-assemble in
    original order; fully-duplicated documents survive as empty strings.

    Returns (doc_id, text_deduped, n_tokens_kept, n_tokens_removed).

    Shape at 100 TB: occurrences shuffle once grouped BY GRAM with a
    map-side-combinable agg (count + min(struct)), so a boilerplate gram
    repeated millions of times pre-reduces per task before the exchange; the
    occurrence->stats join-back is a shuffle join AQE skew-splits on hot
    grams; removed-position explode is bounded by n x removed occurrences,
    never n x corpus. Grouping keys here are the gram STRINGS (exactness for
    the DuckDB oracle); at production scale substitute a 128-bit hash pair
    (two xxhash64 seeds) to shuffle 16 bytes/gram with negligible collision
    odds. Re-assembly shuffles kept tokens once by doc_id.
    """
    toked = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_toks"),
    )
    tk = F.col("_toks")
    # 0-based token positions; an empty doc normalizes to [''] whose lone
    # token is dropped so totals/grams agree (no real token is ever '').
    toks = toked.select(
        "doc_id", F.posexplode(tk).alias("pos", "token")
    ).filter(F.col("token") != "")
    # n-gram occurrences with 0-based start positions (same slice guard as
    # shingles(): sequence(1, 0) would be DESCENDING for short docs)
    gram_structs = F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - (n - 1)),
            lambda i: F.struct(
                (i - F.lit(1)).alias("start"),
                F.concat_ws(" ", F.slice(tk, i, n)).alias("gram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<start:int,gram:string>>"))
    occ = toked.select("doc_id", F.explode(gram_structs).alias("g")).select(
        "doc_id", F.col("g.start").alias("start"), F.col("g.gram").alias("gram")
    )
    gstats = occ.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min(F.struct("doc_id", "start")).alias("keep"),
    )
    removed = occ.join(gstats, "gram").filter(
        (F.col("n_occ") > 1)
        & ~(
            (F.col("doc_id") == F.col("keep.doc_id"))
            & (F.col("start") == F.col("keep.start"))
        )
    )
    rem_pos = removed.select(
        "doc_id",
        F.explode(F.sequence(F.col("start"), F.col("start") + F.lit(n - 1))).alias("pos"),
    ).distinct()
    kept = toks.join(rem_pos, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token"))),
                lambda s: s["token"],
            ),
        ).alias("text_deduped"),
        F.count(F.lit(1)).alias("n_tokens_kept"),
    )
    totals = toked.select(
        "doc_id",
        F.when(F.element_at(tk, 1) == "", F.lit(0))
        .otherwise(F.size(tk))
        .cast("bigint")
        .alias("n_tokens"),
    )
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("text_deduped"), F.lit("")).alias("text_deduped"),
            F.coalesce(F.col("n_tokens_kept"), F.lit(0)).cast("bigint").alias("n_tokens_kept"),
            (F.col("n_tokens") - F.coalesce(F.col("n_tokens_kept"), F.lit(0)))
            .cast("bigint")
            .alias("n_tokens_removed"),
        )
    )


def containment_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SHINGLE_N,
) -> DataFrame:
    """Asymmetric near-dup detection: shingle-set CONTAINMENT
    C(A⊆B) = |A∩B| / |A| (Broder 1997's resemblance companion). Jaccard
    misses quote-inclusion — a short doc wholly embedded in a long one has
    tiny Jaccard but containment 1.0 — and containment is the signal used to
    drop quoted/boilerplate-wrapped variants while keeping the superset doc.

    Emits (doc_a < doc_b) pairs with both directions (cont_ab = how much of
    A is inside B, cont_ba) where max(cont_ab, cont_ba) >= threshold.

    Same exact/quadratic-in-co-shingled-docs contract as ``jaccard_pairs``
    (the small-scale twin); at 100 TB the candidate side is
    ``minhash_lsh_candidates`` output and this verifies candidates only.
    Plan: one shingle relation scanned twice (the unavoidable self-join
    sides) with per-doc sizes as a window over the same relation.
    """
    from pyspark.sql import Window as W

    sh = shingles(df, id_col, text_col, n).withColumn(
        "n_sh", F.count(F.lit(1)).over(W.partitionBy("doc_id"))
    )
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
        .withColumn("cont_ab", F.round(F.col("n_common") / F.col("n_a"), 6))
        .withColumn("cont_ba", F.round(F.col("n_common") / F.col("n_b"), 6))
        .filter(F.greatest("cont_ab", "cont_ba") >= threshold)
        .select("doc_a", "doc_b", "cont_ab", "cont_ba")
    )


def prefix_filter_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SHINGLE_N,
) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering — the All-Pairs /
    PPJoin family (Chaudhuri et al. ICDE'06; Bayardo et al. WWW'07; public
    algorithms). Output contract is identical to ``jaccard_pairs`` (all pairs
    a < b with shingle-set Jaccard >= threshold), but candidate generation is
    sub-quadratic WITHOUT the approximation of MinHash-LSH: exact recall by
    construction, so it sits between the quadratic exact join (small scale)
    and the probabilistic LSH path (when a bounded false-negative rate is
    acceptable).

    Prefix-filtering principle: order the shingle universe by ascending
    document frequency (rarest first, ties by value — any TOTAL order is
    correct; rarity is the performance heuristic). For a set x, let
    p = |x| - ceil(t*|x|) + 1. If J(A,B) >= t and prefix_p(A) ∩ B = ∅, then
    |A∩B| <= |A| - p = ceil(t|A|) - 1 < t*|A| <= t*|A∪B| <= |A∩B| — a
    contradiction; so probing the FULL set of the larger-id side with only
    the p rarest shingles of the smaller-id side misses nothing.

    Shape at 100 TB: the exploded prefix relation carries ~(1-t)|x|+1
    shingles per doc — and by construction the RAREST ones, so the Zipf head
    that makes the naive shingle self-join skew-bound is exactly what the
    prefix excludes; per-shingle candidate fan-out is bounded by that
    shingle's document frequency. The length filter (min >= t*max, valid
    because |A∩B| <= min and >= t*max) prunes cross-size candidates before
    the exchange. Verification joins the candidate-pair relation
    (output-sized) to per-doc set arrays — two hash joins keyed by doc id —
    and computes exact Jaccard with array_intersect; no re-explode of the
    corpus. Epsilon guards on the two float*int comparisons keep rounding
    from ever TIGHTENING a bound (looseness costs performance only; the
    exact verify step restores precision).

    The shingle relation and the ranked (df-joined, windowed) relation are
    each referenced several times downstream; both are materialized ONCE via
    localCheckpoint (the graph.py pattern), so the corpus is scanned and
    shingled exactly once — the naive plan re-exploded the full text six
    times (measured via executedPlan scan count).
    """
    from pyspark.sql import Window as W

    assert 0.0 < threshold <= 1.0
    # distinct: set semantics; checkpointed — reused by dfreq/ranked/sets
    sh = shingles(df, id_col, text_col, n).localCheckpoint(eager=False)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
    w = W.partitionBy("doc_id")
    ranked = (
        sh.join(dfreq, "shingle")
        .withColumn("n_sh", F.count(F.lit(1)).over(w))
        .withColumn("rk", F.row_number().over(w.orderBy("df_", "shingle")))
        .localCheckpoint(eager=False)  # reused by both join sides
    )
    prefix_len = (
        F.col("n_sh")
        - F.ceil(F.lit(threshold) * F.col("n_sh") - F.lit(1e-9))
        + F.lit(1)
    )
    pref = ranked.filter(F.col("rk") <= prefix_len).select(
        "doc_id", "shingle", "n_sh"
    )
    full = ranked.select("doc_id", "shingle", "n_sh")
    cand = (
        pref.alias("a")
        .join(
            full.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.least(F.col("a.n_sh"), F.col("b.n_sh"))
                >= F.lit(threshold) * F.greatest(F.col("a.n_sh"), F.col("b.n_sh"))
                - F.lit(1e-9)
            ),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sets = sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("sh_set"))
    return (
        cand.join(
            sets.select(F.col("doc_id").alias("doc_a"), F.col("sh_set").alias("set_a")),
            "doc_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_b"), F.col("sh_set").alias("set_b")),
            "doc_b",
        )
        .withColumn("n_common", F.size(F.array_intersect("set_a", "set_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.size("set_a") + F.size("set_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
